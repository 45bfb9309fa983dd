"""Sessionization: the per-event cumulative-sum path and the native
session_window rollup must derive identical sessions."""

import datetime

from pyspark.sql import functions as F


def _events(spark):
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0

    def add(user, minutes):
        nonlocal eid
        rows.append((eid, base + datetime.timedelta(minutes=minutes), user))
        eid += 1

    # user 1: two sessions (gap 45 > 30), user 2: one session incl. an
    # exactly-30-minute gap (NOT a new session: strictly-greater rule),
    # user 3: a single event
    for m in (0, 10, 20, 65, 70):
        add(1, m)
    for m in (0, 30, 60):
        add(2, m)
    add(3, 5)
    return spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint")


def test_sessionize_matches_session_window(spark):
    from ontoweaver_spark.sessions import session_stats, sessionize

    ev = _events(spark)
    labeled = sessionize(ev, gap_minutes=30)
    derived = {
        (r["user_id"], r["n_events"], r["first_event"], r["last_event"])
        for r in labeled.groupBy("user_id", "session_no").agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        ).collect()
    }
    native = {
        (r["user_id"], r["n_events"], r["first_event"], r["last_event"])
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    assert derived == native
    assert (1, 3, 0, 2) in native and (1, 2, 3, 4) in native  # the 45-min split
    assert (2, 3, 5, 7) in native  # ==30-min gap does NOT split
    assert (3, 1, 8, 8) in native


def test_sessionize_numbers_deterministic(spark):
    from ontoweaver_spark.sessions import sessionize

    ev = _events(spark)
    a = {(r["event_id"], r["session_no"]) for r in sessionize(ev).collect()}
    b = {(r["event_id"], r["session_no"])
         for r in sessionize(ev.repartition(7)).collect()}
    assert a == b
    assert {s for e, s in a if e in (0, 1, 2)} == {1}
    assert {s for e, s in a if e in (3, 4)} == {2}


def test_change_rate_exact_integers(spark):
    """Hand-computed freshness stats: a page that changed twice in 4
    time units, one that never changed, and one observed once."""
    from ontoweaver_spark.sessions import change_rate

    snaps = spark.createDataFrame(
        [
            # u1: b,b,a,a,b at ts 0..4 -> 2 changes over span 4
            ("u1", 0, "b"), ("u1", 1, "b"), ("u1", 2, "a"),
            ("u1", 3, "a"), ("u1", 4, "b"),
            # u2: constant
            ("u2", 0, "x"), ("u2", 1, "x"), ("u2", 2, "x"),
            # u3: single fetch
            ("u3", 7, "y"),
        ],
        "url string, ts long, value string",
    )
    got = {r["url"]: r.asDict() for r in change_rate(snaps, key_col="url",
                                                     as_of=10).collect()}
    u1 = got["u1"]
    assert (u1["n_fetches"], u1["n_changes"]) == (5, 2)
    assert u1["change_ppm"] == 2 * 1_000_000 // 4          # 500000
    assert u1["est_change_interval"] == (4 - 0) // 2        # 2
    assert u1["staleness_ppm"] == (10 - 4) * 1_000_000 // 2  # 3000000
    u2 = got["u2"]
    assert u2["n_changes"] == 0 and u2["change_ppm"] == 0
    assert u2["est_change_interval"] is None
    assert u2["staleness_ppm"] is None
    u3 = got["u3"]
    assert u3["n_fetches"] == 1 and u3["change_ppm"] is None
    assert u3["est_change_interval"] is None


def test_change_rate_partition_invariant(spark):
    from ontoweaver_spark.sessions import change_rate

    rows = [(f"u{i % 17}", t, "ab"[(i * t) % 2]) for i in range(60)
            for t in range(4)]
    snaps = spark.createDataFrame(rows, "url string, ts long, value string")
    a = sorted(map(tuple, change_rate(snaps, as_of=9).collect()))
    b = sorted(map(tuple, change_rate(snaps.repartition(13),
                                      as_of=9).collect()))
    assert a == b and len(a) == 17
