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
