"""Tests for sessions.asof_join and sessions.range_join — cross-checked
against pure-Python point-in-time / containment references."""

import datetime as dt

from pyspark.sql import functions as F

from ontoweaver_spark.sessions import asof_join, range_join


def T(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


LEFT = [  # (event_id, ts, user_id, value)
    (1, T(10), 7, 1.0),
    (2, T(20), 7, 2.0),
    (3, T(5), 7, 3.0),    # before any right row
    (4, T(15), 9, 4.0),   # user with no right rows at all
    (5, T(30), 7, 5.0),
    (6, T(12), 8, 6.0),   # equal-timestamp boundary vs right (8, T(12))
]
RIGHT = [  # (event_id, ts, user_id, score)
    (101, T(8), 7, 10.0),
    (102, T(12), 8, 20.0),
    (103, T(20), 7, 30.0),  # equal ts with left id=2
    (104, T(25), 7, 40.0),
]
L_SCHEMA = "event_id long, ts timestamp, user_id long, value double"
R_SCHEMA = "event_id long, ts timestamp, user_id long, score double"


def py_asof(strict=False):
    out = {}
    for lid, lts, lu, _ in LEFT:
        best = None
        for rid, rts, ru, score in RIGHT:
            if ru != lu:
                continue
            if (rts < lts) if strict else (rts <= lts):
                if best is None or rts > best[0]:
                    best = (rts, rid, score)
        out[lid] = (best[1], best[2]) if best else (None, None)
    return out


def test_asof_join_matches_python_inclusive_and_strict(spark):
    l = spark.createDataFrame(LEFT, L_SCHEMA)
    r = spark.createDataFrame(RIGHT, R_SCHEMA)
    for strict in (False, True):
        got = {
            row.event_id: (row.event_id_r, row.score_r)
            for row in asof_join(
                l, r, right_cols=["event_id", "score"], strict=strict
            ).collect()
        }
        assert got == py_asof(strict), f"strict={strict}"
    # inclusive: left 2 at T(20) matches right 103 at T(20); strict: 101
    assert py_asof(False)[2][0] == 103 and py_asof(True)[2][0] == 101
    # boundary user 8: inclusive matches the equal-ts row, strict does not
    assert py_asof(False)[6][0] == 102 and py_asof(True)[6] == (None, None)


def test_asof_join_partition_invariant(spark):
    l = spark.createDataFrame(LEFT, L_SCHEMA)
    r = spark.createDataFrame(RIGHT, R_SCHEMA)
    a = sorted(map(tuple, asof_join(l, r, right_cols=["score"]).collect()))
    b = sorted(
        map(tuple, asof_join(l.repartition(5), r.repartition(3),
                             right_cols=["score"]).collect())
    )
    assert a == b


INTERVALS = [  # (iv_id, user_id, start, end)
    (201, 7, T(9), T(21)),    # contains left 1 (T10) and 2 (T20, inclusive end edge at 21)
    (202, 7, T(20), T(40)),   # contains left 2 (start edge) and 5
    (203, 8, T(12), T(12)),   # zero-width: contains only exactly T(12)
    (204, 9, T(100), T(200)), # matches nothing
]
IV_SCHEMA = "iv_id long, user_id long, start timestamp, end timestamp"


def py_range():
    out = set()
    for lid, lts, lu, _ in LEFT:
        for ivid, iu, s, e in INTERVALS:
            if lu == iu and s <= lts <= e:
                out.add((lid, ivid))
    return out


def test_range_join_matches_python_and_has_no_dups(spark):
    l = spark.createDataFrame(LEFT, L_SCHEMA)
    iv = spark.createDataFrame(INTERVALS, IV_SCHEMA)
    for bin_s in (60, 600, 3600):  # bins smaller/like/larger than spans
        rows = range_join(l, iv, bin_seconds=bin_s).collect()
        got = [(r.event_id, r.iv_id) for r in rows]
        assert sorted(got) == sorted(py_range()), f"bin={bin_s}"
        assert len(got) == len(set(got)), f"dup pairs at bin={bin_s}"
    assert (1, 201) in py_range() and (2, 202) in py_range()
    assert (6, 203) in py_range()  # zero-width inclusive
