"""Unit tests for temporal_reachability (time-respecting BFS) and
greedy_cover (greedy weighted set cover), each against an independent
plain-Python reference computation."""

import pytest
from pyspark.sql import functions as F


def _temporal_brute(edges, seeds, hops):
    arrival = dict(seeds)
    for _ in range(hops):
        nxt = dict(arrival)
        for u, v, t in edges:
            if u in arrival and t >= arrival[u]:
                if v not in nxt or t < nxt[v]:
                    nxt[v] = t
        arrival = nxt
    return arrival


def test_temporal_reachability_respects_time(spark):
    from ontoweaver_spark.graphstats import temporal_reachability

    # a->b at t=5, b->c needs t>=5: the t=3 edge is unusable, t=9 works;
    # c->d only exists BEFORE c is reachable -> d unreachable
    edges = [
        ("a", "b", 5), ("b", "c", 3), ("b", "c", 9),
        ("c", "d", 4), ("a", "e", 2), ("e", "f", 2),
    ]
    e = spark.createDataFrame(edges, "src string, dst string, t long")
    seeds = spark.createDataFrame([("a", 0)], "node string, start long")
    got = {
        r["node"]: r["arrival"]
        for r in temporal_reachability(e, seeds, rounds=4).collect()
    }
    assert got == {"a": 0, "b": 5, "c": 9, "e": 2, "f": 2}


def test_temporal_reachability_matches_bruteforce(spark):
    from ontoweaver_spark.graphstats import temporal_reachability

    edges = [
        (f"v{i}", f"v{(i * 3 + 1) % 17}", (i * 7 + 2) % 13) for i in range(17)
    ] + [(f"v{i}", f"v{(i * 5 + 2) % 17}", (i * 11 + 1) % 13) for i in range(17)]
    seeds = [("v0", 0), ("v9", 1)]
    e = spark.createDataFrame(edges, "src string, dst string, t long")
    s = spark.createDataFrame(seeds, "node string, start long")
    got = {
        r["node"]: r["arrival"]
        for r in temporal_reachability(e, s, rounds=5).collect()
    }
    assert got == _temporal_brute(edges, seeds, 5)


def test_temporal_reachability_fixpoint_mode(spark):
    from ontoweaver_spark.graphstats import temporal_reachability

    edges = [(f"v{i}", f"v{i + 1}", i) for i in range(6)]
    e = spark.createDataFrame(edges, "src string, dst string, t long")
    s = spark.createDataFrame([("v0", 0)], "node string, start long")
    got = {
        r["node"]: r["arrival"]
        for r in temporal_reachability(e, s, rounds=10, exact_rounds=False).collect()
    }
    assert got == {f"v{i}": max(i - 1, 0) for i in range(7)}
    with pytest.raises(RuntimeError, match="still relaxing"):
        temporal_reachability(e, s, rounds=2, exact_rounds=False)


def _cover_brute(pairs, k):
    sets = {}
    for s, i in set(pairs):
        sets.setdefault(s, set()).add(i)
    covered, picks = set(), []
    for r in range(1, k + 1):
        # explicit (gain DESC, set ASC) tie-break
        best, bg = None, -1
        for s in sorted(sets):
            g = len(sets[s] - covered)
            if g > bg:
                best, bg = s, g
        if bg == 0:
            break
        picks.append((r, best, bg))
        covered |= sets[best]
    return picks


def test_greedy_cover_matches_bruteforce(spark):
    from ontoweaver_spark.sampling import greedy_cover

    pairs = [
        (f"s{j}", f"i{(j * p + c) % 30}")
        for j in range(8)
        for p, c in [(3, 1), (5, 2), (7, 3), (11, 4), (13, 5)]
    ]
    df = spark.createDataFrame(pairs, "set_id string, item string")
    got = [
        (r["pick_round"], r["set_id"], r["gain"])
        for r in greedy_cover(df, k=4).orderBy("pick_round").collect()
    ]
    assert got == _cover_brute(pairs, 4)


def test_greedy_cover_stops_when_exhausted(spark):
    from ontoweaver_spark.sampling import greedy_cover

    # two sets cover everything; k=5 must stop after 2 picks
    pairs = [("a", "x"), ("a", "y"), ("b", "y"), ("b", "z")]
    df = spark.createDataFrame(pairs, "set_id string, item string")
    got = [
        (r["pick_round"], r["set_id"], r["gain"])
        for r in greedy_cover(df, k=5).orderBy("pick_round").collect()
    ]
    assert got == [(1, "a", 2), (2, "b", 1)]


def test_greedy_cover_mask_and_loop_paths_agree(spark):
    """The bitmask fast path (|sets| <= max_mask_sets) and the distributed
    anti-join loop are the same function: force each on the same instance."""
    from ontoweaver_spark.sampling import greedy_cover

    pairs = [
        (f"s{j:02d}", f"i{(j * p + c) % 53}")
        for j in range(12)
        for p, c in [(3, 1), (5, 2), (7, 3), (11, 4), (13, 5), (17, 6)]
    ]
    df = spark.createDataFrame(pairs, "set_id string, item string")
    fast = [
        (r["pick_round"], r["set_id"], r["gain"])
        for r in greedy_cover(df, k=5, max_mask_sets=48).orderBy("pick_round").collect()
    ]
    loop = [
        (r["pick_round"], r["set_id"], r["gain"])
        for r in greedy_cover(df, k=5, max_mask_sets=3).orderBy("pick_round").collect()
    ]
    assert fast == loop == _cover_brute(pairs, 5)
