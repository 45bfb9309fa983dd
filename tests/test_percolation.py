"""Bootstrap percolation (k-neighbor threshold cascade), synchronous
rounds.

Checks activation rounds against a pure-Python replay on hand and
random graphs, threshold-1 equals BFS levels, a clique fully percolates
from 2 seeds at threshold 2 while a tree does not, and the exact-rounds
prefix contract.
"""

import random
from collections import defaultdict

from ontoweaver_spark.graphstats import bootstrap_percolation


def _py_perc(edges, seeds, threshold, rounds=None):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    active = {s: 0 for s in set(seeds)}
    r = 0
    while rounds is None or r < rounds:
        r += 1
        newly = [
            n
            for n in {m for a in active for m in adj[a]}
            if n not in active
            and sum(1 for x in adj[n] if x in active) >= threshold
        ]
        if not newly:
            if rounds is None:
                break
            continue
        for n in newly:
            active[n] = r
    return active


def _run(spark, edges, seeds, threshold=2, rounds=None):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {
        r["node"]: r["round"]
        for r in bootstrap_percolation(
            e, s, threshold=threshold, rounds=rounds
        ).collect()
    }


def test_clique_percolates_tree_does_not(spark):
    k5 = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    tree = [("c0", "t1"), ("t1", "t2"), ("t2", "t3")]
    got = _run(spark, k5 + tree, ["c0", "c1"], threshold=2)
    assert got == _py_perc(k5 + tree, ["c0", "c1"], 2)
    assert all(f"c{i}" in got for i in range(5))
    assert "t2" not in got  # single-path corroboration < threshold


def test_threshold_one_is_bfs_levels(spark):
    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    got = _run(spark, chain, ["a"], threshold=1)
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_matches_python_on_random_graphs(spark):
    rng = random.Random(77)
    edges = list(
        {
            tuple(sorted((f"v{rng.randint(0, 17)}", f"v{rng.randint(0, 17)}")))
            for _ in range(60)
        }
    )
    edges = [e for e in edges if e[0] != e[1]]
    seeds = ["v0", "v1", "v2"]
    for t in (1, 2, 3):
        assert _run(spark, edges, seeds, threshold=t) == _py_perc(
            edges, seeds, t
        )


def test_exact_rounds_prefix(spark):
    k4 = [(f"n{i}", f"n{j}") for i in range(4) for j in range(i + 1, 4)]
    full = _run(spark, k4, ["n0", "n1"], threshold=2)
    one = _run(spark, k4, ["n0", "n1"], threshold=2, rounds=1)
    assert one == {k: v for k, v in full.items() if v <= 1}
