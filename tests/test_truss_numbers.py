"""Full truss decomposition via edge-level h-index iteration
(Sariyuce et al., WWW'17 local algorithms).

Checks the fixpoint against a pure-Python peel-per-k trussness replay on
hand and random graphs, the triangle-free floor (trussness 2), the
exact-rounds contract (round 0 = support + 2, monotone non-increasing
thereafter), and agreement with k_truss membership at each k.
"""

import random
from collections import defaultdict

from ontoweaver_spark.graphstats import k_truss, truss_numbers


def _py_trussness(edges):
    E = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    t = {e: 2 for e in E}
    cur, k = set(E), 3
    while cur:
        g = set(cur)
        while True:
            adj = defaultdict(set)
            for a, b in g:
                adj[a].add(b)
                adj[b].add(a)
            drop = [(a, b) for (a, b) in g if len(adj[a] & adj[b]) < k - 2]
            if not drop:
                break
            g -= set(drop)
        for e in g:
            t[e] = k
        cur, k = g, k + 1
    return t


def _spark_trussness(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        (r["u"], r["v"]): r["trussness"]
        for r in truss_numbers(df, **kw).collect()
    }


def test_k5_plus_pendant(spark):
    k5 = [(f"n{i}", f"n{j}") for i in range(5) for j in range(i + 1, 5)]
    edges = k5 + [("n0", "p")]
    got = _spark_trussness(spark, edges)
    assert all(got[tuple(sorted(e))] == 5 for e in k5)
    assert got[("n0", "p")] == 2


def test_matches_python_replay_on_random_graphs(spark):
    rng = random.Random(11)
    for trial in range(3):
        n = 14
        edges = [
            (f"v{i}", f"v{j}")
            for i in range(n)
            for j in range(i + 1, n)
            if rng.random() < 0.35
        ]
        # plant a clique so high trussness values appear
        edges += [(f"v{i}", f"v{j}") for i in range(4) for j in range(i + 1, 4)]
        got = _spark_trussness(spark, edges)
        assert got == _py_trussness(edges)


def test_round_zero_is_support_plus_two_and_monotone(spark):
    # two triangles sharing an edge: shared edge support 2, others 1;
    # fixpoint trussness is 3 for every edge (each survives the 3-truss)
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")]
    r0 = _spark_trussness(spark, edges, exact_rounds=0)
    assert r0 == {("a", "b"): 4, ("a", "c"): 3, ("b", "c"): 3,
                  ("a", "d"): 3, ("b", "d"): 3}
    r1 = _spark_trussness(spark, edges, exact_rounds=1)
    assert all(r1[e] <= r0[e] for e in r0)
    fix = _spark_trussness(spark, edges)
    assert fix == {e: 3 for e in r0}


def test_agrees_with_k_truss_membership(spark):
    rng = random.Random(5)
    edges = [
        (f"u{i}", f"u{j}")
        for i in range(12)
        for j in range(i + 1, 12)
        if rng.random() < 0.4
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    tn = _spark_trussness(spark, edges)
    for k in (3, 4):
        member = {
            (r["u"], r["v"]) for r in k_truss(df, k=k).select("u", "v").collect()
        }
        assert member == {e for e, t in tn.items() if t >= k}


def test_triangle_free_graph_all_twos(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    assert set(_spark_trussness(spark, edges).values()) == {2}
