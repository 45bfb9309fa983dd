"""Integer power-iteration eigenvector centrality.

Checks the exact integer recurrence against a pure-Python replay
(including the overflow-safe renormalization), the star-graph hand
result (center dominates in the symmetric variant), directed
source-only-nodes-at-zero semantics, and partition invariance.
"""

import random
from collections import defaultdict

from ontoweaver_spark.graphstats import eigenvector_centrality

SCALE = 1_000_000


def _py_eig(edges, iterations, symmetric):
    E = set()
    for a, b in edges:
        E.add((a, b))
        if symmetric:
            E.add((b, a))
    nodes = sorted({n for e in E for n in e})
    v = {n: SCALE for n in nodes}
    for _ in range(iterations):
        iv = defaultdict(int)
        for a, b in E:
            iv[b] += v[a]
        nv = {n: iv.get(n, 0) for n in nodes}
        mx = max(nv.values()) if nv else 0
        div = max(mx // SCALE, 1)
        v = {n: x // div for n, x in nv.items()}
    return v


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: r["score"]
        for r in eigenvector_centrality(df, **kw).collect()
    }


def test_star_symmetric_center_dominates(spark):
    star = [("hub", f"leaf{i}") for i in range(8)]
    got = _run(spark, star, iterations=4, symmetric=True)
    assert got == _py_eig(star, 4, True)
    assert got["hub"] == max(got.values())
    assert all(got[f"leaf{i}"] == got["leaf0"] for i in range(8))


def test_directed_source_only_goes_to_zero(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "b")]
    got = _run(spark, edges, iterations=3)
    assert got == _py_eig(edges, 3, False)
    assert got["a"] == 0  # nothing points at a


def test_matches_python_on_random_graphs(spark):
    rng = random.Random(42)
    edges = list(
        {
            (f"v{rng.randint(0, 20)}", f"v{rng.randint(0, 20)}")
            for _ in range(80)
        }
    )
    for sym in (False, True):
        assert _run(spark, edges, iterations=5, symmetric=sym) == _py_eig(
            edges, 5, sym
        )


def test_partition_invariance(spark):
    rng = random.Random(9)
    edges = [(f"a{rng.randint(0, 15)}", f"a{rng.randint(0, 15)}") for _ in range(60)]
    df1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    df8 = spark.createDataFrame(edges, "src string, dst string").repartition(8)
    r1 = {r["node"]: r["score"] for r in eigenvector_centrality(df1).collect()}
    r8 = {r["node"]: r["score"] for r in eigenvector_centrality(df8).collect()}
    assert r1 == r8
