"""SALSA authority/hub scores (Lempel & Moran, WWW'00) — integer
alternating degree-normalized walks.

Checks the exact recurrence against a pure-Python replay, the TKC
robustness contrast vs HITS-style reinforcement (a big star beats a
small clique under SALSA), zero-degree semantics, and partition
invariance.
"""

import random
from collections import defaultdict

from ontoweaver_spark.graphstats import salsa_scores

SCALE = 1_000_000


def _py_salsa(edges, iterations):
    E = sorted(set(edges))
    outd = defaultdict(int)
    ind = defaultdict(int)
    for s, d in E:
        outd[s] += 1
        ind[d] += 1
    nodes = sorted({n for e in E for n in e})
    h = {n: SCALE for n in nodes}
    a = {}
    for _ in range(iterations):
        acc = defaultdict(int)
        for s, d in E:
            acc[d] += h[s] // outd[s]
        a = {n: acc.get(n, 0) for n in nodes}
        acc = defaultdict(int)
        for s, d in E:
            acc[s] += a[d] // ind[d]
        h = {n: acc.get(n, 0) for n in nodes}
    return {n: (a[n], h[n]) for n in nodes}


def _run(spark, edges, iterations=3):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: (r["authority"], r["hub"])
        for r in salsa_scores(df, iterations=iterations).collect()
    }


def test_matches_python_replay(spark):
    rng = random.Random(31)
    edges = list(
        {(f"v{rng.randint(0, 18)}", f"v{rng.randint(0, 18)}") for _ in range(70)}
    )
    got = _run(spark, edges)
    assert got == _py_salsa(edges, 3)


def test_tkc_star_beats_clique(spark):
    # 3-clique (directed both ways) vs a 10-leaf star onto one target:
    # SALSA's degree normalization gives the star target top authority;
    # unnormalized HITS-style reinforcement would favor the clique
    clique = [(a, b) for a in "xyz" for b in "xyz" if a != b]
    star = [(f"f{i}", "target") for i in range(10)]
    got = _run(spark, clique + star, iterations=3)
    target_auth = got["target"][0]
    assert all(got[c][0] < target_auth for c in "xyz")


def test_zero_degree_semantics(spark):
    edges = [("a", "b")]
    got = _run(spark, edges, iterations=2)
    assert got == _py_salsa(edges, 2)
    assert got["a"][0] == 0  # no in-edges -> authority 0
    assert got["b"][1] == 0  # no out-edges -> hub 0


def test_partition_invariance(spark):
    rng = random.Random(8)
    edges = [(f"n{rng.randint(0, 12)}", f"n{rng.randint(0, 12)}") for _ in range(50)]
    d1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    d8 = spark.createDataFrame(edges, "src string, dst string").repartition(8)
    r1 = {r["node"]: (r["authority"], r["hub"]) for r in salsa_scores(d1).collect()}
    r8 = {r["node"]: (r["authority"], r["hub"]) for r in salsa_scores(d8).collect()}
    assert r1 == r8
