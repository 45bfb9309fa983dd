"""Rich-club coefficient profile (Zhou & Mondragon '04).

Checks the scaled-integer profile against a pure-Python replay on hand
and random graphs, the star counterexample (no rich club), and the
clique-with-fringe construction (phi -> scale at the top)."""

import random
from collections import defaultdict

from ontoweaver_spark.graphstats import rich_club

SCALE = 1_000_000


def _py_rich_club(edges):
    E = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = defaultdict(int)
    for a, b in E:
        deg[a] += 1
        deg[b] += 1
    out = {}
    for k in sorted(set(deg.values())):
        nodes = {n for n, d in deg.items() if d > k}
        if len(nodes) < 2:
            continue
        ek = sum(1 for a, b in E if a in nodes and b in nodes)
        out[k] = (
            len(nodes),
            ek,
            2 * ek * SCALE // (len(nodes) * (len(nodes) - 1)),
        )
    return out


def _spark_rich_club(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
        for r in rich_club(df).collect()
    }


def test_clique_with_fringe(spark):
    # K4 core + a pendant per core node: degree-3 grid point keeps only
    # the clique -> phi = scale exactly
    k4 = [(f"c{i}", f"c{j}") for i in range(4) for j in range(i + 1, 4)]
    fringe = [(f"c{i}", f"p{i}") for i in range(4)]
    got = _spark_rich_club(spark, k4 + fringe)
    assert got == _py_rich_club(k4 + fringe)
    assert got[1] == (4, 6, SCALE)  # degree >1 keeps the K4 alone


def test_star_has_no_rich_club(spark):
    star = [("hub", f"leaf{i}") for i in range(6)]
    got = _spark_rich_club(spark, star)
    # only k=1 has >= 2 survivors? degree(hub)=6, leaves=1 -> k=1 leaves
    # just the hub (1 node) and k=6 nobody: profile is empty
    assert got == _py_rich_club(star) == {}


def test_matches_python_on_random_graphs(spark):
    rng = random.Random(23)
    for _ in range(3):
        edges = [
            (f"v{i}", f"v{j}")
            for i in range(16)
            for j in range(i + 1, 16)
            if rng.random() < 0.3
        ]
        assert _spark_rich_club(spark, edges) == _py_rich_club(edges)


def test_missing_min_degree_grid_point(spark):
    # construction where some degree value k has NO edge whose min
    # endpoint degree equals k — the suffix-cumulative must still count
    # the larger-md edges (regression for the 0-fill alignment)
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")]
    # degrees: a=3, b=c=2, d=1; min-degrees: ab=2? (a3,b2)->2, ac->2,
    # bc->2, ad->1; k=1 grid point: md==1 exists; craft k=2 row: nodes
    # with deg>2 = {a} (dropped, <2). Use a bigger case:
    edges += [("e", "f")]
    got = _spark_rich_club(spark, edges)
    assert got == _py_rich_club(edges)
