"""Per-node 4-clique participation counts (canonical a<b<c<d listing).

Checks K5 hand counts (each node in C(4,3)=4 of the 5 K4s), a
triangle-free and a K4-free graph (empty), and a random-graph replay
against itertools brute force.
"""

import itertools
import random
from collections import defaultdict

from ontoweaver_spark.graphstats import four_clique_counts


def _py_k4(edges):
    E = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in E for n in e})
    out = defaultdict(int)
    for quad in itertools.combinations(nodes, 4):
        if all(
            tuple(sorted(p)) in E for p in itertools.combinations(quad, 2)
        ):
            for n in quad:
                out[n] += 1
    return dict(out)


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: r["cliques4"] for r in four_clique_counts(df).collect()
    }


def test_k5(spark):
    k5 = [(f"n{i}", f"n{j}") for i in range(5) for j in range(i + 1, 5)]
    got = _run(spark, k5)
    assert got == {f"n{i}": 4 for i in range(5)}


def test_k4_free_graph_is_empty(spark):
    # two triangles sharing an edge: dense but no K4
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")]
    assert _run(spark, edges) == {}


def test_random_replay(spark):
    rng = random.Random(29)
    for _ in range(2):
        edges = [
            (f"v{i}", f"v{j}")
            for i in range(13)
            for j in range(i + 1, 13)
            if rng.random() < 0.45
        ]
        assert _run(spark, edges) == _py_k4(edges)
