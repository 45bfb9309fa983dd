"""Tests for graphstats.hits_fixed_point and graphstats.shortest_paths —
both cross-checked against independent pure-Python reimplementations."""

import hashlib

import pytest
from pyspark.sql import functions as F

from ontoweaver_spark.graphstats import hits_fixed_point, shortest_paths


def py_md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rand_edges(n_nodes=30, n_edges=120, tag="g"):
    edges = []
    for i in range(n_edges):
        h = py_md5_int(f"{tag}{i}")
        u, v = f"v{h % n_nodes}", f"v{(h // n_nodes) % n_nodes}"
        if u != v:
            edges.append((u, v))
    return sorted(set(edges))


def py_hits(edges, iterations, scale=1_000_000):
    edges = sorted(set((s, d) for s, d in edges if s != d))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    hub = {n: scale for n in nodes}
    auth = {}

    def norm(x):
        mx = max(max(x.values()), 1)
        return {k: v * scale // mx for k, v in x.items()}

    for _ in range(iterations):
        auth = {n: 0 for n in nodes}
        for s, d in edges:
            auth[d] += hub[s]
        auth = norm(auth)
        hub = {n: 0 for n in nodes}
        for s, d in edges:
            hub[s] += auth[d]
        hub = norm(hub)
    return {n: (hub[n], auth[n]) for n in nodes}


def py_sssp(edges_w, seeds, rounds=None, directed=True):
    e = {}
    for s, d, w in edges_w:
        e[(s, d)] = min(e.get((s, d), w), w)
        if not directed:
            e[(d, s)] = min(e.get((d, s), w), w)
    dist = {s: 0 for s in seeds}
    i = 0
    while rounds is None or i < rounds:
        nxt = dict(dist)
        for (s, d), w in e.items():
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        i += 1
        if nxt == dist and rounds is None:
            break
        dist = nxt
    return dist


def test_hits_matches_python_reference(spark):
    edges = _rand_edges()
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: (r.hub, r.auth) for r in hits_fixed_point(df, iterations=4).collect()}
    assert got == py_hits(edges, 4)
    assert max(h for h, _ in got.values()) == 1_000_000  # normalized


def test_hits_star_shape(spark):
    # pure star h -> s0..s4: h is the only hub, spokes are the authorities
    edges = [("h", f"s{i}") for i in range(5)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: (r.hub, r.auth) for r in hits_fixed_point(df, iterations=3).collect()}
    assert got["h"] == (1_000_000, 0)
    for i in range(5):
        assert got[f"s{i}"] == (0, 1_000_000)


def test_hits_deterministic_under_partitioning(spark):
    edges = _rand_edges(tag="p")
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, hits_fixed_point(df, iterations=3).collect()))
    b = sorted(map(tuple, hits_fixed_point(df.repartition(7), iterations=3).collect()))
    assert a == b


def _weighted(edges, tag="w"):
    return [(s, d, 1 + py_md5_int(f"{tag}:{s}>{d}") % 9) for s, d in edges]


def test_sssp_fixpoint_matches_python(spark):
    ew = _weighted(_rand_edges(tag="s"))
    df = spark.createDataFrame(ew, "src string, dst string, w long")
    seeds = spark.createDataFrame([("v0",), ("v1",)], "node string")
    stats = {}
    got = {r.node: r.dist for r in
           shortest_paths(df, seeds, weight_col="w", stats=stats).collect()}
    assert got == py_sssp(ew, ["v0", "v1"])
    assert stats["rounds"] >= 1


def test_sssp_exact_rounds_matches_python(spark):
    ew = _weighted(_rand_edges(tag="r"))
    df = spark.createDataFrame(ew, "src string, dst string, w long")
    seeds = spark.createDataFrame([("v2",)], "node string")
    for k in (1, 2, 4):
        got = {r.node: r.dist for r in
               shortest_paths(df, seeds, weight_col="w", rounds=k).collect()}
        assert got == py_sssp(ew, ["v2"], rounds=k)


def test_sssp_hop_count_and_undirected(spark):
    # chain a-b-c-d, undirected, unit weights: hop distances from a
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.dist for r in
           shortest_paths(df, seeds, directed=False).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    # directed: d unreachable from d's perspective backwards
    got = {r.node: r.dist for r in
           shortest_paths(df, spark.createDataFrame([("d",)], "node string")).collect()}
    assert got == {"d": 0}


def test_sssp_parallel_edges_keep_min_weight(spark):
    df = spark.createDataFrame(
        [("a", "b", 5), ("a", "b", 2), ("b", "c", 1)],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.dist for r in
           shortest_paths(df, seeds, weight_col="w").collect()}
    assert got == {"a": 0, "b": 2, "c": 3}


def test_sssp_nonconvergence_raises(spark):
    # 5-chain with max_rounds=2 cannot converge
    df = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(5)], "src string, dst string"
    )
    seeds = spark.createDataFrame([("n0",)], "node string")
    with pytest.raises(RuntimeError, match="did not converge"):
        shortest_paths(df, seeds, max_rounds=2)
