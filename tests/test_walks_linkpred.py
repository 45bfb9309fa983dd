"""Tests for graphstats.random_walks and graphstats.link_prediction_scores.

Both operators are deterministic pure functions of (graph, params), so every
test cross-checks against an independent pure-Python reimplementation —
the same independent-derivation strategy the DuckDB oracles use.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from ontoweaver_spark.graphstats import link_prediction_scores, random_walks


def py_md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_walks(edges, walk_length, walks_per_node, seed, directed=False):
    """Reference hash-min walk: dict walk_id -> [node, node, ...]."""
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    out = {}
    for node in sorted(adj):
        for w in range(walks_per_node):
            wid = f"{node}#{w}"
            path = [node]
            cur = node
            for step in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(
                    nbrs,
                    key=lambda d: (
                        str(py_md5_int(f"{wid}:{seed}:{step}:{d}")).zfill(20) + d
                    ),
                )
                path.append(cur)
            out[wid] = path
    return out


EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
    ("a", "c"), ("e", "a"), ("e", "f"), ("f", "b"),
    ("g", "h"),  # separate component
]


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_random_walks_match_python_reference(spark):
    got = {
        (r.walk_id, r.step): r.node
        for r in random_walks(
            _edges_df(spark, EDGES), walk_length=4, walks_per_node=2, seed=7
        ).collect()
    }
    want = {}
    for wid, path in py_walks(EDGES, 4, 2, 7).items():
        for step, node in enumerate(path):
            want[(wid, step)] = node
    assert got == want


def test_random_walks_deterministic_under_partitioning(spark):
    df = _edges_df(spark, EDGES)
    a = sorted(map(tuple, random_walks(df, 3, 1, seed=1).collect()))
    b = sorted(map(tuple, random_walks(df.repartition(7), 3, 1, seed=1).collect()))
    assert a == b


def test_random_walks_steps_are_edges(spark):
    """Every consecutive (step i, step i+1) pair must be a graph edge."""
    und = set()
    for s, d in EDGES:
        und.add((s, d))
        und.add((d, s))
    walks = random_walks(_edges_df(spark, EDGES), 3, 1, seed=0).collect()
    by_walk: dict[str, dict[int, str]] = {}
    for r in walks:
        by_walk.setdefault(r.walk_id, {})[r.step] = r.node
    for wid, steps in by_walk.items():
        assert steps[0] == wid.split("#")[0]
        for i in range(1, max(steps) + 1):
            assert (steps[i - 1], steps[i]) in und


def test_random_walks_directed_sink_ends_early(spark):
    # directed chain x->y->z: walk from y is y,z then stops (z is a sink)
    df = _edges_df(spark, [("x", "y"), ("y", "z")])
    rows = random_walks(df, walk_length=5, seed=0, directed=True).collect()
    got = {(r.walk_id, r.step): r.node for r in rows}
    assert got[("y#0", 0)] == "y"
    assert got[("y#0", 1)] == "z"
    assert ("y#0", 2) not in got
    # z has no out-edge: no walk starts there
    assert not any(w.startswith("z#") for w, _ in got)
    # x walks the full chain then stops at the sink
    assert got[("x#0", 1)] == "y" and got[("x#0", 2)] == "z"
    assert ("x#0", 3) not in got


def test_random_walks_seed_changes_walks(spark):
    # dense enough graph that at least one hash-min choice must differ
    edges = [(f"n{i}", f"n{j}") for i in range(8) for j in range(i + 1, 8)]
    df = _edges_df(spark, edges)
    a = sorted(map(tuple, random_walks(df, 4, 1, seed=0).collect()))
    b = sorted(map(tuple, random_walks(df, 4, 1, seed=1).collect()))
    assert a != b


def py_linkpred(edges, max_degree, min_common, scale):
    und = set()
    for u, v in edges:
        if u == v:
            continue
        und.add((min(u, v), max(u, v)))
    adj: dict[str, set[str]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {z: len(ns) for z, ns in adj.items()}
    scores: dict[tuple, list] = {}
    for z, ns in adj.items():
        if deg[z] > max_degree:
            continue
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                key = (ns[i], ns[j])
                cur = scores.setdefault(key, [0, 0])
                cur[0] += 1
                cur[1] += scale // deg[z]
    return {
        k: tuple(v)
        for k, v in scores.items()
        if k not in und and v[0] >= min_common
    }


def test_link_prediction_matches_python_reference(spark):
    # deterministic pseudo-random graph: 40 nodes, md5-derived edges
    edges = []
    for i in range(160):
        h = py_md5_int(f"e{i}")
        u, v = f"v{h % 40}", f"v{(h // 40) % 40}"
        if u != v:
            edges.append((u, v))
    got = {
        (r.a, r.b): (r.common, r.ra_score)
        for r in link_prediction_scores(
            _edges_df(spark, edges), max_degree=6, min_common=2
        ).collect()
    }
    assert got == py_linkpred(edges, 6, 2, 1_000_000)
    assert got  # non-degenerate


def test_link_prediction_excludes_existing_edges_and_caps_hubs(spark):
    # star: hub h connected to 10 spokes, spokes s0-s1 also connected
    edges = [("h", f"s{i}") for i in range(10)] + [("s0", "s1")]
    df = _edges_df(spark, edges)
    # cap below hub degree: hub can't serve as shared neighbor -> no pairs
    # via h; only wedge left is via s0/s1 (deg 2 each): (h,s1)/(h,s0) are
    # real edges, excluded; s0-s1's shared neighbor is h only (capped).
    rows = link_prediction_scores(df, max_degree=5, min_common=1).collect()
    assert rows == []
    # without the cap every spoke pair is suggested via the hub
    rows = link_prediction_scores(df, max_degree=100, min_common=1).collect()
    got = {(r.a, r.b) for r in rows}
    assert ("s0", "s1") not in got  # existing edge
    assert ("s2", "s3") in got and len(got) == 10 * 9 // 2 - 1
    ra = {(r.a, r.b): r.ra_score for r in rows}
    # RA score via hub (deg 10): 1_000_000 // 10; s2-s3 share only h
    assert ra[("s2", "s3")] == 100_000
