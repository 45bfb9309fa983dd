"""Jones–Plassmann greedy coloring: defining properties checked against
independent plain-Python computations — a proper coloring within the
max_degree+1 bound, per-round independence (simultaneous coloring is
conflict-free), and round-for-round equality with a serial replay of the
same deterministic priority rule."""

import hashlib

import pytest


def _ring_edges(n):
    return [(f"v{i}", f"v{(i + 1) % n}") for i in range(n)]


def _adj(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def test_coloring_is_proper_within_degree_bound(spark):
    from ontoweaver_spark.graphstats import greedy_coloring

    # ring + chords + a hub touching every 4th node (hub degree 10)
    edges = _ring_edges(40) + [("v0", "v20"), ("v5", "v33")] + [
        ("hub", f"v{i}") for i in range(0, 40, 4)
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    rows = greedy_coloring(e, rounds=16).collect()
    col = {r["node"]: r["color"] for r in rows}
    adj = _adj(edges)

    assert set(col) == set(adj)  # every node colored exactly once
    assert len(rows) == len(col)
    for a, b in edges:
        assert col[a] != col[b], f"edge {a}-{b} monochromatic"
    max_deg = max(len(n) for n in adj.values())
    assert max(col.values()) <= max_deg + 1
    assert min(col.values()) == 1

    # per-round independence: each round's newly-colored set is an IS
    by_round = {}
    for r in rows:
        by_round.setdefault(r["col_round"], set()).add(r["node"])
    for rn, nodes in by_round.items():
        for a in nodes:
            assert not (adj[a] & nodes), f"round {rn}: adjacent pair colored"


def test_coloring_matches_serial_replay(spark):
    """Round-for-round equality with a plain-Python replay of the same
    rule: ready = active nodes with no smaller-key active neighbor; color
    = mex over already-colored neighbors."""
    from ontoweaver_spark.graphstats import greedy_coloring

    edges = _ring_edges(23) + [("v3", "v17"), ("v8", "v14")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["node"], r["color"], r["col_round"])
        for r in greedy_coloring(e, rounds=16, seed=7).collect()
    }

    def key(n):
        h = int(hashlib.md5(f"7:{n}".encode()).hexdigest()[:15], 16)
        return f"{h:020d}" + n

    adj = _adj(edges)
    active = set(adj)
    colored = {}
    want = set()
    rnd = 0
    while active:
        rnd += 1
        ready = {
            n for n in active
            if all(key(n) < key(m) for m in adj[n] if m in active and m != n)
        }
        assert ready, "serial replay stalled"
        for n in sorted(ready):
            used = {colored[m] for m in adj[n] if m in colored}
            c = 1
            while c in used:
                c += 1
            colored[n] = c
            want.add((n, c, rnd))
        active -= ready
    assert got == want


def test_coloring_local_equals_distributed(spark):
    """The bounded-component applyInPandas fast path computes the SAME
    pure function of (graph, seed) as the distributed round loop —
    row-for-row equality on a multi-block conflict graph."""
    from ontoweaver_spark.graphstats import greedy_coloring, greedy_coloring_local

    # 4 independent 8-node blocks, two affine chord families per node
    edges = []
    for blk in range(4):
        for j in range(8):
            edges.append((blk, f"b{blk}n{j}", f"b{blk}n{(3 * j + 1) % 8}"))
            edges.append((blk, f"b{blk}n{j}", f"b{blk}n{(5 * j + 2) % 8}"))
    e = spark.createDataFrame(edges, "blk int, src string, dst string")
    dist = {
        (r["node"], r["color"], r["col_round"])
        for r in greedy_coloring(e.select("src", "dst"), rounds=16, seed=3).collect()
    }
    local = {
        (r["node"], r["color"], r["col_round"])
        for r in greedy_coloring_local(e, "blk", seed=3).collect()
    }
    assert dist == local
    assert len(local) == 32


def test_coloring_raises_when_rounds_exhausted(spark):
    from ontoweaver_spark.graphstats import greedy_coloring

    e = spark.createDataFrame(_ring_edges(30), "src string, dst string")
    with pytest.raises(RuntimeError, match="uncolored nodes remain"):
        greedy_coloring(e, rounds=1)
    # and the loud failure is opt-out
    partial = greedy_coloring(e, rounds=1, require_convergence=False).collect()
    assert 0 < len(partial) < 30
