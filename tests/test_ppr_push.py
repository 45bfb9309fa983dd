"""Forward-push personalized PageRank (Andersen-Chung-Lang, FOCS'06),
round-synchronous integer formulation.

Checks the exact recurrence against a pure-Python replay, locality
(untouched components carry NO state rows), mass conservation up to the
documented truncation leaks, dangling-node absorption, and seed-set
union behavior.
"""

import random
from collections import defaultdict

from ontoweaver_spark.graphstats import ppr_forward_push

SCALE = 1_000_000
ALPHA = 15


def _py_push(edges, seeds, rounds):
    adj = defaultdict(list)
    for a, b in set(edges):
        adj[a].append(b)
    est = defaultdict(int)
    res = {s: SCALE for s in set(seeds)}
    for _ in range(rounds):
        new_res = defaultdict(int)
        for n, r in res.items():
            a = r * ALPHA // 100
            est[n] += a
            out = r - a
            if adj[n] and out > 0:
                share = out // len(adj[n])
                for m in adj[n]:
                    new_res[m] += share
        res = new_res
    nodes = set(est) | set(res)
    return {
        n: (est.get(n, 0), res.get(n, 0))
        for n in nodes
        if est.get(n, 0) > 0 or res.get(n, 0) > 0
    }


def _run(spark, edges, seeds, rounds=4):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {
        r["node"]: (r["est"], r["res"])
        for r in ppr_forward_push(e, s, rounds=rounds).collect()
    }


def test_matches_python_replay(spark):
    rng = random.Random(17)
    edges = list(
        {(f"v{rng.randint(0, 25)}", f"v{rng.randint(0, 25)}") for _ in range(100)}
    )
    got = _run(spark, edges, ["v0", "v5"], rounds=4)
    assert got == _py_push(edges, ["v0", "v5"], 4)


def test_locality_untouched_component_has_no_rows(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z")]
    got = _run(spark, edges, ["a"], rounds=3)
    assert all(not n.startswith(("x", "y", "z")) for n in got)
    assert "c" in got  # 2 hops reached within 3 rounds


def test_mass_conservation_bound(spark):
    # chain with uniform out-degree 1: only the alpha DIV and the final
    # outflow leak mass; total est+res stays within rounds*2 of scale
    edges = [("n0", "n1"), ("n1", "n2"), ("n2", "n3"), ("n3", "n4")]
    got = _run(spark, edges, ["n0"], rounds=3)
    total = sum(e + r for e, r in got.values())
    assert SCALE - 3 * 2 <= total <= SCALE


def test_dangling_absorbs_alpha_then_drops(spark):
    edges = [("s", "sink")]
    got = _run(spark, edges, ["s"], rounds=3)
    assert got == _py_push(edges, ["s"], 3)
    # sink keeps accumulating alpha shares of what it received and drops
    # the remainder (no out-edges)
    assert got["sink"][0] > 0


def test_alpha_validation(spark):
    import pytest

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    s = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError):
        ppr_forward_push(e, s, alpha_pct=0)
