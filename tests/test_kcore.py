"""k_core (graphstats): hand cases, cascade semantics, brute-force parity."""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ontoweaver_spark.graphstats import k_core


def _core(spark, edges, k, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["deg"] for r in k_core(df, k, **kw).collect()}


K5 = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
CHAIN = [("c0", "p1"), ("p1", "p2"), ("p2", "p3")]


def test_k_core_clique_with_pendant_chain(spark):
    # k=2: the chain peels away node by node (cascade!), clique survives
    got = _core(spark, K5 + CHAIN, 2)
    assert got == {f"c{i}": 4 for i in range(5)}
    # k=4: same core; k=5: empty
    assert _core(spark, K5 + CHAIN, 4) == {f"c{i}": 4 for i in range(5)}
    assert _core(spark, K5 + CHAIN, 5) == {}


def test_k_core_exact_rounds_mid_cascade(spark):
    path = [(f"p{i}", f"p{i+1}") for i in range(5)]  # p0..p5
    # one round peels only the endpoints; mid-cascade state is observable
    assert _core(spark, path, 2, exact_rounds=1) == {
        "p1": 1, "p2": 2, "p3": 2, "p4": 1,
    }
    assert _core(spark, path, 2, exact_rounds=2) == {"p2": 1, "p3": 1}
    assert _core(spark, path, 2) == {}  # fixpoint: fully peeled


def test_k_core_nonconvergence_raises(spark):
    path = [(f"p{i}", f"p{i+1}") for i in range(12)]
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(spark.createDataFrame(path, ["src", "dst"]), 2, max_rounds=2).collect()


def _py_k_core(edges, k):
    adj = {}
    for a, b in {frozenset(e) for e in edges if e[0] != e[1]}:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        bad = [n for n, nb in adj.items() if len(nb) < k]
        changed = bool(bad)
        for n in bad:
            for m in adj.pop(n, set()):
                if m in adj:
                    adj[m].discard(n)
    return {n: len(nb) for n, nb in adj.items() if nb}


@given(st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).map(
        lambda e: (f"n{e[0]}", f"n{e[1]}")),
    min_size=1, max_size=30,
), st.integers(1, 4))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_k_core_matches_brute_force(spark, edges, k):
    assert _core(spark, edges, k) == _py_k_core(edges, k)
