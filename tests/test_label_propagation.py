"""graphstats.label_propagation: hand-computed rounds, python brute
force, and partition invariance."""

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ontoweaver_spark.graphstats import label_propagation

# two triangles joined by the bridge c-d
EDGES = [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")]


def _run(spark, edges, rounds, parts=None):
    df = spark.createDataFrame(edges, ["src", "dst"])
    if parts:
        df = df.repartition(parts)
    return dict(label_propagation(df, rounds=rounds).collect())


def _brute(edges, rounds):
    """The exact synchronous semantics in plain python."""
    adj: dict[str, set[str]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            votes = Counter(lab[m] for m in nbrs)
            top = max(votes.values())
            nxt[n] = min(l for l, c in votes.items() if c == top)
        lab = nxt
    return lab


def test_hand_computed_two_rounds(spark):
    assert _run(spark, EDGES, 1) == {
        "a": "b", "b": "a", "c": "a", "d": "c", "e": "d", "f": "d"
    }
    assert _run(spark, EDGES, 2) == {
        "a": "a", "b": "a", "c": "a", "d": "d", "e": "c", "f": "c"
    }
    assert _run(spark, EDGES, 2) == _brute(EDGES, 2)


def test_self_loops_and_duplicates_ignored(spark):
    noisy = EDGES + [("a", "a"), ("b", "a"), ("a", "b")]
    assert _run(spark, noisy, 2) == _brute(EDGES, 2)


def test_partition_invariance(spark):
    assert _run(spark, EDGES, 3, parts=1) == _run(spark, EDGES, 3, parts=7)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1, max_size=20,
    ),
    st.integers(1, 3),
)
def test_matches_brute_force(spark, raw, rounds):
    edges = [(f"n{u}", f"n{v}") for u, v in raw if u != v]
    if not edges:
        return
    assert _run(spark, edges, rounds) == _brute(edges, rounds)
