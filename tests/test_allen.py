"""Allen interval-algebra pair classification (Allen, CACM'83).

Checks all 7 canonical relations on hand intervals, the lexicographic
pair canonicalization (a = earlier interval, ties broken by end then
id), cross-entity isolation, a random replay vs pure Python, and the
loud raise on empty/inverted intervals.
"""

import random

import pytest

from ontoweaver_spark.sessions import allen_relations


def _py_allen(rows):
    out = set()
    by_ent = {}
    for ent, s, e, rid in rows:
        by_ent.setdefault(ent, []).append((s, e, rid))
    for ent, iv in by_ent.items():
        iv = sorted(iv)
        for i, (s1, e1, a) in enumerate(iv):
            for s2, e2, b in iv[i + 1 :]:
                if s1 == s2 and e1 == e2:
                    rel = "equals"
                elif s1 == s2:
                    rel = "starts"
                elif e1 < s2:
                    rel = "before"
                elif e1 == s2:
                    rel = "meets"
                elif e1 < e2:
                    rel = "overlaps"
                elif e1 == e2:
                    rel = "finished_by"
                else:
                    rel = "contains"
                out.add((ent, a, b, rel))
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "ent string, s long, e long, rid long")
    return {
        (r["entity"], r["a"], r["b"], r["relation"])
        for r in allen_relations(df, "ent", "s", "e", "rid").collect()
    }


def test_all_seven_canonical_relations(spark):
    rows = [
        ("x", 0, 10, 1), ("x", 20, 30, 2),   # before
        ("x", 30, 40, 3),                    # meets (2,3)
        ("y", 0, 10, 4), ("y", 5, 15, 5),    # overlaps
        ("y", 0, 20, 6),                     # starts (4,6) after canon
        ("z", 0, 10, 7), ("z", 2, 10, 8),    # finished_by
        ("z", 0, 50, 9),                     # contains (9 vs 8? canon...)
        ("w", 3, 9, 10), ("w", 3, 9, 11),    # equals
    ]
    got = _run(spark, rows)
    want = _py_allen(rows)
    assert got == want
    rels = {r for (_, _, _, r) in got}
    assert rels == {
        "before", "meets", "overlaps", "starts", "finished_by",
        "contains", "equals",
    }


def test_entities_isolated(spark):
    rows = [("a", 0, 10, 1), ("b", 0, 10, 2)]
    assert _run(spark, rows) == set()


def test_random_replay(spark):
    rng = random.Random(3)
    rows = []
    rid = 0
    for ent in ("e1", "e2", "e3"):
        for _ in range(12):
            s = rng.randint(0, 40)
            rows.append((ent, s, s + rng.randint(1, 15), rid))
            rid += 1
    assert _run(spark, rows) == _py_allen(rows)


def test_inverted_interval_raises(spark):
    df = spark.createDataFrame(
        [("a", 10, 10, 1), ("a", 0, 5, 2)], "ent string, s long, e long, rid long"
    )
    with pytest.raises(Exception) as ei:
        allen_relations(df, "ent", "s", "e", "rid").collect()
    assert "empty or inverted" in str(ei.value)
