"""Goldens for structural-equivalence twin classes and the exact-integer
IR evaluation rollup (NDCG@k / AP@k / P@k)."""

import math

from ontoweaver_spark.graphstats import structural_twins
from ontoweaver_spark.similarity import retrieval_metrics

SC = 1_000_000


def test_twins_golden(spark):
    # a,b twins (same out {x}, same in {h}); c differs by extra out; d has
    # the same out-set as a but empty in-set -> not a twin
    e = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("h", "a"), ("h", "b"),
         ("c", "x"), ("c", "y"), ("h", "c"), ("d", "x")],
        ["src", "dst"],
    )
    rows = sorted(
        (r["node"], r["class_id"], r["class_size"])
        for r in structural_twins(e).collect()
    )
    assert rows == [("a", "a", 2), ("b", "a", 2)]
    # min_class_size=1 keeps every node exactly once
    assert structural_twins(e, min_class_size=1).count() == 7


def test_twins_direction_sensitive(spark):
    # p->q and q->p: same neighbor SET on opposite sides -> NOT twins
    e = spark.createDataFrame(
        [("p", "m"), ("m", "q"), ("q", "m"), ("m", "p")], ["src", "dst"]
    )
    got = {(r["node"], r["class_size"])
           for r in structural_twins(e).collect()}
    assert got == {("p", 2), ("q", 2)}  # p,q ARE twins (out {m}, in {m})


def test_retrieval_metrics_hand_computed(spark):
    rows = [("q1", r, 1 if r in (1, 3, 12) else 0) for r in range(1, 16)]
    rows += [("q2", r, 0) for r in range(1, 6)]
    df = spark.createDataFrame(rows, ["query_id", "rank", "rel"])
    out = {r["query_id"]: r for r in retrieval_metrics(df, k=10).collect()}
    g = {r: int(SC / math.log2(r + 1)) for r in range(1, 11)}
    dcg, idcg = g[1] + g[3], g[1] + g[2] + g[3]  # min(R=3, k)=3 ideal slots
    assert out["q1"]["n_rel"] == 3
    assert out["q1"]["ndcg_ppm"] == dcg * SC // idcg
    assert out["q1"]["ap_ppm"] == (1 * SC // 1 + 2 * SC // 3) // 3
    assert out["q1"]["p_at_k_ppm"] == 2 * SC // 10
    assert (out["q2"]["ndcg_ppm"], out["q2"]["ap_ppm"],
            out["q2"]["p_at_k_ppm"]) == (0, 0, 0)


def test_retrieval_metrics_perfect_ranking(spark):
    # all k slots relevant, R = k -> NDCG = AP = P@k = 1.0 exactly
    df = spark.createDataFrame(
        [("q", r, 1) for r in range(1, 6)], ["query_id", "rank", "rel"]
    )
    row = retrieval_metrics(df, k=5).collect()[0]
    assert row["ndcg_ppm"] == SC
    assert row["ap_ppm"] == SC
    assert row["p_at_k_ppm"] == SC
