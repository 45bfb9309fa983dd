"""Unit goldens for the link-prediction eval rollup (``rank_metrics``)
and the two-signal context disambiguator (``disambiguate_by_context``).

Reference analog: OntoWeaver has no eval/linking stage; these are
LLM-pipeline extras per the round brief. Semantics are the standard
filtered-ranking protocol numbers (MRR, Hits@k, Bordes et al. 2013) and
the commonness-prior + context-overlap linker (Milne & Witten 2008),
both exact-integer so results hash-match any engine."""

import pyspark.sql.functions as F

from ontoweaver_spark.linking import disambiguate_by_context, entity_prior
from ontoweaver_spark.similarity import rank_metrics


def test_rank_metrics_exact_integers(spark):
    # ranks 1,2,4,10,20 -> n=5; rr ppm terms 1000000,500000,250000,100000,50000
    ranked = spark.createDataFrame(
        [("t1", 1), ("t2", 2), ("t3", 4), ("t4", 10), ("t5", 20)],
        ["triple_id", "rank"],
    )
    row = rank_metrics(ranked).collect()[0]
    assert row["n"] == 5
    assert row["mrr_ppm"] == (1000000 + 500000 + 250000 + 100000 + 50000) // 5
    assert row["hits1_ppm"] == 1 * 1000000 // 5
    assert row["hits3_ppm"] == 2 * 1000000 // 5
    assert row["hits10_ppm"] == 4 * 1000000 // 5


def test_rank_metrics_custom_ks(spark):
    ranked = spark.createDataFrame([("a", 1), ("b", 3)], ["triple_id", "rank"])
    row = rank_metrics(ranked, ks=(2,)).collect()[0]
    assert set(row.asDict()) == {"n", "mrr_ppm", "hits2_ppm"}
    assert row["hits2_ppm"] == 500000


def _linker_fixtures(spark):
    # mention "jaguar": e_cat is 3x more common; e_car wins only when the
    # context contains car-profile tokens.
    anchors = spark.createDataFrame(
        [("jaguar", "e_cat")] * 3 + [("jaguar", "e_car")] * 1 + [("python", "e_lang")],
        ["mention", "entity_id"],
    )
    profiles = spark.createDataFrame(
        [
            ("e_cat", "feline", 5),
            ("e_cat", "jungle", 3),
            ("e_car", "engine", 6),
            ("e_car", "sedan", 2),
            ("e_lang", "code", 4),
        ],
        ["entity_id", "token", "weight"],
    )
    return entity_prior(anchors), profiles


def test_context_overrides_prior(spark):
    prior, profiles = _linker_fixtures(spark)
    occ = spark.createDataFrame(
        [
            ("o1", "jaguar", ["the", "engine", "sedan", "purrs"]),  # car ctx
            ("o2", "jaguar", ["jungle", "feline"]),  # cat ctx
            ("o3", "jaguar", ["nothing", "matches"]),  # -> prior argmax
            ("o4", "missing", ["engine"]),  # mention unknown -> null
        ],
        ["occ_id", "mention", "tokens"],
    )
    got = {r["occ_id"]: r for r in disambiguate_by_context(occ, prior, profiles).collect()}
    assert got["o1"]["entity_id"] == "e_car" and got["o1"]["ctx_score"] == 8
    assert got["o2"]["entity_id"] == "e_cat" and got["o2"]["ctx_score"] == 8
    assert got["o3"]["entity_id"] == "e_cat" and got["o3"]["ctx_score"] == 0
    assert got["o3"]["prior_ppm"] == 750000
    assert got["o4"]["entity_id"] is None


def test_tie_breaks_deterministic(spark):
    # equal ctx_score and equal prior -> smallest entity_id wins
    anchors = spark.createDataFrame(
        [("m", "e_a"), ("m", "e_b")], ["mention", "entity_id"]
    )
    profiles = spark.createDataFrame(
        [("e_a", "t", 2), ("e_b", "t", 2)], ["entity_id", "token", "weight"]
    )
    occ = spark.createDataFrame([("o", "m", ["t"])], ["occ_id", "mention", "tokens"])
    row = disambiguate_by_context(occ, entity_prior(anchors), profiles).collect()[0]
    assert row["entity_id"] == "e_a" and row["ctx_score"] == 2
