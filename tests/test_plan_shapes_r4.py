"""Physical-plan regression guards for the round-4 final-session operators:
the scale-critical shapes asserted here are the ones a refactor silently
loses first (a TakeOrdered that becomes a global sort, a carry-forward
window that grows a second exchange)."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_priority_sample_is_takeordered_no_exchange(spark):
    from ontoweaver_spark.sampling import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("w")
    )
    plan = _plan(weighted_sample(df, "w", k=10))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # per-partition heaps only


def test_poisson_sample_is_pure_filter(spark):
    from ontoweaver_spark.sampling import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("w")
    )
    plan = _plan(weighted_sample(df, "w", k=10, method="poisson"))
    assert "Exchange hashpartitioning" not in plan  # data never shuffles
    assert "BroadcastExchange" in plan  # only the 1-row total


def test_asof_join_single_key_exchange(spark):
    from ontoweaver_spark.sessions import asof_join

    l = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7)], "event_id long, ts string, user_id long"
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id")
    r = l.select(F.col("event_id").alias("rid"), "ts", "user_id")
    plan = _plan(asof_join(l, r, right_cols=["rid"]))
    assert plan.count("Exchange hashpartitioning") == 1  # the user-key sweep
    assert "Join" not in plan  # union + window, not a join


def test_pmi_and_bpe_topk_are_takeordered(spark):
    from ontoweaver_spark.textops import bpe_merges, pmi_collocations

    df = spark.createDataFrame([("a b a b c",)] * 4, "text string")
    assert "TakeOrderedAndProject" in _plan(pmi_collocations(df, min_count=1, k=3))
    assert "TakeOrderedAndProject" in _plan(bpe_merges(df, k_merges=1))
