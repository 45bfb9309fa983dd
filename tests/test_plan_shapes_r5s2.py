"""Physical-plan regression guards for this session's operators: the
scale-critical shapes a refactor loses first — a harvester growing a
shuffle, a gazetteer/dictionary join losing its broadcast, a layout key
falling out of whole-stage codegen."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _pages(spark):
    return spark.createDataFrame(
        [("http://a", "<html><meta property='og:t' content='x'>"
                      "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>"
                      "</html>")],
        ["url", "html"],
    )


def test_meta_and_microdata_are_zero_shuffle(spark):
    from ontoweaver_spark.webdoc import extract_meta_tags, extract_microdata

    assert "Exchange" not in _plan(extract_meta_tags(_pages(spark)))
    assert "Exchange" not in _plan(extract_microdata(_pages(spark)))


def test_table_header_join_broadcasts(spark):
    from ontoweaver_spark.webdoc import extract_html_tables

    plan = _plan(extract_html_tables(_pages(spark)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_gazetteer_join_broadcasts(spark):
    from ontoweaver_spark.linking import spot_mentions

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    gaz = spark.createDataFrame([("a b", "E")], ["surface", "entity_id"])
    plan = _plan(spot_mentions(docs, gaz, maximal_only=False))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # only the dictionary dedup
    # shuffles (dictionary-sized); the doc side never does
    # the maximal filter computes hits ONCE (checkpoint) + one anti-join
    full = _plan(spot_mentions(docs, gaz))
    assert full.count("Join") >= 1 and "BroadcastHashJoin" not in full


def test_zorder_key_and_readability_are_projections(spark):
    from ontoweaver_spark.layout import zorder_key
    from ontoweaver_spark.textops import readability

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("a"),
        (F.col("id") % 11).alias("b"),
        F.lit("some text here.").alias("text"),
    )
    zplan = _plan(df.select(zorder_key(["a", "b"]).alias("z")))
    # '*(' prefixes codegen stages in the compact plan string
    assert "Exchange" not in zplan and "*(" in zplan
    rplan = _plan(readability(df))
    assert "Exchange" not in rplan


def test_retrieval_metrics_single_pass_aggs(spark):
    from ontoweaver_spark.similarity import rank_metrics

    ranked = spark.createDataFrame([("t", 1)], ["triple_id", "rank"])
    # one-row rollup: exactly one pair of partial/final HashAggregates
    plan = _plan(rank_metrics(ranked))
    assert plan.count("HashAggregate") == 2
