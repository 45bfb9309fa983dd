"""Physical-plan guards for this session's governance/eval operators:
the shapes that keep them 100-TB-viable — shape tables and gold sets
broadcast, fold stays a pure projection, the IFP pair expansion never
becomes a raw self-join of the edge table."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_shacl_shape_tables_broadcast(spark):
    from ontoweaver_spark.validate import shacl_validate

    nodes = spark.createDataFrame([("d1", "document"), ("en", "language")],
                                  "id string, label string")
    edges = spark.createDataFrame([("d1", "en", "in_language")],
                                  "src string, dst string, label string")
    shapes = [{"shape": "S", "target_class": "document",
               "path": "in_language", "min_count": 1, "max_count": 1,
               "object_class": "language"}]
    plan = _plan(shacl_validate(nodes, edges, shapes))
    # every join against the config-sized shape table must broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_fold_diacritics_is_a_projection(spark):
    from ontoweaver_spark.linking import fold_diacritics

    df = spark.range(10).select(F.concat(F.lit("Renée"),
                                         F.col("id").cast("string")).alias("n"))
    plan = _plan(df.select(fold_diacritics("n").alias("f")))
    assert "Exchange" not in plan
    assert "translate" in plan.lower()


def test_ifp_expansion_has_no_edge_self_join(spark):
    from ontoweaver_spark.ontology import ifp_sameas_candidates

    e = spark.createDataFrame(
        [("a", "x", "p"), ("b", "x", "p")],
        "src string, dst string, label string",
    )
    plan = _plan(ifp_sameas_candidates(e, ["p"]))
    # one groupBy + in-plan generate; pairing must NOT be a join
    assert "Generate explode" in plan or "Generate" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_blocking_gold_join_broadcasts(spark):
    from ontoweaver_spark.linking import blocking_metrics

    cand = spark.range(100).select(
        F.concat(F.lit("a"), F.col("id").cast("string")).alias("a"),
        F.concat(F.lit("b"), F.col("id").cast("string")).alias("b"))
    gold = spark.createDataFrame([("a1", "b1")], "a string, b string")
    plan = _plan(blocking_metrics(cand, gold, n_records=200))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan  # 1-row aggregates broadcast-crossed


def test_assign_edge_partitions_hub_join_broadcasts(spark):
    from ontoweaver_spark.graphstats import assign_edge_partitions

    e = spark.createDataFrame([("h", "a"), ("h", "b"), ("s", "a")],
                              "src string, dst string")
    plan = _plan(assign_edge_partitions(e, num_partitions=4, hub_threshold=1))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_characteristic_sets_single_exchange_chain(spark):
    from ontoweaver_spark.ontology import characteristic_sets

    t = spark.createDataFrame([("s", "p", "o")],
                              "subject string, predicate string, object string")
    plan = _plan(characteristic_sets(t))
    # distinct + per-subject collect + cs rollup: exchanges stay bounded
    # (no joins at all — the set rides as a string key)
    assert "Join" not in plan
