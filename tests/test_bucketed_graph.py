"""Bucketed graph materialization: edge->node joins must be shuffle-free."""

from pyspark.sql import functions as F

from ontoweaver_spark import weave
from ontoweaver_spark.pipeline import write_bucketed_graph

MAPPING = {
    "row": {"map": {"id_from_column": "doc_id", "to_subject": "document"}},
    "transformers": [
        {"map": {"column": "lang", "to_object": "language", "via_relation": "in_lang"}},
    ],
}


def test_bucketed_join_has_no_shuffle(spark):
    # tables land in ./spark-warehouse (gitignored); dropped in finally
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fnodes, fedges = weave(docs, MAPPING, affix="suffix")
    write_bucketed_graph(fnodes, fedges, database="kgtest", n_buckets=4)

    nodes = spark.table("kgtest.nodes")
    edges = spark.table("kgtest.edges")
    # co-located join: edges.src == nodes.id, both bucketed/sorted on the key
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = edges.join(nodes, edges["src"] == nodes["id"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        assert joined.count() == edges.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS kgtest.edges")
        spark.sql("DROP TABLE IF EXISTS kgtest.nodes")
        spark.sql("DROP DATABASE IF EXISTS kgtest")


def test_catalog_table_ref_and_v2_sink(spark, tmp_path):
    """'table:<name>' refs read through spark.read.table (the Iceberg-ready
    code path), and write_graph_catalog_tables round-trips the graph via
    the DSv2 writeTo API on the session catalog."""
    from ontoweaver_spark.loaders import read_table
    from ontoweaver_spark.pipeline import write_graph_catalog_tables

    nodes = spark.createDataFrame(
        [("a", "t", {}), ("b", "u", {})],
        "id string, label string, properties map<string,array<string>>",
    )
    edges = spark.createDataFrame(
        [("e", "a", "b", "r", {})],
        "id string, src string, dst string, label string, properties map<string,array<string>>",
    )
    try:
        write_graph_catalog_tables(nodes, edges, "kgv2_graph")
        got = read_table(spark, "table:kgv2_graph_nodes")
        assert got.count() == 2
        assert {r["label"] for r in got.select("label").collect()} == {"t", "u"}
        assert read_table(spark, "table:kgv2_graph_edges").first()["src"] == "a"
        # overwrite path: second call replaces, never errors on existing
        write_graph_catalog_tables(nodes, edges, "kgv2_graph")
        assert read_table(spark, "table:kgv2_graph_nodes").count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS kgv2_graph_nodes")
        spark.sql("DROP TABLE IF EXISTS kgv2_graph_edges")


def test_merge_into_graph_uses_bucketing_and_is_idempotent(spark):
    """Incremental upsert against the bucketed history: the old side's
    bucket partitioning replaces at least one Exchange vs an unbucketed
    old side; and re-merging a re-crawled subset of already-ingested pages
    is a no-op (set-union idempotency on real extraction output)."""
    from ontoweaver_spark import extract
    from ontoweaver_spark.fusion import merge_into_graph

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fnodes, fedges = weave(docs, MAPPING, affix="suffix")
    write_bucketed_graph(fnodes, fedges, database="kgmerge", n_buckets=4)

    recrawl = docs.where(F.col("doc_id") < 100)
    new_n, new_e = extract(recrawl, MAPPING, affix="suffix")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        old_n, old_e = spark.table("kgmerge.nodes"), spark.table("kgmerge.edges")
        m_bucketed, me_bucketed = merge_into_graph(
            old_n, old_e, new_n, new_e, raise_errors=False
        )
        m_plain, _ = merge_into_graph(
            fnodes, fedges, new_n, new_e, raise_errors=False
        )

        def n_exchanges(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange")

        assert n_exchanges(m_bucketed) < n_exchanges(m_plain)

        # idempotency: the subset was already in the graph -> no change
        assert m_bucketed.count() == fnodes.count()
        assert me_bucketed.count() == fedges.count()
        assert m_bucketed.select("id", "label").exceptAll(
            fnodes.select("id", "label")
        ).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS kgmerge.edges")
        spark.sql("DROP TABLE IF EXISTS kgmerge.nodes")
        spark.sql("DROP DATABASE IF EXISTS kgmerge")


def test_iceberg_rtas_gated(spark, tmp_path):
    """Iceberg-runtime verification of the DSv2 writeTo path
    (pipeline.write_graph_catalog_tables fmt="iceberg"). The sandbox ships
    no iceberg-spark-runtime jar and has no network to fetch one (verified:
    DNS resolution fails), so this SKIPS there — on any cluster with the
    jar it runs: lazily configures a hadoop-type Iceberg catalog, RTAS-es
    the graph tables, and reads them back through read_table("iceberg:...")."""
    import pytest

    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        pytest.skip(
            "iceberg-spark-runtime jar not on the classpath and the sandbox "
            "has no network to fetch it — code path verified against the V1 "
            "fallback only (see COVERAGE.md)"
        )

    from ontoweaver_spark.loaders import read_table
    from ontoweaver_spark.pipeline import write_graph_catalog_tables

    spark.conf.set("spark.sql.catalog.ow_ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ow_ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ow_ice.warehouse", str(tmp_path / "wh"))
    fnodes = spark.createDataFrame(
        [("a", "thing", {}), ("b", "other", {})],
        "id string, label string, properties map<string,array<string>>",
    )
    fedges = spark.createDataFrame(
        [("e", "a", "b", "rel", {})],
        "id string, src string, dst string, label string, "
        "properties map<string,array<string>>",
    )
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ow_ice.db")
    write_graph_catalog_tables(fnodes, fedges, "ow_ice.db.graph", fmt="iceberg")
    assert read_table(spark, "iceberg:ow_ice.db.graph_nodes").count() == 2
    assert read_table(spark, "iceberg:ow_ice.db.graph_edges").count() == 1
    # RTAS idempotence: createOrReplace swaps the snapshot atomically
    write_graph_catalog_tables(fnodes, fedges, "ow_ice.db.graph", fmt="iceberg")
    assert read_table(spark, "iceberg:ow_ice.db.graph_nodes").count() == 2
