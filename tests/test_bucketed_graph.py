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
    write_graph_catalog_tables(nodes, edges, "kgv2_graph")
    got = read_table(spark, "table:kgv2_graph_nodes")
    assert got.count() == 2
    assert {r["label"] for r in got.select("label").collect()} == {"t", "u"}
    assert read_table(spark, "table:kgv2_graph_edges").first()["src"] == "a"
