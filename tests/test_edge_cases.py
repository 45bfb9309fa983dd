"""Edge cases: empty inputs, all-null columns, single-row tables — the
shapes a 10^12-document pipeline hits on empty partitions and bad shards."""

import pytest
from pyspark.sql import functions as F

from ontoweaver_spark import extract, reconciliate, weave
from ontoweaver_spark.spec import MappingError, load_mapping

MAPPING = {
    "row": {"map": {"id_from_column": "id", "to_subject": "thing"}},
    "transformers": [
        {"map": {"column": "v", "to_object": "val", "via_relation": "has"}},
    ],
}


def test_empty_input(spark):
    df = spark.createDataFrame([], "id string, v string")
    fnodes, fedges = weave(df, MAPPING)
    assert fnodes.count() == 0 and fedges.count() == 0


def test_all_null_subject_skips_rows(spark):
    df = spark.createDataFrame(
        [(None, "x"), ("", "y"), ("nan", "z"), ("None", "w")], "id string, v string"
    )
    nodes, edges = extract(df, MAPPING)
    assert nodes.count() == 0 and edges.count() == 0


def test_null_object_keeps_subject(spark):
    df = spark.createDataFrame([("a", None), ("b", "x")], "id string, v string")
    nodes, edges = extract(df, MAPPING)
    got = {(r["id"], r["label"]) for r in nodes.collect()}
    assert got == {("a", "thing"), ("b", "thing"), ("x", "val")}
    assert edges.count() == 1


def test_fusion_of_empty_frames(spark):
    nodes = spark.createDataFrame(
        [], "id string, label string, properties map<string,array<string>>"
    )
    edges = spark.createDataFrame(
        [], "id string, src string, dst string, label string, properties map<string,array<string>>"
    )
    fn, fe = reconciliate(nodes, edges)
    assert fn.count() == 0 and fe.count() == 0


def test_single_row(spark):
    df = spark.createDataFrame([("only", "one")], "id string, v string")
    fnodes, fedges = weave(df, MAPPING)
    assert fnodes.count() == 2 and fedges.count() == 1


def test_rowindex_subject_multipartition_contiguous(spark):
    df = spark.range(0, 97, 1, 7).select(F.col("id").cast("string").alias("v"))
    mapping = {
        "row": {"rowIndex": {"to_subject": "r"}},
        "transformers": [
            {"map": {"column": "v", "to_object": "val", "via_relation": "has"}},
        ],
    }
    nodes, _ = extract(df, mapping)
    idx = sorted(
        int(r["id"]) for r in nodes.where(F.col("label") == "r").collect()
    )
    assert idx == list(range(97))  # contiguous 0-based across partitions


def test_unknown_operator_rejected():
    with pytest.raises(MappingError, match="unknown transformer"):
        load_mapping({
            "row": {"map": {"id_from_column": "a", "to_subject": "t"}},
            "transformers": [{"frobnicate": {"column": "b", "to_object": "x",
                                             "via_relation": "r"}}],
        })


def test_missing_column_rejected(spark):
    df = spark.createDataFrame([("a",)], "id string")
    with pytest.raises(ValueError, match="missing columns"):
        extract(df, MAPPING)


def test_natural_sort_key(spark):
    """--sort order must be natural (id2 < id10), like the reference's
    natsort (ontoweave.py:405-412)."""
    from ontoweaver_spark.ids import natural_sort_key

    df = spark.createDataFrame(
        [("id10",), ("id2",), ("a",), ("id2b1",), ("id2b10",)], "id string"
    )
    out = [r["id"] for r in df.orderBy(natural_sort_key(F.col("id"))).collect()]
    assert out == ["a", "id2", "id2b1", "id2b10", "id10"]
