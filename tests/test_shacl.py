"""SHACL-lite node-shape validation (validate.shacl_validate)."""

import pytest
from pyspark.sql import functions as F

from ontoweaver_spark.validate import shacl_validate


SHAPES = [
    {
        "shape": "DocShape",
        "target_class": "document",
        "path": "in_language",
        "min_count": 1,
        "max_count": 1,
        "object_class": "language",
    },
    {
        "shape": "DocShape",
        "target_class": "document",
        "key": "n_chars",
        "pattern": "^[0-9]+$",
    },
    {
        "shape": "DocShape",
        "target_class": "document",
        "key": "lang",
        "values": ["en", "de"],
    },
]


@pytest.fixture()
def graph(spark):
    nodes = spark.createDataFrame(
        [
            ("d1", "document"),
            ("d2", "document"),
            ("d3", "document"),
            ("d4", "document"),
            ("d5", "document"),
            ("en", "language"),
            ("de", "language"),
            ("web", "source"),
        ],
        "id string, label string",
    )
    edges = spark.createDataFrame(
        [
            ("d1", "en", "in_language"),      # conforming
            ("d2", "en", "in_language"),      # max_count violation (2 edges)
            ("d2", "de", "in_language"),
            ("d3", "web", "in_language"),     # object_class violation
            ("d4", "ghost", "in_language"),   # object_class 'missing'
            # d5 has NO in_language edge -> min_count violation
            ("en", "web", "in_language"),     # non-target src: ignored
        ],
        "src string, dst string, label string",
    )
    props = spark.createDataFrame(
        [
            ("d1", "n_chars", "120"),
            ("d2", "n_chars", "x9"),          # pattern violation
            ("d1", "lang", "en"),
            ("d3", "lang", "xx"),             # values violation
            ("en", "lang", "zz"),             # non-target node: ignored
        ],
        "id string, key string, value string",
    )
    return nodes, edges, props


def test_all_violation_kinds(spark, graph):
    nodes, edges, props = graph
    out = shacl_validate(nodes, edges, SHAPES, props=props)
    rows = {(r.id, r.path, r.violation, r.observed) for r in out.collect()}
    assert rows == {
        ("d5", "in_language", "min_count", "0"),
        ("d2", "in_language", "max_count", "2"),
        ("d3", "in_language", "object_class", "source"),
        ("d4", "in_language", "object_class", "missing"),
        ("d2", "n_chars", "pattern", "x9"),
        ("d3", "lang", "values", "xx"),
    }
    assert set(out.columns) == {"id", "shape", "path", "violation", "observed"}
    assert out.select("shape").distinct().collect()[0].shape == "DocShape"


def test_conforming_graph_is_empty(spark, graph):
    nodes, _, props = graph
    edges = spark.createDataFrame(
        [("d%d" % i, "en", "in_language") for i in range(1, 6)],
        "src string, dst string, label string",
    )
    clean_props = props.where(~F.col("value").isin("x9", "xx"))
    out = shacl_validate(nodes, edges, SHAPES, props=clean_props)
    assert out.count() == 0


def test_value_constraint_requires_props(spark, graph):
    nodes, edges, _ = graph
    with pytest.raises(ValueError, match="props"):
        shacl_validate(nodes, edges, SHAPES, props=None)


def test_min_count_zero_edges_included(spark, graph):
    """A node with NO path edges at all must still surface (the naive
    group-by-the-edges formulation drops it)."""
    nodes, edges, props = graph
    only_card = [
        {"shape": "S", "target_class": "document", "path": "in_language",
         "min_count": 1}
    ]
    out = shacl_validate(nodes, edges, only_card, props=props)
    assert [(r.id, r.violation) for r in out.collect()] == [("d5", "min_count")]
