"""rdf_export: N-Triples sink round-trips through this repo's own
distributed .nt reader (write -> read -> identical triple frame)."""

import pytest

from ontoweaver_spark.loaders import read_rdf_triples
from ontoweaver_spark.rdf_export import (
    RDF_TYPE,
    graph_to_triples,
    serialize_ntriples,
    write_ntriples,
)

COLS = ["subject", "predicate", "object",
        "object_kind", "object_lang", "object_datatype"]


def _rows(df):
    return sorted(tuple(r) for r in df.select(*COLS).collect())


def test_graph_roundtrip(spark, tmp_path):
    # tricky ids: space, unicode, slash; props: multi-valued, quote, newline
    nodes = spark.createDataFrame(
        [
            ("p one", "person", {"name": ['say "hi"', "line1\nline2"]}),
            ("café/2", "place", {"tab": ["a\tb"], "back": ["a\\n raw"]}),
        ],
        "id string, label string, properties map<string,array<string>>",
    )
    edges = spark.createDataFrame(
        [("p one", "café/2", "visited")], "src string, dst string, label string"
    )
    triples = graph_to_triples(nodes, edges, base="urn:t:")
    out = str(tmp_path / "kg.nt")
    write_ntriples(triples, out)
    back = read_rdf_triples(spark, out)
    assert _rows(back) == _rows(triples)
    # spot-shape: typing triple present, edge endpoints percent-encoded
    got = {(r.subject, r.predicate, r.object) for r in back.collect()}
    assert ("urn:t:node/p%20one", RDF_TYPE, "urn:t:class/person") in got
    assert ("urn:t:node/p%20one", "urn:t:rel/visited", "urn:t:node/caf%C3%A9%2F2") in got


def test_literal_lang_datatype_blank_roundtrip(spark, tmp_path):
    triples = spark.createDataFrame(
        [
            ("urn:s1", "urn:p", "bonjour", "literal", "fr", None),
            ("urn:s1", "urn:p", "42", "literal", None,
             "http://www.w3.org/2001/XMLSchema#integer"),
            ("_:b0", "urn:p", "urn:o", "uri", None, None),
            ("urn:s2", "urn:p", "_:b0", "blank", None, None),
        ],
        "subject string, predicate string, object string, "
        "object_kind string, object_lang string, object_datatype string",
    )
    out = str(tmp_path / "lit.nt")
    write_ntriples(triples, out)
    assert _rows(read_rdf_triples(spark, out)) == _rows(triples)


def test_serialized_lines_are_valid_nt(spark):
    nodes = spark.createDataFrame(
        [("a", "thing", {"k": ["v"]})],
        "id string, label string, properties map<string,array<string>>",
    )
    edges = spark.createDataFrame([], "src string, dst string, label string")
    lines = [r.line for r in serialize_ntriples(
        graph_to_triples(nodes, edges)).collect()]
    assert all(l.endswith(" .") for l in lines)
    assert '<urn:ow:node/a> <urn:ow:prop/k> "v" .' in lines


def test_edge_properties_rejected(spark):
    nodes = spark.createDataFrame(
        [("a", "thing", {})],
        "id string, label string, properties map<string,array<string>>",
    )
    edges = spark.createDataFrame(
        [("a", "a", "self", {})],
        "src string, dst string, label string, properties map<string,string>",
    )
    with pytest.raises(ValueError, match="reification"):
        graph_to_triples(nodes, edges)


def test_zero_shuffle_plan(spark):
    """The serialize path must be a pure projection: no Exchange."""
    nodes = spark.createDataFrame(
        [("a", "thing", {"k": ["v"]})],
        "id string, label string, properties map<string,array<string>>",
    )
    edges = spark.createDataFrame([("a", "a", "e")], "src string, dst string, label string")
    plan = serialize_ntriples(
        graph_to_triples(nodes, edges)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
