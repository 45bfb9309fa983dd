"""class_property_profile + characteristic_sets (schema discovery)."""

import pytest

from ontoweaver_spark.ontology import characteristic_sets, class_property_profile


def test_class_property_profile(spark):
    nodes = spark.createDataFrame(
        [("d1", "document"), ("d2", "document"), ("d3", "document"),
         ("d4", "document"), ("en", "language")],
        "id string, label string",
    )
    edges = spark.createDataFrame(
        [("d1", "en", "in_language"),
         ("d2", "en", "in_language"),
         ("d2", "de", "in_language"),   # second edge, same node
         ("d3", "s1", "from_source")],
        "src string, dst string, label string",
    )
    props = spark.createDataFrame(
        [("d1", "n_chars", "10"), ("d2", "n_chars", "10"),
         ("d3", "n_chars", "30"), ("d4", "n_chars", "40"),
         ("en", "n_chars", "2")],
        "id string, key string, value string",
    )
    out = class_property_profile(nodes, edges=edges, props=props)
    got = {
        (r.label, r.kind, r.path):
            (r.n_nodes, r.n_present, r.n_total, r.n_distinct, r.fill_ppm)
        for r in out.collect()
    }
    assert got[("document", "edge", "in_language")] == (4, 2, 3, 2, 500_000)
    assert got[("document", "edge", "from_source")] == (4, 1, 1, 1, 250_000)
    assert got[("document", "prop", "n_chars")] == (4, 4, 4, 3, 1_000_000)
    assert got[("language", "prop", "n_chars")] == (1, 1, 1, 1, 1_000_000)
    assert len(got) == 4


def test_profile_requires_some_input(spark):
    nodes = spark.createDataFrame([("a", "x")], "id string, label string")
    with pytest.raises(ValueError):
        class_property_profile(nodes)


def test_characteristic_sets(spark):
    triples = spark.createDataFrame(
        [("b1", "name", "x"), ("b1", "isbn", "y"), ("b1", "isbn", "z"),
         ("b2", "isbn", "q"), ("b2", "name", "w"),
         ("p1", "name", "n"),
         ("p2", "name", "m")],
        "subject string, predicate string, object string",
    )
    out = characteristic_sets(triples)
    got = {r.cs: (r.n_subjects, r.n_preds) for r in out.collect()}
    assert got == {"isbn|name": (2, 2), "name": (2, 1)}
