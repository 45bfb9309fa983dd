"""Ontology domain/range edge validation (rdfs:domain/range semantics
with subclass satisfaction via the closure)."""

from pyspark.sql import functions as F


def _setup(spark):
    hier = spark.createDataFrame(
        [("scientist", "person"), ("person", "agent"), ("org", "agent"),
         ("city", "place")],
        "child string, parent string",
    )
    from ontoweaver_spark.ontology import subclass_closure

    closure = subclass_closure(hier)
    nodes = spark.createDataFrame(
        [("n1", "scientist"), ("n2", "person"), ("n3", "org"),
         ("n4", "city"), ("n5", "agent")],
        "id string, label string",
    )
    cons = spark.createDataFrame(
        [("works_at", "person", "org"), ("located_in", "org", "place"),
         ("knows", "person", "person")],
        "edge_label string, domain string, range string",
    )
    return nodes, cons, closure


def _violations(spark, edges_rows):
    from ontoweaver_spark.ontology import validate_edge_types

    nodes, cons, closure = _setup(spark)
    edges = spark.createDataFrame(
        edges_rows, "src string, dst string, label string"
    )
    return {
        (r.src, r.dst, r.label, r.violation)
        for r in validate_edge_types(edges, nodes, cons, closure).collect()
    }


def test_conforming_edges_emit_nothing(spark):
    # scientist is-a person (closure) -> works_at domain satisfied
    got = _violations(
        spark,
        [("n1", "n3", "works_at"), ("n2", "n3", "works_at"),
         ("n3", "n4", "located_in"), ("n1", "n2", "knows")],
    )
    assert got == set()


def test_domain_and_range_violations(spark):
    got = _violations(
        spark,
        [("n3", "n3", "works_at"),   # org works_at: domain violation
         ("n2", "n4", "works_at"),   # person works_at city: range violation
         ("n4", "n4", "located_in")],  # city located_in: domain only —
        #                                city IS-A place, so range passes
    )
    assert ("n3", "n3", "works_at", "domain") in got
    assert ("n2", "n4", "works_at", "range") in got
    assert ("n4", "n4", "located_in", "domain") in got
    assert len(got) == 3


def test_superclass_does_not_satisfy_subclass_constraint(spark):
    # agent is a SUPERclass of person: n5 must fail the person domain
    got = _violations(spark, [("n5", "n2", "knows")])
    assert got == {("n5", "n2", "knows", "domain")}


def test_unknown_label_and_missing_endpoints(spark):
    got = _violations(
        spark,
        [("n1", "n2", "likes"),      # unknown label only — no domain/range
         ("ghost", "n3", "works_at"),
         ("n2", "ghost", "works_at")],
    )
    assert ("n1", "n2", "likes", "unknown_edge_label") in got
    assert not any(v in ("domain", "range") for (_, _, lb, v) in got if lb == "likes")
    assert ("ghost", "n3", "works_at", "missing_src_type") in got
    assert ("n2", "ghost", "works_at", "missing_dst_type") in got
    # missing endpoint skips its own check but the OTHER side still runs
    assert ("ghost", "n3", "works_at", "domain") not in got
    assert len(got) == 3


def test_works_without_closure(spark):
    from ontoweaver_spark.ontology import validate_edge_types

    nodes, cons, _ = _setup(spark)
    edges = spark.createDataFrame(
        [("n2", "n3", "works_at"), ("n1", "n3", "works_at")],
        "src string, dst string, label string",
    )
    got = {
        (r.src, r.violation)
        for r in validate_edge_types(edges, nodes, cons, closure=None).collect()
    }
    # exact-match person passes; scientist now fails (no closure to climb)
    assert got == {("n1", "domain")}
