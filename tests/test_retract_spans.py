"""Tombstone retraction cascade + byte-exact span dataset builder."""

from pyspark.sql import functions as F

from ontoweaver_spark.fusion import retract_from_graph
from ontoweaver_spark.textops import span_dataset


def _graph(spark):
    nodes = spark.createDataFrame(
        [("d1", "doc"), ("d2", "doc"), ("L", "lang"), ("S", "src"),
         ("iso", "doc")],  # iso: isolated from the start (property-only)
        "id string, label string",
    )
    edges = spark.createDataFrame(
        [("d1", "L", "in_lang"), ("d1", "S", "from_src"),
         ("d2", "S", "from_src")],
        "src string, dst string, label string",
    )
    return nodes, edges


def test_retract_cascades_and_orphans(spark):
    nodes, edges = _graph(spark)
    tomb = spark.createDataFrame([("d1",)], "id string")
    n2, e2 = retract_from_graph(nodes, edges, tomb)
    ids = {r["id"] for r in n2.collect()}
    # d1 tombstoned; L orphaned (its only edge died with d1); S keeps d2;
    # iso never had an edge, so the orphan rule must NOT delete it
    assert ids == {"d2", "S", "iso"}
    kept = {(r["src"], r["dst"]) for r in e2.collect()}
    assert kept == {("d2", "S")}


def test_retract_object_tombstone_drops_incident_edges(spark):
    nodes, edges = _graph(spark)
    tomb = spark.createDataFrame([("S",)], "id string")
    n2, e2 = retract_from_graph(nodes, edges, tomb)
    # S gone; d2's only edge died -> d2 orphaned; d1 keeps in_lang
    assert {r["id"] for r in n2.collect()} == {"d1", "L", "iso"}
    assert {(r["src"], r["dst"]) for r in e2.collect()} == {("d1", "L")}


def test_retract_keep_orphans_flag(spark):
    nodes, edges = _graph(spark)
    tomb = spark.createDataFrame([("d1",)], "id string")
    n2, _ = retract_from_graph(nodes, edges, tomb, drop_orphans=False)
    assert {r["id"] for r in n2.collect()} == {"d2", "L", "S", "iso"}


def test_retract_idempotent(spark):
    nodes, edges = _graph(spark)
    tomb = spark.createDataFrame([("d1",)], "id string")
    n2, e2 = retract_from_graph(nodes, edges, tomb)
    n3, e3 = retract_from_graph(n2, e2, tomb)
    assert sorted(r["id"] for r in n3.collect()) == sorted(
        r["id"] for r in n2.collect()
    )
    assert e3.count() == e2.count()


def test_span_offsets_verified(spark):
    docs = spark.createDataFrame(
        [(1, "intro text answer: alpha tail"),
         (2, "answer: beta"),
         (3, "no match here"),
         (4, "alpha answer: alpha twice")],  # group text occurs earlier too
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           span_dataset(docs, r"answer: ([a-z]+)").collect()}
    assert set(out) == {1, 2, 4}
    r1 = out[1]
    assert (r1["answer"], r1["char_start"], r1["char_end"]) == ("alpha", 19, 24)
    assert r1["verified"] is True
    assert out[2]["char_start"] == 8 and out[2]["verified"] is True
    # doc 4: the full match 'answer: alpha' first occurs at 6, the group
    # offset is inside the match -> still exact despite the earlier 'alpha'
    r4 = out[4]
    assert (r4["char_start"], r4["answer"], r4["verified"]) == (14, "alpha", True)
