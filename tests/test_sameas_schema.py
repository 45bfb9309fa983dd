"""Unit tests for fusion.sameas_canonicalize and graphstats.schema_graph.

Both also have driver oracles (`kg_sameas`, `schema_graph` in
__spark_entry__.py); these tests pin the small-graph semantics — chain
closure through transitive sameAs, min-id canonical choice, edge dedup
after rewrite, and the exact label-quotient counts.
"""

from ontoweaver_spark.fusion import sameas_canonicalize
from ontoweaver_spark.graphstats import schema_graph


def test_sameas_chain_canonicalization(spark):
    nodes = spark.createDataFrame(
        [("a", "person"), ("b", "person"), ("c", "alias"), ("d", "city")],
        ["id", "label"],
    )
    edges = spark.createDataFrame(
        [("a", "d", "lives_in"), ("c", "d", "lives_in"), ("b", "a", "knows")],
        ["src", "dst", "label"],
    )
    # chain: a=b, b=c  ->  one class {a,b,c}, canonical "a" (string min)
    sameas = spark.createDataFrame([("a", "b"), ("b", "c")], ["a", "b"])

    nodes2, edges2, mapping = sameas_canonicalize(nodes, edges, sameas)

    m = {r["old_id"]: r["new_id"] for r in mapping.collect()}
    assert m == {"b": "a", "c": "a"}

    n = {(r["id"], r["label"]) for r in nodes2.collect()}
    # b,c collapse into a; label is the min over the class's labels
    assert n == {("a", "alias"), ("d", "city")}

    e = {(r["src"], r["dst"], r["label"]) for r in edges2.collect()}
    # a->d and c->d collapse to one edge; b->a becomes a self-loop a->a
    assert e == {("a", "d", "lives_in"), ("a", "a", "knows")}


def test_sameas_no_pairs_is_identity(spark):
    nodes = spark.createDataFrame([("a", "x"), ("b", "y")], ["id", "label"])
    edges = spark.createDataFrame([("a", "b", "r")], ["src", "dst", "label"])
    sameas = spark.createDataFrame([], "a string, b string")
    nodes2, edges2, mapping = sameas_canonicalize(nodes, edges, sameas)
    assert mapping.count() == 0
    assert nodes2.count() == 2
    assert edges2.collect()[0]["src"] == "a"


def test_schema_graph_quotient_counts(spark):
    nodes = spark.createDataFrame(
        [("p1", "person"), ("p2", "person"), ("c1", "city"), ("c2", "city")],
        ["id", "label"],
    )
    edges = spark.createDataFrame(
        [
            ("p1", "c1", "lives_in"),
            ("p2", "c1", "lives_in"),
            ("p1", "c2", "lives_in"),
            ("p1", "p2", "knows"),
        ],
        ["src", "dst", "label"],
    )
    rows = {
        (r["src_label"], r["edge_label"], r["dst_label"]): (
            r["n_edges"],
            r["n_srcs"],
            r["n_dsts"],
        )
        for r in schema_graph(nodes, edges).collect()
    }
    assert rows == {
        ("person", "lives_in", "city"): (3, 2, 2),
        ("person", "knows", "person"): (1, 1, 1),
    }


def test_schema_graph_drops_dangling(spark):
    # an edge whose endpoint has no node row cannot be labeled -> excluded
    nodes = spark.createDataFrame([("a", "x")], ["id", "label"])
    edges = spark.createDataFrame(
        [("a", "ghost", "r"), ("a", "a", "r")], ["src", "dst", "label"]
    )
    out = schema_graph(nodes, edges).collect()
    assert len(out) == 1 and out[0]["n_edges"] == 1


def test_metapath_counts_hand_graph(spark):
    from ontoweaver_spark.graphstats import metapath_counts

    nodes = spark.createDataFrame(
        [("p1", "person"), ("p2", "person"), ("c1", "city"), ("s1", "state")],
        ["id", "label"],
    )
    edges = spark.createDataFrame(
        [
            ("p1", "c1", "lives_in"),
            ("p2", "c1", "lives_in"),
            ("c1", "s1", "in_state"),
            ("p1", "p2", "knows"),
        ],
        ["src", "dst", "label"],
    )
    rows = {
        (r["src_label"], r["edge1"], r["mid_label"], r["edge2"], r["dst_label"]):
        (r["n_paths"], r["n_src"], r["n_dst"])
        for r in metapath_counts(nodes, edges).collect()
    }
    assert rows == {
        ("person", "lives_in", "city", "in_state", "state"): (2, 2, 1),
        ("person", "knows", "person", "lives_in", "city"): (1, 1, 1),
    }
