"""Unit tests for the round-3-tail trio: graph profiling, bounded
regular-path queries, and SCD2 point-in-time snapshots."""

import pytest
from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, label string, dst string")


def test_profile_graph_metrics(spark):
    from ontoweaver_spark.graphstats import profile_graph

    nodes = spark.createDataFrame(
        [
            ("n1", "person", {"name": "a", "age": "3"}),
            ("n2", "person", {"name": "b"}),
            ("n3", "city", {"name": "x"}),
        ],
        "id string, label string, properties map<string,string>",
    )
    edges = _edges(
        spark,
        [("n1", "lives_in", "n3"), ("n2", "lives_in", "n3"),
         ("n1", "knows", "n2")],
    )
    got = {
        (r.section, r.name, r.metric): r.value
        for r in profile_graph(nodes, edges).collect()
    }
    assert got[("node_label", "person", "count")] == 2
    assert got[("node_label", "city", "count")] == 1
    assert got[("prop_fill", "person.name", "count")] == 2
    assert got[("prop_fill", "person.age", "count")] == 1
    assert got[("edge_label", "lives_in", "count")] == 2
    assert got[("edge_label", "lives_in", "distinct_src")] == 2
    assert got[("edge_label", "lives_in", "distinct_dst")] == 1
    assert got[("degree", "lives_in", "max_in")] == 2
    assert got[("degree", "lives_in", "max_out")] == 1
    assert got[("degree", "knows", "max_out")] == 1


def test_path_query_sequence(spark):
    from ontoweaver_spark.graphquery import path_query

    edges = _edges(
        spark,
        [("a", "r1", "b"), ("a", "r1", "b2"), ("b", "r2", "c"),
         ("b2", "r2", "c"), ("b", "r9", "z")],
    )
    got = {(r.src, r.dst) for r in path_query(edges, ["r1", "r2"]).collect()}
    # diamond a->{b,b2}->c collapses to ONE distinct pair
    assert got == {("a", "c")}


def test_path_query_kleene_range(spark):
    from ontoweaver_spark.graphquery import path_query

    # chain a-r->b-r->c-r->d plus an alternation label s: b-s->x
    edges = _edges(
        spark,
        [("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"), ("b", "s", "x")],
    )
    got = {
        (r.src, r.dst, r.path_len)
        for r in path_query(edges, [{"r", "s"}], min_len=2, max_len=3).collect()
    }
    assert ("a", "c", 2) in got and ("a", "d", 3) in got
    assert ("a", "x", 2) in got  # alternation: r then s
    assert not any(pl < 2 for (_, _, pl) in got)


def test_path_query_rejects_bad_args(spark):
    from ontoweaver_spark.graphquery import path_query

    edges = _edges(spark, [("a", "r", "b")])
    with pytest.raises(ValueError):
        path_query(edges, [])
    with pytest.raises(ValueError):
        path_query(edges, [{"r"}], min_len=2, max_len=1)


def test_snapshot_at_picks_covering_interval(spark):
    from ontoweaver_spark.sessions import snapshot_at

    intervals = spark.createDataFrame(
        [
            ("u1", "a", 0, 2), ("u1", "b", 2, None),
            ("u2", "x", 0, None),
            ("u3", "late", 5, None),
        ],
        "url string, value string, valid_from bigint, valid_to bigint",
    )
    got = {(r.url, r.value) for r in snapshot_at(intervals, 3).collect()}
    assert got == {("u1", "b"), ("u2", "x")}
    # boundary: valid_from <= at < valid_to (half-open)
    at2 = {(r.url, r.value) for r in snapshot_at(intervals, 2).collect()}
    assert ("u1", "b") in at2 and ("u1", "a") not in at2
