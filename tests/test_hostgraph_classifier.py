"""urls.host_link_graph and textops.hashed_linear_score."""

import hashlib

from ontoweaver_spark.textops import hashed_linear_score, hashed_weights
from ontoweaver_spark.urls import host_link_graph, host_of


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_host_of(spark):
    rows = spark.createDataFrame(
        [
            ("https://Example.COM/path?q=1",),
            ("http://a.b.c:8080/x",),
            ("relative/path",),
            ("ftp://files.example/x",),
        ],
        ["u"],
    ).select(host_of("u").alias("h")).collect()
    assert [r.h for r in rows] == ["example.com", "a.b.c:8080", "", "files.example"]


def test_host_link_graph(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.com/1", "see https://b.com/x and https://b.com/y plus https://a.com/self"),
            ("https://a.com/2", "https://c.org/z only"),
            ("https://b.com/1", "back to https://a.com/1."),
            ("https://d.net/1", "no links here"),
        ],
        ["url", "text"],
    )
    got = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_link_graph(pages).collect()
    }
    assert got == {
        ("a.com", "b.com"): 2,
        ("a.com", "c.org"): 1,
        ("b.com", "a.com"): 1,
    }
    with_self = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_link_graph(pages, include_self=True).collect()
    }
    assert with_self[("a.com", "a.com")] == 1


def test_hashed_linear_score_matches_python(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta beta gamma"), (2, "Alpha ALPHA"), (3, "x")],
        ["doc_id", "text"],
    )
    n_buckets, seed, wr = 64, 7, 1000
    w = hashed_weights(spark, n_buckets=n_buckets, seed=seed, weight_range=wr)
    got = {r.id: r.score for r in hashed_linear_score(
        docs, w, n_buckets=n_buckets).collect()}

    def weight(tok: str) -> int:
        b = _md5int(tok.lower()) % n_buckets
        return _md5int(f"w:{seed}:{b}") % (2 * wr + 1) - wr

    assert got == {
        1: weight("alpha") + 2 * weight("beta") + weight("gamma"),
        2: 2 * weight("alpha"),
        3: weight("x"),
    }


def test_threshold_keep_flag(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, "c")], ["doc_id", "text"])
    w = hashed_weights(spark, n_buckets=16, seed=1)
    out = hashed_linear_score(docs, w, n_buckets=16, threshold=0)
    assert set(out.columns) == {"id", "score", "keep"}
    for r in out.collect():
        assert r.keep == (r.score >= 0)


def test_weight_table_broadcast_plan(spark):
    """The weight join must be a BroadcastHashJoin — a shuffled model
    join would be the wrong plan at any corpus size."""
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    w = hashed_weights(spark, n_buckets=32)
    plan = hashed_linear_score(docs, w, n_buckets=32)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
