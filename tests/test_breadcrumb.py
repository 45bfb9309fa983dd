"""Breadcrumb-trail taxonomy, copula is-a, and triple-support goldens:
the site-navigation broader-than harvest (first breadcrumb-classed
container, consecutive anchor pairs, entity decode), the copula recall
frames with their stoplist, and the exact distinct-doc support rollup
that gates both. Reference analog: none (the reference consumes
ontologies as given); mining one from crawl markup/sentences plus a
support gate is the web-scale bootstrap the north rule targets."""

import pyspark.sql.functions as F

from ontoweaver_spark.ontology import triple_support
from ontoweaver_spark.webdoc import breadcrumb_trails, copula_isa


def _pairs(df):
    return {
        (r.id, r.child, r.parent, r.child_pos)
        for r in df.collect()
    }


def test_breadcrumb_consecutive_pairs(spark):
    html = (
        '<html><nav class="breadcrumb"><a href="/">Home</a> &gt; '
        '<a href="/e">Electronics</a> &gt; <a href="/e/p">Phones</a>'
        "</nav><p>body</p></html>"
    )
    df = spark.createDataFrame([("u1", html)], "url string, html string")
    got = _pairs(breadcrumb_trails(df))
    assert got == {
        ("u1", "Electronics", "Home", 2),
        ("u1", "Phones", "Electronics", 3),
    }


def test_breadcrumb_first_container_only_and_entities(spark):
    html = (
        '<ol class="site-breadcrumb-list"><li><a>A&amp;B</a></li>'
        "<li><a> C </a></li></ol>"
        '<div class="breadcrumb"><a>X</a><a>Y</a></div>'
    )
    df = spark.createDataFrame([("u1", html)], "url string, html string")
    got = _pairs(breadcrumb_trails(df))
    # only the FIRST breadcrumb container contributes; entity decoded,
    # anchor text trimmed
    assert got == {("u1", "C", "A&B", 2)}


def test_breadcrumb_binary_html_and_no_trail(spark):
    html = '<div class="breadcrumb"><a>Home</a><a>Docs</a></div>'
    df = spark.createDataFrame(
        [("u1", bytearray(html, "utf-8")), ("u2", bytearray(b"<p>no</p>"))],
        "url string, html binary",
    )
    got = _pairs(breadcrumb_trails(df))
    assert got == {("u1", "Docs", "Home", 2)}


def test_breadcrumb_single_crumb_emits_nothing(spark):
    html = '<nav class="breadcrumb"><a>Home</a></nav>'
    df = spark.createDataFrame([("u1", html)], "url string, html string")
    assert breadcrumb_trails(df).count() == 0


def test_copula_frames_and_stoplist(spark):
    docs = spark.createDataFrame(
        [
            (1, "A Penguin is a bird. Granite is a kind of rock."),
            (2, "He is a member of parliament."),  # 'member' not dropped
            (3, "This is a type of thing."),  # 'this'/'thing' pass; fine
            (4, "It is a very good day."),  # 'very' dropped
        ],
        "doc_id long, text string",
    )
    got = {
        (r.hyponym, r.hypernym, r.pattern)
        for r in copula_isa(docs).collect()
    }
    assert ("penguin", "bird", "is_a") in got
    assert ("granite", "rock", "kind_of") in got
    # the is_a frame also fires on "granite is a kind" — stoplist kills it
    assert ("granite", "kind", "is_a") not in got
    assert all(h != "very" and hy != "very" for hy, h, _ in got)


def test_triple_support_exact_distinct_docs(spark):
    rows = [
        (1, "a", "is_a", "b"),
        (1, "a", "is_a", "b"),  # same doc twice -> support 1
        (2, "a", "is_a", "b"),
        (3, "x", "part_of", "y"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, subject string, predicate string, object string"
    )
    out = {
        (r.subject, r.predicate, r.object, r.support)
        for r in triple_support(df).collect()
    }
    assert out == {("a", "is_a", "b", 2), ("x", "part_of", "y", 1)}
    gated = triple_support(df, min_support=2)
    assert [tuple(r) for r in gated.collect()] == [("a", "is_a", "b", 2)]


def test_page_kg_plan_is_join_free(spark):
    """The capstone's load-bearing scale claim: nothing joins before the
    support gate's HAVING prune — pin it so a refactor can't regress the
    10^12-page shape."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as m

    df = m.q_page_kg(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_numeric_consensus_low_median(spark):
    from ontoweaver_spark.ontology import numeric_consensus

    rows = [
        (1, "a", "pop", 10), (2, "a", "pop", 20),
        (3, "a", "pop", 20), (4, "a", "pop", 99),
        (5, "b", "size", 7),
        (6, "c", "len", 1), (7, "c", "len", 1000000),  # outlier
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, subject string, relation string, value long"
    )
    got = {
        (r.subject, r.relation, r.n_claims, r.n_values, r.vmin, r.vmax,
         r.median)
        for r in numeric_consensus(df).collect()
    }
    assert got == {
        ("a", "pop", 4, 3, 10, 99, 20),      # rank (4-1)//2 = 1 -> 20
        ("b", "size", 1, 1, 7, 7, 7),
        ("c", "len", 2, 2, 1, 1000000, 1),   # low median ignores outlier
    }
