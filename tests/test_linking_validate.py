"""Entity linking / canonicalization / validation unit tests."""

from pyspark.sql import functions as F

from ontoweaver_spark.linking import (
    canonical_entity,
    canonical_url,
    comention_edges,
    link_entities,
)
from ontoweaver_spark.validate import quarantine, validate_input


def test_canonical_url(spark):
    cases = [
        ("HTTPS://WWW.Example.COM:443/a/b/?q=1#frag", "https://example.com/a/b"),
        ("http://example.com:80/", "http://example.com/"),
        ("http://example.com", "http://example.com/"),
        ("https://site9.io/p123/", "https://site9.io/p123"),
        ("not a url", "not a url"),  # un-parseable -> unchanged
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_canonical_entity(spark):
    df = spark.createDataFrame(
        [("  Apple, Inc. ",), ("APPLE INC",), ("apple   inc",)], "name string"
    )
    got = {r["c"] for r in df.select(canonical_entity(F.col("name")).alias("c")).collect()}
    assert got == {"apple inc"}


def test_link_entities_keep_and_skip(spark):
    mentions = spark.createDataFrame(
        [("Apple, Inc.", 1), ("Microsoft", 2), ("Unknown Co", 3)], "mention string, doc int"
    )
    aliases = spark.createDataFrame(
        [("apple inc", "Q312"), ("MICROSOFT", "Q2283")], "alias string, canonical string"
    )
    kept = link_entities(mentions, aliases, on_unknown="keep").orderBy("doc").collect()
    assert [(r["entity_id"], r["linked"]) for r in kept] == [
        ("Q312", True), ("Q2283", True), ("unknown co", False),
    ]
    skipped = link_entities(mentions, aliases, on_unknown="skip").collect()
    assert {r["entity_id"] for r in skipped} == {"Q312", "Q2283"}


def test_link_entities_plan_broadcasts(spark):
    mentions = spark.createDataFrame([("a",)], "mention string")
    aliases = spark.createDataFrame([("a", "A")], "alias string, canonical string")
    plan = link_entities(mentions, aliases)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the mention side must not shuffle


def test_comention_edges(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "z"), (2, "x"), (2, "y"), (3, "y"), (3, "y")],
        "doc_id int, entity_id string",
    )
    got = {
        (r["a"], r["b"], r["n_docs"])
        for r in comention_edges(df).collect()
    }
    assert got == {("x", "y", 2), ("x", "z", 1), ("y", "z", 1)}


def test_validate_input_counts_and_quarantine(spark):
    df = spark.createDataFrame(
        [("en", 100, "ok text"), ("xx", 100, "bad lang"), ("en", 9999, "bad range"),
         (None, 100, "no lang"), ("en", 100, None)],
        "lang string, n int, text string",
    )
    rules = {
        "lang": {"isin": ["en", "es"], "required": True},
        "n": {"in_range": [1, 1000]},
        "text": {"required": True},
    }
    valid, report = validate_input(df, rules)
    assert report.total == 5
    assert report.valid == 1
    assert report.per_rule == {"lang": 2, "n": 1, "text": 1}
    assert valid.count() == 1

    q = quarantine(df, rules).collect()
    failed = {tuple(r["_failed_rules"]) for r in q}
    assert ("lang",) in failed and ("n",) in failed and ("text",) in failed

    try:
        validate_input(df, rules, raise_errors=True)
        assert False, "expected raise"
    except ValueError as e:
        assert "4/5" in str(e)


def test_connected_components_chain_and_cycle(spark):
    from ontoweaver_spark.dedup import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (diameter 3), cycle 10-11-12-10, pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        "a long, b long",
    )
    got = {
        (r["vertex"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_jaccard_stop_shingle_cap(spark):
    """max_shingle_df drops boilerplate shingles from BOTH the inverted
    index and the per-doc counts: similarity is over the filtered universe."""
    from ontoweaver_spark.dedup import jaccard_pairs

    # every doc shares the 'x y z' boilerplate; docs 1/2 also share 'a b c'
    rows = [
        (1, "a b c x y z"),
        (2, "a b c x y z"),
        (3, "p q r x y z"),
        (4, "s t u x y z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # uncapped: the boilerplate connects everything
    uncapped = {
        (r["a"], r["b"]): r["jaccard"]
        for r in jaccard_pairs(df, shingle_k=3).collect()
    }
    assert len(uncapped) == 6  # all pairs share >=1 shingle

    # cap 3: shingles in all 4 docs drop ('x y z', 'c x y'? only those with
    # df>3); docs 1-2 still pair on their private shingles at jaccard 1.0
    capped = {
        (r["a"], r["b"]): r["jaccard"]
        for r in jaccard_pairs(df, shingle_k=3, max_shingle_df=3).collect()
    }
    assert (1, 2) in capped and capped[(1, 2)] == 1.0
    assert (3, 4) not in capped  # only shared boilerplate, now filtered
