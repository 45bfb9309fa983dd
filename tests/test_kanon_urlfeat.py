"""Goldens for the k-anonymity governance rollup and structural URL
features."""

from ontoweaver_spark.urls import url_features
from ontoweaver_spark.validate import k_anonymity_report


def test_k_anonymity_hand_computed(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("b", 2), ("b", 3)], ["h", "g"]
    )
    row = k_anonymity_report(df, ["h", "g"], k=3).collect()[0]
    assert (row["n_rows"], row["n_groups"]) == (5, 3)
    assert (row["violating_groups"], row["rows_at_risk"]) == (2, 2)
    assert (row["min_group_size"], row["k"]) == (1, 3)


def test_k_anonymity_null_is_its_own_class(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 1), ("x", 1)], ["h", "g"]
    )
    row = k_anonymity_report(df, ["h", "g"], k=2).collect()[0]
    # NULL group has size 2 (safe at k=2); 'x' group violates
    assert (row["n_groups"], row["violating_groups"], row["rows_at_risk"]) == (2, 1, 1)


def test_url_features_golden(spark):
    u = spark.createDataFrame(
        [("https://ex.com/a/b/c?x=1&y=2#frag",),
         ("http://ex.org",),
         ("https://ex.net/?q=1",)],
        ["url"],
    )
    got = {r["url"]: r for r in url_features(u).collect()}
    r1 = got["https://ex.com/a/b/c?x=1&y=2#frag"]
    assert (r1["is_https"], r1["host"], r1["path_depth"], r1["path_len"],
            r1["n_params"], r1["has_fragment"]) == (True, "ex.com", 3, 6, 2, True)
    r2 = got["http://ex.org"]
    assert (r2["is_https"], r2["host"], r2["path_depth"], r2["n_params"],
            r2["has_fragment"]) == (False, "ex.org", 0, 0, False)
    r3 = got["https://ex.net/?q=1"]
    assert (r3["path_depth"], r3["path_len"], r3["n_params"]) == (0, 1, 1)
