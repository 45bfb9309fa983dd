"""tfidf_top_terms (textops) and temperature_mix_sample (sampling)."""

import hashlib

from ontoweaver_spark.sampling import temperature_mix_sample
from ontoweaver_spark.textops import tfidf_top_terms

DOCS = [
    (1, "apple apple banana"),
    (2, "banana cherry"),
    (3, "cherry cherry durian durian durian"),
]


def _rows(df):
    return {(r["doc"], r["rank"]): r for r in df.collect()}


def test_tfidf_hand_computed(spark):
    # N=3; df: apple 1, banana 2, cherry 2, durian 1
    # idf (scale 1e6): apple/durian 3_000_000, banana/cherry 1_500_000
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = _rows(tfidf_top_terms(df, k=3, min_len=3, max_df_frac=1.0))
    assert got[(1, 1)]["token"] == "apple" and got[(1, 1)]["score"] == 6_000_000
    assert got[(1, 2)]["token"] == "banana" and got[(1, 2)]["score"] == 1_500_000
    # d2: equal scores -> deterministic token-asc tie-break
    assert got[(2, 1)]["token"] == "banana" and got[(2, 2)]["token"] == "cherry"
    assert got[(3, 1)]["token"] == "durian" and got[(3, 1)]["score"] == 9_000_000
    assert got[(3, 2)]["token"] == "cherry" and got[(3, 2)]["score"] == 3_000_000
    assert len(got) == 6


def test_tfidf_max_df_cut_and_k(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    # banana/cherry sit in 2/3 docs > 0.5*3 -> stopword-cut; d2 vanishes
    got = _rows(tfidf_top_terms(df, k=3, min_len=3, max_df_frac=0.5))
    assert {r["token"] for r in got.values()} == {"apple", "durian"}
    assert {d for d, _ in got} == {1, 3}
    # k=1 keeps exactly one row per surviving doc
    got1 = _rows(tfidf_top_terms(df, k=1, min_len=3, max_df_frac=1.0))
    assert sorted(got1) == [(1, 1), (2, 1), (3, 1)]


def _bucket(key, seed=42):
    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
    return int(h[:15], 16) % 1_000_000


def test_temperature_mix_rates_and_keeps(spark):
    # strata sizes a:100 b:25 c:25 -> alpha=.5 rates a 0.5, b/c 1.0
    rows = [(f"a{i}", "a") for i in range(100)]
    rows += [(f"b{i}", "b") for i in range(25)]
    rows += [(f"c{i}", "c") for i in range(25)]
    df = spark.createDataFrame(rows, ["key", "s"])
    out = temperature_mix_sample(df, "s", "key", alpha=0.5, seed=42).collect()
    rates = {r["s"]: r["mix_rate"] for r in out}
    assert rates == {"a": 0.5, "b": 1.0, "c": 1.0}
    kept = {r["key"] for r in out}
    expect = {k for k, s in rows if s != "a" or _bucket(k) < 500_000}
    assert kept == expect
    assert len(kept & {k for k, s in rows if s == "a"}) < 100  # actually thinned


def test_temperature_mix_alpha_limits_and_invariance(spark):
    rows = [(f"a{i}", "a") for i in range(80)] + [(f"b{i}", "b") for i in range(20)]
    df = spark.createDataFrame(rows, ["key", "s"])
    # alpha=1: identity mix, everything kept
    assert temperature_mix_sample(df, "s", "key", alpha=1.0).count() == 100
    # alpha=0: head stratum thinned toward the smallest's size (rate .25)
    out0 = temperature_mix_sample(df, "s", "key", alpha=0.0).collect()
    assert {r["mix_rate"] for r in out0 if r["s"] == "a"} == {0.25}
    assert all(r["mix_rate"] == 1.0 for r in out0 if r["s"] == "b")
    # deterministic in (key, seed): partitioning never changes the sample
    a = {r["key"] for r in temperature_mix_sample(df, "s", "key").collect()}
    b = {
        r["key"]
        for r in temperature_mix_sample(df.repartition(7), "s", "key").collect()
    }
    assert a == b
