"""Frontier scheduling (budget + politeness slots) and mergeable KMV."""

from pyspark.sql import functions as F

from ontoweaver_spark.textops import (
    kmv_distinct, kmv_estimate_from_sketch, kmv_merge, kmv_sketch,
)
from ontoweaver_spark.urls import frontier_plan


def test_frontier_budget_and_slots(spark):
    rows = [(f"https://h{i % 3}.com/u{i}", (i * 37) % 101) for i in range(60)]
    cand = spark.createDataFrame(rows, "url string, priority long")
    out = frontier_plan(cand, budget=30).collect()
    assert len(out) == 30  # quotas sum to the budget exactly
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r["fetch_slot"])
    # 60 candidates spread 3 hosts evenly -> each host gets 10 slots,
    # contiguous from 1 (the politeness-queue contract)
    for slots in by_host.values():
        assert sorted(slots) == list(range(1, 11))


def test_frontier_keeps_highest_priority(spark):
    cand = spark.createDataFrame(
        [("https://a.com/lo", 1), ("https://a.com/hi", 9),
         ("https://a.com/mid", 5)],
        "url string, priority long",
    )
    out = frontier_plan(cand, budget=2).collect()
    got = {r["url"]: r["fetch_slot"] for r in out}
    assert got == {"https://a.com/hi": 1, "https://a.com/mid": 2}


def test_kmv_merge_lossless_vs_direct(spark):
    # 3 shards x 40 keys with heavy overlap; k small enough to engage
    # the estimator path
    rows = [(f"s{i % 3}", f"key{(i * 7) % 50}") for i in range(120)]
    df = spark.createDataFrame(rows, "shard string, key string")
    whole = df.withColumn("corpus", F.lit("all"))

    direct = kmv_distinct(whole, "corpus", "key", k=8).collect()[0]
    sk = kmv_sketch(df, "shard", "key", k=8).withColumn("corpus", F.lit("all"))
    merged = kmv_estimate_from_sketch(
        kmv_merge(sk.select("corpus", "sketch"), "corpus", k=8), "corpus", k=8
    ).collect()[0]
    assert (merged["n_kept"], merged["estimate"]) == (
        direct["n_kept"], direct["estimate"]
    )


def test_kmv_small_group_exact(spark):
    df = spark.createDataFrame(
        [("g", f"k{i}") for i in range(5)], "grp string, key string"
    )
    sk = kmv_sketch(df, "grp", "key", k=16)
    est = kmv_estimate_from_sketch(sk, "grp", k=16).collect()[0]
    assert (est["n_kept"], est["estimate"]) == (5, 5)
