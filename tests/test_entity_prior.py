"""Commonness-prior entity disambiguation + filtered TransE ranking.

The prior is the Milne-Witten p(entity|mention) anchor statistic as exact
integer ppm; disambiguation is the deterministic argmax baseline.  The
filtered TransE protocol (Bordes NIPS'13) must never rank WORSE than raw
and must rank strictly better whenever another true tail outscores the
evaluated one.
"""

import pyspark.sql.functions as F

from ontoweaver_spark.linking import disambiguate_by_prior, entity_prior
from ontoweaver_spark.similarity import hash_transe_rank


def test_entity_prior_exact_ppm(spark):
    anchors = spark.createDataFrame(
        [("apple", "fruit")] * 3 + [("apple", "company")] * 7 + [("solo", "only")],
        ["mention", "entity_id"],
    )
    rows = {
        (r["mention"], r["entity_id"]): (r["n_links"], r["prior_ppm"])
        for r in entity_prior(anchors).collect()
    }
    assert rows == {
        ("apple", "fruit"): (3, 300000),
        ("apple", "company"): (7, 700000),
        ("solo", "only"): (1, 1000000),
    }


def test_prior_ppm_truncates_not_rounds(spark):
    # 1/3 -> 333333 (truncating BIGINT div), 2/3 -> 666666: the exact
    # integer surface the oracle gate depends on
    anchors = spark.createDataFrame(
        [("m", "a")] + [("m", "b")] * 2, ["mention", "entity_id"]
    )
    got = {
        r["entity_id"]: r["prior_ppm"] for r in entity_prior(anchors).collect()
    }
    assert got == {"a": 333333, "b": 666666}


def test_disambiguate_argmax_and_tiebreak(spark):
    anchors = spark.createDataFrame(
        [("apple", "fruit")] * 3
        + [("apple", "company")] * 7
        # exact ppm tie between car and cat: lexicographic entity wins
        + [("jaguar", "cat")] * 2
        + [("jaguar", "car")] * 2,
        ["mention", "entity_id"],
    )
    mentions = spark.createDataFrame(
        [("d1", "apple"), ("d2", "jaguar"), ("d3", "unseen")],
        ["doc_id", "mention"],
    )
    out = {
        r["doc_id"]: (r["entity_id"], r["prior_ppm"])
        for r in disambiguate_by_prior(mentions, entity_prior(anchors)).collect()
    }
    assert out["d1"] == ("company", 700000)
    assert out["d2"] == ("car", 500000)  # tie -> smallest entity_id
    assert out["d3"] == (None, None)  # unseen mention -> unlinked


def test_disambiguate_ppm_tie_breaks_on_n_links(spark):
    # 334/1000 and 1/3 both truncate to ppm brackets that can collide at
    # coarser scales; construct an exact ppm tie with DIFFERENT n_links:
    # x: 1 of 2 (500000), y: 2 of 4 (500000) on separate mentions cannot
    # tie within one mention, so use 3-entity split 2/2/... same n. The
    # n_links tiebreak needs same-ppm different-n: 1000000*1//2=500000
    # vs 1000000*2//4 requires one mention total 4: a=2, b=2 ties both;
    # instead total 6: a=3 (500000), b=2 (333333), c=1 (166666) — no tie.
    # Genuine same-ppm-different-n needs truncation collapse: total=7,
    # a=3 -> 428571, b=3 -> 428571 (same n); total large: a=7000001?
    # Keep it honest: verify the struct ordering prefers higher n when
    # ppm ties by feeding the prior table directly.
    prior = spark.createDataFrame(
        [("m", "low_n", 1, 500000), ("m", "hi_n", 5, 500000)],
        ["mention", "entity_id", "n_links", "prior_ppm"],
    )
    mentions = spark.createDataFrame([("d", "m")], ["doc_id", "mention"])
    out = disambiguate_by_prior(mentions, prior).collect()[0]
    assert out["entity_id"] == "hi_n"


def _toy_triples(spark):
    docs = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    i = F.col("doc_id")
    triples = docs.select(
        F.concat(F.lit("e"), (i % 20).cast("string")).alias("head"),
        F.concat(F.lit("r"), (i % 3).cast("string")).alias("rel"),
        F.concat(
            F.lit("e"), ((i * 7 + F.expr("doc_id div 60")) % 20).cast("string")
        ).alias("tail"),
    )
    cands = docs.where(i < 20).select(
        F.concat(F.lit("e"), i.cast("string")).alias("candidate")
    )
    return triples, cands


def test_transe_filtered_never_worse_and_sometimes_better(spark):
    triples, cands = _toy_triples(spark)
    raw = hash_transe_rank(triples, cands, dim=3, mod=100)
    fil = hash_transe_rank(triples, cands, dim=3, mod=100, filtered=True)
    j = (
        raw.withColumnRenamed("rank", "raw_rank")
        .join(
            fil.withColumnRenamed("rank", "filt_rank"),
            ["head", "rel", "tail", "score"],
        )
        .select("raw_rank", "filt_rank")
        .collect()
    )
    assert len(j) > 0
    assert all(r["filt_rank"] <= r["raw_rank"] for r in j)
    assert any(r["filt_rank"] < r["raw_rank"] for r in j)


def test_transe_filtered_equals_raw_when_single_tail(spark):
    # tail = f(head, rel) exactly (no div-block term): each (head, rel)
    # has ONE true tail, so there is nothing to filter out
    docs = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    i = F.col("doc_id")
    triples = docs.select(
        F.concat(F.lit("e"), (i % 12).cast("string")).alias("head"),
        F.concat(F.lit("r"), (i % 3).cast("string")).alias("rel"),
        F.concat(F.lit("e"), ((i * 7) % 12).cast("string")).alias("tail"),
    )
    cands = docs.where(i < 12).select(
        F.concat(F.lit("e"), i.cast("string")).alias("candidate")
    )
    raw = sorted(
        hash_transe_rank(triples, cands, dim=3, mod=100).collect()
    )
    fil = sorted(
        hash_transe_rank(triples, cands, dim=3, mod=100, filtered=True).collect()
    )
    assert raw == fil


def test_truth_finder_corroboration_beats_majority(spark):
    from ontoweaver_spark.linking import truth_finder

    rows = []
    for src in ["g1", "g2", "g3"]:
        rows += [(src, "s1", "p", "v1")]
        for k in range(1, 6):  # the good sources corroborate elsewhere
            rows += [(src, f"s{k + 1}", "p", f"t{k}")]
    for src in ["b1", "b2", "b3", "b4"]:
        rows += [(src, "s1", "p", "v2")]
        for k in range(1, 6):  # each bad source scatters its own junk
            rows += [(src, f"s{k + 1}", "p", f"junk_{src}_{k}")]
    claims = spark.createDataFrame(rows, ["source", "subj", "pred", "obj"])
    out = {
        r["obj"]: r["conf_ppm"]
        for r in truth_finder(claims, rounds=3)
        .where(F.col("subj") == "s1")
        .collect()
    }
    # majority vote says v2 (4 sources vs 3); trust-weighted says v1
    assert out["v1"] > out["v2"]
    # round 1 belief is pure vote weight: v2 must win THERE, proving the
    # reversal comes from the trust iteration, not the setup
    r1 = {
        r["obj"]: r["belief"]
        for r in truth_finder(claims, rounds=1)
        .where(F.col("subj") == "s1")
        .collect()
    }
    assert r1["v2"] > r1["v1"]


def test_truth_finder_duplicate_assertions_count_once(spark):
    from ontoweaver_spark.linking import truth_finder

    base = [("a", "s", "p", "x"), ("b", "s", "p", "y")]
    once = truth_finder(
        spark.createDataFrame(base, ["source", "subj", "pred", "obj"]), rounds=2
    )
    dup = truth_finder(
        spark.createDataFrame(base * 5, ["source", "subj", "pred", "obj"]),
        rounds=2,
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, dup.collect()))


def test_truth_finder_rejects_bad_rounds(spark):
    import pytest

    from ontoweaver_spark.linking import truth_finder

    df = spark.createDataFrame([("a", "s", "p", "x")], ["source", "subj", "pred", "obj"])
    with pytest.raises(ValueError):
        truth_finder(df, rounds=0)
