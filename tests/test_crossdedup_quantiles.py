"""Tests for dedup.cross_corpus_duplicates and textops.length_quantiles."""

import pytest
from pyspark.sql import functions as F

from ontoweaver_spark.dedup import cross_corpus_duplicates
from ontoweaver_spark.textops import length_quantiles

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
SCHEMA = "doc_id long, text string"


def test_cross_corpus_finds_only_cross_pairs(spark):
    new = spark.createDataFrame(
        [
            (1, BASE),                                  # exact dup of ref 101
            (2, BASE.replace("today", "tomorrow")),     # near dup of ref 101
            (3, "completely different words about spark query engines"),
            (4, BASE),                                  # exact dup of new 1 AND ref 101
        ],
        SCHEMA,
    )
    ref = spark.createDataFrame(
        [
            (101, BASE),
            (102, "unrelated reference text on graph algorithms and joins"),
            (103, "completely different words about spark query engines"),  # dup of new 3
        ],
        SCHEMA,
    )
    rows = cross_corpus_duplicates(new, ref, threshold=0.5).collect()
    got = {(r.a, r.b): r.jaccard for r in rows}
    assert got[(1, 101)] == 1.0
    assert got[(4, 101)] == 1.0
    assert got[(3, 103)] == 1.0
    assert 0.5 <= got[(2, 101)] < 1.0
    # strictly two-sided: no new-new pair (1,4) in any orientation
    assert all(a in (1, 2, 3, 4) and b in (101, 102, 103) for a, b in got)
    assert (2, 102) not in got


def py_quantile(values, q):
    import math

    xs = sorted(values)
    pos = q * (len(xs) - 1)
    lo = math.floor(pos)
    hi = min(lo + 1, len(xs) - 1)
    v = xs[lo] + (pos - lo) * (xs[hi] - xs[lo])
    return math.floor(v * 10000 + 0.5) / 10000


def test_length_quantiles_match_python(spark):
    import hashlib

    docs = []
    for i in range(200):
        h = int(hashlib.md5(f"q{i}".encode()).hexdigest()[:8], 16)
        n = 1 + h % 37
        docs.append((i, " ".join(f"w{j}" for j in range(n)), "en" if i % 3 else "de"))
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {r.lang: r for r in length_quantiles(df, qs=(0.25, 0.5, 0.9, 0.99)).collect()}
    for lang in ("en", "de"):
        lens = [len(t.split()) for _, t, l in docs if l == lang]
        assert got[lang].n_docs == len(lens)
        assert got[lang].p25 == py_quantile(lens, 0.25)
        assert got[lang].p50 == py_quantile(lens, 0.5)
        assert got[lang].p90 == py_quantile(lens, 0.9)
        assert got[lang].p99 == py_quantile(lens, 0.99)


def test_length_quantiles_single_value_group(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "xx")], "doc_id long, text string, lang string"
    )
    r = length_quantiles(df).collect()[0]
    assert (r.n_docs, r.p25, r.p50, r.p90, r.p99) == (1, 3.0, 3.0, 3.0, 3.0)
