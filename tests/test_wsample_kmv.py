"""Tests for sampling.weighted_sample and textops.kmv_distinct."""

import hashlib
import math

import pytest

from ontoweaver_spark.sampling import weighted_sample
from ontoweaver_spark.textops import kmv_distinct


def py_md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


DOCS = [(i, 1 + py_md5_int(f"w{i}") % 100) for i in range(300)]
SCHEMA = "doc_id long, n_chars long"


def test_priority_sample_matches_python_topk(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = sorted(r.doc_id for r in weighted_sample(df, "n_chars", k=25, seed=7).collect())
    want = sorted(
        i for i, _ in sorted(
            DOCS, key=lambda d: (-(d[1] / py_md5_int(f"7:{d[0]}")), d[0])
        )[:25]
    )
    assert got == want and len(got) == 25
    # different seed -> different sample
    got2 = sorted(r.doc_id for r in weighted_sample(df, "n_chars", k=25, seed=8).collect())
    assert got2 != got


def test_poisson_sample_matches_python_filter(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    W = float(sum(w for _, w in DOCS))
    k = 40
    want = sorted(
        i for i, w in DOCS
        if py_md5_int(f"3:{i}") / float(1 << 60) < k * float(w) / W
    )
    got = sorted(r.doc_id for r in
                 weighted_sample(df, "n_chars", k=k, seed=3, method="poisson").collect())
    assert got == want
    # expected-size-k: within a loose band
    assert 0.5 * k <= len(got) <= 2 * k
    # heavier rows are sampled at higher rate on average
    by_id = dict(DOCS)
    mean_w_kept = sum(by_id[i] for i in got) / len(got)
    mean_w_all = W / len(DOCS)
    assert mean_w_kept > mean_w_all
    with pytest.raises(ValueError, match="unknown method"):
        weighted_sample(df, "n_chars", k=1, method="nope")


def test_priority_sample_partition_invariant(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    a = sorted(map(tuple, weighted_sample(df, "n_chars", k=10, seed=1).collect()))
    b = sorted(map(tuple,
                   weighted_sample(df.repartition(7), "n_chars", k=10, seed=1).collect()))
    assert a == b


def py_kmv(pairs, k):
    groups: dict = {}
    for g, key in pairs:
        groups.setdefault(g, set()).add(py_md5_int(str(key)))
    out = {}
    for g, hs in groups.items():
        lo = sorted(hs)[:k]
        if len(lo) < k:
            out[g] = (len(lo), len(lo))
        else:
            est = math.floor((k - 1) * float(1 << 60) / float(lo[-1]) + 0.5)
            out[g] = (k, est)
    return out


def test_kmv_matches_python_and_is_accurate(spark):
    pairs = [("big", f"tok{i}") for i in range(5000)] + [
        ("small", f"s{i}") for i in range(10)
    ]
    df = spark.createDataFrame(pairs, "lang string, token string")
    got = {r.lang: (r.n_kept, r.estimate)
           for r in kmv_distinct(df, "lang", "token", k=64).collect()}
    assert got == py_kmv(pairs, 64)
    # small group: exact count
    assert got["small"] == (10, 10)
    # big group: estimate within 30% of truth at k=64
    assert abs(got["big"][1] - 5000) / 5000 < 0.3


def test_kmv_ignores_duplicate_keys(spark):
    pairs = [("g", "x")] * 100 + [("g", "y")] * 50
    df = spark.createDataFrame(pairs, "lang string, token string")
    got = kmv_distinct(df, "lang", "token", k=8).collect()[0]
    assert (got.n_kept, got.estimate) == (2, 2)
