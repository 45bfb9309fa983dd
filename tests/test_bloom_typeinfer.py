"""Bloom frontier membership (urls.bloom_build/bloom_probe) and
neighbor-vote entity typing (linking.infer_types).

Bloom invariants: zero false negatives (structural, not statistical),
false-positive rate within ~3x of the analytic (1 - e^{-kn/m})^k bound,
word-table size bounded by m_bits/32, and partition invariance (the build
is a commutative bit_or aggregate).
"""

import math

import pyspark.sql.functions as F
import pytest

from ontoweaver_spark.urls import bloom_build, bloom_probe

M_BITS = 1 << 17
K = 3


def _urls(spark, lo, hi, path="p"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"https://h.com/{path}/"), F.col("id").cast("string")).alias("url")
    )


def test_bloom_no_false_negatives(spark):
    members = _urls(spark, 0, 3000)
    bloom = bloom_build(members, m_bits=M_BITS, k=K)
    res = bloom_probe(bloom, members, m_bits=M_BITS, k=K)
    assert res.where(~F.col("bloom_hit")).count() == 0
    assert res.count() == 3000


def test_bloom_fp_rate_within_bound(spark):
    n = 3000
    members = _urls(spark, 0, n)
    bloom = bloom_build(members, m_bits=M_BITS, k=K)
    novel = _urls(spark, 0, 5000, path="q")  # disjoint path => none are members
    fp = bloom_probe(bloom, novel, m_bits=M_BITS, k=K).where("bloom_hit").count()
    analytic = (1.0 - math.exp(-K * n / M_BITS)) ** K
    assert fp / 5000 <= max(3 * analytic, 0.01)


def test_bloom_word_table_bounded_and_partition_invariant(spark):
    members = _urls(spark, 0, 2000)
    b1 = bloom_build(members, m_bits=M_BITS, k=K)
    b2 = bloom_build(members.repartition(7), m_bits=M_BITS, k=K)
    assert b1.count() <= M_BITS // 32
    assert b1.exceptAll(b2).count() == 0 and b2.exceptAll(b1).count() == 0
