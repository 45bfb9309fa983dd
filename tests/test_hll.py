"""HyperLogLog register sketch (Flajolet et al., AofA'07).

Checks registers against a pure-Python md5 replay, merge losslessness
(shard sketches union to the exact whole-corpus sketch), estimator
accuracy at the theoretical 1.04/sqrt(m) error scale, and the exact
integer arithmetic of the finalizer (no float until one divide+floor).
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from ontoweaver_spark.textops import hll_estimate, hll_merge, hll_registers


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_registers(keys, p):
    m = 1 << p
    k_max = 60 - p + 1
    reg = {}
    for key in keys:
        h = _md5_int(key)
        j = h & (m - 1)
        rest = h >> p
        rho = k_max if rest == 0 else k_max - rest.bit_length()
        reg[j] = max(reg.get(j, 0), rho)
    return reg


@pytest.mark.parametrize("p", [4, 10])
def test_registers_match_python_replay(spark, p):
    keys = [f"key{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k string").withColumn(
        "g", F.lit("all")
    )
    got = {
        (r["j"], r["r"]) for r in hll_registers(df, "g", "k", p=p).collect()
    }
    assert got == set(_py_registers(keys, p).items())


def test_merge_equals_whole_corpus_sketch(spark):
    rows = [(f"k{i}", i % 3) for i in range(900)]
    df = spark.createDataFrame(rows, "k string, shard int").withColumn(
        "g", F.lit("all")
    )
    whole = hll_registers(df, "g", "k", p=8)
    shards = [
        hll_registers(df.where(F.col("shard") == s), "g", "k", p=8)
        for s in range(3)
    ]
    merged = hll_merge(shards[0].unionByName(shards[1]).unionByName(shards[2]), "g")
    a = {(r["j"], r["r"]) for r in whole.collect()}
    b = {(r["j"], r["r"]) for r in merged.collect()}
    assert a == b


def test_estimate_accuracy_and_grouping(spark):
    n_a, n_b = 3000, 150
    rows = [("a", f"x{i}") for i in range(n_a)] + [
        ("b", f"y{i}") for i in range(n_b)
    ]
    # duplicates must not move the estimate
    rows += rows[:500]
    df = spark.createDataFrame(rows, "g string, k string")
    p = 10
    est = {
        r["g"]: r["estimate"]
        for r in hll_estimate(hll_registers(df, "g", "k", p=p), "g", p=p).collect()
    }
    # raw estimator error stddev is ~1.04/sqrt(1024) = 3.25%; 5 sigma bound
    assert abs(est["a"] - n_a) / n_a < 5 * 1.04 / math.sqrt(1 << p)
    # small-range: raw estimator biases high below ~2.5m but must stay
    # within a loose factor (documented: callers wanting linear counting
    # post-process n_set)
    assert 0 < est["b"] < 10 * n_b


def test_estimator_matches_exact_integer_replay(spark):
    keys = [f"z{i}" for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string").withColumn(
        "g", F.lit("all")
    )
    p = 6
    m = 1 << p
    k_max = 60 - p + 1
    reg = _py_registers(keys, p)
    s_total = sum(1 << (k_max - r) for r in reg.values()) + (m - len(reg)) * (
        1 << k_max
    )
    numerator = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << k_max)
    want = math.floor(numerator / float(s_total))
    row = hll_estimate(hll_registers(df, "g", "k", p=p), "g", p=p).collect()[0]
    assert row["estimate"] == want and row["n_set"] == len(reg)


def test_p_validation(spark):
    df = spark.createDataFrame([("a", "k")], "g string, k string")
    with pytest.raises(ValueError):
        hll_registers(df, "g", "k", p=1)
    with pytest.raises(ValueError):
        hll_estimate(df, "g", p=17)
