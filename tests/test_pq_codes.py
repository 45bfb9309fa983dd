"""Tests for similarity.pq_codes — cross-checked against a pure-Python
product quantizer with the same seeded codebook and rounding."""

import math

import pytest

from ontoweaver_spark.similarity import pq_codes


def _vecs(n=40, dim=16, tag="v"):
    import hashlib

    out = []
    for i in range(n):
        v = []
        for j in range(dim):
            h = int(hashlib.md5(f"{tag}:{i}:{j}".encode()).hexdigest()[:8], 16)
            v.append((h % 2001 - 1000) / 1000.0)
        out.append((i, v))
    return out


def py_pq(vecs, m, k, dim):
    w = dim // m
    cb = {i: v for i, v in vecs if i < k}
    out = {}
    for i, v in vecs:
        codes = []
        for s in range(m):
            best = None
            for j in range(k):
                d = sum(
                    (float(v[t]) - float(cb[j][t])) ** 2
                    for t in range(s * w, (s + 1) * w)
                )
                d = math.floor(d * 10000 + 0.5) / 10000
                if best is None or (d, j) < best:
                    best = (d, j)
            codes.append(best[1])
        out[i] = codes
    return out


def test_pq_codes_match_python(spark):
    vecs = _vecs()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: list(r.codes) for r in pq_codes(df, m=4, k=8, dim=16).collect()}
    assert got == py_pq(vecs, 4, 8, 16)
    # codebook vectors quantize to themselves in every subspace
    for j in range(8):
        assert got[j] == [j] * 4


def test_pq_codes_deterministic_and_validated(spark):
    vecs = _vecs(tag="w")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    a = sorted((r.vec_id, tuple(r.codes)) for r in pq_codes(df, m=2, k=4, dim=16).collect())
    b = sorted(
        (r.vec_id, tuple(r.codes))
        for r in pq_codes(df.repartition(7), m=2, k=4, dim=16).collect()
    )
    assert a == b
    with pytest.raises(ValueError, match="divide evenly"):
        pq_codes(df, m=5, dim=16)
