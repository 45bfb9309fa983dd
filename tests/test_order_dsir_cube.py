"""Tests for sampling.training_order, textops.importance_weights, and
textops.corpus_rollup — each cross-checked against an independent
pure-Python derivation."""

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from ontoweaver_spark.sampling import training_order
from ontoweaver_spark.textops import corpus_rollup, importance_weights

SCALE = 1_000_000


def py_md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


DOCS = [
    (i, f"tok{i % 7} tok{i % 5} tok{i % 3} common word", "en" if i % 3 else "de",
     "web" if i % 2 else "books")
    for i in range(40)
]
SCHEMA = "doc_id long, text string, lang string, source string"


def test_training_order_matches_python_rank(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = {r.doc_id: r.position
           for r in training_order(df, seed=3).collect()}
    want_order = sorted(
        (d[0] for d in DOCS), key=lambda i: (py_md5_int(f"3:{i}"), i)
    )
    assert got == {doc: pos for pos, doc in enumerate(want_order)}
    # a different seed is a different permutation
    got1 = {r.doc_id: r.position
            for r in training_order(df, seed=4).collect()}
    assert got1 != got
    # positions are a contiguous 0-based permutation either way
    assert sorted(got1.values()) == list(range(len(DOCS)))


def test_training_order_stable_under_partitioning(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    a = sorted((r.doc_id, r.position) for r in training_order(df, seed=9).collect())
    b = sorted(
        (r.doc_id, r.position)
        for r in training_order(df.repartition(11), seed=9).collect()
    )
    assert a == b


def py_importance(docs, n_buckets=4096):
    doc_b = {}
    hist_c: Counter = Counter()
    hist_t: Counter = Counter()
    for did, text, lang, _ in docs:
        toks = text.split()
        if not toks:
            continue
        bs = Counter(py_md5_int(t) % n_buckets for t in toks)
        doc_b[did] = bs
        hist_c.update(bs)
        if lang == "en":
            hist_t.update(bs)
    out = {}
    for did, bs in doc_b.items():
        s = sum(k * (SCALE * hist_t.get(b, 0) // hist_c[b]) for b, k in bs.items())
        n = sum(bs.values())
        out[did] = (n, s // n)
    return out


def test_importance_weights_match_python(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = {r.doc_id: (r.n_tokens, r.weight)
           for r in importance_weights(df, F.col("lang") == "en").collect()}
    assert got == py_importance(DOCS)
    # target docs trend higher than non-target (their buckets dominate)
    en = [w for d, (_, w) in got.items() if DOCS[d][2] == "en"]
    de = [w for d, (_, w) in got.items() if DOCS[d][2] == "de"]
    assert min(en) > 0 and sum(en) / len(en) > sum(de) / len(de)


def test_corpus_rollup_matches_python_cube(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = {(r.lang, r.source): (r.n_docs, r.n_tokens)
           for r in corpus_rollup(df).collect()}
    want: dict = {}
    for _, text, lang, source in DOCS:
        n = len(text.split())
        for key in [(lang, source), (lang, None), (None, source), (None, None)]:
            c = want.setdefault(key, [0, 0])
            c[0] += 1
            c[1] += n
    assert got == {k: tuple(v) for k, v in want.items()}
    assert got[(None, None)][0] == len(DOCS)
