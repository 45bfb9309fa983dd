"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03 — MOSS).

Checks the selection rule against a pure-Python replay (min of each
w-window of k-gram hashes, rightmost minimum on ties), the paper's
guarantee (documents sharing a verbatim run of w+k-1 tokens share a
fingerprint), the short-document fallback, and the pair report's
document-frequency cap.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from ontoweaver_spark.dedup import winnow_fingerprints, winnow_pairs


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int, w: int):
    toks = text.split()
    n_grams = max(len(toks) - (k - 1), 1)
    hs = [_md5_int(" ".join(toks[i : i + k])) for i in range(n_grams)]
    out = set()
    if n_grams < w:
        # last (only partial) window: min of everything, rightmost tie
        g = min(hs)
        pos = max(i for i, h in enumerate(hs) if h == g)
        return {(g, pos + 1)}
    for end in range(w - 1, n_grams):
        window = hs[end - w + 1 : end + 1]
        g = min(window)
        # rightmost minimum
        off = max(i for i, h in enumerate(window) if h == g)
        out.add((g, end - w + 1 + off + 1))
    return out


@pytest.mark.parametrize("k,w", [(3, 4), (5, 4), (2, 5)])
def test_winnow_matches_python_replay(spark, k, w):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "pack my box with five dozen liquor jugs right now please"),
        (3, "a b a b a b a b a b a b"),  # heavy hash ties
        (4, "short text"),  # fewer grams than w
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id"], r["fp"], r["fp_pos"])
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }
    want = {
        (d, g, p) for d, t in texts for (g, p) in _py_winnow(t, k, w)
    }
    assert got == want


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    # any shared verbatim run of w+k-1 tokens must share >=1 fingerprint
    k, w = 4, 5
    run = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1 tokens
    df = spark.createDataFrame(
        [
            (1, "xx yy zz " + run + " p q r"),
            (2, "completely different prefix tokens here " + run),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, k=k, w=w).select("doc_id", "fp").collect()
    a = {r["fp"] for r in fps if r["doc_id"] == 1}
    b = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert a & b


def test_winnow_pairs_df_cap_drops_boilerplate(spark):
    # 10 docs all share one boilerplate sentence; two docs also share a
    # rare sentence. With max_df below 10 the boilerplate fingerprints
    # are dropped, so only the rare-overlap pair (with its own
    # min_shared) survives.
    boiler = "all rights reserved contact us terms of service apply here"
    rare = "the seventeen turquoise zeppelins hummed quietly over bratislava"
    rows = [(i, f"doc number {i} intro words " + boiler) for i in range(10)]
    rows[3] = (3, rare + " " + boiler)
    rows[7] = (7, boiler + " " + rare)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # min_shared=2: selection is context-dependent, so single boilerplate
    # fingerprints can slip under the df cap in a few docs — but only the
    # rare-overlap pair shares >= 2 capped fingerprints
    pairs = winnow_pairs(df, k=3, w=3, min_shared=2, max_df=5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(3, 7)}
    # sanity: without the cap the boilerplate links many more pairs
    allp = winnow_pairs(df, k=3, w=3, min_shared=2, max_df=1000).count()
    assert allp > 1
