"""Chi-square keyness: distinctive terms per corpus slice.

Checks the 2x2 contingency arithmetic and ranking against a pure-Python
replay, the overuse-only filter (ad > bc), the min_count floor, and that
a term uniformly spread across groups never ranks.
"""

import math
from collections import Counter

from ontoweaver_spark.textops import keyness_terms


def _py_keyness(rows, k=10, min_len=3, min_count=5):
    gt = Counter()
    for g, text in rows:
        for t in text.lower().split():
            if len(t) >= min_len:
                gt[(g, t)] += 1
    t_tot = Counter()
    g_tot = Counter()
    for (g, t), a in gt.items():
        t_tot[t] += a
        g_tot[g] += a
    n = sum(gt.values())
    scored = []
    for (g, t), a in gt.items():
        if a < min_count:
            continue
        b = t_tot[t] - a
        c = g_tot[g] - a
        d = n - t_tot[t] - g_tot[g] + a
        diff = a * d - b * c
        if diff <= 0:
            continue
        chi2 = float(n) * float(diff) * float(diff)
        chi2 = chi2 / float(a + b) / float(c + d) / float(a + c) / float(b + d)
        chi2 = math.floor(chi2 * 10000.0 + 0.5) / 10000.0
        scored.append((g, t, a, b, chi2))
    out = {}
    for g in {g for g, _ in rows}:
        rows_g = sorted(
            (r for r in scored if r[0] == g), key=lambda r: (-r[4], r[1])
        )[:k]
        for i, (gg, t, a, b, chi2) in enumerate(rows_g, 1):
            out[(gg, t)] = (a, b, chi2, i)
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "g string, text string")
    return {
        (r["g"], r["term"]): (r["cnt_in"], r["cnt_out"], r["chi2"], r["rank"])
        for r in keyness_terms(df, "g", **kw).collect()
    }


def test_matches_python_replay(spark):
    rows = [
        ("en", "cat dog cat bird cat the the the"),
        ("en", "cat dog fish the the and and"),
        ("fr", "chat chien chat oiseau the the the"),
        ("fr", "chat poisson chien the and and"),
    ] * 3
    got = _run(spark, rows, k=5, min_count=3)
    assert got == _py_keyness(rows, k=5, min_count=3)
    # 'cat' is distinctive for en, 'chat' for fr
    assert ("en", "cat") in got and ("fr", "chat") in got
    assert ("en", "chat") not in got


def test_uniform_term_never_ranks(spark):
    rows = [("a", "common alpha " * 10), ("b", "common beta " * 10)]
    got = _run(spark, rows, k=10, min_count=2)
    assert all(t != "common" for (_, t) in got)


def test_min_count_floor(spark):
    rows = [("a", "rare " + "filler " * 20), ("b", "filler " * 20)]
    got = _run(spark, rows, k=10, min_count=2)
    assert all(t != "rare" for (_, t) in got)  # cnt_in = 1 < 2


def test_k_truncation_and_rank_order(spark):
    rows = [
        ("x", " ".join(f"tok{i}" for i in range(20)) * 6),
        ("y", "unrelated words here entirely " * 6),
    ]
    got = _run(spark, rows, k=3, min_count=2)
    ranks = sorted(r for (_, _, _, r) in got.values())
    assert ranks == [1, 1, 2, 2, 3, 3] or ranks == [1, 1, 2, 2, 3, 3]
