"""Tests for textops.bpe_merges — cross-checked against a pure-Python BPE
trainer with identical greedy-replace and tie-break semantics."""

from collections import Counter

from ontoweaver_spark.textops import bpe_merges


def py_bpe(texts, k, lowercase=True):
    wf = Counter(
        w for t in texts for w in (t.lower() if lowercase else t).split() if w
    )
    vocab = [("  " + "  ".join(list(w)) + "  </w>  ", f) for w, f in wf.items()]
    merges = []
    for r in range(1, k + 1):
        pc: Counter = Counter()
        for s, f in vocab:
            toks = s.split()
            for x, y in zip(toks, toks[1:]):
                pc[(x, y)] += f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, c))
        vocab = [(s.replace(f" {a}  {b} ", f" {a}{b} "), f) for s, f in vocab]
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "Low lowest NEWEST",
]


def test_bpe_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = sorted(map(tuple, bpe_merges(df, k_merges=8).collect()))
    want = sorted(py_bpe(CORPUS, 8))
    assert got == want
    assert len(got) == 8
    # the paper's canonical behavior: frequent word-final pairs merge early
    first = [(a, b) for _, a, b, _ in sorted(got)]
    assert ("e", "s") in first or ("s", "t") in first or ("es", "t") in first


def test_bpe_greedy_rescan_overlap(spark):
    # 'aaaa': pair (a,a) has count 3 per word; greedy left-to-right merge
    # must produce 'aa aa' (chained non-overlapping matches — the case the
    # double-space separator exists for; a single-space representation
    # yields 'aa a a'). Round 2 ties (aa,aa) with (aa,</w>) at 3 each and
    # the lexicographic tie-break picks (aa,</w>) ('<' sorts before 'a').
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    got = sorted(map(tuple, bpe_merges(df, k_merges=2).collect()))
    want = sorted(py_bpe(["aaaa aaaa aaaa"], 2))
    assert got == want
    assert got[0][1:4] == ("a", "a", 9)  # 3 non-overlapping pairs x 3 words
    assert got[1][1:3] == ("aa", "</w>")


def test_bpe_exhaustion_stops_emitting(spark):
    # single 1-char word: only pair is (x, </w>); after 1 merge nothing left
    df = spark.createDataFrame([("x x x",)], "text string")
    rows = sorted(map(tuple, bpe_merges(df, k_merges=4).collect()))
    assert rows == [(1, "x", "</w>", 3)]


def test_bpe_deterministic_under_partitioning(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    a = sorted(map(tuple, bpe_merges(df, k_merges=5).collect()))
    b = sorted(map(tuple, bpe_merges(df.repartition(7), k_merges=5).collect()))
    assert a == b
