"""Cross-doc duplicated n-gram spans: only cross-document repeats
trigger, touching windows merge, positions are 1-based inclusive."""


def _spans(spark, rows, n=3, min_docs=2):
    from ontoweaver_spark.dedup import duplicated_ngram_spans

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_id, r.span_start, r.span_end, r.n_hits)
        for r in duplicated_ngram_spans(df, n=n, min_docs=min_docs).collect()
    }


def test_shared_trigram_flags_both_docs(spark):
    got = _spans(
        spark,
        [(1, "aa bb cc dd unique1 one"), (2, "zz aa bb cc dd other2 two")],
    )
    # doc1: windows at 1,2 hit (aa bb cc / bb cc dd) -> merged span 1..4
    # doc2: windows at 2,3 hit -> span 2..5
    assert got == {(1, 1, 4, 2), (2, 2, 5, 2)}


def test_intra_doc_repeat_alone_does_not_trigger(spark):
    got = _spans(spark, [(1, "xx yy zz ww xx yy zz"), (2, "pp qq rr ss")])
    assert got == set()


def test_disjoint_hits_stay_separate_spans(spark):
    # doc1 shares "aa bb cc" (pos 1) and "dd ee ff" (pos 7) with doc2,
    # separated by unique tokens -> two spans
    got = _spans(
        spark,
        [(1, "aa bb cc u1 u2 u3 dd ee ff"),
         (2, "aa bb cc x9 dd ee ff")],
    )
    d1 = {t for t in got if t[0] == 1}
    assert d1 == {(1, 1, 3, 1), (1, 7, 9, 1)}


def test_min_docs_threshold(spark):
    rows = [(1, "aa bb cc k1"), (2, "aa bb cc k2"), (3, "aa bb cc k3")]
    assert len(_spans(spark, rows, min_docs=3)) == 3
    assert _spans(spark, rows, min_docs=4) == set()


def test_short_doc_clamped_prefix_window(spark):
    # both docs shorter than n: single clamped window each, identical text
    got = _spans(spark, [(1, "aa bb"), (2, "aa bb")], n=5)
    assert got == {(1, 1, 5, 1), (2, 1, 5, 1)}
