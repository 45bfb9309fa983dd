"""Train/eval n-gram decontamination (decontam.py): exact overlap counts
on planted contamination, the drop-side convenience, and the broadcast
scale shape (the corpus side must never shuffle)."""

from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    eval_q = "what year did the treaty of westphalia end the thirty years war in europe"
    return _df(spark, [
        (1, base),                                   # clean
        (2, eval_q),                                 # verbatim eval copy
        (3, f"intro words {eval_q} trailing text"),  # eval embedded mid-doc
        (4, eval_q.replace("europe", "germany")),    # last word changed: shares only the first 13-gram
        (5, "completely unrelated text about cooking pasta with garlic and fresh basil leaves"),
    ])


def test_contamination_report_exact(spark):
    from ontoweaver_spark.decontam import contamination_report

    corpus = _corpus(spark)
    ev = _df(spark, [(100, "what year did the treaty of westphalia end the "
                           "thirty years war in europe")])
    rows = {
        (r["doc_id"], r["eval_id"]): r["n_shared"]
        for r in contamination_report(corpus, ev, n=13).collect()
    }
    # eval doc has 14 tokens -> 2 distinct 13-grams; doc 2 shares both,
    # doc 3 contains the full text so shares both, doc 4 changed the last
    # word so only the first 13-gram survives
    assert rows == {(2, 100): 2, (3, 100): 2, (4, 100): 1}


def test_decontaminate_drops_and_thresholds(spark):
    from ontoweaver_spark.decontam import decontaminate

    corpus = _corpus(spark)
    ev = _df(spark, [(100, "what year did the treaty of westphalia end the "
                           "thirty years war in europe")])
    kept = {r["doc_id"] for r in decontaminate(corpus, ev, n=13).collect()}
    assert kept == {1, 5}
    # min_hits=2 tolerates the single-13-gram brush (doc 4 survives)
    kept2 = {r["doc_id"] for r in decontaminate(corpus, ev, n=13, min_hits=2).collect()}
    assert kept2 == {1, 4, 5}
    # schema passes through untouched
    assert decontaminate(corpus, ev).columns == corpus.columns


def test_decontam_short_docs_partial_ngram(spark):
    """Docs shorter than n still match their verbatim copies (the single
    partial n-gram), so short eval prompts are not silently unprotected."""
    from ontoweaver_spark.decontam import contamination_report

    corpus = _df(spark, [(1, "short prompt here"), (2, "short prompt here too")])
    ev = _df(spark, [(9, "short prompt here")])
    rows = {(r["doc_id"], r["eval_id"]) for r in
            contamination_report(corpus, ev, n=13).collect()}
    assert rows == {(1, 9)}  # doc 2's partial 13-gram includes 'too'


def test_decontam_broadcasts_eval_side(spark):
    """Scale shape: the eval n-gram set must arrive via BroadcastExchange —
    a shuffled (SortMerge) join of the corpus would be the 100-TB killer."""
    from ontoweaver_spark.decontam import contamination_report

    plan = contamination_report(
        _corpus(spark), _df(spark, [(100, "a b c")])
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastExchange" in plan
