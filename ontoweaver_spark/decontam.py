"""Train/eval decontamination: flag (and drop) training documents that
share long n-grams with an evaluation/benchmark set — the GPT-3/PaLM-style
13-gram overlap rule every serious pretraining pipeline runs before
training, so benchmark answers don't leak into the corpus.

Scale shape (the part that matters at 100 TB): the eval side is SMALL by
construction — benchmarks are KBs-to-MBs next to the corpus — so its
exploded n-gram set broadcasts. The corpus explodes its n-grams map-side
and hits a broadcast hash join: the 100-TB side is never shuffled; only
the matched (contaminated) pairs — a tiny set — flow into the per-pair
count aggregate. No reference analog exists (the reference is a KG
builder); this is part of the training-data operator family the engine
adds on top (VERDICT §LLM-data-pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_id_col: str | None = None,
    n: int = 13,
) -> DataFrame:
    """Every (corpus doc, eval doc) pair sharing >= 1 distinct word
    ``n``-gram -> ``(<id_col>, eval_id, n_shared)``.

    ``n=13`` is the published decontamination shape (GPT-3 appendix C /
    PaLM). Documents shorter than ``n`` tokens contribute their single
    partial n-gram (concat_ws skips the missing positions), so a verbatim
    short eval prompt still matches its verbatim copy. Eval docs that are
    literally in the corpus show up as identity pairs when ids coincide —
    that IS contamination, not noise.
    """
    eval_text_col = eval_text_col or text_col
    eval_id_col = eval_id_col or id_col
    ev = eval_df.select(
        F.col(eval_id_col).alias("eval_id"),
        F.explode(shingles(F.col(eval_text_col), n)).alias("ngram"),
    )
    corp = corpus.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("ngram")
    )
    return (
        corp.join(F.broadcast(ev), "ngram")
        .groupBy(id_col, "eval_id")
        .agg(F.count("*").alias("n_shared"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_id_col: str | None = None,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """The corpus minus every document sharing >= ``min_hits`` distinct
    ``n``-grams with ANY eval document (one broadcast anti-join; the
    contaminated-id set is small because contamination is rare)."""
    bad = (
        contamination_report(
            corpus, eval_df, text_col, id_col, eval_text_col, eval_id_col, n
        )
        .where(F.col("n_shared") >= min_hits)
        .select(id_col)
        .distinct()
    )
    return corpus.join(F.broadcast(bad), id_col, "left_anti")
