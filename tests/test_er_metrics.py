"""fold_diacritics (DuckDB strip_accents parity) + blocking_metrics."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ontoweaver_spark.linking import (
    _FOLD_DST,
    _FOLD_SRC,
    blocking_metrics,
    fold_diacritics,
)


def test_fold_table_matches_duckdb_strip_accents():
    """The vendored table must be bit-identical to the installed DuckDB's
    strip_accents over the ENTIRE covered range, and must cover every
    1:1-foldable char in U+00C0-U+024F (nothing missing, nothing extra)."""
    want = {}
    for cp in range(0xC0, 0x250):
        ch = chr(cp)
        out = duckdb.sql("select strip_accents(?)", params=[ch]).fetchone()[0]
        if out != ch and len(out) == 1 and out.isascii():
            want[ch] = out
    assert dict(zip(_FOLD_SRC, _FOLD_DST)) == want


def test_fold_column(spark):
    df = spark.createDataFrame(
        [("Renée",), ("Černý",), ("François",), ("plain",), ("Æsir ß",)],
        "name string",
    )
    got = [r.f for r in df.select(fold_diacritics("name").alias("f")).collect()]
    assert got == ["Renee", "Cerny", "Francois", "plain", "Æsir ß"]


def test_blocking_metrics_exact(spark):
    # universe of 5 records -> 10 total pairs
    cand = spark.createDataFrame(
        [("r2", "r1"), ("r1", "r2"), ("r3", "r4"), ("r1", "r5"), ("r1", "r1")],
        "a string, b string",
    )  # canonicalizes to 3 pairs (self-pair dropped, direction collapsed)
    gold = spark.createDataFrame(
        [("r1", "r2"), ("r2", "r3")], "a string, b string"
    )
    row = blocking_metrics(cand, gold, n_records=5).collect()[0]
    assert (row.n_candidates, row.n_gold, row.n_matched, row.total_pairs) == (
        3, 2, 1, 10,
    )
    assert row.reduction_ratio_ppm == (10 - 3) * 1_000_000 // 10
    assert row.pair_completeness_ppm == 500_000
    assert row.pair_quality_ppm == 1_000_000 // 3


def test_blocking_metrics_zero_denominators(spark):
    empty = spark.createDataFrame([], "a string, b string")
    row = blocking_metrics(empty, empty, n_records=1).collect()[0]
    assert row.total_pairs == 0
    assert row.reduction_ratio_ppm is None
    assert row.pair_completeness_ppm is None
    assert row.pair_quality_ppm is None


def _bcubed_replay(pred, gold):
    from collections import Counter
    common = set(pred) & set(gold)
    ps = Counter(pred[i] for i in common)
    gs = Counter(gold[i] for i in common)
    it = Counter((pred[i], gold[i]) for i in common)
    n = len(common)
    P = sum(it[(pred[i], gold[i])] * 10**6 // ps[pred[i]] for i in common) // n
    R = sum(it[(pred[i], gold[i])] * 10**6 // gs[gold[i]] for i in common) // n
    F = 2 * P * R // (P + R) if P + R else None
    return n, P, R, F


def test_bcubed_textbook_and_replay(spark):
    # classic example: gold {a,b,c},{d,e}; predicted merges everything
    pred = {x: "p0" for x in "abcde"}
    gold = {**{x: "g0" for x in "abc"}, **{x: "g1" for x in "de"}}
    pdf = spark.createDataFrame(list(pred.items()), "id string, cluster string")
    gdf = spark.createDataFrame(list(gold.items()), "id string, cluster string")
    from ontoweaver_spark.linking import bcubed_metrics

    row = bcubed_metrics(pdf, gdf).collect()[0]
    n, P, R, F = _bcubed_replay(pred, gold)
    assert (row.n_records, row.bcubed_precision_ppm,
            row.bcubed_recall_ppm, row.bcubed_f1_ppm) == (n, P, R, F)
    assert row.bcubed_recall_ppm == 1_000_000        # over-merge: recall 1
    assert row.bcubed_precision_ppm < 1_000_000      # ... precision pays
    # perfect clustering scores exactly 10^6 everywhere
    perfect = bcubed_metrics(gdf, gdf).collect()[0]
    assert (perfect.bcubed_precision_ppm, perfect.bcubed_recall_ppm,
            perfect.bcubed_f1_ppm) == (1_000_000, 1_000_000, 1_000_000)
