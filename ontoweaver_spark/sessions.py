"""Gap-based sessionization over event streams — the standard web-scale
clickstream/crawl-log operator (split each user's events into sessions
wherever the gap to the previous event exceeds a threshold).

Two complementary shapes, both one shuffle keyed on the user:

- :func:`sessionize` — per-event session assignment via the classic
  lag + cumulative-sum-of-session-starts window pair. Use when downstream
  needs every event labeled (joins back, per-event features).
- :func:`session_stats` — per-session aggregates through Spark's NATIVE
  ``F.session_window`` (merged gap windows, the same operator Structured
  Streaming uses for stateful session aggregation — the batch and
  streaming paths share semantics). Use when only the rollup is needed.

All output timestamps are exact microsecond integers (``unix_micros``) so
a DuckDB oracle hash-matches bit-for-bit; FP-summed measures are
deliberately excluded (cross-engine float sum order is not reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = 30,
    session_col: str = "session_no",
) -> DataFrame:
    """Label every event with its 1-based per-user session number.

    A session starts at the user's first event and after any gap >
    ``gap_minutes``. ``order_col`` breaks equal-timestamp ties so the
    numbering is deterministic at any parallelism. Shuffle shape: ONE hash
    partition by user; both window passes (lag, running sum) run inside
    that single partition ordering — no second exchange."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    # cast handles TIMESTAMP_NTZ inputs (parquet naive timestamps);
    # epoch-exact because the engine session timezone is pinned to UTC
    # (session.py) — the same interpretation a naive epoch_us gives
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(tus).over(w)
    new_s = F.when(
        prev.isNull() | ((tus - prev) > gap_minutes * 60_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    return events.withColumn(
        session_col, F.sum(new_s).over(running).cast("long")
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregates via the native ``session_window`` operator:
    (user, session_start_us, session_end_us, n_events, first/last event).

    ``session_window``'s end is the last event + gap (Spark's definition);
    the start is the first event. Exact-integer outputs only — see module
    docstring. The same expression runs under Structured Streaming with a
    watermark for the continuous-crawl case."""
    sw = F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
    return (
        events.groupBy(F.col(user_col), sw.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.min(order_col).alias("first_event"),
            F.max(order_col).alias("last_event"),
        )
        .select(
            user_col,
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("session_start_us"),
            F.unix_micros(F.col("w.end").cast("timestamp")).alias("session_end_us"),
            "n_events", "first_event", "last_event",
        )
    )
