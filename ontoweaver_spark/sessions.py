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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the columns of the
    LATEST ``right`` row with ``right.ts <= left.ts`` (``< `` when
    ``strict``) within the same ``by`` key — the point-in-time lookup
    (price as of trade time, last click before a view, feature state as
    of a label) that Spark has no native operator for.

    Implementation is the scale-canonical union + carry-forward: tag the
    sides, union them, and per ``by`` key sweep once in timestamp order
    carrying the last seen right-side payload (``last(ignorenulls)`` over
    an unbounded-preceding window), then keep the left rows. ONE shuffle
    keyed on ``by`` + one intra-partition sort — the same cost as
    sessionize, and crucially NOT a per-left-row subquery or a broadcast
    of either side: both sides stream through the sort at any size. At
    equal timestamps the right row sorts before (inclusive) or after
    (strict) the left row, which is exactly the <= / < boundary.

    ``right`` must be unique per ``(by, ts_col)`` — with duplicates the
    carried row is the struct-wise max at that timestamp (deterministic,
    but dedup upstream if you need a different policy). Left rows with no
    predecessor keep NULL right columns (left-join semantics, matching
    DuckDB's ASOF LEFT JOIN, which serves as this operator's independent
    oracle)."""
    right_cols = right_cols or [c for c in right.columns if c not in (by, ts_col)]
    payload = F.struct(*[F.col(c) for c in right_cols])
    l_tag, r_tag = (0, 1) if strict else (1, 0)
    lu = left.withColumn("_side", F.lit(l_tag)).withColumn("_p", F.lit(None).cast(
        right.select(payload.alias("_p")).schema["_p"].dataType.simpleString()
    ))
    ru = (
        right.select(F.col(by), F.col(ts_col), payload.alias("_p"))
        .withColumn("_side", F.lit(r_tag))
    )
    # align schemas: right rows carry nulls for the left payload columns
    left_only = [c for c in left.columns if c not in (by, ts_col)]
    for c in left_only:
        ru = ru.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lu.select(by, ts_col, "_side", "_p", *left_only).unionByName(
        ru.select(by, ts_col, "_side", "_p", *left_only)
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_last", F.last("_p", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == l_tag).select(
        by, ts_col, *left_only,
        *[F.col("_last").getField(c).alias(c + suffix) for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 600,
) -> DataFrame:
    """Interval (range) join: every ``left`` row paired with every
    ``intervals`` row of the same ``by`` key whose ``[start, end]`` span
    contains ``left.ts`` (inclusive both ends) — the event-in-window
    primitive (events during an incident, trades inside an auction).

    A naive theta-join is a per-key cross product. The scale shape here is
    TIME BUCKETING: both sides map onto ``bin_seconds``-wide epoch bins —
    the point side into its single bin, each interval exploded over the
    bins it overlaps — so the only shuffle is a hash join on
    ``(by, bin)``, then the exact containment predicate filters locally.
    Each qualifying pair meets in exactly ONE bin (the point's), so no
    dedup pass is needed. Cost: |intervals| x (span/bin + 1) exploded
    rows; pick ``bin_seconds`` near the typical span so that factor stays
    ~2. DuckDB executes the same query as a native inequality join
    (IEJoin) — an independent physical strategy the oracle checks against."""
    lb = left.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(ts_col)) / bin_seconds)
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds),
            )
        ),
    )
    joined = lb.join(iv, [by, "_bin"]).where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("_bin")


def validity_intervals(
    snapshots: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Collapse per-key recrawl snapshots into SCD2 validity intervals —
    the temporal-KG materialization step (the reference emits a static
    graph; a crawl re-fetches pages, so edge/property values need
    (valid_from, valid_to) lineage). One row per maximal run of consecutive
    equal values in ``ts`` order within a key:
    ``(key, value, valid_from, valid_to, n_snapshots, is_current)`` where
    ``valid_to`` is the NEXT run's first timestamp (exclusive upper bound)
    and NULL on the currently-valid run.

    Equal-``ts`` duplicates within a key are tolerated only if their values
    agree (ordering ties on (ts, value) keep runs deterministic).

    100-TB shape: everything is keyed on ``key_col`` — the lag/cumsum
    windows, the run rollup (grouping on (key, run) is co-located with the
    key-partitioned window output: HashPartitioning(key) satisfies the
    clustering requirement, so Spark adds NO second exchange), and the
    lead() that stitches valid_to. ONE shuffle total; per-key state is the
    snapshot history, never the corpus.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, value_col)
    chg = (
        F.when(F.lag(value_col).over(w).isNull(), 1)
        .when(F.lag(value_col).over(w) != F.col(value_col), 1)
        .otherwise(0)
    )
    runs = snapshots.select(
        key_col, ts_col, value_col, F.sum(chg).over(w).alias("_run")
    )
    per_run = runs.groupBy(key_col, "_run").agg(
        F.min(ts_col).alias("valid_from"),
        F.first(value_col).alias(value_col),
        F.count("*").alias("n_snapshots"),
    )
    w2 = Window.partitionBy(key_col).orderBy("_run")
    return per_run.select(
        key_col,
        value_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_snapshots",
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


def snapshot_at(
    intervals: DataFrame,
    at,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time view of SCD2 validity intervals: the rows valid AT
    ``at`` (``valid_from <= at < valid_to``, open-ended rows have NULL
    ``valid_to``) — the "what did the KG say on date X" query that makes
    :func:`validity_intervals` output usable as a temporal store. The
    interval invariant (per key, intervals partition the timeline) means
    the result has at most one row per key, and reconstructing snapshot
    N and diffing against snapshot N+1 is two of these plus
    ``graphstats.graph_diff``.

    Pure WHERE over the interval table — a partition-pruned scan when
    the table is written range-partitioned on ``valid_from``; no
    shuffle, no window.
    """
    a = F.lit(at)
    return intervals.where(
        (F.col(from_col) <= a)
        & (F.col(to_col).isNull() | (F.col(to_col) > a))
    )


def change_rate(
    snapshots: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    value_col: str = "value",
    as_of=None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-key recrawl change statistics -> ``(key, n_fetches,
    n_changes, first_ts, last_ts, change_ppm, est_change_interval[,
    staleness_ppm])`` — the freshness model that decides WHICH of 10^12
    pages to refetch next (Cho & Garcia-Molina, "Effective page refresh
    policies for web crawlers", TOIT 2003): pages are Poisson-changing
    processes, and the crawler's budget goes to the pages whose
    estimated change interval has most elapsed.

    Exact integers only: ``change_ppm = n_changes * scale DIV
    (n_fetches - 1)`` (the fraction of refetch gaps that observed a
    change; NULL on a single fetch), ``est_change_interval =
    (last_ts - first_ts) DIV n_changes`` (mean observed time between
    changes in ``ts`` units; NULL when nothing changed), and — when
    ``as_of`` is given — ``staleness_ppm = (as_of - last_ts) * scale
    DIV est_change_interval`` (elapsed fraction of the expected change
    interval: >= scale means the page has likely changed; sort
    descending and cut at budget for the refetch plan; NULL where the
    interval is unknown, i.e. never-changed pages, which a real
    scheduler refetches on a slow fixed cycle). ``as_of`` is a caller
    input, never wall-clock — determinism discipline. The ratio
    estimator undercounts when changes outpace fetches (Cho & G-M's
    ``-ln(1 - X/n)`` correction is the float refinement; the exact
    rational form keeps the ORDERING for any fixed fetch cadence, which
    is what the scheduler consumes).

    100-TB shape: one lag window + one rollup, both keyed on ``key_col``
    — HashPartitioning(key) satisfies the groupBy clustering, so ONE
    shuffle total and per-key state is the snapshot history, never the
    corpus (the validity_intervals argument, sessions.py:190).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, value_col)
    chg = (
        F.when(F.lag(value_col).over(w).isNull(), 0)
        .when(F.lag(value_col).over(w) != F.col(value_col), 1)
        .otherwise(0)
    )
    agg = (
        snapshots.select(key_col, ts_col, chg.alias("_chg"))
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum("_chg").alias("n_changes"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
    )
    out = agg.select(
        key_col, "n_fetches", "n_changes", "first_ts", "last_ts",
        F.when(
            F.col("n_fetches") > 1,
            F.expr(f"n_changes * CAST({scale} AS BIGINT) div (n_fetches - 1)"),
        ).alias("change_ppm"),
        F.when(
            F.col("n_changes") > 0,
            F.expr("(last_ts - first_ts) div n_changes"),
        ).alias("est_change_interval"),
    )
    if as_of is not None:
        out = out.withColumn(
            "staleness_ppm",
            F.when(
                F.col("est_change_interval") > 0,
                # exact BIGINT div — float `/` + cast rounds through a
                # double (the burst_windows lesson, sessions.py:334)
                F.expr(
                    f"(CAST({int(as_of)} AS BIGINT) - last_ts)"
                    f" * CAST({scale} AS BIGINT) div est_change_interval"
                ),
            ),
        )
    return out


def funnel(
    events: DataFrame,
    stages: list,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    horizon_minutes: int = None,
) -> DataFrame:
    """Ordered-funnel analysis -> one row per user who entered the funnel:
    ``(user, stages_completed, t_stage1 .. t_stageK)`` as exact
    ``unix_micros`` integers (NULL past the last completed stage).

    Earliest-completion semantics, the standard product-analytics contract:
    ``t_1`` is the user's first ``stages[0]`` event; ``t_k`` is the first
    ``stages[k-1]`` event STRICTLY after ``t_{k-1}`` (and, with
    ``horizon_minutes``, within that horizon of ``t_1``). Greedy earliest
    matching is optimal here: taking the earliest possible event for each
    stage can only leave more room for later stages, so a user completes
    the funnel under this rule iff any ordered assignment exists.

    Scale shape (10^12-event log): stage k is one filtered aggregation
    ``min(ts) GROUP BY user`` joined to the survivors of stage k-1 — K-1
    shuffles on the user key over strictly shrinking frames, never a
    per-user event collect (a hub user with 10^8 events costs its
    aggregation partials, not a row explosion). The raw event scan is
    re-filtered per stage so stage predicates push down to the source.
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    # cast handles TIMESTAMP_NTZ inputs (parquet naive timestamps)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("stage"),
        micros.alias("t"),
    )
    cur = (
        ev.where(F.col("stage") == stages[0])
        .groupBy("user")
        .agg(F.min("t").alias("t_1"))
    )
    if horizon_minutes is not None:
        cur = cur.withColumn(
            "_deadline", F.col("t_1") + F.lit(horizon_minutes * 60_000_000)
        )
    for k, stage in enumerate(stages[1:], start=2):
        nxt = (
            ev.where(F.col("stage") == stage)
            .join(cur.select("user", F.col(f"t_{k - 1}").alias("_prev"),
                             *(["_deadline"] if horizon_minutes is not None else [])),
                  "user")
            .where(
                (F.col("t") > F.col("_prev"))
                if horizon_minutes is None
                else (F.col("t") > F.col("_prev"))
                & (F.col("t") <= F.col("_deadline"))
            )
            .groupBy("user")
            .agg(F.min("t").alias(f"t_{k}"))
        )
        cur = cur.join(nxt, "user", "left")
    t_cols = [f"t_{k}" for k in range(1, len(stages) + 1)]
    reached = sum((F.col(c).isNotNull()).cast("int") for c in t_cols)
    return cur.select(
        "user", reached.alias("stages_completed"), *t_cols
    )


def burst_windows(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    factor: int = 3,
) -> DataFrame:
    """Rate-burst detection -> ``(key, bucket_start_us, n_events,
    n_buckets, total_events)`` for every (key, time-bucket) whose event
    count exceeds ``factor`` x the key's own average ACTIVE-bucket rate.
    The crawl-ops anomaly query: which host/user suddenly spiked
    against its own baseline (a global threshold would just re-rank
    keys by volume).

    Exact integer test — ``n_events * n_buckets > factor * total``
    avoids the float mean, so the result hash-matches any engine. One
    bucket-count aggregation plus one per-key rollup joined back
    (broadcast-sized: one row per active key); never a per-event
    window.
    """
    # exact BIGINT truncating division (Spark `div` == DuckDB `//` on
    # integers, both toward zero) — float division + cast('long') rounds
    # through a double, a latent boundary hazard for pre-1970 timestamps
    b = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {bucket_seconds * 1_000_000}"
    )
    per_bucket = (
        events.select(F.col(key_col).alias("key"), b.alias("bucket"))
        .groupBy("key", "bucket")
        .agg(F.count("*").alias("n_events"))
        .localCheckpoint(eager=False)
    )
    per_key = per_bucket.groupBy("key").agg(
        F.count("*").alias("n_buckets"), F.sum("n_events").alias("total_events")
    )
    return (
        per_bucket.join(per_key, "key")
        .where(
            F.col("n_events") * F.col("n_buckets")
            > F.lit(factor) * F.col("total_events")
        )
        .select(
            "key",
            (F.col("bucket") * bucket_seconds * 1_000_000).alias("bucket_start_us"),
            "n_events",
            "n_buckets",
            "total_events",
        )
    )


def allen_relations(
    df: DataFrame,
    entity_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """Allen interval-algebra classification of every interval pair per
    entity -> ``(entity, a, b, relation)`` (Allen, CACM'83) — the
    temporal-KG integrity primitive: two validity intervals for the same
    functional assertion (one CEO at a time, one canonical redirect at a
    time) that come out ``overlaps``/``contains``/``equals`` are a
    CONFLICT to reconcile, ``meets`` is a clean succession, ``before``
    an ordinary gap.

    Pairs are canonicalized by ``(start, end, id)`` lexicographic order
    (a = the earlier interval), which collapses Allen's 13 relations to
    the 7 canonical forms — before / meets / overlaps / finished_by /
    contains / starts / equals — with the 6 inverses implied by reading
    the pair backwards. Every comparison is exact integer (epoch-micros
    longs); no float, engine-bit-identical.

    Shape: one per-entity self-join bounded by versions-per-entity (the
    functional-property audit case is a handful of rows per key); the
    half-pair predicate keeps it n(n-1)/2 per entity. Intervals are
    half-open ``[start, end)``; zero-length and inverted intervals are
    rejected in-plan with a loud raise.
    """
    ent, s, e, rid = (
        F.col(entity_col), F.col(start_col), F.col(end_col), F.col(id_col)
    )
    base = df.select(
        ent.alias("_ent"),
        F.when(
            s.cast("long") >= e.cast("long"),
            F.raise_error(
                F.concat(
                    F.lit("allen_relations: empty or inverted interval for id "),
                    rid.cast("string"),
                )
            ),
        ).otherwise(s.cast("long")).alias("_s"),
        e.cast("long").alias("_e"),
        rid.alias("_rid"),
    )
    a, b = base.alias("a"), base.alias("b")
    first_is_a = (
        (F.col("a._s") < F.col("b._s"))
        | ((F.col("a._s") == F.col("b._s")) & (F.col("a._e") < F.col("b._e")))
        | (
            (F.col("a._s") == F.col("b._s"))
            & (F.col("a._e") == F.col("b._e"))
            & (F.col("a._rid") < F.col("b._rid"))
        )
    )
    p = a.join(b, (F.col("a._ent") == F.col("b._ent")) & first_is_a).select(
        F.col("a._ent").alias("entity"),
        F.col("a._rid").alias("a"),
        F.col("b._rid").alias("b"),
        F.col("a._s").alias("s1"), F.col("a._e").alias("e1"),
        F.col("b._s").alias("s2"), F.col("b._e").alias("e2"),
    )
    rel = (
        F.when((F.col("s1") == F.col("s2")) & (F.col("e1") == F.col("e2")), "equals")
        .when(F.col("s1") == F.col("s2"), "starts")
        .when(F.col("e1") < F.col("s2"), "before")
        .when(F.col("e1") == F.col("s2"), "meets")
        .when(F.col("e1") < F.col("e2"), "overlaps")
        .when(F.col("e1") == F.col("e2"), "finished_by")
        .otherwise("contains")
    )
    return p.select("entity", "a", "b", rel.alias("relation"))
