"""Structured Streaming front-end for the extraction pipeline.

The reference is batch-only (SURVEY.md §2.5); this is an engine extension:
because extraction is a row-local flatMap (zero shuffles), the SAME compiled
mapping runs unchanged on a streaming DataFrame — nodes/edges append to
staging sinks continuously, and fusion runs per micro-batch (foreachBatch
merging into the staging area) or as a terminal batch job over the staged
output (the pipeline's phase 2), which is the scalable pattern: continuous
cheap extraction, periodic global reconciliation.
"""

from __future__ import annotations

import os
from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession

from .compiler import compile_mapping
from .spec import MappingSpec, load_mapping


def stream_extract(
    stream_df: DataFrame,
    mapping: Union[dict, str, MappingSpec],
    affix: str = "none",
    type_affix_sep: str = ":",
) -> tuple[DataFrame, DataFrame]:
    """Compile the mapping against a streaming DataFrame -> streaming
    (nodes, edges). Works because the extraction plan is stateless
    (projection + explode only). ``rowIndex`` subjects are rejected — a
    global contiguous index does not exist on an unbounded stream."""
    spec = mapping if isinstance(mapping, MappingSpec) else load_mapping(mapping)
    if spec.uses_row_index():
        raise ValueError(
            "rowIndex subjects are not defined on unbounded streams; "
            "use a content-derived subject (e.g. url) instead"
        )
    res = compile_mapping(stream_df, spec, affix=affix, type_affix_sep=type_affix_sep)
    return res.nodes, res.edges


def stream_dedup_pages(
    stream_df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
    canonicalize: bool = False,
) -> DataFrame:
    """Streaming URL-level dedup for a continuous crawl feed: keep the first
    page seen per ``key`` within the watermark horizon.

    Idiomatic Structured Streaming — ``dropDuplicatesWithinWatermark``
    evicts a key's state once the watermark passes the event time at which
    it was first seen, so state stays proportional to the key arrival rate
    x horizon, not to the total 10^12-key history. (Plain
    ``dropDuplicates([key])`` would only evict state if the event-time
    column were PART of the dedup key — with a key-only dedup its state
    grows without bound on a continuous feed.) Exact global dedup across
    all time belongs to the batch fusion stage; this trims intra-window
    repeats before they hit staging.

    ``canonicalize=True`` dedups on ``urls.canonical_url(key)`` instead of
    the raw string, so case/port/tracking-param variants of one page
    collapse in-stream (the stateless projection composes freely with the
    stateful dedup); the original ``key`` column is preserved."""
    from pyspark.sql import functions as F

    if not canonicalize:
        return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([key])
    from .urls import canonical_url

    return (
        stream_df.withColumn("_ow_canon", canonical_url(F.col(key)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_ow_canon"])
        .drop("_ow_canon")
    )


def windowed_crawl_rate(
    stream_df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed aggregation: pages per (host, event-time
    window). Late pages within the watermark horizon still update their
    window; older state is evicted, so state size is bounded by
    (hosts x horizon/window) regardless of total stream length. Output is
    append-able once a window passes the watermark (the standard
    late-data-tolerant crawl-rate metric)."""
    from pyspark.sql import functions as F

    host = F.regexp_extract(F.col(url_col), r"^https?://([^/]+)", 1)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), host.alias("host"))
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("win.start").alias("window_start"), "host", "n_pages")
    )


HOST_STATS_SCHEMA = "host string, n_pages long, n_batches long"
_HOST_STATE_SCHEMA = "n_pages long, n_batches long"


def host_crawl_stats(stream_df: DataFrame, url_col: str = "url") -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    running per-host page counts over a continuous crawl feed — the crawl
    accounting a 10^12-document ingest needs (budget enforcement, hub
    monitoring). State is one small row per host (GroupState, stored in the
    state store, checkpointed with the query); each micro-batch emits the
    updated totals for hosts it touched.

    The reference is batch-only (SURVEY.md §2.5); this is the engine-native
    pattern for operators Spark's built-ins can't express statelessly.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            total, batches = state.get
        else:
            total, batches = 0, 0
        total += n
        batches += 1
        state.update((total, batches))
        yield pd.DataFrame({"host": [key[0]], "n_pages": [total], "n_batches": [batches]})

    with_host = stream_df.withColumn(
        "_host", F.regexp_extract(F.col(url_col), r"^https?://([^/]+)", 1)
    )
    return with_host.groupBy("_host").applyInPandasWithState(
        update,
        outputStructType=HOST_STATS_SCHEMA,
        stateStructType=_HOST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_pages_to_staging(
    spark: SparkSession,
    source_dir: str,
    mapping: Union[dict, str, MappingSpec],
    out_dir: str,
    schema: Optional[str] = None,
    affix: str = "none",
    trigger_available_now: bool = True,
):
    """File-source streaming: watch ``source_dir`` for new parquet page
    files, extract continuously, append raw nodes/edges to staging parquet
    with checkpointing (exactly-once file-source semantics). Returns the
    two streaming queries."""
    reader = spark.readStream
    if schema:
        reader = reader.schema(schema)
    stream = reader.parquet(source_dir)
    nodes, edges = stream_extract(stream, mapping, affix=affix)

    queries = []
    for name, df in (("nodes", nodes), ("edges", edges)):
        writer = (
            df.writeStream.format("parquet")
            .option("path", os.path.join(out_dir, "staging_stream", name))
            .option("checkpointLocation", os.path.join(out_dir, "_checkpoints", name))
            .outputMode("append")
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        queries.append(writer.start())
    return queries

def _current_version(graph_dir: str) -> Optional[int]:
    try:
        with open(os.path.join(graph_dir, "CURRENT")) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def stream_upsert_graph(
    spark: SparkSession,
    source_dir: str,
    mapping: Union[dict, str, MappingSpec],
    graph_dir: str,
    schema: Optional[str] = None,
    affix: str = "none",
    reconciliate_sep: str = "|",
    salt: int = 0,
    max_files_per_trigger: Optional[int] = None,
    trigger_available_now: bool = True,
    keep_versions: int = 2,
):
    """The full continuous-crawl loop: watch ``source_dir`` for new page
    files, extract each micro-batch, and fold it into the fused graph with
    :func:`fusion.merge_into_graph` — so the graph is always fused and
    queryable. Per-batch COMPUTE is proportional to the batch (the history
    is touched by one join, never re-aggregated); per-batch STORAGE writes
    one full snapshot (copy-on-write, like an Iceberg overwrite commit) —
    superseded versions beyond ``keep_versions`` are pruned after each
    pointer swap, so disk stays O(keep_versions x graph), not O(batches).
    Keep >= 2 so in-flight readers of the previous CURRENT get a grace
    window.

    Snapshots are versioned (``graph_dir/v=N/{nodes,edges}``) and a
    ``CURRENT`` pointer file is swapped atomically (``os.replace``) only
    after version N+1 is fully written: readers never observe a partial
    graph, and version N stays immutable while serving as the merge input
    for N+1 (no read-overwrite hazard). If ``foreachBatch`` retries a batch
    after a crash between the pointer swap and the checkpoint commit, the
    re-merge is a NO-OP: node/edge fusion is a set-union monoid, and
    set-union is idempotent — re-folding the same batch cannot change the
    snapshot (the same associativity property test_fusion_invariance pins).

    Returns the streaming query."""
    from .fusion import merge_into_graph, reconciliate

    spec = mapping if isinstance(mapping, MappingSpec) else load_mapping(mapping)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        res = compile_mapping(batch_df, spec, affix=affix)
        cur = _current_version(graph_dir)
        if cur is None:
            fnodes, fedges = reconciliate(
                res.nodes, res.edges,
                reconciliate_sep=reconciliate_sep, raise_errors=False, salt=salt,
            )
        else:
            old_n = spark.read.parquet(os.path.join(graph_dir, f"v={cur}", "nodes"))
            old_e = spark.read.parquet(os.path.join(graph_dir, f"v={cur}", "edges"))
            fnodes, fedges = merge_into_graph(
                old_n, old_e, res.nodes, res.edges,
                reconciliate_sep=reconciliate_sep, raise_errors=False, salt=salt,
            )
        nxt = (cur or 0) + 1
        fnodes.write.mode("overwrite").parquet(os.path.join(graph_dir, f"v={nxt}", "nodes"))
        fedges.write.mode("overwrite").parquet(os.path.join(graph_dir, f"v={nxt}", "edges"))
        tmp = os.path.join(graph_dir, "CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, os.path.join(graph_dir, "CURRENT"))
        # prune superseded snapshots (keep the newest `keep_versions`).
        # Walk DOWN from the newest stale version until the first gap:
        # earlier versions were pruned by earlier batches, so this is
        # O(1) amortized per batch, not O(total batches) stat calls.
        import shutil

        v = nxt - max(keep_versions, 1)
        while v >= 1:
            stale = os.path.join(graph_dir, f"v={v}")
            if not os.path.isdir(stale):
                break
            shutil.rmtree(stale, ignore_errors=True)
            v -= 1

    os.makedirs(graph_dir, exist_ok=True)
    reader = spark.readStream
    if schema:
        reader = reader.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(graph_dir, "_checkpoints"))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_fetch_parse_join(
    fetches: DataFrame,
    parses: DataFrame,
    url_col: str = "url",
    fetch_ts_col: str = "fetch_ts",
    parse_ts_col: str = "parse_ts",
    max_lag: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Watermarked stream-stream INNER interval join: pair each fetch
    event with the parse events for the same url that land within
    ``max_lag`` AFTER the fetch — the crawl-pipeline correlation step
    (did the fetched page get parsed, and how long did it take?).

    Both sides carry a watermark and the join predicate bounds
    ``parse_ts`` to ``[fetch_ts, fetch_ts + max_lag]``, which is what
    lets Spark EVICT buffered state: a fetch older than
    ``watermark + max_lag`` can never match a future parse, so the state
    store stays bounded no matter how long the streams run — the
    unbounded-state trap of an unconstrained stream-stream join is a
    compile-time error avoided by construction here. Output rows append
    as soon as both sides arrive (inner join; per Spark semantics a
    fetch with no parse simply never emits — use the batch anti-join
    audit for missing-parse detection).

    Batch DataFrames run through the identical plan (watermark is a
    no-op in batch), so the batch join is the oracle for the streamed
    result on the same data.
    """
    from pyspark.sql import functions as F

    f = fetches.withWatermark(fetch_ts_col, watermark).alias("f")
    p = parses.withWatermark(parse_ts_col, watermark).alias("p")
    lag_expr = f"INTERVAL {max_lag}"
    cond = (
        (F.col(f"f.{url_col}") == F.col(f"p.{url_col}"))
        & (F.col(f"p.{parse_ts_col}") >= F.col(f"f.{fetch_ts_col}"))
        & (
            F.col(f"p.{parse_ts_col}")
            <= F.col(f"f.{fetch_ts_col}") + F.expr(lag_expr)
        )
    )
    return f.join(p, cond, "inner").select(
        F.col(f"f.{url_col}").alias("url"),
        F.col(f"f.{fetch_ts_col}").alias("fetch_ts"),
        F.col(f"p.{parse_ts_col}").alias("parse_ts"),
        (
            F.unix_micros(F.col(f"p.{parse_ts_col}").cast("timestamp"))
            - F.unix_micros(F.col(f"f.{fetch_ts_col}").cast("timestamp"))
        ).alias("lag_us"),
    )
