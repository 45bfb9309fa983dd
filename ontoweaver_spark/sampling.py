"""Deterministic sampling operators for training-data pipelines.

A 100-TB corpus is rebalanced (downsample the head language, upsample rare
domains) and split (train/eval) BEFORE any expensive stage. Both are pure
per-row filters here — zero shuffle, fully pushable below downstream ops —
and deterministic: the keep/drop decision is a function of (key, seed)
only, so re-runs, resumed chunks, and different partitionings all select
the same rows (the same invariance contract as the fusion stage).

The hash is the md5-prefix integer (``textops.md5_int``) rather than
xxhash64 so every sample is reproducible in any engine that has md5 —
including the DuckDB oracle that verifies these operators bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .textops import md5_int

_BUCKETS = 1_000_000


def _bucket(key: Column, seed: int) -> Column:
    """Stable per-row bucket in [0, 1e6): md5 of 'seed:key'."""
    return F.pmod(
        md5_int(F.concat_ws(":", F.lit(str(seed)), key.cast("string"))),
        F.lit(_BUCKETS),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically:
    row kept iff ``hash(seed, key) mod 1e6 < fraction * 1e6``.

    ``fractions`` maps stratum value -> keep fraction (e.g. ``{"en": 0.1}``
    to downsample English 10x); unlisted strata keep ``default_fraction``.
    Unlike ``df.sampleBy`` (per-partition RNG: result changes with
    partitioning and Spark version) this is a pure Column predicate —
    reproducible anywhere, pushable to the scan, and exact per row: the
    same document is kept or dropped regardless of where it lands.
    """
    frac = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return df.where(_bucket(F.col(key_col), seed) < frac * _BUCKETS)


def hash_split(
    df: DataFrame,
    key_col: str,
    eval_fraction: float = 0.01,
    seed: int = 42,
) -> DataFrame:
    """Deterministic train/eval split: adds ``split`` ('train' | 'eval').

    Split by KEY hash, not row position, so (a) all duplicates / versions
    of a document land on the same side (no train-eval leakage through
    near-identical rows sharing a key), and (b) the assignment survives
    re-partitioning, appends, and resumes.
    """
    return df.withColumn(
        "split",
        F.when(
            _bucket(F.col(key_col), seed) < F.lit(float(eval_fraction)) * _BUCKETS,
            F.lit("eval"),
        ).otherwise(F.lit("train")),
    )

def temperature_mix_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Temperature-:math:`\\alpha` corpus rebalancing (the multilingual /
    multi-domain mixing rule: sample stratum *s* proportionally to
    :math:`p_s^{\\alpha}` instead of its raw share :math:`p_s`) as a pure
    downsampling filter — adds ``mix_rate`` and keeps each row iff its
    deterministic md5 bucket clears the stratum's rate.

    The keep rate is :math:`r_s = (n_{min}/n_s)^{1-\\alpha}` — the
    :math:`p_s^{\\alpha}` distribution normalized so the SMALLEST stratum
    keeps rate 1.0 (pure subsampling, no replication; ``alpha=1`` keeps
    everything, ``alpha=0`` equalizes all strata to the smallest's size).

    Cross-engine exactness: at the default ``alpha=0.5`` the rate is
    ``sqrt(n_min / n_s)`` — IEEE-754 ``sqrt`` and ``/`` are CORRECTLY
    ROUNDED in every conforming engine (unlike ``pow``/``ln``, which are
    only ~1-ulp), so rates and keep decisions are bit-identical between
    Spark and the DuckDB oracle. Other alphas use ``pow`` and carry the
    (~2^-50-probability) boundary hazard; the oracle query pins 0.5.

    Scale shape: one tiny stratum-count agg, its min broadcast back, then
    a broadcast hash join of the per-stratum rate onto the corpus — the
    wide side NEVER shuffles and the filter composes with scan pushdown
    of everything upstream. Deterministic in (key, seed): re-runs,
    resumes, and repartitions keep exactly the same rows.
    """
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n_s"))
    nmin = counts.agg(F.min("n_s").alias("n_min"))
    ratio = F.col("n_min").cast("double") / F.col("n_s").cast("double")
    if alpha == 0.5:
        rate = F.sqrt(ratio)
    elif alpha == 1.0:
        rate = F.lit(1.0)
    elif alpha == 0.0:
        rate = ratio
    else:
        rate = F.pow(ratio, F.lit(1.0 - float(alpha)))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        strata_col, rate.alias("mix_rate")
    )
    return df.join(F.broadcast(rates), strata_col).where(
        _bucket(F.col(key_col), seed) < F.col("mix_rate") * _BUCKETS
    )


def training_order(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 0,
    position_col: str = "position",
) -> DataFrame:
    """Deterministic global training order -> input columns +
    ``position_col`` (contiguous 0-based rank): the epoch-shuffle stage of
    a training-data pipeline. Rows are ordered by ``md5(seed ':' key)``
    with the key itself as tie-break — a reproducible pseudo-random
    permutation that changes completely per ``seed`` (one seed per epoch)
    yet is identical across re-runs, partitionings, and engines.

    Scale shape: Spark's ``orderBy`` is a RANGE-PARTITIONED distributed
    sort (sampled boundaries, every partition sorts locally — never a
    single-task global sort), and the rank comes from the lazy
    zip-with-index in :func:`ontoweaver_spark.compiler.with_row_index`
    (per-partition counts + broadcast offsets), NOT from a global
    ``row_number`` window, which would collapse the whole corpus into one
    task. Total cost: one exchange + one tiny counts aggregate.
    """
    from .compiler import with_row_index

    key = F.col(key_col)
    h = md5_int(F.concat_ws(":", F.lit(str(seed)), key.cast("string")))
    # materialize the sorted frame once: with_row_index fans it into two
    # consumers (per-partition counts + the indexed data) and each would
    # otherwise re-run the whole range-partitioned sort (verified in the
    # physical plan: two rangepartitioning exchanges without this)
    ordered = df.orderBy(h, key).localCheckpoint(eager=False)
    return with_row_index(ordered, position_col)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: int = 0,
    method: str = "priority",
) -> DataFrame:
    """Deterministic weighted sampling without replacement — the
    "sample documents proportionally to token count" stage. Weights must
    be positive; the randomness is ``md5(seed ':' key)``, so the sample is
    a pure function of (rows, seed): identical across re-runs,
    partitionings, and engines.

    - ``method="priority"`` (Ohlsson/Duffield priority sampling): keep the
      EXACTLY-k rows with largest priority ``w / u`` where ``u`` is the
      row's 60-bit hash (ties broken by key). Spark executes the top-k as
      TakeOrderedAndProject — per-partition heaps of size k, no global
      sort, no shuffle of the losers.
    - ``method="poisson"`` (expected-size-k inclusion sampling): keep rows
      where ``u / 2^60 < k * w / W`` (W = total weight) — a PURE FILTER
      with one tiny total-weight aggregate broadcast back; zero data
      shuffle, fully pushdown-composable, the form that survives any
      scale. Sample size is k in expectation, not exactly.

    Both comparisons happen in IEEE doubles produced by a single division
    of exact integers — bit-identical in any engine."""
    key = F.col(key_col)
    h = md5_int(F.concat_ws(":", F.lit(str(seed)), key.cast("string")))
    w = F.col(weight_col).cast("double")
    if method == "priority":
        prio = w / h.cast("double")
        return df.orderBy(prio.desc(), key).limit(k)
    if method == "poisson":
        total = df.agg(F.sum(F.col(weight_col)).cast("double").alias("_w_total"))
        return (
            df.crossJoin(F.broadcast(total))
            .where(h.cast("double") / F.lit(float(1 << 60)) < F.lit(float(k)) * w / F.col("_w_total"))
            .drop("_w_total")
        )
    raise ValueError(f"unknown method {method!r} (priority|poisson)")


def per_group_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly-min(k, |group|) rows PER GROUP, picked by md5 priority —
    the "give me 10k docs per language" stage that rate-based
    :func:`stratified_sample` can't promise (rates give binomial counts).
    Pure function of (rows, seed): the winners are the k smallest
    ``md5(seed ':' key)`` in each group, key tie-break, so re-runs,
    repartitionings, and a SQL engine all pick the same rows.

    Scale shape: ONE shuffle keyed on the group for the rank window; rows
    ranked past k are dropped before anything downstream. A group 100x
    hotter than the rest (web-scale 'en') makes that partition's sort
    bigger, not the output — for truly pathological skew, pre-filter with
    ``stratified_sample`` at ~2x the target rate, then exact-k here.
    """
    from pyspark.sql import Window

    h = md5_int(F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def interleaved_order(
    df: DataFrame,
    group_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
    position_col: str = "position",
) -> DataFrame:
    """Group-balanced global training order: rank r of EVERY group sorts
    before rank r+1 of any group (round-robin interleave), so a
    multilingual corpus feeds the trainer a language mix from step one
    instead of exhausting the biggest language first. Within a group the
    order is the md5(seed:key) epoch shuffle (same randomness contract as
    :func:`training_order`); within a rank, groups order by name. The
    result is a pure function of (rows, seed) — reproducible across
    re-runs, partitionings, and engines.

    Scale shape: one group-keyed rank window, then the same
    range-partitioned global sort + lazy zip-with-index as training_order
    (never a single-task global row_number). Two exchanges total.
    """
    from pyspark.sql import Window

    from .compiler import with_row_index

    h = md5_int(F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    ranked = df.withColumn("_rnk", F.row_number().over(w))
    ordered = ranked.orderBy("_rnk", group_col).localCheckpoint(eager=False)
    return with_row_index(ordered, position_col).drop("_rnk")


def apportion_budget(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer ``budget``
    across keys proportional to integer weights -> ``(key, weight,
    quota)`` with ``sum(quota) == budget`` exactly — the crawl-budget
    allocator (fetch slots per host proportional to host value) and the
    per-source sampling-quota planner for corpus mixing. Floating-point
    proportional splits never sum back to the budget; this is the
    standard exact-integer fix.

    base_i = floor(B*w_i / S), and the K = B - sum(base) leftover units
    go to the K largest remainders ((B*w_i) mod S, ties to the smaller
    key — a total order, so the allocation is deterministic).

    Shape: one global sum (broadcast back as data), one projection, one
    row_number over the KEY table ordered by remainder. Keys are hosts /
    sources — orders of magnitude fewer than rows; for key spaces too big
    for a single-task sort window, swap the row_number for the
    length_quantiles histogram threshold (same contract, two passes).
    ``B*w_i`` stays in LongType: caller guarantees B * max(w) < 2^63
    (true for any real budget/host-count pair; raise to DECIMAL if not).
    """
    from pyspark.sql import Window

    w = F.col(weight_col).cast("long")
    tot = df.agg(F.sum(w).alias("_S"), F.count("*").alias("_nk"))
    j = df.select(F.col(key_col).alias("key"), w.alias("weight")).crossJoin(
        F.broadcast(tot)
    )
    parts = j.select(
        "key",
        "weight",
        F.floor(F.lit(budget) * F.col("weight") / F.col("_S")).alias("_base"),
        ((F.lit(budget) * F.col("weight")) % F.col("_S")).alias("_rem"),
        F.col("_S"),
    )
    win = Window.orderBy(F.desc("_rem"), F.asc("key"))
    ranked = parts.withColumn("_rn", F.row_number().over(win))
    # K leftovers = budget - sum(base); sum(base) derivable per-row? No —
    # one more tiny agg over the KEY table, broadcast back.
    kdf = parts.agg((F.lit(budget) - F.sum("_base")).alias("_K"))
    return (
        ranked.crossJoin(F.broadcast(kdf))
        .select(
            F.col("key").alias(key_col),
            F.col("weight").alias(weight_col),
            (F.col("_base") + F.when(F.col("_rn") <= F.col("_K"), 1).otherwise(0))
            .cast("long")
            .alias("quota"),
        )
    )


def greedy_cover(
    pairs: DataFrame,
    k: int = 5,
    set_col: str = "set_id",
    item_col: str = "item",
    max_mask_sets: int = 48,
) -> DataFrame:
    """Greedy weighted set cover -> ``(pick_round, set_id, gain)``: pick
    up to ``k`` sets, each round the set covering the most NOT-yet-covered
    items (ties -> smallest set id), stopping early when no set adds
    anything. The classic (1 - 1/e) approximation — the crawl-seed
    question: which k hosts' vocabularies cover the most of the corpus?

    Deterministic by the (gain DESC, set_id ASC) total order, so a DuckDB
    oracle can replay the same k rounds. A set is never re-picked: after a
    pick its items are covered, so its residual gain is 0.

    Two shapes, chosen by |sets|:

    * ``|sets| <= max_mask_sets`` (the common crawl-seed case — dozens of
      hosts/sources): each item's set membership is ONE BIGINT bitmask,
      and greedy needs only the (bitmask -> item-count) histogram, whose
      cardinality is the number of distinct co-occurrence PATTERNS
      (<= distinct items, in practice tiny). One distributed agg builds
      the histogram; all k rounds replay driver-side as pure integer
      arithmetic — 2 jobs total instead of k+1, and the 10^12 items are
      touched exactly once.
    * ``|sets| > max_mask_sets``: the fully distributed loop — round r
      anti-joins the checkpointed pairs frame against the items of the
      r-1 picked sets (a cached-block filter, never a growing union of
      frames), one job per round, driver traffic one argmax row per
      round — NOT a per-item collect.
    """
    p = (
        pairs.select(
            F.col(set_col).cast("string").alias("s"), F.col(item_col).alias("i")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    spark = pairs.sparkSession

    set_ids = [r[0] for r in p.select("s").distinct().limit(max_mask_sets + 1).collect()]
    if len(set_ids) <= max_mask_sets:
        return _greedy_cover_mask(spark, p, k, sorted(set_ids))

    picks = []
    picked_ids: list[str] = []
    for r in range(1, k + 1):
        if picked_ids:
            covered = p.where(F.col("s").isin(picked_ids)).select("i")
            resid = p.join(covered, "i", "left_anti")
        else:
            resid = p
        gains = resid.groupBy("s").agg(F.count("*").alias("g"))
        # single-row argmax with (g DESC, s ASC) tie-break
        best = gains.agg(
            F.min_by(F.struct("s", "g"), F.struct((-F.col("g")).alias("ng"), F.col("s"))).alias("b")
        ).select("b.s", "b.g").first()
        if best is None or best["s"] is None or best["g"] == 0:
            break
        picks.append((r, best["s"], best["g"]))
        picked_ids.append(best["s"])
    return spark.createDataFrame(
        picks, "pick_round int, set_id string, gain long"
    )


def _greedy_cover_mask(spark, p, k, set_ids):
    """Bitmask fast path for :func:`greedy_cover` (|sets| <= 48): one
    distributed agg -> (membership-bitmask, item-count) histogram, then
    the greedy rounds are exact driver-side integer arithmetic over the
    histogram. Bit j of the mask = membership in ``set_ids[j]`` (sorted,
    so the (gain DESC, set_id ASC) tie-break is a first-max scan)."""
    bitval = F.create_map(
        *[x for j, s in enumerate(set_ids) for x in (F.lit(s), F.lit(1 << j).cast("long"))]
    )
    hist = (
        p.groupBy("i")
        .agg(F.collect_set("s").alias("ss"))
        .select(
            F.aggregate(
                "ss",
                F.lit(0).cast("long"),
                lambda acc, x: acc.bitwiseOR(bitval[x]),
            ).alias("mask")
        )
        .groupBy("mask")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    masks = [(r["mask"], r["cnt"]) for r in hist]
    picks = []
    covered_bits = 0
    for rnd in range(1, k + 1):
        best_j, best_gain = None, 0
        for j in range(len(set_ids)):  # sorted order => ties pick smallest id
            g = sum(c for m, c in masks if (m >> j) & 1 and not (m & covered_bits))
            if g > best_gain:
                best_j, best_gain = j, g
        if best_j is None:
            break
        picks.append((rnd, set_ids[best_j], best_gain))
        covered_bits |= 1 << best_j
    return spark.createDataFrame(
        picks, "pick_round int, set_id string, gain long"
    )


def skyline(
    df: DataFrame,
    dim_cols: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Pareto frontier (maximize every ``dim_cols``) -> the rows no other
    row dominates. p dominates q iff p >= q on ALL dims and p > q on at
    least one; rows equal on every dim are mutually undominated and all
    kept. The corpus-curation selection "longest AND highest-quality AND
    freshest — without picking arbitrary weights".

    Two-phase distributed skyline (the classic partition/merge shape):
    (1) per-partition local skyline via one Arrow-batched
    ``mapInPandas`` over only (id + dims) — a global skyline point is
    undominated everywhere, so it survives its own partition, making
    skyline(data) == skyline(union of local skylines); (2) the
    candidate union (log-factor sized for independent dims, NEVER the
    full corpus) merges through the same kernel on one partition. The
    wide row is never shuffled — survivors semi-join back by id.

    The kernel sorts descending-lexicographically and scans with a
    running frontier: a row is compared (vectorized) only against
    current frontier points, O(n * |skyline|) instead of the naive
    O(n^2) all-pairs that a pure-SQL NOT EXISTS would be.
    """
    import numpy as np
    import pandas as pd

    dims = list(dim_cols)
    proj = df.select(
        F.col(id_col).alias("_sk_id"),
        *[F.col(c).cast("double").alias(c) for c in dims],
    ).na.drop(subset=dims)
    schema = proj.schema

    def local_skyline(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(dims, ascending=False, kind="mergesort").reset_index(
            drop=True
        )
        vals = pdf[dims].to_numpy()
        frontier: list[int] = []
        fvals = np.empty((0, len(dims)))
        keep = np.zeros(len(pdf), dtype=bool)
        for i in range(len(pdf)):
            v = vals[i]
            if len(frontier):
                # dominated iff some frontier point >= on all dims and > on one
                ge = (fvals >= v).all(axis=1)
                gt = (fvals > v).any(axis=1)
                if bool((ge & gt).any()):
                    continue
            keep[i] = True
            frontier.append(i)
            fvals = np.vstack([fvals, v])
        yield pdf.loc[keep]

    local = proj.mapInPandas(local_skyline, schema=schema)
    merged = local.repartition(1).mapInPandas(local_skyline, schema=schema)
    return df.join(
        merged.select(F.col("_sk_id").alias(id_col)).distinct(), id_col, "left_semi"
    )
