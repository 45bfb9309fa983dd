"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline. The probe set is
  broadcast (it is small by construction); the corpus side streams — no
  shuffle of the corpus, one narrow join.
- sign-bucketed (LSH-style) top-k: the scale path. Vectors bucket by the
  sign pattern of their leading dimensions (a fixed, data-independent set of
  axis-aligned hyperplanes — deterministic and oracle-reproducible); search
  only within the probe's bucket. At 100 TB the bucket join hash-partitions
  both sides by bucket key instead of broadcasting the corpus.

All dot products are F.zip_with + F.aggregate (JVM-side); results round to
4 decimals so a DuckDB oracle can value-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textops import round_ieee
from .session import stats_reset_checkpoint


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(v: Column, dims: int = 8) -> Column:
    """Deterministic LSH-ish bucket: sign bits of the first `dims` entries."""
    return sign_bucket_at(v, dims, 0)


def sign_bucket_at(v: Column, dims: int, offset: int) -> Column:
    """Sign-bit bucket over ``dims`` dimensions starting at ``offset``
    (0-based), wrapping modulo the vector length — the per-table hash for
    OR-amplified LSH (each table reads a disjoint dimension slice)."""
    def bit(i: int) -> Column:
        idx = (F.lit(offset + i) % F.size(v)) + 1 if offset else F.lit(i + 1)
        return F.when(F.element_at(v, idx) >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(i) for i in range(dims)])


def topk_bruteforce(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe (probe broadcast join).
    Deterministic ranking: (rounded cosine desc, neighbor id asc)."""
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id")).select(
        "probe_id", "neighbor_id", round_ieee(cosine(F.col("pv"), F.col("cv")), 4).alias("cos")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
    )


def _centroid_scores(v: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """array<struct<cos,neg_cid>> of cosine(v, centroid) for every centroid.

    The centroids enter the plan as ONE literal array<struct> and the cosine
    is ONE shared `transform` lambda — the expression tree is O(dims *
    n_centroids) literals + O(1) lambdas. Inlining a separate cosine
    expression per centroid (the previous shape) costs seconds of Catalyst
    analysis/codegen per query at n=8, and a when-cascade threading
    `best_cos` through predicate + otherwise doubles the tree per centroid
    (2^n copies after optimizer inlining — measured 10x slower than brute
    force). `neg_cid` so that max-by-sort ties resolve to the LOWEST cid."""
    cent_arr = F.array(*[
        F.struct(
            F.lit(-cid).alias("neg_cid"),
            F.array(*[F.lit(float(x)) for x in cvec]).alias("cvec"),
        )
        for cid, cvec in centroids
    ])
    return F.transform(
        cent_arr,
        lambda c: F.struct(cosine(v, c["cvec"]).alias("cos"), c["neg_cid"].alias("neg_cid")),
    )


def assign_centroid(v: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid id by cosine (ties -> lowest centroid id); one
    array_sort argmax over the shared-lambda score array — no UDF, no
    shuffle, linear expression size."""
    best = F.element_at(F.array_sort(_centroid_scores(v, centroids)), -1)
    return -best["neg_cid"]


def seed_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic seeding: the ``n_centroids`` lowest-id corpus vectors,
    packed as the one-row ``{cents: array<struct<neg_cid, cvec>>}`` frame
    that :func:`topk_ivf` broadcasts (centroids travel as DATA, never as
    expression literals)."""
    return (
        corpus.orderBy(id_col).limit(n_centroids)
        .agg(F.collect_list(
            F.struct((-F.col(id_col)).alias("neg_cid"), F.col(vec_col).alias("cvec"))
        ).alias("cents"))
    )


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Spherical k-means (Lloyd's) over the corpus — the trained-centroid
    path :func:`topk_ivf` is designed to swap in at scale.

    Distributed shape per iteration: assign = the same broadcast
    one-row-cents cross join as ``topk_ivf`` (corpus never shuffles for
    assignment); update = ONE groupBy(list_id) with ``dim`` component
    averages (map-side partials; n_centroids rows out). The mean is kept
    UN-normalized: only its direction matters because ``cosine()`` divides
    by both norms at use (see the inline comment at the update step).
    Empty clusters keep their previous centroid. The centroid frame is ``localCheckpoint``-ed per round so
    the plan stays O(1) across iterations. Deterministic seeding
    (:func:`seed_centroids`); float-sum ordering across partitions makes
    ~1-ulp wiggle possible, so trained centroids are property-tested, not
    oracle-hashed.
    """
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if dim_row is None:
        raise ValueError("train_centroids: empty corpus")
    dim = dim_row["d"]
    cents = seed_centroids(corpus, n_centroids, vec_col, id_col).localCheckpoint()

    for _ in range(iters):
        assigned = corpus.crossJoin(F.broadcast(cents)).select(
            F.col(vec_col).alias("v"),
            assign_centroid_df(F.col(vec_col)).alias("list_id"),
        )
        means = assigned.groupBy("list_id").agg(
            *[F.avg(F.element_at("v", i + 1)).alias(f"c{i}") for i in range(dim)]
        )
        # the component mean is NOT re-normalized: cosine() divides by both
        # norms at use, so only the mean's direction matters — and an inline
        # norm() inside a transform lambda would re-expand the dim-wide mean
        # expression per element (the O(dim^2) blowup class this module
        # already eliminated from centroid assignment)
        new = means.select(
            "list_id",
            F.array(*[F.col(f"c{i}").cast("double") for i in range(dim)]).alias("cvec"),
        )
        old = cents.select(F.explode("cents").alias("s")).select(
            (-F.col("s.neg_cid")).alias("list_id"), F.col("s.cvec").alias("old_cvec")
        )
        merged = old.join(new, "list_id", "left").select(
            "list_id", F.coalesce("cvec", "old_cvec").alias("cvec")
        )
        cents = merged.agg(F.collect_list(
            F.struct((-F.col("list_id")).alias("neg_cid"), F.col("cvec").alias("cvec"))
        ).alias("cents")).transform(stats_reset_checkpoint)
    return cents


def assign_centroid_df(v: Column) -> Column:
    """Nearest-centroid id against the broadcast one-row ``cents`` column
    (array_sort argmax, ties -> lowest cid); requires ``cents`` in scope
    via the crossJoin(broadcast(cents_frame)) pattern."""
    scored = F.array_sort(F.transform(
        F.col("cents"),
        lambda s: F.struct(cosine(v, s["cvec"]).alias("cos"),
                           s["neg_cid"].alias("neg_cid")),
    ))
    return -F.element_at(scored, -1)["neg_cid"]


def topk_ivf(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors partition into
    ``n_centroids`` lists by nearest centroid; each probe searches only its
    ``nprobe`` nearest lists.

    Centroids are deterministic — the ``n_centroids`` lowest-id corpus
    vectors (a k-means-free seeding that any engine can reproduce; swap in
    trained centroids at scale without changing the plan). Shuffle shape:
    the corpus is hash-partitioned once by list id; probes (small) broadcast
    with their probe-list array pre-exploded — at 100 TB this is one narrow
    join keyed on the list id, never a cross join.

    The centroid set travels as DATA — a one-row array<struct> broadcast
    cross-joined onto both sides — never as expression literals. (Embedding
    n_centroids copies of the vectors in the plan costs seconds of Catalyst
    analysis at n=8 and is unusable at a realistic n=4096; the broadcast
    keeps the expression tree O(1) and needs no driver collect at all.)

    Pass ``centroids`` (the one-row frame from :func:`train_centroids`) to
    search trained inverted lists; ``n_centroids`` is then ignored.
    """
    cents1 = (
        centroids
        if centroids is not None
        else seed_centroids(corpus, n_centroids, vec_col, id_col)
    )

    def scores(v: Column) -> Column:
        # array<struct<cos,neg_cid>>; ONE shared cosine lambda. array_sort's
        # last element = max cos, ties -> max neg_cid = lowest cid.
        return F.array_sort(F.transform(
            F.col("cents"),
            lambda s: F.struct(cosine(v, s["cvec"]).alias("cos"),
                               s["neg_cid"].alias("neg_cid")),
        ))

    c = corpus.crossJoin(F.broadcast(cents1)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        (-F.element_at(scores(F.col(vec_col)), -1)["neg_cid"]).alias("list_id"),
    )
    # per-probe nprobe nearest centroid lists, exploded to (probe, list_id)
    p = probes.crossJoin(F.broadcast(cents1)).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("pv"),
        F.explode(F.transform(
            F.slice(F.reverse(scores(F.col(vec_col))), 1, nprobe),
            lambda s: -s["neg_cid"],
        )).alias("list_id"),
    )
    scored = c.join(F.broadcast(p), "list_id").where(
        F.col("probe_id") != F.col("neighbor_id")
    ).select(
        "probe_id", "neighbor_id",
        round_ieee(cosine(F.col("pv"), F.col("cv")), 4).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
    )


def build_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    n_centroids: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Train k-means centroids and persist a queryable IVF index:

    - ``<index_dir>/centroids.parquet`` — the one-row ``cents`` frame
      (:func:`train_centroids` output, the exact shape ``topk_ivf``'s
      ``centroids=`` parameter consumes);
    - ``<index_dir>/lists.parquet`` — the corpus with its nearest-centroid
      ``list_id``, written ``partitionBy(list_id)`` so an nprobe query scans
      only its lists' partition directories (partition pruning is the IVF
      inverted-file read at rest).

    This is the user-facing scale path the trained centroids plug into
    (``python -m ontoweaver_spark.ann build`` wraps it). Returns a manifest
    dict with paths and counts."""
    import os

    cents = train_centroids(corpus, n_centroids, iters, vec_col, id_col)
    cents_path = os.path.join(index_dir, "centroids.parquet")
    lists_path = os.path.join(index_dir, "lists.parquet")
    cents.write.mode("overwrite").parquet(cents_path)
    assigned = corpus.crossJoin(F.broadcast(cents)).select(
        F.col(id_col), F.col(vec_col),
        assign_centroid_df(F.col(vec_col)).alias("list_id"),
    )
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(lists_path)
    return {
        "centroids": cents_path,
        "lists": lists_path,
        "n_centroids": n_centroids,
        "vec_col": vec_col,
        "id_col": id_col,
    }


def topk_ivf_indexed(
    spark,
    index_dir: str,
    probes: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Query a persisted :func:`build_ivf_index` index: probes assign to
    their ``nprobe`` nearest trained centroids, then join the pre-assigned
    list partitions (the ``list_id`` join key is the parquet partition
    column — pruning reads only the probed lists). Ranking rule matches
    ``topk_ivf`` exactly: (rounded cosine desc, neighbor id asc)."""
    import os

    cents = spark.read.parquet(os.path.join(index_dir, "centroids.parquet"))
    lists = spark.read.parquet(os.path.join(index_dir, "lists.parquet"))

    def scores(v: Column) -> Column:
        return F.array_sort(F.transform(
            F.col("cents"),
            lambda s: F.struct(cosine(v, s["cvec"]).alias("cos"),
                               s["neg_cid"].alias("neg_cid")),
        ))

    p = probes.crossJoin(F.broadcast(cents)).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("pv"),
        F.explode(F.transform(
            F.slice(F.reverse(scores(F.col(vec_col))), 1, nprobe),
            lambda s: -s["neg_cid"],
        )).alias("list_id"),
    )
    c = lists.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "list_id"
    )
    scored = c.join(F.broadcast(p), "list_id").where(
        F.col("probe_id") != F.col("neighbor_id")
    ).select(
        "probe_id", "neighbor_id",
        round_ieee(cosine(F.col("pv"), F.col("cv")), 4).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
    )


def topk_bucketed(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's sign bucket.
    Same ranking rule as brute force; recall trades off with bucket width."""
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("pv"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    scored = c.join(F.broadcast(p), "bucket").where(
        F.col("probe_id") != F.col("neighbor_id")
    ).select(
        "probe_id", "neighbor_id", round_ieee(cosine(F.col("pv"), F.col("cv")), 4).alias("cos")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.4,
    n_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    deduplication in EMBEDDING space: cluster the corpus, compare pairs
    only WITHIN each cluster, and drop every vector that has a
    lower-id neighbor at cosine >= threshold in its cluster. Returns one
    row per vector: ``(vec_id, cluster_id, keep)`` — the same
    actionable ``WHERE keep`` shape as :func:`dedup.dedup_decisions`,
    but firing on paraphrases and re-renderings that share no shingles
    (the dedup mode MinHash fundamentally cannot see).

    Clustering is the deterministic :func:`seed_centroids` assignment by
    default (oracle-reproducible in any engine); pass ``centroids`` from
    :func:`train_centroids` for real k-means lists at scale —
    the plan is identical either way.

    Scale shape: assignment is the broadcast one-row-cents cross join
    (corpus never shuffles to be assigned); the pair stage shuffles the
    corpus ONCE hash-partitioned by cluster_id and self-joins within
    partitions. The per-cluster quadratic is the documented SemDeDup
    trade — n_clusters is the knob that bounds it (the paper uses
    k=50000 for 100M+ docs, i.e. ~constant expected cluster size; size
    k so |cluster| ~ corpus/k stays O(10^3-10^4)). The keep decision is
    an anti-join of the corpus against the distinct dropped ids.
    """
    cents1 = (
        centroids
        if centroids is not None
        else seed_centroids(corpus, n_clusters, vec_col, id_col)
    )
    assigned = stats_reset_checkpoint(
        corpus.crossJoin(F.broadcast(cents1)).select(
            F.col(id_col),
            F.col(vec_col).alias("_v"),
            assign_centroid_df(F.col(vec_col)).alias("cluster_id"),
        ),
        eager=False,
    )
    left = assigned.select(
        F.col("cluster_id"), F.col(id_col).alias("_a"), F.col("_v").alias("_va")
    )
    right = assigned.select(
        F.col("cluster_id"), F.col(id_col).alias("_b"), F.col("_v").alias("_vb")
    )
    dropped = (
        left.join(right, "cluster_id")
        .where(F.col("_a") < F.col("_b"))
        .where(round_ieee(cosine(F.col("_va"), F.col("_vb")), 4) >= threshold)
        .select(F.col("_b").alias(id_col))
        .distinct()
    )
    return (
        assigned.select(id_col, "cluster_id")
        .join(dropped.withColumn("_dropped", F.lit(True)), id_col, "left")
        .select(
            id_col, "cluster_id",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("keep"),
        )
    )


def pq_codes(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization codes -> ``(id, codes: array<bigint>)``, one
    code per subspace — the vector-compression stage of an embedding
    pipeline (a 64-dim float vector becomes m small ints; at 10^12 vectors
    that is the difference between an index that fits and one that
    doesn't).

    The vector splits into ``m`` contiguous subspaces of ``dim/m``
    dimensions; each subvector is assigned to the nearest of ``k``
    codebook entries by squared L2, tie-broken by codebook id. The
    codebook is SEEDED: entry ``j`` is the matching subvector slice of
    the corpus vector with ``id == j`` (ids are contiguous from 0) — a
    deterministic, data-derived codebook that any engine reproduces with
    a filter, no trained state to ship. (Train a real codebook per
    subspace with :func:`train_centroids` and quantize against that for
    production recall; the assignment plan below is identical.)

    Exactness: distances are computed as ``dot(diff, diff)`` where diff
    casts to double BEFORE subtracting — a sequential left-fold in index
    order, the same association DuckDB's ``list_dot_product`` uses, then
    rounded (round_ieee) before the argmin, so codes are engine-exact.

    Scale shape: the k-row codebook broadcasts; assignment is ONE
    broadcast nested-loop join (n x k rows) with all m argmins computed
    in the SAME aggregate pass keyed on id — no shuffle of the vectors
    beyond that one aggregation, no per-subspace passes."""
    if dim % m:
        raise ValueError(f"dim ({dim}) must divide evenly into {m} subspaces")
    w = dim // m
    base = df.select(F.col(id_col), F.col(vec_col).alias("_v"))
    cb = base.where(F.col(id_col) < k).select(
        F.col(id_col).alias("_cid"), F.col("_v").alias("_cv")
    )
    joined = base.crossJoin(F.broadcast(cb))
    aggs = []
    for s in range(m):
        a = F.slice("_v", s * w + 1, w)
        b = F.slice("_cv", s * w + 1, w)
        diffs = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
        d = round_ieee(dot(diffs, diffs), 4)
        aggs.append(
            F.min(F.struct(d.alias("d"), F.col("_cid").alias("c"))).alias(f"_m{s}")
        )
    return (
        joined.groupBy(id_col)
        .agg(*aggs)
        .select(id_col, F.array(*[F.col(f"_m{s}.c") for s in range(m)]).alias("codes"))
    )


def profile_jaccard(
    df: DataFrame,
    key_col: str,
    item_col: str,
    max_item_df: int | None = None,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Pairwise Jaccard similarity between KEYS by their item sets ->
    ``(key_a, key_b, shared, size_a, size_b, jaccard)`` with
    ``key_a < key_b`` — host-profile similarity (which sites cover the
    same keyword vocabulary), source-overlap audits, and the set-level
    generalization of document n-gram Jaccard (dedup.jaccard_candidates
    works on docs; this works on any grouping).

    Inverted-index join: distinct (item, key) postings self-join per
    item, so only keys that SHARE an item ever meet — never a cartesian
    over keys. ``max_item_df`` drops items shared by more than that many
    keys before the join (the stop-shingle cap of dedup.py applied to
    profiles: an item present in every key contributes pairs
    quadratically and information zero). Counts are exact integers; the
    one FP division is performed identically in any ANSI engine.
    """
    posts = df.select(
        F.col(item_col).alias("item"), F.col(key_col).cast("string").alias("key")
    ).distinct()
    if max_item_df is not None:
        hot = posts.groupBy("item").agg(F.count("*").alias("_df")).where(
            F.col("_df") > max_item_df
        ).select("item")
        posts = posts.join(F.broadcast(hot), "item", "left_anti")
    sizes = posts.groupBy("key").agg(F.count("*").alias("size"))
    a = posts.select("item", F.col("key").alias("key_a"))
    b = posts.select("item", F.col("key").alias("key_b"))
    shared = (
        a.join(b, "item")
        .where(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("shared"))
    )
    out = (
        shared.join(sizes.select(F.col("key").alias("key_a"), F.col("size").alias("size_a")), "key_a")
        .join(sizes.select(F.col("key").alias("key_b"), F.col("size").alias("size_b")), "key_b")
        .select(
            "key_a", "key_b", "shared", "size_a", "size_b",
            round_ieee(
                F.col("shared")
                / (F.col("size_a") + F.col("size_b") - F.col("shared"))
            ).alias("jaccard"),
        )
    )
    if min_jaccard > 0.0:
        out = out.where(F.col("jaccard") >= min_jaccard)
    return out


def hash_transe_rank(
    triples: DataFrame,
    candidates: DataFrame,
    dim: int = 4,
    mod: int = 1000,
    filtered: bool = False,
) -> DataFrame:
    """TransE link-prediction evaluation with integer-quantized hash
    embeddings -> ``(head, rel, tail, score, rank)`` — the KG-embedding
    eval harness (rank of the TRUE tail among all candidate corruptions
    under score ``||h + r - t||_1``; mean-rank / hits@k are one agg away).
    Embeddings here are deterministic md5-derived integers in [0, mod)
    per dimension, so scores and ranks are EXACT and engine-portable; in
    production the three ``_emb`` projections swap for joins against a
    trained embedding table — the ranking plan (broadcast candidates,
    per-triple min/count agg) is unchanged, which is the part that has to
    survive 10^12 triples.

    Shape: candidates (the corruption set — entity vocab or a sampled
    slice) broadcast against the triples; scores are ``dim`` JVM integer
    columns summed, no arrays, no Python; rank = one hash agg per triple
    counting strictly-better corruptions (the true tail ranks 1 + that,
    the standard "raw" protocol; equal scores do not hurt the true
    tail).

    ``filtered=True`` switches to the FILTERED protocol (Bordes et al.
    NIPS'13, the FB15k convention): a corruption that is itself a KNOWN
    true triple ``(head, rel, candidate)`` never counts against the
    evaluated tail — raw ranking unfairly penalizes triples whose
    (head, rel) has several true tails that all score well.  Shape: the
    known-tail sets are one ``collect_set`` keyed on (head, rel) joined
    onto the |t|-row scored frame BEFORE the candidate cross — never a
    join against the |t|x|cand| crossed frame — so the extra cost is one
    co-keyed shuffle of |t| rows plus an ``array_contains`` per crossed
    row; per-key array size is bounded by the (head, rel) out-degree,
    which is bounded by the entity vocabulary, not the corpus.
    """
    from .textops import md5_int

    def emb(prefix: str, name, d: int) -> Column:
        return md5_int(F.concat(F.lit(prefix + ":"), name, F.lit(f":{d}"))) % mod

    def l1(tail_name) -> Column:
        return sum(
            F.abs(
                emb("e", F.col("head"), d) + emb("r", F.col("rel"), d)
                - emb("e", tail_name, d)
            )
            for d in range(dim)
        )

    t = triples.select("head", "rel", "tail").distinct()
    scored = t.withColumn("score", l1(F.col("tail")).cast("long"))
    if filtered:
        known = t.groupBy("head", "rel").agg(
            F.collect_set("tail").alias("_known_tails")
        )
        # same (head, rel) grouping key as the distinct above — AQE
        # co-partitions; the array rides along through the cross
        scored = scored.join(known, ["head", "rel"])
    cand = F.broadcast(candidates.select(F.col("candidate").cast("string")))
    crossed = scored.crossJoin(cand).withColumn(
        "_cscore", l1(F.col("candidate")).cast("long")
    )
    better = F.col("_cscore") < F.col("score")
    if filtered:
        # known-true corruptions never count; the evaluated tail itself
        # is in the set but ties with score, so raw never counted it
        # either — filtered is raw minus the OTHER true tails.
        better = better & ~F.array_contains("_known_tails", F.col("candidate"))
    ranked = crossed.groupBy("head", "rel", "tail", "score").agg(
        (1 + F.sum(better.cast("int"))).cast("int").alias("rank")
    )
    return ranked


def rank_metrics(ranked: DataFrame, ks: tuple = (1, 3, 10)) -> DataFrame:
    """KG-embedding evaluation rollup over a ``hash_transe_rank``-shaped
    frame -> ONE row ``(n, mrr_ppm, hits{k}_ppm ...)`` — the numbers every
    link-prediction paper reports (MRR, Hits@k), exact-integer so the
    result hash-matches any engine:

    - ``mrr_ppm  = sum(1_000_000 div rank) div n`` (reciprocal ranks as
      truncated ppm, then a truncated mean — both divisions BIGINT; the
      double-truncation is documented, deterministic, and within 1 ppm
      per term of the float MRR),
    - ``hits{k}_ppm = count(rank <= k) * 1_000_000 div n``.

    One map-side-combined aggregate over the ranked frame; composes with
    either protocol (raw / ``filtered=True``).
    """
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(1000000 div rank)").alias("_rr_sum"),
    ]
    for k in ks:
        aggs.append(
            F.sum((F.col("rank") <= k).cast("long")).alias(f"_h{k}")
        )
    row = ranked.agg(*aggs)
    out = [
        F.col("n").cast("long").alias("n"),
        F.expr("_rr_sum div n").cast("long").alias("mrr_ppm"),
    ]
    for k in ks:
        out.append(
            F.expr(f"_h{k} * 1000000 div n").cast("long").alias(f"hits{k}_ppm")
        )
    return row.select(*out)


def retrieval_metrics(
    results: DataFrame,
    k: int = 10,
    scale: int = 1_000_000,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query IR evaluation over a ranked result list with binary
    relevance -> ``(query_id, n_rel, ndcg_ppm, ap_ppm, p_at_k_ppm)`` —
    the retrieval-side twin of :func:`rank_metrics` (use that for KG
    link prediction, this for BM25/ANN search quality):

    - ``ndcg_ppm``: DCG@k with the binary gain table
      ``G[r] = trunc(scale / log2(r+1))`` (a LITERAL integer table baked
      at plan-build time — the only float touch happens in Python once,
      never in the engine, so Spark and any SQL oracle share identical
      constants), normalized by the ideal DCG over ``min(R, k)`` top
      slots; 0 when the query has no relevant docs.
    - ``ap_ppm``: average precision@k — mean over hit ranks r <= k of
      ``P@r = hits_so_far * scale div r``, divided by ``min(R, k)``.
    - ``p_at_k_ppm``: ``hits_at_k * scale div k``.

    ``R = n_rel`` counts relevant rows ANYWHERE in the query's result
    frame (judged-pool convention; relevance outside the frame is
    unknowable here). All arithmetic after the literal table is BIGINT
    truncating division — engine-portable and partition-independent.

    Shape: one rank<=k filter, one cumulative-count window PARTITIONED
    BY query (each partition is a <=k-row top-k list, so the window is
    bounded by construction, never corpus-scale), one per-query
    aggregate with map-side partials.
    """
    import math

    gains = {r: int(scale / math.log2(r + 1)) for r in range(1, k + 1)}
    gain_expr = "CASE " + " ".join(
        f"WHEN {rank_col} = {r} THEN {g}L" for r, g in gains.items()
    ) + " ELSE 0L END"
    per_q = results.groupBy(F.col(query_col).alias("query_id")).agg(
        F.sum(F.col(rel_col).cast("long")).alias("n_rel")
    )
    topk = (
        results.where(F.col(rank_col) <= k)
        .select(
            F.col(query_col).alias("query_id"),
            F.col(rank_col).alias("rank"),
            F.col(rel_col).cast("long").alias("rel"),
            F.expr(gain_expr).alias("gain"),
        )
        .withColumn("hits_so_far", F.sum("rel").over(
            Window.partitionBy("query_id").orderBy("rank")
        ))
    )
    scored = topk.groupBy("query_id").agg(
        F.sum(F.col("rel") * F.col("gain")).alias("dcg"),
        F.sum(
            F.when(
                F.col("rel") == 1,
                F.expr(f"hits_so_far * {scale} div rank"),
            ).otherwise(F.lit(0))
        ).alias("_ap_num"),
        F.sum("rel").alias("hits_at_k"),
    )
    # ideal DCG for R relevant docs = sum of the top min(R, k) gains
    ideal = {r: sum(gains[i] for i in range(1, r + 1)) for r in range(1, k + 1)}
    idcg_expr = "CASE " + " ".join(
        f"WHEN least(n_rel, {k}) = {r} THEN {g}L" for r, g in ideal.items()
    ) + " ELSE 0L END"
    return (
        per_q.join(scored, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.expr(
                f"CASE WHEN n_rel > 0 THEN"
                f" (coalesce(dcg, 0) * {scale}) div ({idcg_expr})"
                f" ELSE 0 END"
            ).cast("long").alias("ndcg_ppm"),
            F.expr(
                f"CASE WHEN n_rel > 0 THEN"
                f" coalesce(_ap_num, 0) div least(n_rel, {k})"
                f" ELSE 0 END"
            ).cast("long").alias("ap_ppm"),
            F.expr(f"coalesce(hits_at_k, 0) * {scale} div {k}")
            .cast("long").alias("p_at_k_ppm"),
        )
    )
