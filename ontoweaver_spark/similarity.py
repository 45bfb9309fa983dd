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
    return F.concat(*[
        F.when(F.element_at(v, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(dims)
    ])


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


def assign_centroid(v: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid id by cosine (ties -> lowest centroid id). The
    centroid set is small by construction, so the argmax unrolls to a
    when-cascade of JVM expressions — no UDF, no shuffle."""
    best_id, best_cos = F.lit(centroids[0][0]), F.lit(-2.0)
    first = True
    for cid, cvec in centroids:
        cv = F.array(*[F.lit(float(x)) for x in cvec])
        cos = cosine(v, cv)
        if first:
            best_id, best_cos = F.lit(cid), cos
            first = False
        else:
            better = cos > best_cos
            best_id = F.when(better, F.lit(cid)).otherwise(best_id)
            best_cos = F.when(better, cos).otherwise(best_cos)
    return best_id


def topk_ivf(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
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
    """
    cents = [
        (r[id_col], list(r[vec_col]))
        for r in corpus.orderBy(id_col).limit(n_centroids).collect()
    ]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        assign_centroid(F.col(vec_col), cents).alias("list_id"),
    )

    # per-probe nprobe nearest centroid lists, exploded to (probe, list_id)
    def probe_lists(v: Column) -> Column:
        scored = F.array(*[
            F.struct(cosine(v, F.array(*[F.lit(float(x)) for x in cvec])).alias("cos"),
                     F.lit(cid).alias("cid"))
            for cid, cvec in cents
        ])
        ordered = F.reverse(F.array_sort(scored))  # by (cos, cid) desc
        return F.transform(F.slice(ordered, 1, nprobe), lambda s: s["cid"])

    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("pv"),
        F.explode(probe_lists(F.col(vec_col))).alias("list_id"),
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
