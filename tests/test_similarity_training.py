"""Trained-centroid IVF: spherical k-means properties + recall."""

import math
import random

from pyspark.sql import functions as F

from ontoweaver_spark.similarity import (
    seed_centroids,
    topk_bruteforce,
    topk_ivf,
    train_centroids,
)


def _blobs(spark, n_per=40, dim=8, seed=11):
    """Three well-separated direction blobs on the 8-dim sphere."""
    rng = random.Random(seed)
    axes = [0, 3, 6]
    rows = []
    vid = 0
    for b, axis in enumerate(axes):
        for _ in range(n_per):
            v = [rng.gauss(0, 0.05) for _ in range(dim)]
            v[axis] += 1.0
            rows.append((vid, [float(x) for x in v], b))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, blob int"
    )


def test_train_centroids_cluster_purity(spark):
    df = _blobs(spark)
    cents = train_centroids(df, n_centroids=3, iters=5)
    # assign every vector to its trained centroid; each blob must map to
    # exactly one centroid and distinct blobs to distinct centroids
    from ontoweaver_spark.similarity import assign_centroid_df

    assigned = (
        df.crossJoin(F.broadcast(cents))
        .select("blob", assign_centroid_df(F.col("embedding")).alias("cid"))
        .groupBy("blob")
        .agg(F.countDistinct("cid").alias("n_cids"), F.first("cid").alias("cid"))
    ).collect()
    assert all(r["n_cids"] == 1 for r in assigned)
    assert len({r["cid"] for r in assigned}) == 3


def test_trained_ivf_beats_seeded_recall(spark):
    df = _blobs(spark)
    probes = df.where(F.col("vec_id").isin([0, 45, 85]))
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in topk_bruteforce(df, probes, k=5).collect()
    }
    cents = train_centroids(df, n_centroids=3, iters=4)
    approx = {
        (r["probe_id"], r["neighbor_id"])
        for r in topk_ivf(df, probes, k=5, nprobe=1, centroids=cents).collect()
    }
    recall = len(exact & approx) / len(exact)
    # nprobe=1 over trained lists: each probe's whole blob is in one list,
    # so the true neighbors (same blob) are all searchable
    assert recall == 1.0


def test_seed_centroids_shape(spark):
    df = _blobs(spark)
    row = seed_centroids(df, 4).first()
    cents = row["cents"]
    assert len(cents) == 4
    assert sorted(-s["neg_cid"] for s in cents) == [0, 1, 2, 3]
    assert all(len(s["cvec"]) == 8 for s in cents)
