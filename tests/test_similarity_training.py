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


def test_ivf_index_build_query_end_to_end(spark, tmp_path):
    """The persisted trained-IVF path: build_ivf_index -> topk_ivf_indexed
    must return exactly what topk_ivf(centroids=trained) computes in-memory
    (same centroids, same ranking rule), and the lists parquet must be
    partitioned by list_id (partition pruning = inverted-file read)."""
    import os

    from ontoweaver_spark.similarity import build_ivf_index, topk_ivf_indexed

    df = _blobs(spark).select("vec_id", "embedding")
    idx = str(tmp_path / "ivf_index")
    manifest = build_ivf_index(df, idx, n_centroids=3, iters=4)
    assert any(d.startswith("list_id=") for d in os.listdir(manifest["lists"]))

    probes = df.where(F.col("vec_id").isin([0, 45, 85]))
    got = {
        tuple(r) for r in topk_ivf_indexed(spark, idx, probes, k=5, nprobe=1).collect()
    }
    cents = spark.read.parquet(manifest["centroids"])
    want = {
        tuple(r)
        for r in topk_ivf(df, probes, k=5, nprobe=1, centroids=cents).collect()
    }
    assert got == want and len(got) == 15


def test_ann_cli_build_and_query(spark, tmp_path):
    """python -m ontoweaver_spark.ann build/query round trip."""
    from ontoweaver_spark.ann import main

    corpus = str(tmp_path / "corpus.parquet")
    _blobs(spark).select("vec_id", "embedding").write.parquet(corpus)
    probes = str(tmp_path / "probes.parquet")
    _blobs(spark).where("vec_id < 2").select("vec_id", "embedding").write.parquet(probes)
    idx, out = str(tmp_path / "idx"), str(tmp_path / "hits.parquet")

    assert main(["build", corpus, idx, "--n-centroids", "3", "--master", "local[2]"]) == 0
    assert main(["query", idx, probes, out, "--k", "3", "--master", "local[2]"]) == 0
    hits = spark.read.parquet(out)
    assert hits.count() == 6  # 2 probes x k=3
    assert set(hits.columns) == {"probe_id", "neighbor_id", "cos", "rank"}
