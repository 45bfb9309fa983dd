

def test_semantic_dedup_drops_paraphrase_keeps_unique(spark):
    """SemDeDup semantics: a near-identical embedding (paraphrase) with a
    higher id is dropped; orthogonal vectors all keep; the drop decision
    never crosses clusters."""
    from ontoweaver_spark.similarity import semantic_dedup

    dim = 8

    def v(*hot):
        out = [0.0] * dim
        for i, w in hot:
            out[i] = w
        return out

    rows = [
        (0, v((0, 1.0))),                 # centroid seed / unique
        (1, v((1, 1.0))),                 # centroid seed / unique
        (2, v((0, 0.98), (1, 0.05))),     # near-dup of 0 -> dropped
        (3, v((0, 0.97), (1, 0.08))),     # near-dup of 0/2 -> dropped
        (4, v((1, 0.9), (0, -0.3))),      # same cluster as 1, cos ~0.94 -> dropped at 0.9? cos(1,4)=0.9/|v4| -> check below
        (5, v((2, 1.0), (3, 1.0))),       # diagonal, its own direction
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, threshold=0.95, n_clusters=2).collect()}
    assert len(out) == 6
    assert out[0]["keep"] and out[1]["keep"]
    assert not out[2]["keep"] and not out[3]["keep"]
    assert out[5]["keep"]                  # unique direction survives
    # vec 4: cos to 1 is 0.9/sqrt(0.81+0.09)=0.9487 < 0.95 -> kept
    assert out[4]["keep"]
    # lowering the threshold flips it
    out2 = {r["vec_id"]: r["keep"]
            for r in semantic_dedup(df, threshold=0.9, n_clusters=2).collect()}
    assert not out2[4]


def test_semantic_dedup_partition_invariant(spark):
    """Same decisions regardless of input partitioning (deterministic
    centroids + exact tie-breaks)."""
    import random

    from ontoweaver_spark.similarity import semantic_dedup

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    # add exact duplicates to guarantee drops
    rows += [(100 + i, rows[i][1]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    a = sorted(map(tuple, semantic_dedup(df.repartition(1), 0.8, 4).collect()))
    b = sorted(map(tuple, semantic_dedup(df.repartition(13), 0.8, 4).collect()))
    assert a == b
    kept = {t[0]: t[2] for t in a}
    for i in range(5):
        assert kept[i] and not kept[100 + i]   # dup family: lowest id wins
