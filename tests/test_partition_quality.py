"""assign_edge_partitions + partition_quality (vertex-cut scoring)."""

import hashlib

from ontoweaver_spark.graphstats import (
    assign_edge_partitions,
    edge_partition_plan,
    partition_quality,
)


def _md5int(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _skewed(spark, hub_fanout=400, tail=50):
    rows = [("hub", f"t{i}") for i in range(hub_fanout)]
    rows += [(f"s{i}", f"t{i % 7}") for i in range(tail)]
    return spark.createDataFrame(rows, "src string, dst string")


def test_assignment_matches_python_hash_replay(spark):
    e = _skewed(spark)
    p = 8
    got = {
        (r.src, r.dst): (r.is_hub_edge, r.partition)
        for r in assign_edge_partitions(e, num_partitions=p,
                                        hub_threshold=100).collect()
    }
    for (s, d), (hub, part) in got.items():
        want_hub = s == "hub"
        want = (
            (_md5int(s) + _md5int(d)) % p if want_hub else _md5int(s) % p
        )
        assert (hub, part) == (want_hub, want), (s, d)


def test_plan_report_consistent_with_assignment(spark):
    e = _skewed(spark)
    plan = {r.partition: (r.n_edges, r.n_hub_edges)
            for r in edge_partition_plan(e, num_partitions=8,
                                         hub_threshold=100).collect()}
    from pyspark.sql import functions as F

    assigned = assign_edge_partitions(e, num_partitions=8, hub_threshold=100)
    agg = (
        assigned.groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("is_hub_edge").cast("long")).alias("h"))
        .collect()
    )
    got = {r.partition: (r.n, r.h) for r in agg}
    assert plan == got


def test_quality_vertex_cut_levels_the_hub(spark):
    """The hybrid cut must beat naive hash(src): lower balance_ppm at a
    modest replication price (> 1.0 only because the hub replicates)."""
    e = _skewed(spark)
    p = 8
    hybrid = partition_quality(
        assign_edge_partitions(e, num_partitions=p, hub_threshold=100), p
    ).collect()[0]
    naive = partition_quality(
        assign_edge_partitions(e, num_partitions=p, hub_threshold=10**9), p
    ).collect()[0]
    assert naive.balance_ppm >= 7_000_000      # hub partition holds ~all
    assert hybrid.balance_ppm < naive.balance_ppm // 3
    assert hybrid.replication_ppm > 1_000_000  # hub mirrored across parts
    assert naive.replication_ppm >= 1_000_000
    assert hybrid.n_edges == naive.n_edges == 450
    # exact-integer definitions
    assert hybrid.balance_ppm == hybrid.max_load * p * 10**6 // hybrid.n_edges
