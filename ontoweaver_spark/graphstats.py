"""Graph analytics over the materialized KG: degrees, hubs, and the
degree histogram that drives skew decisions.

These are the operational queries a KG pipeline runs between builds:
``suggest_salt`` (fusion.py) estimates hot keys from a SAMPLE before
fusing; these run on the fused output to verify the skew profile and
feed the next run's salt choice. All plain aggregations — one shuffle
keyed by node id, map-side partials absorb the explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def degree_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node (node, out_deg, in_deg, degree) over a directed edge list.

    One union + one aggregation: each endpoint contributes a (node,
    is_out) row; the groupBy sums both directions in a single shuffle
    instead of aggregating out- and in-degree separately and joining.
    """
    ends = edges.select(
        F.col(src_col).alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i")
    ).unionAll(
        edges.select(F.col(dst_col).alias("node"), F.lit(0), F.lit(1))
    )
    return ends.groupBy("node").agg(
        F.sum("o").alias("out_deg"),
        F.sum("i").alias("in_deg"),
        F.count("*").alias("degree"),
    )


def top_hubs(
    edges: DataFrame, k: int = 20, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """The k highest-degree nodes (degree desc, node asc — deterministic).

    orderBy().limit(k) compiles to TakeOrderedAndProject — each partition
    keeps its local top-k and only k rows merge on the driver side. (A
    global row_number window here would instead drag all |V| rows into ONE
    partition; the rank is attached after the limit, over k rows.)"""
    top = (
        degree_stats(edges, src_col, dst_col)
        .orderBy(F.desc("degree"), F.asc("node"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("degree"), F.asc("node"))
    return top.withColumn("rank", F.row_number().over(w))


def degree_histogram(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(degree, n_nodes) — the distribution whose tail is the skew
    profile. Two aggregations, both map-side-combinable."""
    return (
        degree_stats(edges, src_col, dst_col)
        .groupBy("degree")
        .agg(F.count("*").alias("n_nodes"))
    )
