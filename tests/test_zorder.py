"""Goldens for Z-order layout keys: bit interleaving, clamping,
quadrant locality, and the range-partitioned write layout."""

import pytest
import pyspark.sql.functions as F

from ontoweaver_spark.layout import zorder_key, zorder_layout


def test_interleave_hand_computed(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (3, 2)], ["x", "y"]
    )
    got = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()}
    # x bit i -> position 2i, y bit i -> position 2i+1
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3,
                   (2, 3): 14, (3, 2): 13}


def test_clamping_and_three_columns(spark):
    df = spark.createDataFrame([(-5, 70000, 2)], ["a", "b", "c"])
    row = df.select(zorder_key(["a", "b"], bits=16).alias("z")).collect()[0]
    # a clamps to 0, b clamps to 65535 -> all odd bit positions set
    assert row["z"] == 0xAAAAAAAA
    z3 = df.select(zorder_key(["a", "b", "c"], bits=8).alias("z")).collect()[0]["z"]
    # a=0, b=255 (bits at 3i+1), c=2 (bit1 -> pos 5)
    assert z3 == sum(1 << (3 * i + 1) for i in range(8)) + (1 << 5)


def test_key_width_guard(spark):
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)  # 64 > 63


def test_layout_partitions_are_curve_segments(spark):
    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    out = zorder_layout(df, ["x", "y"], bits=4, n_files=4)
    assert out.rdd.getNumPartitions() == 4
    # every partition holds one contiguous z-range: max of part i < min of i+1
    ranges = (
        out.withColumn("p", F.spark_partition_id())
        .groupBy("p").agg(F.min("_zkey").alias("lo"), F.max("_zkey").alias("hi"))
        .orderBy("p").collect()
    )
    for a, b in zip(ranges, ranges[1:]):
        assert a["hi"] <= b["lo"]
