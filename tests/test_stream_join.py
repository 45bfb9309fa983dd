"""Watermarked stream-stream interval join: the streamed result must
equal the identical plan run in batch over the same files (watermarks
are no-ops in batch), including the boundary cases (parse exactly at
fetch_ts, exactly at fetch_ts + max_lag, just past it, and wrong-url)."""

import datetime as dt

from pyspark.sql import functions as F


def _write_sources(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    fetches = [
        ("u1", ts(0)), ("u2", ts(5)), ("u3", ts(10)), ("u4", ts(15)),
    ]
    parses = [
        ("u1", ts(0)),    # boundary: parse == fetch -> matches
        ("u1", ts(10)),   # boundary: parse == fetch + max_lag -> matches
        ("u2", ts(16)),   # 11 min after fetch -> past max_lag, no match
        ("u3", ts(12)),   # inside window -> matches
        ("u3", ts(9)),    # BEFORE its fetch -> no match
        ("u9", ts(15)),   # unknown url -> no match
    ]
    fdir, pdir = str(tmp_path / "f"), str(tmp_path / "p")
    spark.createDataFrame(fetches, "url string, fetch_ts timestamp").coalesce(
        1
    ).write.parquet(fdir)
    spark.createDataFrame(parses, "url string, parse_ts timestamp").coalesce(
        1
    ).write.parquet(pdir)
    return fdir, pdir


def test_stream_join_matches_batch_and_bounds(spark, tmp_path):
    from ontoweaver_spark.streaming import stream_fetch_parse_join

    fdir, pdir = _write_sources(spark, tmp_path)
    fs = "url string, fetch_ts timestamp"
    ps = "url string, parse_ts timestamp"

    batch = stream_fetch_parse_join(
        spark.read.schema(fs).parquet(fdir),
        spark.read.schema(ps).parquet(pdir),
        max_lag="10 minutes",
    )
    want = {tuple(r) for r in batch.collect()}
    # the three expected matches, spelled out
    assert len(want) == 3
    assert {r[0] for r in want} == {"u1", "u3"}
    lags = sorted(r[3] for r in want)
    assert lags == [0, 2 * 60_000_000, 10 * 60_000_000]

    streamed = stream_fetch_parse_join(
        spark.readStream.schema(fs).parquet(fdir),
        spark.readStream.schema(ps).parquet(pdir),
        max_lag="10 minutes",
    )
    assert streamed.isStreaming
    q = (
        streamed.writeStream.format("memory")
        .queryName("fp_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM fp_join").collect()}
    assert got == want
