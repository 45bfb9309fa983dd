"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media as ``binary`` columns with
a metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so each task processes
whole record batches without JVM<->Python row churn.

The image/audio codec libraries are not available in this container, so the
DECODE step is stubbed with a deterministic fake (clearly marked); the
Spark-side plumbing — schema, batch iteration, partitioning, UDF signatures
— is real and tested. Swapping the stub for Pillow/ffmpeg is a one-function
change per modality.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, mime:string>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, n_bytes int, "
    "phash bigint, brightness double"
)

FRAME_SAMPLE_SCHEMA = "media_id bigint, frame_idx int, frame_hash bigint"


def _decode_image_stub(payload: bytes) -> dict:
    """STUB decode: deterministic fake pixel statistics derived from the
    payload hash. Replace with a real decoder (PIL.Image.open) when the
    codec libraries are present — the call signature is the contract."""
    h = hashlib.md5(payload or b"").digest()
    return {
        "width": 16 + h[0],
        "height": 16 + h[1],
        "brightness": h[2] / 255.0,
        "phash": int.from_bytes(h[4:12], "big", signed=True),
    }


def image_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches).

    Input: MEDIA_SCHEMA rows with kind='image'. Output: IMAGE_FEATURES_SCHEMA.
    The decode itself is the stub above; everything around it (filter
    pushdown on kind, batch shape, output schema) is production-shaped.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [_decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "n_bytes": [len(p or b"") for p in pdf["payload"]],
                "phash": [f["phash"] for f in feats],
                "brightness": [round(f["brightness"], 4) for f in feats],
            })

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, sample_rate int, n_bytes int, duration_s double, loudness double"
)

RESIZE_SCHEMA = "media_id bigint, width int, height int, payload binary"


def audio_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract audio via mapInPandas. Decode is the same
    deterministic stub pattern as images (no codec libs in this container);
    duration derives from payload length at the metadata sample rate, the
    schema/batch plumbing is the production shape."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n_bytes = [len(p or b"") for p in pdf["payload"]]
            sr = [int(s or 16000) for s in pdf["sample_rate"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "sample_rate": sr,
                "n_bytes": n_bytes,
                # stub decode: 2 bytes/sample mono
                "duration_s": [round(n / (2 * s), 4) for n, s in zip(n_bytes, sr)],
                "loudness": [
                    round(hashlib.md5(p or b"").digest()[3] / 255.0, 4)
                    for p in pdf["payload"]
                ],
            })

    return (
        media.where(F.col("kind") == "audio")
        .select("media_id", "payload", F.col("meta.sample_rate").alias("sample_rate"))
        .mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)
    )


def image_resize(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize images to fit ``max_dim`` (aspect-preserving). The pixel
    resample is stubbed (payload hashed to a deterministic thumbnail
    token); dimension math and the Arrow-batched plumbing are real."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ws, hs, payloads = [], [], []
            for w, h, p in zip(pdf["width"], pdf["height"], pdf["payload"]):
                w, h = int(w or 1), int(h or 1)
                scale = min(1.0, max_dim / max(w, h))
                ws.append(max(1, int(w * scale)))
                hs.append(max(1, int(h * scale)))
                payloads.append(hashlib.md5((p or b"") + b"|thumb").digest())
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "width": ws, "height": hs, "payload": payloads,
            })

    return (
        media.where(F.col("kind") == "image")
        .select(
            "media_id", "payload",
            F.col("meta.width").alias("width"), F.col("meta.height").alias("height"),
        )
        .mapInPandas(resize, schema=RESIZE_SCHEMA)
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample every Nth frame of video payloads (stubbed frame extraction:
    deterministic hash per sampled frame index). One output row per
    (video, sampled frame)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                for i in range(0, int(n_frames or 0), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    d = hashlib.md5((payload or b"") + i.to_bytes(4, "big")).digest()
                    hashes.append(int.from_bytes(d[:8], "big", signed=True))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "payload", F.col("meta.n_frames").alias("n_frames"))
        .mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)
    )


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (payload bytes
    derived from the row id; kinds cycle image/audio/video)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("payload-"), F.md5(F.concat(F.col("id").cast("string"), F.lit(seed)))),
        "utf-8",
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        F.struct(
            (F.col("id") % 640 + 16).cast("int").alias("width"),
            (F.col("id") % 480 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("id") % 90 + 10).cast("int").alias("n_frames"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )
