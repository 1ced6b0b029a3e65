"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The decode kernels are STUBS in this container (no image/audio libs baked
in): `decode_image` raises NotImplementedError unless `fake=True`, in which
case a deterministic fake decoder (hash-derived dimensions/features) stands
in so the Spark-side plumbing — schema, batch shape, partitioning — is real
and tested. Swapping in Pillow/torchaudio is a one-function change; the
DataFrame contract does not move.

Design for 100 TB of media:
  * binary payloads stay opaque until the last possible stage (column
    pruning keeps them out of every scan that doesn't need bytes);
  * mapInPandas streams Arrow record batches — bounded memory per task
    regardless of file sizes; spark.sql.execution.arrow.maxRecordsPerBatch
    caps batch height, and oversized payloads are admission-filtered like
    oversize documents (CompletePipelineReceiver.java:131-136);
  * feature extraction emits fixed-width arrays → downstream joins/ANN
    never touch the raw bytes again.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, feat_dim: int) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real decoder: derives dims + a feature
    vector from the payload digest. Replaces (not simulates) pixel math."""
    d = hashlib.sha256(payload or b"").digest()
    w = 64 + d[0]
    h = 64 + d[1]
    feats = [((d[i % 32] / 255.0) * 2 - 1) for i in range(feat_dim)]
    return w, h, feats


def decode_image_features(
    media: DataFrame, feat_dim: int = 16, fake: bool = False
) -> DataFrame:
    """mapInPandas image decode + feature extraction.

    Real implementation requires an image library (not in this container):
    raises NotImplementedError unless fake=True (deterministic fake kernel,
    identical Spark plumbing).
    """
    if not fake:
        # unconditional: a REAL pixel kernel is not implemented yet, so
        # fake=False must never silently return the hash-derived stand-in
        # — even where Pillow happens to be importable (that would present
        # fabricated dimensions/features as real decode output)
        raise NotImplementedError(
            "real image decode kernel not implemented (Pillow-based kernel "
            "pending); pass fake=True for the deterministic test kernel"
        )

    pruned = media.filter(F.col("kind") == "image").select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, feats = _fake_decode(payload, feat_dim)
                rows.append((mid, w, h, feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "features"]
            )

    return pruned.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("duration_ms", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _fake_decode_audio(payload: bytes, feat_dim: int) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real audio decoder (duration, sample
    rate, MFCC-ish feature vector from the payload digest)."""
    d = hashlib.sha256(payload or b"").digest()
    duration_ms = 1000 + d[2] * 16
    sample_rate = 8000 + (d[3] % 4) * 8000
    feats = [((d[(4 + i) % 32] / 255.0) * 2 - 1) for i in range(feat_dim)]
    return duration_ms, sample_rate, feats


def decode_audio_features(
    media: DataFrame, feat_dim: int = 8, fake: bool = False
) -> DataFrame:
    """mapInPandas audio decode + feature extraction — same plumbing
    contract as decode_image_features (payload pruned until this stage,
    bounded Arrow batches, fixed-width feature output). Real decoding
    requires an audio library (not in this container): raises
    NotImplementedError unless fake=True (deterministic test kernel)."""
    if not fake:
        # unconditional — same contract as decode_image_features
        raise NotImplementedError(
            "real audio decode kernel not implemented; pass fake=True for "
            "the deterministic test kernel"
        )

    pruned = media.filter(F.col("kind") == "audio").select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                dur, sr, feats = _fake_decode_audio(payload, feat_dim)
                rows.append((mid, dur, sr, feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "duration_ms", "sample_rate", "features"]
            )

    return pruned.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Frame-sampling plumbing: emits (media_id, frame_idx, ts_ms) rows;
    the frame decode itself is stubbed like decode_image_features."""
    if not fake:
        raise NotImplementedError(
            "video decode requires av/ffmpeg; pass fake=True for plumbing tests"
        )
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", F.coalesce("meta_duration_ms", F.lit(0)).alias("dur")
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.floor(F.col("dur") / every_ms), F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("ts_ms", F.col("frame_idx") * every_ms)


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.md5(f"media-{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                None,
                None,
                (i % 7 + 1) * 1500 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
