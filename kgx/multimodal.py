"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

Two kernel tiers per modality:

  * REAL header parsers (fake=False, round 4): pure-stdlib ``struct``
    parses of the container headers — PNG IHDR / GIF logical-screen
    descriptor / JPEG SOF marker for (width, height), RIFF fmt/data
    chunks for WAV (sample_rate, channels, bits, duration). These emit
    REAL metadata from real bytes with zero dependencies; the model
    feature vector stays NULL in this tier (pixel/sample features need a
    decoder+model library this container does not have — documented, not
    faked). Unparseable/corrupt payloads yield NULL metadata rows, never
    task failures: at 100 TB, corrupt files are routine data, not errors.
  * deterministic FAKE kernels (fake=True): hash-derived dims/features
    that stand in for full pixel decode so the feature-vector plumbing —
    schema, batch shape, partitioning — is testable end-to-end. Replaces
    (never simulates) pixel math.

Swapping in Pillow/torchaudio upgrades the fake tier to full decode as a
one-function change; the DataFrame contract does not move.

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
import struct
import zlib
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


# ---------------------------------------------------------------------------
# REAL header parsers — pure stdlib, no decoder libraries
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers that carry dimensions (all SOFn except the
# DHT/DAC/RST-family C4/C8/CC, per ITU T.81 Table B.1)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def parse_image_header(payload: bytes | None) -> tuple[int | None, int | None, str | None]:
    """(width, height, format) from raw image bytes via header parse only —
    PNG IHDR (bytes 16-24 of the file: big-endian u32 pair), GIF87a/89a
    logical screen descriptor (little-endian u16 pair at offset 6), JPEG
    SOFn marker scan (big-endian height,width at marker payload offset
    3/5). Returns (None, None, None) for anything unparseable — corrupt or
    foreign bytes are data, not exceptions, at corpus scale."""
    if not payload:
        return None, None, None
    try:
        if payload[:8] == _PNG_SIG and len(payload) >= 24 and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return w, h, "png"
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            return w, h, "gif"
        if payload[:2] == b"\xff\xd8":  # JPEG SOI
            i = 2
            n = len(payload)
            while i + 3 < n:
                if payload[i] != 0xFF:
                    return None, None, None  # marker desync: corrupt
                marker = payload[i + 1]
                if marker == 0xFF:  # fill byte padding
                    i += 1
                    continue
                if marker == 0xD9:  # EOI before any SOF
                    break
                if 0xD0 <= marker <= 0xD8 or marker == 0x01:  # standalone
                    i += 2
                    continue
                if i + 4 > n:
                    break
                seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
                if marker in _JPEG_SOF:
                    if i + 9 > n:
                        break
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return w, h, "jpeg"
                i += 2 + seg_len
    except (struct.error, IndexError):  # truncated mid-field
        pass
    return None, None, None


def parse_wav_header(
    payload: bytes | None,
) -> tuple[int | None, int | None, int | None, int | None]:
    """(duration_ms, sample_rate, channels, bits_per_sample) from RIFF/WAVE
    bytes by walking the chunk list (id:4, size:<u32, data; word-aligned).
    duration_ms = floor(data_bytes * 1000 / byte_rate) — exact integer
    math so a SQL oracle reproduces it. None-tuple for non-WAV bytes."""
    if not payload or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None, None, None, None
    sample_rate = channels = bits = byte_rate = data_size = None
    i, n = 12, len(payload)
    try:
        while i + 8 <= n:
            cid = payload[i : i + 4]
            size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= n:
                channels, sample_rate, byte_rate = struct.unpack(
                    "<HII", payload[i + 10 : i + 20]
                )
                if i + 24 <= n:
                    bits = struct.unpack("<H", payload[i + 22 : i + 24])[0]
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size & 1)  # chunks are word-aligned
    except (struct.error, IndexError):
        pass
    if sample_rate and byte_rate and data_size is not None:
        duration_ms = data_size * 1000 // byte_rate
        return duration_ms, sample_rate, channels, bits
    return None, sample_rate, channels, bits


def parse_mp4_header(
    payload: bytes | None,
) -> tuple[int | None, int | None, str | None]:
    """(duration_ms, timescale, brand) from ISO-BMFF (MP4/MOV) bytes by
    walking the top-level box list to ``moov`` and reading its ``mvhd``
    movie header (version 0: u32 timescale + u32 duration at payload
    offset 12; version 1: u32 + u64 at offset 20). Box sizes are big-
    endian u32 with the size==1 64-bit extension handled. None-tuple for
    non-BMFF bytes — corrupt media is data, not an exception. NOTE: this
    is header metadata only; frame decode still requires a demuxer+codec
    (see sample_video_frames)."""
    if not payload or len(payload) < 16 or payload[4:8] != b"ftyp":
        return None, None, None
    brand = payload[8:12].decode("ascii", "replace")
    try:
        def boxes(buf: bytes, i: int, end: int):
            while i + 8 <= end:
                size = struct.unpack(">I", buf[i : i + 4])[0]
                tag = buf[i + 4 : i + 8]
                hdr = 8
                if size == 1:
                    if i + 16 > end:
                        return
                    size = struct.unpack(">Q", buf[i + 8 : i + 16])[0]
                    hdr = 16
                elif size == 0:  # box extends to end of file
                    size = end - i
                if size < hdr:
                    return
                yield tag, i + hdr, min(i + size, end)
                i += size

        for tag, s, e in boxes(payload, 0, len(payload)):
            if tag != b"moov":
                continue
            for tag2, s2, e2 in boxes(payload, s, e):
                if tag2 != b"mvhd":
                    continue
                version = payload[s2]
                if version == 1 and s2 + 32 <= e2:
                    timescale = struct.unpack(">I", payload[s2 + 20 : s2 + 24])[0]
                    duration = struct.unpack(">Q", payload[s2 + 24 : s2 + 32])[0]
                elif version == 0 and s2 + 20 <= e2:
                    timescale, duration = struct.unpack(
                        ">II", payload[s2 + 12 : s2 + 20]
                    )
                else:
                    return None, None, brand
                if not timescale:
                    return None, None, brand
                return duration * 1000 // timescale, timescale, brand
    except (struct.error, IndexError):
        pass
    return None, None, brand


# --- deterministic fixture builders (valid files, stdlib only) -------------

def make_png(width: int, height: int) -> bytes:
    """A complete, spec-valid 8-bit grayscale PNG of the given dimensions
    (zlib-compressed all-zero scanlines). Deterministic."""
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * width) * height  # filter byte + pixels per row
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer. Deterministic."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + b"\x3b"


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG stream: SOI, JFIF APP0, a 1-component SOF0 carrying the
    dimensions, EOI. Header-complete (no entropy-coded scan)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_mp4(duration_ms: int, timescale: int = 48000, v1: bool = False) -> bytes:
    """Minimal ISO-BMFF stream: ftyp + moov/mvhd carrying the duration.
    Header-complete (no track/mdat). Deterministic."""
    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    duration = duration_ms * timescale // 1000
    if v1 or duration > 0xFFFFFFFF:
        # version-1 mvhd carries 64-bit times; real muxers upgrade exactly
        # when the tick count no longer fits the version-0 32-bit field
        mvhd = b"\x01" + b"\x00" * 3 + struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        mvhd = b"\x00" + b"\x00" * 3 + struct.pack(">IIII", 0, 0, timescale, duration)
    # trailing mvhd fields (rate, volume, matrix, next-track) zero-padded
    mvhd += b"\x00" * 80
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + box(b"moov", box(b"mvhd", mvhd))


def make_wav(sample_rate: int, n_samples: int, channels: int = 1, bits: int = 16) -> bytes:
    """A complete, spec-valid PCM WAV (silence) with the given geometry.
    Deterministic; duration_ms = n_samples*1000 // sample_rate."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


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

    fake=False (default) runs the REAL stdlib header kernel
    (parse_image_header): width/height come from actual PNG/GIF/JPEG bytes
    — the per-document content metadata the reference stores
    (DocumentMetaData.java:20-24). The ``features`` column is NULL in this
    tier: a model feature vector requires pixel decode + a vision model
    this container does not ship, and emitting hash noise as "features"
    from the real path would be fabrication. Unparseable payloads yield
    NULL dims, never task failures.

    fake=True runs the deterministic hash kernel (dims AND features
    populated) for plumbing tests and the feature-path oracle rows.
    """
    pruned = media.filter(F.col("kind") == "image").select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if fake:
                    w, h, feats = _fake_decode(payload, feat_dim)
                else:
                    w, h, _fmt = parse_image_header(payload)
                    feats = None  # model features: see docstring
                rows.append((mid, w, h, feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "features"]
            )

    return pruned.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def _header_metadata(
    media: DataFrame, kind: str, fields: list[StructField], parse_fn
) -> DataFrame:
    """Shared header-metadata plumbing for the three modalities: prune the
    payload to one mapInPandas stage, apply a per-payload header parser
    returning a tuple matching ``fields``, emit fixed-width metadata so
    nothing downstream re-touches bytes."""
    pruned = media.filter(F.col("kind") == kind).select("media_id", "payload")
    schema = StructType([StructField("media_id", LongType(), False), *fields])
    cols = [f.name for f in schema.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (mid, *parse_fn(payload))
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(batches, schema)


def image_metadata(media: DataFrame) -> DataFrame:
    """REAL image metadata extraction: (media_id, width, height, format)
    from the raw payload bytes via parse_image_header — the non-fake
    decode surface."""
    return _header_metadata(
        media,
        "image",
        [
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("format", StringType(), True),
        ],
        parse_image_header,
    )


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
    bounded Arrow batches, fixed-width feature output).

    fake=False (default) runs the REAL stdlib RIFF/WAVE header kernel
    (parse_wav_header): duration_ms and sample_rate come from actual WAV
    bytes; ``features`` is NULL in this tier (sample-level features need
    an audio decode library — see decode_image_features). fake=True runs
    the deterministic hash kernel with features populated."""
    pruned = media.filter(F.col("kind") == "audio").select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if fake:
                    dur, sr, feats = _fake_decode_audio(payload, feat_dim)
                else:
                    dur, sr, _ch, _bits = parse_wav_header(payload)
                    feats = None
                rows.append((mid, dur, sr, feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "duration_ms", "sample_rate", "features"]
            )

    return pruned.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def audio_metadata(media: DataFrame) -> DataFrame:
    """REAL audio metadata: (media_id, duration_ms, sample_rate, channels,
    bits) from raw WAV bytes via parse_wav_header — the non-fake decode
    surface."""
    return _header_metadata(
        media,
        "audio",
        [
            StructField("duration_ms", IntegerType(), True),
            StructField("sample_rate", IntegerType(), True),
            StructField("channels", IntegerType(), True),
            StructField("bits", IntegerType(), True),
        ],
        parse_wav_header,
    )


def video_metadata(media: DataFrame) -> DataFrame:
    """REAL video metadata: (media_id, duration_ms, timescale, brand) from
    raw ISO-BMFF bytes via parse_mp4_header — the header tier of the video
    modality (frame decode remains stubbed, see sample_video_frames)."""
    return _header_metadata(
        media,
        "video",
        [
            StructField("duration_ms", LongType(), True),
            StructField("timescale", IntegerType(), True),
            StructField("brand", StringType(), True),
        ],
        parse_mp4_header,
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Frame-sampling plumbing: emits (media_id, frame_idx, ts_ms) rows.
    Video is the one modality still fully stubbed: frame extraction needs
    a container demuxer + codec (av/ffmpeg, absent here), and unlike
    image/audio there is no header-only kernel that yields frames."""
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
