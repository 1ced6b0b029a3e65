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
from pyspark.sql import DataFrame, Window
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


def make_mp4_with_samples(
    frame_sizes: list[int],
    frame_dur_ticks: int,
    timescale: int = 1000,
    chunk_frames: int = 1,
) -> bytes:
    """A spec-shaped ISO-BMFF file WITH a real sample table: ftyp +
    moov{mvhd, trak{mdia{mdhd, minf{stbl{stts, stsc, stsz, stco}}}}} +
    mdat whose payload is exactly sum(frame_sizes) bytes. Chunk offsets in
    stco are ABSOLUTE file offsets into the mdat payload (chunks laid out
    contiguously, chunk_frames samples per chunk, remainder in a final
    short chunk) — the same boxes a demuxer seeks by. Deterministic."""
    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    n = len(frame_sizes)
    duration = n * frame_dur_ticks
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = b"\x00" * 4 + struct.pack(">IIII", 0, 0, timescale, duration) + b"\x00" * 80
    mdhd = b"\x00" * 4 + struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0)
    stts = b"\x00" * 4 + struct.pack(">III", 1, n, frame_dur_ticks)
    # sample-to-chunk runs: full chunks of chunk_frames, then the remainder
    full, rem = divmod(n, chunk_frames)
    stsc_entries = []
    if full:
        stsc_entries.append((1, chunk_frames))
    if rem:
        stsc_entries.append((full + 1, rem))
    stsc = b"\x00" * 4 + struct.pack(">I", len(stsc_entries)) + b"".join(
        struct.pack(">III", first, spc, 1) for first, spc in stsc_entries
    )
    stsz = b"\x00" * 4 + struct.pack(">II", 0, n) + b"".join(
        struct.pack(">I", s) for s in frame_sizes
    )
    n_chunks = full + (1 if rem else 0)

    def build(chunk_offsets: list[int]) -> bytes:
        stco = b"\x00" * 4 + struct.pack(">I", n_chunks) + b"".join(
            struct.pack(">I", o) for o in chunk_offsets
        )
        stbl = box(b"stbl", box(b"stts", stts) + box(b"stsc", stsc)
                   + box(b"stsz", stsz) + box(b"stco", stco))
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", box(b"mdhd", mdhd) + minf)
        trak = box(b"trak", mdia)
        moov = box(b"moov", box(b"mvhd", mvhd) + trak)
        return ftyp + moov + box(b"mdat", b"\x00" * sum(frame_sizes))

    # two-pass: stco depends on moov's own length, which is offset-count
    # dependent but not offset-value dependent — build once with zeros to
    # measure, then write the real absolute offsets
    probe = build([0] * n_chunks)
    mdat_data_start = len(probe) - sum(frame_sizes)
    offsets, pos, i = [], mdat_data_start, 0
    for ei, (first, spc) in enumerate(stsc_entries):
        last_chunk = (stsc_entries[ei + 1][0] - 1
                      if ei + 1 < len(stsc_entries) else n_chunks)
        for _c in range(first, last_chunk + 1):
            offsets.append(pos)
            for _s in range(spc):
                pos += frame_sizes[i]
                i += 1
    return build(offsets)


def parse_mp4_sample_table(
    payload: bytes | None,
) -> list[tuple[int, int, int, int]]:
    """REAL header-only frame index: (frame_idx, ts_ms, byte_offset, size)
    rows decoded from the first track's sample tables — stts (decode
    deltas), stsz (sizes), stsc+stco/co64 (chunk layout → absolute byte
    offsets) under the mdhd media timescale. This is exactly the seek
    index a demuxer builds before touching any codec: frame SAMPLING
    becomes real from headers alone, while frame DECODE stays honestly
    gated on av/ffmpeg (absent here). Empty list for non-BMFF or
    table-less bytes — corrupt media is data, not an exception.

    Reference analogue: per-document content metadata extraction
    (DocumentMetaData.java:20-24), extended to the sample level."""
    if not payload or len(payload) < 16 or payload[4:8] != b"ftyp":
        return []
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
                elif size == 0:
                    size = end - i
                if size < hdr:
                    return
                yield tag, i + hdr, min(i + size, end)
                i += size

        def find(buf, s, e, tag):
            for t, s2, e2 in boxes(buf, s, e):
                if t == tag:
                    return s2, e2
            return None

        moov = find(payload, 0, len(payload), b"moov")
        if not moov:
            return []
        trak = find(payload, *moov, b"trak")
        if not trak:
            return []
        mdia = find(payload, *trak, b"mdia")
        if not mdia:
            return []
        mdhd = find(payload, *mdia, b"mdhd")
        minf = find(payload, *mdia, b"minf")
        if not mdhd or not minf:
            return []
        v = payload[mdhd[0]]
        timescale = struct.unpack(
            ">I", payload[mdhd[0] + (20 if v == 1 else 12):][:4]
        )[0]
        stbl = find(payload, *minf, b"stbl")
        if not stbl or not timescale:
            return []
        tables: dict[bytes, tuple[int, int]] = {}
        for t, s2, e2 in boxes(payload, *stbl):
            tables[t] = (s2, e2)
        if b"stts" not in tables or b"stsz" not in tables:
            return []

        def u32s(s, e, off, cnt):
            return list(struct.unpack(f">{cnt}I", payload[s + off : s + off + 4 * cnt]))

        # stts -> per-sample decode ticks
        s, e = tables[b"stts"]
        n_ent = struct.unpack(">I", payload[s + 4 : s + 8])[0]
        deltas: list[int] = []
        for i in range(n_ent):
            cnt, dur = struct.unpack(">II", payload[s + 8 + 8 * i : s + 16 + 8 * i])
            deltas.extend([dur] * cnt)
        # stsz -> sizes
        s, e = tables[b"stsz"]
        uniform, n_samples = struct.unpack(">II", payload[s + 4 : s + 12])
        sizes = ([uniform] * n_samples if uniform
                 else u32s(s, e, 12, n_samples))
        # stco / co64 -> chunk offsets
        if b"stco" in tables:
            s, e = tables[b"stco"]
            n_chunks = struct.unpack(">I", payload[s + 4 : s + 8])[0]
            chunk_offs = u32s(s, e, 8, n_chunks)
        elif b"co64" in tables:
            s, e = tables[b"co64"]
            n_chunks = struct.unpack(">I", payload[s + 4 : s + 8])[0]
            chunk_offs = list(struct.unpack(
                f">{n_chunks}Q", payload[s + 8 : s + 8 + 8 * n_chunks]
            ))
        else:
            return []
        # stsc -> samples per chunk runs
        s, e = tables.get(b"stsc", (None, None))
        runs: list[tuple[int, int]] = []
        if s is not None:
            n_ent = struct.unpack(">I", payload[s + 4 : s + 8])[0]
            for i in range(n_ent):
                first, spc, _d = struct.unpack(
                    ">III", payload[s + 8 + 12 * i : s + 20 + 12 * i]
                )
                runs.append((first, spc))
        if not runs:
            runs = [(1, 1)]

        rows: list[tuple[int, int, int, int]] = []
        ticks = 0
        sample = 0
        for ri, (first, spc) in enumerate(runs):
            last = (runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(chunk_offs))
            for c in range(first, last + 1):
                if c > len(chunk_offs) or sample >= n_samples:
                    break
                off = chunk_offs[c - 1]
                for _k in range(spc):
                    if sample >= n_samples:
                        break
                    rows.append((
                        sample,
                        ticks * 1000 // timescale,
                        off,
                        sizes[sample],
                    ))
                    off += sizes[sample]
                    ticks += deltas[sample] if sample < len(deltas) else 0
                    sample += 1
        return rows
    except (struct.error, IndexError):
        return []


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


FRAME_INDEX_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("byte_offset", LongType(), False),
        StructField("size", LongType(), False),
    ]
)


def video_frame_index(media: DataFrame) -> DataFrame:
    """REAL header-only frame index: one row per sample
    (media_id, frame_idx, ts_ms, byte_offset, size) decoded from each
    video payload's ISO-BMFF sample tables (stts/stsz/stsc/stco) by
    parse_mp4_sample_table — exactly the seek index a demuxer builds
    before touching a codec, so frame SAMPLING and byte-range fetch
    planning are real from headers alone. Frame DECODE (pixels) stays
    honestly gated on av/ffmpeg, which this environment does not ship.

    Scale shape: payload pruned to this one mapInPandas stage; output is
    slim fixed-width rows (~40 bytes/frame), no shuffle — a pure map over
    any corpus size."""
    pruned = media.filter(F.col("kind") == "video").select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "frame_idx", "ts_ms", "byte_offset", "size"]
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else None
                for fi, ts, off, sz in parse_mp4_sample_table(raw):
                    rows.append((int(mid), fi, ts, off, sz))
            yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(batches, FRAME_INDEX_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Frame sampling. fake=False (default) is REAL from round 5 on: the
    header-only sample table (video_frame_index) yields every frame's
    timestamp and byte range, and one frame per every_ms bucket is kept —
    the first by frame_idx within each floor(ts_ms/every_ms) bucket, the
    deterministic nearest-from-above rule — emitting (media_id,
    frame_idx, ts_ms, byte_offset, size). Pixel decode of the sampled
    frames stays gated on av/ffmpeg (absent here); the byte ranges are
    what a decode stage would fetch.

    fake=True keeps the round-3 duration-arithmetic plumbing rows
    (media_id, frame_idx, ts_ms) for payloads without sample tables.

    Scale shape: map stage + ONE window shuffle keyed by media_id (frame
    counts per video bound the partition; no text/payload moves)."""
    if not fake:
        idx = video_frame_index(media)
        w = Window.partitionBy(
            "media_id", (F.col("ts_ms") / every_ms).cast("bigint")
        ).orderBy("frame_idx")
        return (
            idx.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
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


def make_jpeg_exif(
    width: int, height: int, orientation: int, little: bool = False
) -> bytes:
    """JPEG with a REAL Exif APP1 segment: TIFF header (II/MM byte order,
    magic 42, IFD0 offset) + a one-entry IFD0 carrying the Orientation
    tag (0x0112, SHORT, count 1, value left-justified in the 4-byte
    field per TIFF 6.0 §2), then the same JFIF APP0 + SOF0 skeleton as
    make_jpeg. Both byte orders are exercised by callers — the parser
    must honor the header, not assume one. Deterministic."""
    bo = "<" if little else ">"
    tiff = (
        (b"II" if little else b"MM")
        + struct.pack(bo + "H", 42)
        + struct.pack(bo + "I", 8)
        + struct.pack(bo + "H", 1)  # one IFD0 entry
        + struct.pack(bo + "HHI", 0x0112, 3, 1)  # Orientation, SHORT, x1
        + struct.pack(bo + "H", orientation) + b"\x00\x00"
        + struct.pack(bo + "I", 0)  # no next IFD
    )
    exif = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(exif) + 2) + exif
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app1 + app0 + sof0 + b"\xff\xd9"


def parse_exif_orientation(payload: bytes | None) -> int | None:
    """Orientation (1-8) from a JPEG's Exif APP1 segment via a real TIFF
    IFD walk: marker scan → APP1 with "Exif\\0\\0" → byte-order header
    (II little / MM big, magic 42) → IFD0 entries → tag 0x0112 (SHORT,
    count 1). None for anything unparseable or Exif-less — corrupt or
    foreign bytes are data, not exceptions, at corpus scale."""
    if not payload or payload[:2] != b"\xff\xd8":
        return None
    try:
        i, n = 2, len(payload)
        while i + 3 < n:
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker == 0xD9 or marker == 0xDA:  # EOI / image data
                break
            if 0xD0 <= marker <= 0xD8 or marker == 0x01:
                i += 2
                continue
            if i + 4 > n:
                break
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker == 0xE1 and payload[i + 4 : i + 10] == b"Exif\x00\x00":
                tiff = payload[i + 10 : i + 2 + seg_len]
                if len(tiff) < 8:
                    return None
                if tiff[:2] == b"II":
                    bo = "<"
                elif tiff[:2] == b"MM":
                    bo = ">"
                else:
                    return None
                if struct.unpack(bo + "H", tiff[2:4])[0] != 42:
                    return None
                off = struct.unpack(bo + "I", tiff[4:8])[0]
                if off + 2 > len(tiff):
                    return None
                n_ent = struct.unpack(bo + "H", tiff[off : off + 2])[0]
                for k in range(n_ent):
                    e = tiff[off + 2 + 12 * k : off + 2 + 12 * (k + 1)]
                    if len(e) < 12:
                        return None
                    tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
                    if tag == 0x0112 and typ == 3 and cnt == 1:
                        return struct.unpack(bo + "H", e[8:10])[0]
                return None
            i += 2 + seg_len
    except (struct.error, IndexError):
        pass
    return None


def exif_metadata(media: DataFrame) -> DataFrame:
    """REAL Exif surface: (media_id, orientation) parsed out of the raw
    JPEG bytes by the TIFF IFD walk — same pruned one-stage mapInPandas
    plumbing as the other header kernels."""
    return _header_metadata(
        media,
        "image",
        [StructField("orientation", IntegerType(), True)],
        lambda p: (parse_exif_orientation(p),),
    )
