"""Streaming deduplication: exact near-line dedup on an unbounded
document/turn stream.

The batch dedup family (kgx/dedup.py) assumes the corpus is at rest; on a
live ingest the same guarantee — at most one survivor per content key —
needs keyed streaming state. Two tiers, both built on Spark's native
streaming dedup operators (state store + watermark eviction), not
foreachBatch bookkeeping:

  * dedup_stream_exact      — dropDuplicates on the content hash: survivors
    are exact-once per key for the STREAM LIFETIME (state never evicted;
    use when the key space is bounded, e.g. conv ids).
  * dedup_stream_watermarked — dropDuplicatesWithinWatermark: duplicates
    are suppressed when they arrive within the watermark delay of the
    first sighting, and state is EVICTED once the watermark passes — the
    production shape for unbounded content keys (state ≈ keys seen per
    watermark window, not per stream lifetime). Late re-posts beyond the
    delay intentionally re-emit (re-crawl semantics).

The content key is the same normalized-text md5 the batch exact_dedup and
fingerprint operators use, so a document suppressed here is exactly one
the batch path would have deduplicated.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def content_key(text_col: str = "text") -> F.Column:
    """Normalized-content hash shared with dedup.exact_dedup/fingerprint:
    md5 over whitespace-collapsed lowercase text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "))


def dedup_stream_exact(stream: DataFrame, text_col: str = "text") -> DataFrame:
    return stream.withColumn("_ck", content_key(text_col)).dropDuplicates(["_ck"])


def dedup_stream_watermarked(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    delay: str = "10 minutes",
) -> DataFrame:
    return (
        stream.withColumn("_ck", content_key(text_col))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["_ck"])
    )
