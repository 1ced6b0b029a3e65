"""Watermarked event-time windowed aggregation on an unbounded stream.

The reference's aggregation surface is per-document batch (SURVEY §2.4);
a production KG ingest also needs the classic streaming shape — tumbling
event-time windows with a watermark bounding state for late data
(SURVEY §2.8: "bounded buffer + FINISH drain" is the reference's crude
analogue of watermark-driven completeness). This module is the native
Structured Streaming form:

  * `withWatermark(ts, delay)` — rows later than `delay` behind the max
    observed event time are dropped; window state older than the
    watermark is evicted, so state size is O(windows in flight), not
    O(stream lifetime).
  * append output mode — a window's row is emitted exactly once, when
    the watermark passes the window end (final, not speculative).

Aggregates accumulate in DECIMAL(18,2), not DOUBLE: exact, association-
independent sums that are bit-identical across partitionings, engines
(DuckDB oracle) and parallelism levels; cast to double only on output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SENTINEL_PREFIX = "__"


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 day",
    delay: str = "1 minute",
) -> DataFrame:
    """Tumbling-window (count, exact sum) per event type.

    Deliberately does NOT filter sentinel/drain rows (``event_type``
    starting with ``__``) inside the stream: Catalyst pushes any
    deterministic predicate that doesn't reference ``ts_col`` BELOW the
    EventTimeWatermark node (PushPredicateThroughNonJoin), so a
    pre-aggregation filter would drop far-future drain rows at the scan
    and the watermark would never advance past the last real window.
    Instead sentinels flow into the aggregation, where their own
    far-future windows simply never close (append mode only emits a
    window once the watermark passes its end) — so they advance the
    watermark, drain every real window, and still contribute zero output
    rows. Callers reading the sink batch-side should filter
    ``~startswith(type_col, SENTINEL_PREFIX)`` for defense in depth.
    """
    return (
        stream.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_sum_dec"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(type_col),
            F.col("n_events"),
            F.col("_sum_dec").cast("double").alias("sum_value"),
        )
    )
