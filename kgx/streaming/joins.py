"""Watermarked stream-stream join: conversion attribution on live events.

The reference never joins two live feeds (its ZeroMQ loop is one document
at a time), but a production transcript/event ingest does: e.g. attribute a
purchase to the click that preceded it within an hour, while both sides are
still unbounded streams. Structured Streaming's stream-stream inner join
needs exactly two things to keep state bounded (SURVEY §2.8 scale notes):

  * a watermark on both sides — bounds how late either side can arrive;
  * a time-range join condition — tells the state store when a buffered
    click can never match a future purchase and can be evicted
    (click_ts < purchase-side watermark − window ⇒ evict).

Inner-join results emit as soon as both rows have arrived (no waiting for
the watermark — that is only needed for outer joins' NULL side), so a
Trigger.AvailableNow drain yields the complete batch-equivalent answer
without drain sentinels.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str,
    delay: str,
    how: str,
) -> DataFrame:
    """Shared body for the inner and left-outer attribution joins — one
    definition of the watermarks, time-range condition and projection so
    the two variants cannot drift."""
    c = (
        clicks.select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        ).withWatermark("click_ts", delay)
    )
    p = (
        purchases.select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        ).withWatermark("purchase_ts", delay)
    )
    j = c.join(
        p,
        F.expr(
            f"c_user = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + interval {window}"
        ),
        how,
    )
    return j.select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts"))
        .cast("bigint")
        .alias("gap_sec"),
    )


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    delay: str = "1 minute",
) -> DataFrame:
    """Join each purchase to every click by the same user in the preceding
    `window` (inclusive bounds on both ends). Both inputs must carry
    (event_id, user_id, ts); both get event-time watermarks so the join
    state is evicted once the opposite side's watermark passes the window.
    """
    return _attribution_join(clicks, purchases, window, delay, "inner")


def attribute_purchases_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    delay: str = "1 minute",
) -> DataFrame:
    """Left-outer variant: every click emits — joined to each same-user
    purchase in the following `window`, or with NULL purchase columns once
    the engine can prove no match will ever arrive (the global watermark
    has passed click_ts + window, so the state store evicts the click and
    emits its NULL row). Matched rows still emit eagerly, like the inner
    join; ONLY the NULL rows wait on the watermark — so an AvailableNow
    drain needs far-future sentinel rows on both feeds to flush the tail
    (same drain protocol as kgx.streaming.windowed; the sentinels' own
    eviction horizon stays ahead of the final watermark, so they never
    emit themselves)."""
    return _attribution_join(clicks, purchases, window, delay, "leftOuter")
