"""Distributed as-of join (point-in-time lookup) and interval/range join.

The reference engine has no as-of or range join — its only lookups are
Hibernate point queries (DatabaseFacade.java createOrget*). These are the
time-series operators Spark itself lacks as primitives; both are built as
compositions of existing DataFrame ops chosen for 100 TB behavior, never a
range-predicate join (which Spark plans as BroadcastNestedLoop/cartesian
and which explodes on hot keys).

as-of join — the union-tag construction:
  1. tag the build (right) side 0 and the probe (left) side 1,
  2. unionByName on (key, ts); the build side carries its payload columns
     (renamed to their output names), the probe side carries nulls,
  3. ONE hash exchange: window PARTITION BY key ORDER BY (ts, side, tiebreak),
  4. last(payload IGNORE NULLS) over ROWS UNBOUNDED PRECEDING..CURRENT gives
     every probe row the latest build row with build.ts <= probe.ts,
  5. filter back to the probe side (optionally null out matches older than
     `tolerance_s`).
Cost: a single shuffle + per-partition sort, O(n log n) per key group, zero
candidate-pair blowup regardless of key skew (AQE splits oversized
partitions). Tie semantics are explicit and deterministic: a build row at
exactly the probe ts IS visible (<=, side 0 sorts first), and among equal
build ts the greatest `tiebreak` value wins.

interval join — time-bin bucketing:
  intervals are exploded to the fixed-width bins they overlap (sequence()),
  points are mapped to their single bin, the join runs as an equi-join on
  (key, bin) and the exact containment predicate filters false bin
  neighbors. Equi-join means hash shuffle / broadcast as Catalyst sees fit;
  bin width bounds the fan-out (an interval of length L costs
  ceil(L/bin)+1 rows, a point costs 1).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | Sequence[str],
    ts_col: str = "ts",
    payload: Sequence[str] = (),
    tiebreak: str | None = None,
    tolerance_s: int | None = None,
    prefix: str = "prior_",
) -> DataFrame:
    """For each probe row, attach the latest build row with
    build[ts_col] <= probe[ts_col] on the same key(s).

    Returns probe with `{prefix}{ts_col}` plus `{prefix}{c}` for each
    payload column (null when no build row qualifies, or when the match is
    older than `tolerance_s` seconds).
    """
    keys = [on] if isinstance(on, str) else list(on)
    out_ts = prefix + ts_col
    out_payload = [prefix + c for c in payload]

    tb_build = F.col(tiebreak) if tiebreak else F.lit(0)
    b = build.select(
        *keys,
        F.col(ts_col).alias("_ats"),
        F.lit(0).alias("_side"),
        tb_build.cast("long").alias("_tb"),
        F.col(ts_col).alias(out_ts),
        *[F.col(c).alias(prefix + c) for c in payload],
    )
    p = probe.select(
        *probe.columns,
        F.col(ts_col).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tb"),
    )
    u = p.unionByName(b, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy("_ats", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in [out_ts, *out_payload]:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))

    res = u.filter(F.col("_side") == 1).drop("_ats", "_side", "_tb")
    if tolerance_s is not None:
        fresh = F.col(out_ts) >= F.col(ts_col) - F.expr(
            f"INTERVAL {int(tolerance_s)} SECOND"
        )
        for c in [*out_payload, out_ts]:  # out_ts nulled last (predicate uses it)
            res = res.withColumn(c, F.when(fresh, F.col(c)))
    return res


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | Sequence[str],
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Equi-joinable containment join: points to the interval(s) that
    contain them (start <= ts <= end) on the same key(s).

    Both sides are mapped to `bin_seconds`-wide epoch bins — intervals to
    every bin they overlap (sequence), points to one bin — so the physical
    plan is a plain hash equi-join on (key, bin); the exact BETWEEN filter
    then drops bin-neighbor false positives. No cartesian, no range join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    bins = F.explode(
        F.sequence(
            (F.unix_timestamp(start_col) / bin_seconds).cast("long"),
            (F.unix_timestamp(end_col) / bin_seconds).cast("long"),
        )
    ).alias("_bin")
    iv = intervals.select("*", bins)
    pt = points.withColumn(
        "_bin", (F.unix_timestamp(point_ts) / bin_seconds).cast("long")
    )
    joined = pt.join(iv, [*keys, "_bin"], "inner").filter(
        F.col(point_ts).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_bin")


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Changelog → SCD2 validity intervals (slowly-changing-dimension
    type 2, Kimball — public method): each change row becomes effective
    at its own timestamp and expires at the NEXT change of the same key;
    the latest row per key has valid_to = NULL and is_current = true.

    The ordering key is (ts_col, *order_tiebreak) — pass a unique
    tie-break column (e.g. the event id) so same-timestamp changes get a
    deterministic total order; without one, lead() under ties is
    engine-dependent.

    Scale shape: ONE window shuffle keyed by the dimension key — the
    canonical warehouse compaction; no self-join (the naive "join next
    change" doubles the shuffle and skews on hot keys)."""
    order_cols = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_tiebreak or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn("valid_to", F.lead(ts_col).over(w)).withColumn(
        "is_current", F.col("valid_to").isNull()
    )
