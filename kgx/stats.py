"""Column-profiling statistics for pipeline data-quality gates.

A training-data pipeline fronts every ingest with distribution checks
(drift, outliers, degenerate partitions). Two tiers:

  * profile_numeric — EXACT grouped quantiles (linear interpolation on the
    sorted values) + min/max/count. Exact percentile buffers each group's
    values in the aggregation state, so it is for dims / samples / bounded
    groups. Its arithmetic (index = p·(n−1), one lerp per quantile) is
    bit-identical to DuckDB's quantile_cont — hash-checkable cross-engine.
  * profile_numeric_approx — the 100 TB path: approx_percentile
    (a mergeable quantile sketch aggregated map-side in constant memory
    per group) with the same output shape. Accuracy dial =
    `accuracy` (10000 ≈ 0.01% rank error); not oracle-comparable by
    construction, so it ships behind the exact variant's tested contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

QUANTILES = (0.5, 0.9, 0.99)


def _finish(df: DataFrame, group_col: str) -> DataFrame:
    return df.selectExpr(
        group_col,
        "n",
        "vmin",
        "vmax",
        "q[0] AS p50",
        "q[1] AS p90",
        "q[2] AS p99",
    )


def profile_numeric(
    df: DataFrame, group_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    qs = ", ".join(f"{q}D" for q in QUANTILES)
    agg = df.groupBy(group_col).agg(
        F.count(value_col).alias("n"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
        F.expr(f"percentile({value_col}, array({qs}))").alias("q"),
    )
    return _finish(agg, group_col)


def profile_numeric_approx(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    accuracy: int = 10000,
) -> DataFrame:
    qs = ", ".join(f"{q}D" for q in QUANTILES)
    agg = df.groupBy(group_col).agg(
        F.count(value_col).alias("n"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
        F.expr(
            f"approx_percentile({value_col}, array({qs}), {accuracy})"
        ).alias("q"),
    )
    return _finish(agg, group_col)
