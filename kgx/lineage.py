"""Stage lineage + resume (S10 / DOCUMENT_VERSION analogue).

The reference writes one DOCUMENT_VERSION row per (document, stage) with the
artifact URL + ontology version (DatabaseFacade.java:236-281) — its audit
trail doubles as a resume marker. Ours: one lineage row per (run, stage)
plus per-partition row counts, appended to a `lineage` parquet table next to
the outputs; a stage whose output dir carries a `_KGX_STAGE_OK` marker is
skipped on resume (the killed-run-resumes-without-recompute contract).

On a real deployment the outputs are Iceberg tables and the marker is the
table's snapshot — `MERGE INTO` on (conv_id, classifier) gives the same
delete-then-insert idempotency as ClassifiedDocument.java:76-93.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from datetime import datetime, timezone

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MARKER = "_KGX_STAGE_OK"


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def stage_output_ok(path: str) -> bool:
    return os.path.exists(os.path.join(path, MARKER))


def mark_stage_ok(path: str, meta: dict | None = None) -> None:
    with open(os.path.join(path, MARKER), "w") as f:
        json.dump(meta or {}, f)


def partition_counts(df: DataFrame) -> DataFrame:
    """rows per physical partition — the per-partition metric rows."""
    return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count(F.lit(1)).alias("rows")
    )


def append_partition_lineage(
    spark: SparkSession,
    lineage_dir: str,
    run_id: str,
    stage: str,
    out_path: str,
    kb_version: str | None = None,
) -> None:
    """Per-partition metric rows for a stage's written output: one lineage
    row per physical scan partition with its row count (partition_id set;
    the stage summary row keeps partition_id NULL). Computed by re-reading
    the output with zero data columns — parquet satisfies a bare count from
    footer row counts, so this is a metadata-priced pass even on a 100 TB
    output — and written distributed (no driver collect)."""
    counts = partition_counts(spark.read.parquet(out_path))
    counts.select(
        F.lit(run_id).alias("run_id"),
        F.lit(stage).alias("stage"),
        F.col("partition_id").cast("int"),
        F.lit(None).cast("long").alias("rows_in"),
        F.col("rows").cast("long").alias("rows_out"),
        F.lit(None).cast("long").alias("wall_ms"),
        # cast: the default kb_version=None would otherwise be a VOID-type
        # literal column, which the parquet writer rejects
        F.lit(kb_version).cast("string").alias("kb_version"),
        F.current_timestamp().alias("ts"),
    ).write.mode("append").parquet(lineage_dir)


def append_lineage(
    spark: SparkSession,
    lineage_dir: str,
    run_id: str,
    stage: str,
    rows_in: int | None,
    rows_out: int | None,
    wall_ms: int,
    kb_version: str | None = None,
) -> None:
    row = [
        (
            run_id,
            stage,
            None,
            rows_in,
            rows_out,
            wall_ms,
            kb_version,
            datetime.now(timezone.utc).replace(tzinfo=None),
        )
    ]
    from kgx import schema

    spark.createDataFrame(row, schema.LINEAGE).coalesce(1).write.mode("append").parquet(
        lineage_dir
    )


class StageTimer:
    def __enter__(self):
        self.t0 = time.monotonic()
        return self

    def __exit__(self, *exc):
        self.wall_ms = int((time.monotonic() - self.t0) * 1000)
        return False
