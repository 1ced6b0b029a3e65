"""SparkSession factory with scale-oriented defaults.

Tuned for correctness tests on local[N] but with every knob chosen as it
would be on a 1000-executor cluster reading 100 TB:

  * AQE on (coalesce + skew-join split) — replaces hand-tuned shuffle counts.
  * Arrow enabled — every Python stage is an Arrow-batched pandas UDF.
  * shuffle.partitions sized to cores locally; on a cluster this is set to
    2-3x total executor cores by job.py's --shuffle-partitions flag.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kgx",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        # > 0 guard: "0" passes isdigit() but shuffle.partitions=0 fails
        # deep inside the first shuffle instead of at session construction
        shuffle_partitions = int(cpus) if cpus.isdigit() and int(cpus) > 0 else 32

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # large Arrow batches: at 10k rows/batch the JVM↔python socket
        # round-trips dominate under high task counts (measured 2x wall-time
        # at local[32]); 100k keeps per-batch memory modest (~tens of MB)
        # while amortizing the transfer
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # dynamic partition overwrite = our idempotent re-run primitive
        # (replaces the reference's delete-then-insert per (doc, classifier),
        # ClassifiedDocument.java:76-93) when writing parquet; with an Iceberg
        # catalog the same stage issues MERGE INTO instead.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
