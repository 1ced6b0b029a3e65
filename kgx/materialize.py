"""Stage 7 — graph materialization (S6/S7): triples / nodes / mentions
tables, date-partitioned, idempotent.

The reference writes facts to SQL Server per-document transactions
(CompletePipelineWorker.java:278-288) and audit files into date-partitioned
directories tmp/YYYY/M/D (GlobalParameters.java:359-386). We write
parquet partitioned by ts_day (the days(ts) transform on Iceberg);
`spark.sql.sources.partitionOverwriteMode=dynamic` + a full-pipeline rerun
gives delete-then-insert idempotency per partition — the A5 semantics. With
an Iceberg catalog the same DataFrames go through MERGE INTO on
(conv_id, classifier).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_triples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    triples.write.mode(mode).partitionBy("ts_day").parquet(path)


def write_nodes(nodes: DataFrame, path: str, mode: str = "overwrite") -> None:
    nodes.write.mode(mode).parquet(path)


def mention_evidence(turns_with_mentions: DataFrame) -> DataFrame:
    """PHRASE-table analogue (db_schema.sql:360-374): one row per mention
    span with its phrase type (PHRASE_TYPE values,
    insertAllConstantTypes.sql)."""
    kind_to_phrase = F.create_map(
        F.lit("SO"), F.lit("sentimentObjectPhrase"),
        F.lit("OrientationTerm"), F.lit("orientationPhrase"),
        F.lit("Indicator"), F.lit("indicatorPhrase"),
        F.lit("Feature"), F.lit("featurePhrase"),
    )
    cols = ["conv_id", "turn_idx", "ts_day"] + (
        ["txt_h"] if "txt_h" in turns_with_mentions.columns else []
    )
    ev = turns_with_mentions.select(
        *cols, F.explode("mentions").alias("m")
    ).select(
        *cols,
        F.col("m.begin").alias("begin"),
        F.col("m.end").alias("end"),
        F.col("m.surface").alias("text"),
        kind_to_phrase[F.col("m.kind")].alias("phrase_type"),
    )
    if "txt_h" in ev.columns:
        # late-dedup rule on slim exploded rows: keep only mentions from the
        # winning (min txt_h) text per (conv_id, turn_idx) — the same rule
        # facts_from_turn_features applies — then collapse exact-duplicate
        # rows (identical dup texts hash equal and yield identical spans)
        from pyspark.sql import Window

        w = Window.partitionBy("conv_id", "turn_idx")
        ev = (
            ev.withColumn("_min_h", F.min("txt_h").over(w))
            .filter(F.col("txt_h") == F.col("_min_h"))
            .drop("txt_h", "_min_h")
            .dropDuplicates(["conv_id", "turn_idx", "begin", "end", "phrase_type"])
        )
    return ev.select(
        "conv_id", "turn_idx", "begin", "end", "text", "phrase_type", "ts_day"
    )


def write_mentions(mentions: DataFrame, path: str, mode: str = "overwrite") -> None:
    mentions.write.mode(mode).partitionBy("ts_day").parquet(path)
