"""Incremental temporal-validity intervals over a fact-evidence stream
(foreachBatch + batch-keyed evidence-delta log).

Batch temporal validity (kgx.aggregate.temporal_validity) run-length
encodes the turn-ordered polarity sequence of every (conversation,
subject, predicate). On a live extraction stream the per-turn evidence is
ADDITIVE-MERGEABLE — sum(score_i) per (conv, subject, pred, turn) —
so the streaming form maintains an evidence log and re-derives the
interval set at any point, through exactly the batch operator
(aggregate.temporal_validity is shared verbatim: the log rows are fed
back as facts-shaped rows whose score is the accumulated evidence, and
the operator's own per-turn sum performs the cross-batch merge).

Exactly-once without a transactional sink: each micro-batch writes its
per-(conv, subject, pred, turn) evidence DELTA to its own `batch=<id>`
partition with overwrite — Structured Streaming replays a failed batch
under the SAME batch_id, so a replay overwrites its own partition
instead of double-counting (the additive-counter contract shared with
fusion_stream; see that module for the compaction story, which applies
unchanged because evidence sums commute).

Unlike the watermark-closed stateful streams (carryover, SCD2), arrival
order NEVER matters here: interval assembly happens at read time over
the merged log, so out-of-order turns, conversations straddling batches
and replays all produce byte-identical interval tables.

State shape at scale: the log is bounded by distinct (conv, subject,
pred, turn) — never by evidence volume; each batch shuffles only its own
delta (map-side combined), and the interval read is one log-sized
aggregation + the run-encoding window chain.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

EVIDENCE_KEYS = ["conv_id", "name_lc", "pred", "turn_idx"]


def evidence_delta(batch_df: DataFrame) -> DataFrame:
    """Per-(conv, subject, pred, turn) evidence sums of one micro-batch
    (map-side combined; the only shuffle a batch pays)."""
    return batch_df.groupBy(
        "conv_id",
        F.lower("entity_name").alias("name_lc"),
        "pred",
        "turn_idx",
    ).agg(F.sum("score_i").cast("bigint").alias("evidence"))


def start_validity_stream(
    spark,
    facts,
    log_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Drain a fact stream (conv_id, entity_name, pred, turn_idx,
    score_i) into a batch-keyed evidence-delta log at log_path. Returns
    the StreamingQuery; read the interval table afterwards with
    read_intervals(spark, log_path)."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        evidence_delta(batch_df).coalesce(1).write.mode("overwrite").parquet(
            f"{log_path}/batch={batch_id}"
        )

    writer = (
        facts.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_intervals(spark, log_path: str) -> DataFrame:
    """Validity intervals from the evidence-delta log — equals batch
    temporal_validity over the same facts regardless of how batches
    split or reordered them."""
    from kgx import aggregate

    ev = spark.read.parquet(f"{log_path}/batch=*")
    shaped = ev.select(
        "conv_id",
        F.col("name_lc").alias("entity_name"),
        "pred",
        "turn_idx",
        F.col("evidence").alias("score_i"),
    )
    return aggregate.temporal_validity(shaped)
