"""Incremental knowledge fusion over an evidence-triple stream
(foreachBatch + batch-keyed vote-delta log).

Batch fusion (kgx.canonical.fact_fusion) resolves each (subject,
predicate) to one value by majority vote over ALL evidence. On a live
extraction stream the evidence never stops, but vote counts are
ADDITIVE-MERGEABLE — so the streaming form maintains a vote table and
re-derives the fused facts at any point, with exactly the batch
operator's winner pick (canonical.fuse_votes is shared verbatim).

Exactly-once without a transactional sink: each micro-batch writes its
per-(key, value) vote DELTA to its own `batch=<id>` partition with
overwrite — Structured Streaming replays a failed batch under the SAME
batch_id, so a replay overwrites its own partition instead of
double-counting (the additive-counter analogue of the repo's A5
batch-keyed overwrite; a MERGE-increment would need a transactional
target to be replay-safe). Readers aggregate the delta log through
fuse_votes; a long-running deployment periodically COMPACTS the log by
summing closed partitions into a base table via
materialize.merge_upsert_parquet (counts merge by addition, so
compaction commutes with ongoing appends of newer batches).

State shape at scale: the vote table is bounded by distinct
(subject, predicate, value) — never by evidence volume; each batch
shuffles only its own delta (map-side combined), and the fused read is
one vote-table-sized aggregation + the bounded winner window.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

VOTE_KEYS = ["subj_uri", "pred", "obj_polarity"]


def vote_delta(batch_df: DataFrame) -> DataFrame:
    """Per-(key, value) vote counts of one micro-batch (map-side
    combined; the only shuffle a batch pays)."""
    return batch_df.groupBy(*VOTE_KEYS).agg(
        F.count("*").cast("long").alias("n_votes_winner")
    )


def start_fusion_stream(
    spark,
    triples,
    votes_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Drain an evidence-triple stream (subj_uri, pred, obj_polarity)
    into a batch-keyed vote-delta log at votes_path. Returns the
    StreamingQuery; read the fused table afterwards with
    read_fused(spark, votes_path)."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        vote_delta(batch_df).coalesce(1).write.mode("overwrite").parquet(
            f"{votes_path}/batch={batch_id}"
        )

    writer = (
        triples.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_fused(spark, votes_path: str) -> DataFrame:
    """Fused facts from the vote-delta log — equals batch fact_fusion
    over the same evidence regardless of how batches split it."""
    from kgx import canonical

    votes = spark.read.parquet(f"{votes_path}/batch=*")
    return canonical.fuse_votes(votes)
