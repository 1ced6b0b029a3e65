"""Structured-Streaming rows: the KG stream, conversation docs, windowed
counts, stream joins, dedup, SCD2 and entity-carryover streams (batch-
oracle-sharing twins).

Split out of kgx/queries.py in round 5 (VERDICT r4 #7) — bodies moved
verbatim; kgx.queries re-exports everything and holds the ordered
REGISTRY.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kgx import aggregate as agg_mod
from kgx import (
    asof,
    assemble,
    dedup,
    graph,
    linking,
    mentions,
    multimodal,
    relations,
    resources,
    similarity,
    textops,
)

from kgx.rows.base import _t  # noqa: E501
from kgx.rows.kg import _KG_COLS, _doc_transcripts, _kg_mt_run, _kg_run  # noqa: E501

def _stream_workdir(tag: str) -> str:
    """Bounded scratch dir for a streaming registry query: a DETERMINISTIC
    per-(query, process) path, wiped on entry. mkdtemp leaked a full copy
    of the source table + sink + checkpoint per invocation (a driver loop
    re-running the registry accumulated copies until /tmp filled); reusing
    one path per query bounds the footprint to a single copy. The returned
    sink stays on disk after the call BY DESIGN — the returned DataFrame
    reads it lazily, so it must survive until the caller materializes."""
    import os
    import shutil
    import tempfile

    base = os.path.join(tempfile.gettempdir(), "kgx_stream_q", f"{tag}_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    return base
def stream_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL structured-streaming wrapper (kgx.streaming.stream_job):
    documents-as-transcripts written to a file source, drained with
    Trigger.AvailableNow through foreachBatch extract→triples, then the
    materialized sink compared against the SAME DuckDB oracle as the batch
    kg_* trio — streaming must equal batch on identical input (each conv is
    a single turn here, so no conversation straddles a micro-batch)."""
    import os
    import tempfile

    from kgx.streaming import stream_job

    base = _stream_workdir("kg")
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    _doc_transcripts(spark, sf_dir).repartition(4).write.parquet(src)
    source = stream_job.stream_transcripts_from_files(
        spark, src, max_files_per_trigger=2
    )
    q = stream_job.start_kg_stream(
        spark, source, out, ckpt, kb=resources.driver_kb(), available_now=True
    )
    q.awaitTermination(600)
    return (
        spark.read.parquet(out)
        .select(*_KG_COLS)
        .withColumn("score", F.col("score").cast("double"))
    )
def stream_conversation_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState,
    kgx.streaming.stateful): documents-as-transcripts fed through a file
    source in multiple micro-batches; conversations buffer in keyed state
    and emit once the event-time watermark passes last_turn + gap. Two
    far-future sentinel files advance the watermark so every data
    conversation closes deterministically; the oracle recomputes the
    per-conversation docs in SQL (single-turn convs here, so doc_text =
    text and the ts bounds are the shared literal timestamp)."""
    import os as _os
    import tempfile

    from kgx.streaming import stateful

    base = _stream_workdir("state")
    src, out, ckpt = (_os.path.join(base, d) for d in ("src", "out", "ckpt"))
    _os.makedirs(src)

    tr = _doc_transcripts(spark, sf_dir)
    half = tr.filter(F.col("conv_id").cast("long") % 2 == 0)
    other = tr.filter(F.col("conv_id").cast("long") % 2 == 1)
    half.coalesce(1).write.parquet(f"{src}/p0")
    other.coalesce(1).write.parquet(f"{src}/p1")

    def sentinel(name: str, ts: str) -> None:
        spark.createDataFrame(
            [(name, 0, "user", "s", None, ts)],
            "conv_id string, turn_idx int, role string, text string, tool string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(
            f"{src}/{name}"
        )

    sentinel("__s1", "2025-01-02 00:00:00")
    sentinel("__s2", "2025-01-03 00:00:00")
    # file order == batch order: data first, sentinels last (modification
    # times ascending in EXPLICIT logical order — an alphabetical listing
    # would put the __sentinels first and the watermark would then drop
    # every data row as late)
    import glob

    for i, name in enumerate(("p0", "p1", "__s1", "__s2")):
        for f in glob.glob(f"{src}/{name}/*"):
            _os.utime(f, (1000 + i, 1000 + i))

    from kgx import schema as _schema

    source = (
        spark.readStream.schema(_schema.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    docs = stateful.sessionize_conversations(
        source, gap="10 minutes", gap_ms=10 * 60 * 1000
    )
    q = (
        docs.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return (
        spark.read.parquet(out)
        .filter(~F.col("conv_id").startswith("__"))
        .select("conv_id", "n_turns", "doc_text", "ts_min_ms", "ts_max_ms")
    )
def stream_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (kgx.streaming.dedup_stream): the documents
    table replayed TWICE through a file source — the second micro-batch is
    byte-identical to the first, so every one of its rows must be
    suppressed by the keyed dedup STATE carried across batches (the
    near-line at-most-once-per-content guarantee). Output is the distinct
    content-key set, which is deterministic regardless of which twin won
    each key; the oracle recomputes the same normalized-text md5 keys from
    the table at rest."""
    import glob as _glob
    import os as _os
    import tempfile

    from kgx import schema as _schema
    from kgx.streaming import dedup_stream

    base = _stream_workdir("dedup")
    src, out, ckpt = (_os.path.join(base, d) for d in ("src", "out", "ckpt"))
    _os.makedirs(src)

    tr = _doc_transcripts(spark, sf_dir)
    tr.coalesce(1).write.parquet(f"{src}/p0")
    tr.coalesce(1).write.parquet(f"{src}/p1")
    for i, name in enumerate(("p0", "p1")):
        for f in _glob.glob(f"{src}/{name}/*"):
            _os.utime(f, (1000 + i, 1000 + i))

    source = (
        spark.readStream.schema(_schema.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    deduped = dedup_stream.dedup_stream_exact(source).select(
        F.col("_ck").alias("content_key")
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.read.parquet(out).select("content_key").distinct()
STREAM_DEDUP_SQL = """
SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
  AS content_key
FROM documents
"""
# 2025-01-01 00:00:00 UTC = 1735689600000 ms
STREAM_CONV_DOCS_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS conv_id,
       CAST(1 AS INTEGER) AS n_turns,
       text AS doc_text,
       CAST(1735689600000 AS BIGINT) AS ts_min_ms,
       CAST(1735689600000 AS BIGINT) AS ts_max_ms
FROM documents
"""
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window streaming aggregation (SURVEY §2.8,
    kgx.streaming.windowed): the events table replayed through a file
    source in 3 micro-batches, 1-day event-time windows per event_type,
    append mode — each window emits exactly once, when the watermark
    passes its end. Two far-future sentinel files drain the final
    windows (the streaming analogue of the reference's FINISH message,
    CompletePipelineReceiver.java semantics); the sentinels' own 2030
    windows never close, so they advance the watermark without emitting
    (see kgx.streaming.windowed on why they must NOT be filtered
    pre-aggregation). Sums accumulate in DECIMAL(18,2), so the result is
    bit-identical to the batch oracle regardless of partitioning."""
    import glob as _glob
    import os as _os
    import tempfile

    from kgx.streaming import windowed

    base = _stream_workdir("windowed")
    src, out, ckpt = (_os.path.join(base, d) for d in ("src", "out", "ckpt"))
    _os.makedirs(src)

    ev = _t(spark, sf_dir, "events")
    schema = ev.schema
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/p0")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/p1")
    # TWO sentinels, both inside the SAME 1-day window: the watermark a
    # batch uses is computed from earlier batches, so the first far-future
    # row advances the watermark and the second's batch (plus the trailing
    # no-data batch) flushes the now-closed final windows; the shared
    # sentinel window [2030-01-01, 2030-01-02) itself never closes (final
    # watermark 2030-01-01 11:59), so no __drain row reaches the sink
    for sn, sts in (("__s1", "2030-01-01 00:00:00"), ("__s2", "2030-01-01 12:00:00")):
        spark.createDataFrame(
            [(int(-1), sts, int(0), "__drain", 0.0, None)],
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(
            f"{src}/{sn}"
        )
    # file mtimes define micro-batch order: data first, sentinels last
    # (otherwise the watermark jumps to 2030 in batch 0 and every real
    # event is dropped as late)
    for i, name in enumerate(("p0", "p1", "__s1", "__s2")):
        for f in _glob.glob(f"{src}/{name}/*"):
            _os.utime(f, (1000 + i, 1000 + i))

    source = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
        # parquet stores TIMESTAMP_NTZ; EventTimeWatermark requires
        # session-tz TIMESTAMP (equal values — session tz is UTC)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = windowed.windowed_event_counts(source, delay="1 minute")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return (
        spark.read.parquet(out)
        .filter(~F.col("event_type").startswith(windowed.SENTINEL_PREFIX))
        .select("window_start", "event_type", "n_events", "sum_value")
    )
STREAM_WINDOWED_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""
def stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (kgx.streaming.joins): the
    events table replayed chronologically in two micro-batches through TWO
    file-source streams (clicks / purchases), each purchase attributed to
    same-user clicks in the preceding hour. Inner-join rows emit as soon
    as both sides arrive, so the AvailableNow drain needs no sentinels —
    the chronological split guarantees no on-time row is ever behind the
    watermark; the watermarks + time-range bound exist to evict join
    state, the thing that matters on an unbounded feed."""
    import glob as _glob
    import os as _os
    import tempfile

    from kgx.streaming import joins

    base = _stream_workdir("join")
    src, out, ckpt = (_os.path.join(base, d) for d in ("src", "out", "ckpt"))
    _os.makedirs(src)

    ev = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    cut = F.lit("2024-01-16").cast("timestamp")
    ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(f"{src}/p0")
    ev.filter(F.col("ts") >= cut).coalesce(1).write.parquet(f"{src}/p1")
    for i, name in enumerate(("p0", "p1")):
        for f in _glob.glob(f"{src}/{name}/*"):
            _os.utime(f, (1000 + i, 1000 + i))

    def side(etype: str) -> DataFrame:
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .filter(F.col("event_type") == etype)
        )

    j = joins.attribute_purchases(side("click"), side("purchase"))
    q = (
        j.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.read.parquet(out).select(
        "click_id", "purchase_id", "user_id", "gap_sec"
    )
STREAM_JOIN_SQL = """
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_sec
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""
def stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join
    (kgx.streaming.joins.attribute_purchases_outer): unlike the inner
    variant, the NULL rows for never-converted clicks can only emit once
    the global watermark proves no matching purchase will arrive — so the
    AvailableNow drain appends two far-future sentinel files (one click +
    one purchase each, negative user ids) that push the final watermark
    past every real click's eviction horizon while staying inside their
    OWN horizon (the streaming analogue of the reference's FINISH
    message). Sentinels are filtered from the sink read; every real click
    appears at least once, matched or NULL."""
    import glob as _glob
    import os as _os
    import tempfile

    from kgx.streaming import joins

    base = _stream_workdir("join_outer")
    src, out, ckpt = (_os.path.join(base, d) for d in ("src", "out", "ckpt"))
    _os.makedirs(src)

    ev = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    cut = F.lit("2024-01-16").cast("timestamp")
    ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(f"{src}/p0")
    ev.filter(F.col("ts") >= cut).coalesce(1).write.parquet(f"{src}/p1")
    # two sentinel batches: the watermark a batch uses comes from EARLIER
    # batches, so s1 advances it to 2030 and s2's batch flushes the
    # now-evictable clicks; all four sentinel rows sit within one hour of
    # each other, so no sentinel click's own horizon is ever passed
    sent = [
        ("__s1", -1, "2030-01-01 00:00:00", "click", -1),
        ("__s1", -2, "2030-01-01 00:30:00", "purchase", -2),
        ("__s2", -3, "2030-01-01 00:40:00", "click", -3),
        ("__s2", -4, "2030-01-01 00:45:00", "purchase", -4),
    ]
    for sn in ("__s1", "__s2"):
        spark.createDataFrame(
            [(int(eid), ts, int(uid), et, 0.0, None) for f_, eid, ts, et, uid in sent if f_ == sn],
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(
            f"{src}/{sn}"
        )
    for i, name in enumerate(("p0", "p1", "__s1", "__s2")):
        for f in _glob.glob(f"{src}/{name}/*"):
            _os.utime(f, (1000 + i, 1000 + i))

    def side(etype: str) -> DataFrame:
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .filter(F.col("event_type") == etype)
        )

    j = joins.attribute_purchases_outer(side("click"), side("purchase"))
    q = (
        j.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return (
        spark.read.parquet(out)
        .filter(F.col("user_id") >= 0)
        .select("click_id", "purchase_id", "user_id", "gap_sec")
    )
STREAM_JOIN_OUTER_SQL = """
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_sec
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
"""
def stream_entity_carryover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of kg_entity_carryover (applyInPandasWithState,
    kgx.streaming.carryover_stream): the same 50 multi-turn conversations
    fed through a file source with turns deliberately OUT OF ORDER across
    micro-batches (odd turns arrive a batch before even turns); per-turn
    SO sets come from the Arrow-UDF mention stage running as a stateless
    streaming projection, conversations buffer in keyed state and emit
    their carryover rows when the watermark closes them. Emitting only at
    close makes the out-of-order arrival safe — and the output therefore
    equals the batch operator's, so this streaming query shares the batch
    oracle SQL verbatim (a full value-hash-checked stateful stream)."""
    import glob as _glob
    import os as _os

    from kgx import schema as _schema
    from kgx.streaming import carryover_stream

    base = _stream_workdir("carry")
    src, out, ckpt = (_os.path.join(base, d) for d in ("src", "out", "ckpt"))
    _os.makedirs(src)

    docs = _t(spark, sf_dir, "documents")
    tr = docs.select(
        (F.col("doc_id") % 50).cast("string").alias("conv_id"),
        F.floor(F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    # odd turns FIRST: a later micro-batch delivers EARLIER turns, proving
    # the close-time emission is arrival-order independent
    tr.filter(F.col("turn_idx") % 2 == 1).coalesce(1).write.parquet(f"{src}/p0")
    tr.filter(F.col("turn_idx") % 2 == 0).coalesce(1).write.parquet(f"{src}/p1")

    def sentinel(name: str, ts: str) -> None:
        spark.createDataFrame(
            [(name, 0, "user", "s", None, ts)],
            "conv_id string, turn_idx int, role string, text string, tool string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(
            f"{src}/{name}"
        )

    sentinel("__s1", "2025-01-02 00:00:00")
    sentinel("__s2", "2025-01-03 00:00:00")
    # file order == batch order (see stream_conversation_docs): data first,
    # sentinels last, modification times ascending
    for i, name in enumerate(("p0", "p1", "__s1", "__s2")):
        for f in _glob.glob(f"{src}/{name}/*"):
            _os.utime(f, (1000 + i, 1000 + i))

    source = (
        spark.readStream.schema(_schema.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    so = mentions.so_sets(source, resources.driver_kb())
    rows = carryover_stream.carryover_conversations(
        so, gap="10 minutes", gap_ms=10 * 60 * 1000
    )
    q = (
        rows.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.read.parquet(out).filter(~F.col("conv_id").startswith("__"))
def stream_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of events_scd2 (applyInPandasWithState,
    kgx.streaming.scd2_stream): the same changelog fed through a file
    source with rows deliberately OUT OF ORDER across micro-batches (odd
    event_ids arrive a batch before even ones); keys buffer change rows
    in state and emit their full interval set when the watermark closes
    them — which is what makes the reordering safe, so this stream shares
    the batch oracle SQL (EVENTS_SCD2_SQL) verbatim. gap=60 days exceeds
    the corpus's one-month span: every key closes exactly once at the
    sentinel-driven drain (see the operator docstring for the production
    quiet-gap + MERGE contract)."""
    import glob as _glob
    import os as _os

    from kgx.streaming import scd2_stream

    base = _stream_workdir("scd2")
    src, out, ckpt = (_os.path.join(base, d) for d in ("src", "out", "ckpt"))
    _os.makedirs(src)

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/p0")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/p1")

    def sentinel(name: str, ts: str) -> None:
        spark.createDataFrame(
            [(-1, -1, ts, 0.0)],
            "user_id long, event_id long, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(
            f"{src}/{name}"
        )

    sentinel("__s1", "2024-06-01 00:00:00")
    sentinel("__s2", "2024-06-02 00:00:00")
    for i, name in enumerate(("p0", "p1", "__s1", "__s2")):
        for f in _glob.glob(f"{src}/{name}/*"):
            _os.utime(f, (1000 + i, 1000 + i))

    source = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    rows = scd2_stream.scd2_events(source, gap="60 days")
    q = (
        rows.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.read.parquet(out).filter(F.col("user_id") >= 0)
def stream_tool_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of kg_tool_transitions (applyInPandasWithState,
    kgx.streaming.transitions_stream): the same multi-turn fold with the
    same md5-derived tool column, fed through a file source with turns
    deliberately OUT OF ORDER across micro-batches (odd turns a batch
    before even turns — every bigram spans the boundary or arrives
    reversed). Conversations buffer (turn_idx, tool) in keyed state and
    emit their adjacent-turn bigrams when the watermark closes them; the
    corpus-wide matrix (counts + row-normalized p) is a batch aggregation
    over the sink. Close-time emission makes the result equal the batch
    operator's, so this stream shares KG_TOOL_TRANSITIONS_SQL verbatim —
    a full value-hash-checked stateful stream."""
    import glob as _glob
    import os as _os

    from kgx.dedup import md5_hash60
    from kgx.streaming import transitions_stream

    base = _stream_workdir("toolt")
    src, out, ckpt = (_os.path.join(base, d) for d in ("src", "out", "ckpt"))
    _os.makedirs(src)

    from kgx.rows.kg import _TT_TOOLS

    docs = _t(spark, sf_dir, "documents")
    pick = (
        md5_hash60(
            F.concat_ws(
                ":",
                (F.col("doc_id") % 50).cast("string"),
                F.floor(F.col("doc_id") / 50).cast("int").cast("string"),
                F.lit("tool"),
            )
        )
        % F.lit(len(_TT_TOOLS))
        + 1
    ).cast("int")
    tr = docs.select(
        (F.col("doc_id") % 50).cast("string").alias("conv_id"),
        F.floor(F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.element_at(F.array(*[F.lit(t) for t in _TT_TOOLS]), pick).alias("tool"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    tr.filter(F.col("turn_idx") % 2 == 1).coalesce(1).write.parquet(f"{src}/p0")
    tr.filter(F.col("turn_idx") % 2 == 0).coalesce(1).write.parquet(f"{src}/p1")

    def sentinel(name: str, ts: str) -> None:
        spark.createDataFrame(
            [(name, 0, None, ts)],
            "conv_id string, turn_idx int, tool string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(
            f"{src}/{name}"
        )

    sentinel("__s1", "2025-01-02 00:00:00")
    sentinel("__s2", "2025-01-03 00:00:00")
    for i, name in enumerate(("p0", "p1", "__s1", "__s2")):
        for f in _glob.glob(f"{src}/{name}/*"):
            _os.utime(f, (1000 + i, 1000 + i))

    source = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    rows = transitions_stream.transition_conversations(source, gap="10 minutes")
    q = (
        rows.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    bigrams = spark.read.parquet(out).filter(~F.col("conv_id").startswith("__"))
    cnt = bigrams.groupBy("tool", "next_tool").agg(F.count("*").alias("n"))
    per_tool = Window.partitionBy("tool")
    return cnt.select(
        "tool",
        "next_tool",
        "n",
        F.sum("n").over(per_tool).alias("row_total"),
        (F.col("n").cast("double") / F.sum("n").over(per_tool)).alias("p"),
    )
def stream_fact_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of kg_fact_fusion (foreachBatch, kgx.streaming.
    fusion_stream): the SAME sentence-triple evidence split across three
    micro-batches BY CONVERSATION (conv_id % 3 — every fused key receives
    votes from multiple batches, so the additive vote merge is really
    exercised), drained into a batch-keyed vote-delta log, then fused
    through canonical.fuse_votes. Vote counts are additive-mergeable, so
    the result equals batch fusion regardless of the batch split — this
    row shares KG_FUSION_SQL verbatim. Replay safety comes from the
    batch-keyed partition overwrite, not from a transactional sink (see
    the module docstring)."""
    import os as _os

    from kgx.streaming import fusion_stream

    facts, _tf = _kg_run(spark, sf_dir)
    tri = agg_mod.sentence_triples(facts).select(
        "conv_id", "subj_uri", "pred", "obj_polarity"
    )
    base = _stream_workdir("fusion")
    src, votes, ckpt = (_os.path.join(base, d) for d in ("src", "votes", "ckpt"))
    _os.makedirs(src)
    for i in range(3):
        tri.filter(F.col("conv_id").cast("long") % 3 == i).select(
            "subj_uri", "pred", "obj_polarity"
        ).coalesce(1).write.parquet(f"{src}/p{i}")

    source = (
        spark.readStream.schema(
            "subj_uri string, pred string, obj_polarity string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = fusion_stream.start_fusion_stream(
        spark, source, votes, ckpt, available_now=True
    )
    q.awaitTermination(600)
    return fusion_stream.read_fused(spark, votes)
def stream_temporal_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of kg_temporal_validity (foreachBatch, kgx.streaming.
    validity_stream): the SAME multiturn sentence facts split across three
    micro-batches BY TURN PARITY-then-conv (turn_idx % 3 — every
    conversation's interval sequence receives evidence from multiple
    batches ARRIVING OUT OF TURN ORDER), drained into a batch-keyed
    evidence-delta log, then run-length encoded through the SHARED batch
    operator (aggregate.temporal_validity consumes the merged log).
    Per-turn evidence is additive-mergeable, so the result equals the
    batch row regardless of the split or order — this row shares
    KG_TEMPORAL_SQL verbatim. Replay safety comes from the batch-keyed
    partition overwrite (fusion_stream's additive-counter contract)."""
    import os as _os

    from kgx.streaming import validity_stream

    facts, _tf = _kg_mt_run(spark, sf_dir)
    slim = facts.select("conv_id", "entity_name", "pred", "turn_idx", "score_i")
    base = _stream_workdir("validity")
    src, log, ckpt = (_os.path.join(base, d) for d in ("src", "log", "ckpt"))
    _os.makedirs(src)
    # out-of-order delivery: later turns arrive in EARLIER batches
    for i, rem in enumerate((2, 1, 0)):
        slim.filter(F.col("turn_idx") % 3 == rem).coalesce(1).write.parquet(
            f"{src}/p{i}"
        )

    source = (
        spark.readStream.schema(
            "conv_id string, entity_name string, pred string, "
            "turn_idx int, score_i long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = validity_stream.start_validity_stream(
        spark, source, log, ckpt, available_now=True
    )
    q.awaitTermination(600)
    return validity_stream.read_intervals(spark, log)
