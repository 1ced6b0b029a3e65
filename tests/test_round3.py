"""Round-3 regression tests (VERDICT.md r2 'What's wrong')."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from kgx import aggregate, assemble, mentions, relations, resources, synth
from kgx.streaming import stream_job


def test_stream_sink_survives_static_overwrite_mode(spark, tmp_path):
    """The exact condition that broke CORRECTNESS_r02's stream_kg_triples:
    the driver builds its OWN SparkSession, where
    spark.sql.sources.partitionOverwriteMode is Spark's default STATIC.
    Under STATIC, a partitioned mode('overwrite') write wipes the whole
    sink directory every micro-batch, so only the final batch survives.
    The sink must pin dynamic overwrite per-write (writer option) so it is
    correct regardless of session conf."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "static")
    try:
        pdf = synth.make_transcripts(
            n_convs=12, turns_per_conv=6, seed=33, oversize_every=0
        )
        src_dir = str(tmp_path / "src")
        os.makedirs(src_dir)
        convs = sorted(pdf["conv_id"].unique())
        half = len(convs) // 2
        pdf[pdf["conv_id"].isin(convs[:half])].to_parquet(
            f"{src_dir}/a.parquet", index=False
        )
        pdf[pdf["conv_id"].isin(convs[half:])].to_parquet(
            f"{src_dir}/b.parquet", index=False
        )

        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        source = stream_job.stream_transcripts_from_files(
            spark, src_dir, max_files_per_trigger=1
        )
        q = stream_job.start_kg_stream(
            spark, source, out_dir, ckpt, available_now=True
        )
        # cold-session micro-batches (Arrow UDF spin-up + stage compile) can
        # exceed 120s under load; a short timeout here reads the sink
        # mid-stream and fails spuriously
        terminated = q.awaitTermination(600)
        assert terminated, "stream did not drain within 600s"

        got = (
            spark.read.parquet(out_dir)
            .drop("batch_id", "ts_day")
            .withColumn("score", F.col("score").cast("string"))
            .toPandas()
        )

        kb = resources.default_kb()
        turns = assemble.assemble_turns(spark.createDataFrame(pdf))
        wm = mentions.detect_mentions(turns, kb)
        facts, tf = relations.sentence_facts(wm, kb)
        want = (
            aggregate.all_triples(facts, tf)
            .drop("ts_day")
            .withColumn("score", F.col("score").cast("string"))
            .toPandas()
        )

        # Under the pre-fix sink, `got` holds only the LAST micro-batch
        # (roughly half the rows); with the per-write dynamic option the
        # stream output matches the batch pipeline exactly.
        cols = sorted(got.columns)
        g = sorted(map(tuple, got[cols].astype(str).values.tolist()))
        w = sorted(map(tuple, want[cols].astype(str).values.tolist()))
        assert g == w
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
