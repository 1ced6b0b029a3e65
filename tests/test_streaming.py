"""Streaming wrapper: drain a file source with AvailableNow and check the
triples match the batch pipeline on the same input."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from kgx import aggregate, assemble, mentions, relations, resources, synth
from kgx.streaming import stream_job


def test_stream_matches_batch(spark, tmp_path):
    pdf = synth.make_transcripts(n_convs=12, turns_per_conv=6, seed=21, oversize_every=0)
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    # two files → at least two micro-batches with maxFilesPerTrigger=1;
    # split on conv boundary so conversations don't straddle batches
    convs = sorted(pdf["conv_id"].unique())
    half = len(convs) // 2
    pdf[pdf["conv_id"].isin(convs[:half])].to_parquet(f"{src_dir}/a.parquet", index=False)
    pdf[pdf["conv_id"].isin(convs[half:])].to_parquet(f"{src_dir}/b.parquet", index=False)

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    source = stream_job.stream_transcripts_from_files(spark, src_dir, max_files_per_trigger=1)
    q = stream_job.start_kg_stream(spark, source, out_dir, ckpt, available_now=True)
    q.awaitTermination(120)

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

    key = sorted(got.columns)
    g = sorted(map(tuple, got[key].astype(str).values.tolist()))
    w = sorted(map(tuple, want[key].astype(str).values.tolist()))
    assert g == w
