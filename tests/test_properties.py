"""Property tests (SURVEY.md §5 item 6): scoring algebra bounds,
row-order/permutation invariance, deterministic re-runs, and job resume."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from kgx import aggregate, assemble, job, mentions, relations, resources, synth


def _triples(spark, pdf):
    kb = resources.default_kb()
    turns = assemble.assemble_turns(spark.createDataFrame(pdf))
    wm = mentions.detect_mentions(turns, kb)
    facts, tf = relations.sentence_facts(wm, kb)
    t = aggregate.all_triples(facts, tf)
    return sorted(
        map(
            tuple,
            t.withColumn("score", F.col("score").cast("string"))
            .toPandas()
            .astype(str)
            .values.tolist(),
        )
    )


def test_row_order_invariance(spark):
    """Input row order must not affect the triple set (shuffle order never
    leaks: W1 sort_array + groupBy are order-insensitive)."""
    pdf = synth.make_transcripts(n_convs=15, turns_per_conv=8, seed=33, oversize_every=0)
    shuffled = pdf.sample(frac=1.0, random_state=99).reset_index(drop=True)
    assert _triples(spark, pdf) == _triples(spark, shuffled)


def test_rerun_determinism(spark):
    pdf = synth.make_transcripts(n_convs=10, turns_per_conv=6, seed=44, oversize_every=0)
    assert _triples(spark, pdf) == _triples(spark, pdf)


@given(pos=st.integers(0, 50), neg=st.integers(0, 50))
@settings(max_examples=50, deadline=None)
def test_score_algebra_bounds(pos, neg):
    """score ∈ [-1, 1]; sign(score) consistent with counts; NaN guard."""
    if pos + neg == 0:
        return  # guarded row never emitted
    score = (pos - neg) / (pos + neg)
    assert -1.0 <= score <= 1.0
    if pos > neg:
        assert score > 0
    elif neg > pos:
        assert score < 0
    else:
        assert score == 0
    assert resources.dom_label(abs(score)) in {
        "no amount", "small amount", "moderate amount", "large amount", "maximum amount",
    }


def test_job_resume_skips_completed_stages(spark, tmp_path):
    pdf = synth.make_transcripts(n_convs=8, turns_per_conv=5, seed=55, oversize_every=0)
    inp = str(tmp_path / "in.parquet")
    pdf.to_parquet(inp, index=False)
    out = str(tmp_path / "kg")

    transcripts = spark.read.parquet(inp)
    paths = job.run_pipeline(spark, transcripts, out, resume=True)
    first = spark.read.parquet(paths["triples"]).count()
    extract_mtime = os.path.getmtime(os.path.join(paths["facts"], "_KGX_STAGE_OK"))

    # full re-run: everything skipped, outputs identical, extract untouched
    paths2 = job.run_pipeline(spark, transcripts, out, resume=True)
    assert spark.read.parquet(paths2["triples"]).count() == first
    assert os.path.getmtime(os.path.join(paths["facts"], "_KGX_STAGE_OK")) == extract_mtime

    # simulate kill after extract: downstream marker removed → only that
    # stage recomputes; extract stays untouched
    os.remove(os.path.join(paths["triples"], "_KGX_STAGE_OK"))
    job.run_pipeline(spark, transcripts, out, resume=True)
    assert spark.read.parquet(paths["triples"]).count() == first
    assert os.path.getmtime(os.path.join(paths["facts"], "_KGX_STAGE_OK")) == extract_mtime
