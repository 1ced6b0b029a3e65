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


# ---------------------------------------------------------------------------
# late (slim) dedup vs early (full-text) dedup
# ---------------------------------------------------------------------------

def _triples_set(t):
    import pyspark.sql.functions as F

    return sorted(
        map(
            tuple,
            t.withColumn("score", F.col("score").cast("string"))
            .toPandas()
            .astype(str)
            .values.tolist(),
        )
    )


def test_late_dedup_matches_early_on_exact_duplicates(spark):
    """admit_turns + slim dedup ≡ assemble_turns (early full-text dedup)
    when duplicate (conv_id, turn_idx) rows carry identical text."""
    pdf = synth.make_transcripts(n_convs=12, turns_per_conv=4, seed=77, oversize_every=0)
    dup = pdf.sample(n=10, random_state=1)  # exact duplicate rows
    import pandas as pd

    noisy = pd.concat([pdf, dup], ignore_index=True)
    kb = resources.default_kb()

    early = spark.createDataFrame(noisy)
    t_early = aggregate.all_triples(
        *relations.extract_facts(assemble.assemble_turns(early), kb)
    )
    late = assemble.admit_turns(spark.createDataFrame(noisy))
    t_late = aggregate.all_triples(*relations.extract_facts(late, kb))
    assert _triples_set(t_early) == _triples_set(t_late)


def test_late_dedup_deterministic_on_conflicting_duplicates(spark):
    """Conflicting duplicate texts resolve to the min-txt_h winner: the
    output is identical across runs and row orders (the parallel,
    order-independent analogue of the reference's first-writer-wins)."""
    import pandas as pd

    pdf = synth.make_transcripts(n_convs=10, turns_per_conv=3, seed=78, oversize_every=0)
    conflict = pdf.sample(n=6, random_state=2).copy()
    conflict["text"] = conflict["text"] + " big big fast"
    noisy = pd.concat([pdf, conflict], ignore_index=True)
    shuffled = noisy.sample(frac=1.0, random_state=3).reset_index(drop=True)
    kb = resources.default_kb()

    def run(frame):
        turns = assemble.admit_turns(spark.createDataFrame(frame))
        return _triples_set(aggregate.all_triples(*relations.extract_facts(turns, kb)))

    r1, r2 = run(noisy), run(shuffled)
    assert r1 == r2
    # exactly one winner per (conv_id, turn_idx): no duplicated sentence rows
    from collections import Counter

    turns = assemble.admit_turns(spark.createDataFrame(noisy))
    tf = relations.extract_facts(turns, kb)[1]
    keys = [(r["conv_id"], r["turn_idx"]) for r in tf.select("conv_id", "turn_idx").collect()]
    assert max(Counter(keys).values()) == 1


def test_mention_evidence_dedup_consistent_with_facts(spark):
    """The evidence path applies the same min-txt_h winner rule, so spans
    come from the same text the facts were computed from."""
    import pandas as pd

    from kgx import materialize, mentions as mentions_mod

    pdf = synth.make_transcripts(n_convs=6, turns_per_conv=3, seed=79, oversize_every=0)
    conflict = pdf.head(4).copy()
    conflict["text"] = "zzz " + conflict["text"]
    noisy = pd.concat([pdf, conflict], ignore_index=True)

    kb = resources.default_kb()
    turns = assemble.admit_turns(spark.createDataFrame(noisy))
    ev = materialize.mention_evidence(mentions_mod.detect_mentions(turns, kb))
    # winner text hash per (conv, turn) from the dedup rule
    import pyspark.sql.functions as F

    winners = (
        turns.groupBy("conv_id", "turn_idx")
        .agg(F.min_by("text", "txt_h").alias("wtext"))
        .collect()
    )
    wmap = {(r["conv_id"], r["turn_idx"]): r["wtext"] for r in winners}
    for r in ev.collect():
        wt = wmap[(r["conv_id"], r["turn_idx"])]
        assert wt[r["begin"]:r["end"]].lower() == r["text"].lower()


def test_salted_rollup_matches_unsalted(spark):
    """--salt path: two-phase salted document rollup produces identical
    triples to the direct groupBy (same totals, same first-wins subject)."""
    pdf = synth.make_transcripts(n_convs=20, turns_per_conv=6, seed=91, oversize_every=0)
    kb = resources.default_kb()
    turns = assemble.admit_turns(spark.createDataFrame(pdf))
    facts, tf = relations.extract_facts(turns, kb)
    facts = facts.persist()
    plain = _triples_set(aggregate.document_triples(facts, salt_buckets=None))
    salted = _triples_set(aggregate.document_triples(facts, salt_buckets=7))
    facts.unpersist()
    assert plain == salted
