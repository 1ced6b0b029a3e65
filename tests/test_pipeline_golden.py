"""Golden end-to-end test: Spark pipeline vs the pure-Python differential
oracle on the deterministic synthetic corpus (SURVEY.md §5 items 2-3).

Compares the full semantic triple set (order-insensitive). Target is
P/R >= 0.95; in practice exact equality since the oracle implements the
same documented contract independently.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from kgx import aggregate, assemble, mentions, relations, resources, synth
from tests.oracle import Oracle

MAX_LEN = 2000  # small cap so synth's oversize turns are exercised

KEY_COLS = [
    "conv_id",
    "turn_idx",
    "level",
    "subj_name",
    "subj_uri",
    "subj_type",
    "pred",
    "subfeature",
    "obj_polarity",
    "score",
    "classifier",
    "dom_label",
    "indicator_uri",
]


def _canon(df: pd.DataFrame) -> set[tuple]:
    from decimal import Decimal

    score_i = KEY_COLS.index("score")
    turn_i = KEY_COLS.index("turn_idx")

    def norm(v, i):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        if i == score_i:
            return str(Decimal(str(v)).normalize())
        if i == turn_i:
            return str(int(float(v)))
        return str(v)

    rows = set()
    for r in df[KEY_COLS].itertuples(index=False):
        rows.add(tuple(norm(v, i) for i, v in enumerate(r)))
    return rows


def run_spark_pipeline(spark, pdf: pd.DataFrame) -> pd.DataFrame:
    kb = resources.default_kb()
    tdf = spark.createDataFrame(pdf)
    turns = assemble.assemble_turns(tdf, max_text_len=MAX_LEN, num_partitions=8)
    wm = mentions.detect_mentions(turns, kb)
    facts, tf = relations.sentence_facts(wm, kb)
    triples = aggregate.all_triples(facts, tf)
    out = triples.withColumn("score", F.col("score").cast("string")).toPandas()
    return out


def test_golden_corpus_matches_oracle(spark):
    pdf = synth.make_transcripts(n_convs=40, turns_per_conv=12, seed=7)
    got = run_spark_pipeline(spark, pdf)

    kb = resources.default_kb()
    oracle = Oracle(kb, max_text_len=MAX_LEN)
    want = oracle.run(pdf)

    got_set = _canon(got)
    want_set = _canon(want)

    missing = want_set - got_set
    extra = got_set - want_set
    assert len(want_set) > 100, "oracle produced implausibly few triples"
    precision = 1 - len(extra) / max(len(got_set), 1)
    recall = 1 - len(missing) / max(len(want_set), 1)
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.3f} R={recall:.3f}\n"
        f"missing sample: {sorted(missing)[:5]}\n"
        f"extra sample: {sorted(extra)[:5]}"
    )
    # the contract is actually exact:
    assert missing == set(), f"missing: {sorted(missing)[:10]}"
    assert extra == set(), f"extra: {sorted(extra)[:10]}"


def test_turn_text_invariant(spark):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    assembly must never mutate or reorder turn text (north rule invariant)."""
    pdf = synth.make_transcripts(n_convs=10, turns_per_conv=8, seed=11)
    tdf = spark.createDataFrame(pdf)
    turns = assemble.assemble_turns(tdf, max_text_len=10**9)
    got = (
        turns.select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_admission_filter(spark):
    pdf = synth.make_transcripts(n_convs=20, turns_per_conv=10, seed=5)
    tdf = spark.createDataFrame(pdf)
    turns = assemble.assemble_turns(tdf, max_text_len=MAX_LEN)
    assert turns.filter(F.length("text") > MAX_LEN).count() == 0
    n_over = int((pdf["text"].str.len() > MAX_LEN).sum())
    assert n_over > 0, "synth corpus should contain oversize turns"
    assert turns.count() == len(pdf) - n_over
