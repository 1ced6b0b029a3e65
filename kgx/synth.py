"""Deterministic synthetic transcript corpus.

BASELINE input_hint: the pipeline's input is an Iceberg table
(conv_id, turn_idx:int32, role, text, tool, ts). No external data is allowed
in this sandbox, so we synthesize that exact shape deterministically
(seeded numpy) at any scale; tests use ~50 convs, bench uses >=10^5 turns.

Corpus properties (FIXTURES.md §1):
  * turns embed gazetteer surfaces, orientation terms, indicator and feature
    surfaces from kgx.resources;
  * a fraction of convs contain NO entity mention — exercises the
    PosNegWordRatio fallback branch (CompletePipelineWorker.java:194-219);
  * a few oversize texts — exercises the maxMessageLength admission filter
    (CompletePipelineReceiver.java:131-136);
  * ts monotone within conv, spanning >=3 calendar days — exercises days(ts)
    partitioning (GlobalParameters.java:359-386);
  * entity popularity ~ Zipf(1.2) — exercises salted hot-entity aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kgx import resources

_FILLER = (
    "the market report today noted that analysts were watching closely as "
    "trading volumes stayed steady and investors considered their positions "
    "while the committee reviewed quarterly figures and commentary continued "
    "about broader conditions in several sectors over recent weeks"
).split()

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array([None, "search", "calculator", "browser"], dtype=object)


def _zipf_weights(n: int, a: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** a
    return w / w.sum()


def make_transcripts(
    n_convs: int = 50,
    turns_per_conv: int = 20,
    seed: int = 42,
    oversize_every: int = 97,
) -> pd.DataFrame:
    """Build a deterministic transcripts DataFrame (pandas; write with
    spark.createDataFrame or df.to_parquet)."""
    rng = np.random.RandomState(seed)
    kb = resources.default_kb()

    surfaces = [s for (_u, _n, _t, s) in kb.gazetteer]
    ent_weights = _zipf_weights(len(surfaces))
    pos = list(resources.POSITIVE_TERMS)
    neg = list(resources.NEGATIVE_TERMS)
    ind_surfaces = [i[2] for i in kb.indicators]
    feat_surfaces = [s for (s, _c) in kb.feature_surfaces]

    rows: list[tuple] = []
    base_ts = np.datetime64("2025-06-01T08:00:00")
    for c in range(n_convs):
        conv_id = f"conv-{seed}-{c:06d}"
        n_turns = max(2, int(rng.poisson(turns_per_conv)))
        # ~15% of convs carry no entity mention → fallback branch
        conv_has_entities = rng.rand() >= 0.15
        # conv start spread over ~6 days
        conv_start = base_ts + np.timedelta64(int(rng.randint(0, 6 * 24 * 3600)), "s")
        for t in range(n_turns):
            n_fill = rng.randint(5, 25)
            words = list(rng.choice(_FILLER, size=n_fill))
            r = rng.rand()
            if conv_has_entities and r < 0.55:
                # entity mention turn: surface + polarity terms
                surf = surfaces[rng.choice(len(surfaces), p=ent_weights)]
                words.insert(rng.randint(0, len(words)), surf)
                n_pos = rng.randint(0, 3)
                n_neg = rng.randint(0, 3)
                for w in rng.choice(pos, size=n_pos):
                    words.insert(rng.randint(0, len(words)), w)
                for w in rng.choice(neg, size=n_neg):
                    words.insert(rng.randint(0, len(words)), w)
                if rng.rand() < 0.35:  # explicit feature mention
                    words.insert(rng.randint(0, len(words)), feat_surfaces[rng.randint(len(feat_surfaces))])
                    if rng.rand() < 0.5:  # second feature → subfeature path
                        words.insert(rng.randint(0, len(words)), feat_surfaces[rng.randint(len(feat_surfaces))])
            elif conv_has_entities and r < 0.70:
                # indicator (indirect sentiment) turn
                words.insert(rng.randint(0, len(words)), ind_surfaces[rng.randint(len(ind_surfaces))])
                n_pos = rng.randint(0, 2)
                n_neg = rng.randint(0, 2)
                for w in rng.choice(pos, size=n_pos):
                    words.insert(rng.randint(0, len(words)), w)
                for w in rng.choice(neg, size=n_neg):
                    words.insert(rng.randint(0, len(words)), w)
            elif r < 0.85:
                # orientation-only turn (feeds PosNegWordRatio)
                for w in rng.choice(pos, size=rng.randint(0, 3)):
                    words.insert(rng.randint(0, len(words)), w)
                for w in rng.choice(neg, size=rng.randint(0, 3)):
                    words.insert(rng.randint(0, len(words)), w)
            text = " ".join(words)
            gid = c * 1000 + t
            if oversize_every and gid % oversize_every == oversize_every - 1:
                text = text + " pad" * 4000  # oversize → admission filter
            role = _ROLES[rng.randint(len(_ROLES))]
            tool = _TOOLS[rng.randint(len(_TOOLS))] if role == "tool" else None
            ts = conv_start + np.timedelta64(int(t * 60 + rng.randint(0, 50)), "s")
            rows.append((conv_id, t, role, text, tool, ts))

    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    # microsecond precision — Spark's parquet reader rejects TIMESTAMP(NANOS)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return df


def write_transcripts_parquet(path: str, n_convs: int, seed: int = 42, turns_per_conv: int = 20) -> str:
    df = make_transcripts(n_convs=n_convs, seed=seed, turns_per_conv=turns_per_conv)
    df.to_parquet(path, index=False)
    return path
