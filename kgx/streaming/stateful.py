"""Custom stateful streaming: watermarked conversation sessionization via
applyInPandasWithState.

The batch pipeline assumes a conversation arrives whole (the reference's
one-message-one-document model, SURVEY.md §2.8). On a live transcript
stream, turns of one conversation straddle micro-batches; this operator
buffers turns per conv_id in keyed state and emits ONE assembled
conversation document when the conversation closes — i.e. when the
event-time watermark passes last_turn_ts + gap (the streaming rendering of
the session gap in `queries.sessionize`, and of S4's drain semantics for
per-conversation state).

Semantics (shared with assemble.conversation_docs, W1/W3):
  * turns buffered unordered, assembled by explicit (turn_idx) sort at
    emission — shuffle/batch arrival order never leaks into doc_text;
  * duplicate (turn_idx) deliveries resolve min-text-hash first (J6's
    deterministic winner, same rule as the batch path);
  * doc_text = texts joined by "\n"; per-turn char offsets recomputed
    downstream exactly as in conversation_docs (the emitted doc is
    byte-identical to the batch assembly of the same turns).

Scale: state per key is the conversation's turns (bounded by conversation
length, not stream length); the watermark bounds how long state lives, so
total state ≈ active conversations × avg turns — the same bound any
session-window aggregation carries. Arrow moves whole per-key pandas
frames, no per-row Python.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CONV_DOC = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_turns", IntegerType(), False),
        StructField("doc_text", StringType(), False),
        StructField("ts_min_ms", LongType(), True),
        StructField("ts_max_ms", LongType(), True),
    ]
)

_STATE = StructType(
    [
        StructField("turn_idxs", ArrayType(IntegerType()), True),
        StructField("texts", ArrayType(StringType()), True),
        StructField("ts_min_ms", LongType(), True),
        StructField("ts_max_ms", LongType(), True),
    ]
)


def _assemble(conv_id: str, idxs: list, texts: list, tmin, tmax) -> pd.DataFrame:
    # W1 ordering + J6 dedup at emission: sort by (turn_idx, text) and keep
    # the first text per idx — deterministic min-text winner, batch parity
    pairs = sorted(zip(idxs, texts), key=lambda p: (p[0], p[1]))
    seen: dict = {}
    for i, t in pairs:
        seen.setdefault(i, t)
    ordered = [seen[i] for i in sorted(seen)]
    return pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "n_turns": len(ordered),
                "doc_text": "\n".join(ordered),
                "ts_min_ms": tmin,
                "ts_max_ms": tmax,
            }
        ]
    )


def _interval_ms(spec: str) -> int:
    """'30 minutes' / '10 seconds' / '1 hour' → milliseconds."""
    n, unit = spec.split()
    per = {"second": 1000, "minute": 60_000, "hour": 3_600_000,
           "day": 86_400_000}[unit.rstrip("s")]
    return int(n) * per


def sessionize_conversations(
    turns: DataFrame, gap: str = "30 minutes", gap_ms: int | None = None
) -> DataFrame:
    """turns stream (conv_id, turn_idx, text, ts) → closed-conversation doc
    stream. `gap` doubles as the watermark delay (late turns inside the gap
    still join their conversation; later ones are dropped by the watermark,
    the standard trade). The state timeout is DERIVED from `gap` — passing
    an explicit gap_ms is an expert override; two independently-set values
    silently drift (a 10-minute watermark with the old 30-minute default
    timeout emitted conversations 20 minutes late)."""
    if gap_ms is None:
        gap_ms = _interval_ms(gap)

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            idxs, texts, tmin, tmax = state.get
            state.remove()
            yield _assemble(conv_id, list(idxs), list(texts), tmin, tmax)
            return
        idxs: list = []
        texts: list = []
        tmin = tmax = None
        if state.exists:
            p_idxs, p_texts, tmin, tmax = state.get
            idxs, texts = list(p_idxs), list(p_texts)
        for pdf in pdfs:
            idxs.extend(int(v) for v in pdf["turn_idx"])
            texts.extend(str(v) for v in pdf["text"])
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            for t in ts_ms:
                tmin = t if tmin is None else min(tmin, t)
                tmax = t if tmax is None else max(tmax, t)
        state.update((idxs, texts, tmin, tmax))
        # close when the event-time watermark passes last turn + gap
        state.setTimeoutTimestamp(int(tmax) + gap_ms)
        return
        yield  # pragma: no cover - make fn a generator on the update path

    return (
        turns.withWatermark("ts", gap)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=CONV_DOC,
            stateStructType=_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
