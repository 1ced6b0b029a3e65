"""Streaming coref-lite entity carryover (applyInPandasWithState).

The batch operator (kgx.mentions.entity_carryover) assumes the whole
conversation is at rest; on a live transcript stream, turns of one
conversation straddle micro-batches and may arrive OUT OF ORDER. This
operator buffers each conversation's per-turn SO sets in keyed state and
emits the full carryover rows once — when the event-time watermark passes
last_turn_ts + gap (conversation closed, same closing rule as
stateful.sessionize_conversations). Emitting only at close is what makes
out-of-order arrival safe: a late-arriving earlier turn would otherwise
retroactively change the carry source of turns already emitted.

Semantics at emission are IDENTICAL to the batch operator (same rows for
the same turns — the registry query shares the batch oracle SQL):
  * turns sorted by turn_idx; duplicate deliveries of one turn_idx resolve
    deterministically (min sorted-SO-set wins, the J6-style tie rule);
  * a turn's active set = its own SO set if non-empty, else the most
    recent prior turn's; turns before the first SO turn emit nothing.

Scale: state per key is one (turn_idx, so_set) pair per buffered turn —
bounded by conversation length (the so_set is a handful of surfaces, not
the text; the text column never enters state). The watermark bounds state
lifetime exactly as in sessionize_conversations.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kgx.streaming.stateful import _interval_ms

CARRYOVER_ROW = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("entity", StringType(), False),
        StructField("src_turn_idx", IntegerType(), False),
        StructField("carried", BooleanType(), False),
    ]
)

_STATE = StructType(
    [
        StructField("turn_idxs", ArrayType(IntegerType()), True),
        # per-turn SO sets, parallel to turn_idxs; "|"-joined (surfaces are
        # word tokens, so the delimiter cannot occur inside a surface)
        StructField("so_sets", ArrayType(StringType()), True),
        StructField("ts_max_ms", LongType(), True),
    ]
)


def _carry_rows(conv_id: str, idxs: list, sets: list) -> pd.DataFrame:
    """Batch-parity carryover over the buffered (turn_idx, so_set) pairs."""
    pairs = sorted(zip(idxs, sets), key=lambda p: (p[0], p[1]))
    seen: dict = {}
    for i, s in pairs:
        seen.setdefault(i, s)  # min-(sorted set) winner per duplicated idx
    rows = []
    src_idx, src_set = None, None
    for i in sorted(seen):
        ents = [e for e in seen[i].split("|") if e]
        if ents:
            src_idx, src_set = i, ents
        if src_set is None:
            continue
        for e in src_set:
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": i,
                    "entity": e,
                    "src_turn_idx": src_idx,
                    "carried": src_idx != i,
                }
            )
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "entity", "src_turn_idx", "carried"]
    )


def carryover_conversations(
    so_turns: DataFrame, gap: str = "10 minutes", gap_ms: int | None = None
) -> DataFrame:
    """(conv_id, turn_idx, ts, so_set) stream → carryover-row stream.

    `so_turns` is the output of kgx.mentions.so_sets over a transcript
    stream (the Arrow-UDF mention stage runs as a stateless streaming
    projection before this operator). `gap` doubles as the watermark
    delay, and the state timeout derives from it (one knob, same contract
    as sessionize_conversations)."""
    if gap_ms is None:
        gap_ms = _interval_ms(gap)

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            idxs, sets, _tmax = state.get
            state.remove()
            out = _carry_rows(conv_id, list(idxs), list(sets))
            if len(out):
                yield out
            return
        idxs: list = []
        sets: list = []
        tmax = None
        if state.exists:
            p_idxs, p_sets, tmax = state.get
            idxs, sets = list(p_idxs), list(p_sets)
        for pdf in pdfs:
            idxs.extend(int(v) for v in pdf["turn_idx"])
            sets.extend("|".join(v) for v in pdf["so_set"])
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            for t in ts_ms:
                tmax = t if tmax is None else max(tmax, t)
        state.update((idxs, sets, tmax))
        state.setTimeoutTimestamp(int(tmax) + gap_ms)
        return
        yield  # pragma: no cover - make fn a generator on the update path

    return (
        so_turns.withWatermark("ts", gap)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=CARRYOVER_ROW,
            stateStructType=_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
