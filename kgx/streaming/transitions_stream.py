"""Streaming tool-transition extraction (applyInPandasWithState).

The batch operator (kgx.assemble.tool_transitions) sees whole
conversations at rest; on a live transcript stream, turns of one
conversation straddle micro-batches and can arrive OUT OF ORDER, and a
bigram (turn i, turn i+1) may span a batch boundary. This operator
buffers each conversation's (turn_idx, tool) pairs in keyed state and
emits the conversation's adjacent-turn tool bigrams once — when the
event-time watermark passes last_ts + gap (conversation closed; the same
closing rule as stateful.sessionize_conversations / carryover_stream).
Close-time emission is what makes boundary-spanning and out-of-order
bigrams exact rather than approximate.

Per-conversation bigram rows stream out; the corpus-wide transition
matrix (counts + row-normalized probabilities) is a plain batch
aggregation over the sink — associative, so it can also run continuously
via foreachBatch-MERGE. At emission the bigrams equal the batch
operator's for the same turns (the registry row shares the batch oracle
SQL verbatim): turns sorted by turn_idx, duplicate deliveries of a
turn_idx resolved deterministically (min tool wins, the J6-style tie
rule), NULL tools excluded from both ends of a bigram.

Scale: state per key is one (turn_idx, tool) pair per buffered turn —
bounded by conversation length; text never enters state. The watermark
bounds state lifetime.
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

from kgx.streaming.stateful import _interval_ms

BIGRAM_ROW = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("tool", StringType(), False),
        StructField("next_tool", StringType(), False),
    ]
)

_STATE = StructType(
    [
        StructField("turn_idxs", ArrayType(IntegerType()), True),
        # parallel to turn_idxs; '' encodes a NULL tool (tools are word
        # tokens, never empty)
        StructField("tools", ArrayType(StringType()), True),
        StructField("ts_max_ms", LongType(), True),
    ]
)


def _bigram_rows(conv_id: str, idxs: list, tools: list) -> pd.DataFrame:
    """Batch-parity bigrams over the buffered (turn_idx, tool) pairs."""
    pairs = sorted(zip(idxs, tools), key=lambda p: (p[0], p[1]))
    seen: dict = {}
    for i, t in pairs:
        seen.setdefault(i, t)  # min-tool winner per duplicated idx
    order = sorted(seen)
    rows = []
    for a, b in zip(order, order[1:]):
        if seen[a] and seen[b]:
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": a,
                    "tool": seen[a],
                    "next_tool": seen[b],
                }
            )
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "tool", "next_tool"])


def transition_conversations(
    turns: DataFrame, gap: str = "10 minutes", gap_ms: int | None = None
) -> DataFrame:
    """(conv_id, turn_idx, tool, ts) stream → per-conversation tool-bigram
    stream. `gap` doubles as the watermark delay and the state timeout
    derives from it (one knob, the shared stateful-stream contract)."""
    if gap_ms is None:
        gap_ms = _interval_ms(gap)

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            idxs, tools, _tmax = state.get
            state.remove()
            out = _bigram_rows(conv_id, list(idxs), list(tools))
            if len(out):
                yield out
            return
        idxs: list = []
        tools: list = []
        tmax = None
        if state.exists:
            p_idxs, p_tools, tmax = state.get
            idxs, tools = list(p_idxs), list(p_tools)
        for pdf in pdfs:
            idxs.extend(int(v) for v in pdf["turn_idx"])
            tools.extend("" if v is None else str(v) for v in pdf["tool"])
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            for t in ts_ms:
                tmax = t if tmax is None else max(tmax, t)
        state.update((idxs, tools, tmax))
        state.setTimeoutTimestamp(int(tmax) + gap_ms)
        return
        yield  # pragma: no cover - make fn a generator on the update path

    return (
        turns.withWatermark("ts", gap)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=BIGRAM_ROW,
            stateStructType=_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
