"""Streaming SCD2 compaction (applyInPandasWithState).

The batch operator (kgx.asof.scd2_intervals) assumes the changelog is at
rest; on a live CDC stream, one key's change rows straddle micro-batches
and may arrive OUT OF ORDER. Emitting an interval as soon as the next
change arrives would be wrong under reordering: a late-arriving EARLIER
change retroactively splits an interval already emitted. So this operator
buffers each key's change rows in keyed state and emits the key's full
interval set once — when the event-time watermark passes last_ts + gap
(key quiet, the same closing rule as sessionize_conversations /
carryover_conversations).

Semantics at emission are IDENTICAL to the batch operator for the same
rows — ordering by (ts, tie-break id), valid_to = next change's ts, the
final row NULL/is_current — so the registry query shares the batch oracle
SQL (EVENTS_SCD2_SQL) verbatim: a value-hash-checked stateful stream.

Choosing `gap` is a real semantic knob, not a tuning detail: a key quiet
for `gap` emits its buffered intervals and CLOSES (its last row
is_current) — if a later change re-opens the key, the new emission's
first row supersedes that stale is_current, which an append-mode stream
cannot retract; downstream restores cross-window continuity by MERGE on
the key (the same A5 delete-then-recompute contract the triple sink
uses). The registry row sets gap beyond the corpus's full time span, so
every key closes exactly once at drain and the output equals the batch
operator row-for-row.

Scale: state per key is (event_id, ts_us, value) triples — the change
columns only, never the full payload — bounded by the key's change count
within one quiet-gap window; the watermark bounds state lifetime. The
timestamp rides state as INT64 MICROSECONDS (the synthetic changelog has
sub-millisecond timestamps; a ms truncation would corrupt ts equality
with the batch oracle).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from kgx.streaming.stateful import _interval_ms

SCD2_ROW = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("value", DoubleType(), True),
        StructField("valid_to", TimestampType(), True),
        StructField("is_current", BooleanType(), False),
    ]
)

_STATE = StructType(
    [
        StructField("event_ids", ArrayType(LongType()), True),
        StructField("ts_us", ArrayType(LongType()), True),
        StructField("values", ArrayType(DoubleType()), True),
    ]
)


def _interval_rows(user_id: int, eids: list, tss: list, vals: list) -> pd.DataFrame:
    """Batch-parity SCD2 over the buffered (event_id, ts_us, value) rows.

    The sort KEY is (ts, event_id) only — the batch operator's order key;
    including value would both diverge from it and crash comparing None
    against a float when two rows tie on (ts, event_id)."""
    rows = sorted(zip(tss, eids, vals), key=lambda r: (r[0], r[1]))
    out = []
    for i, (ts, eid, val) in enumerate(rows):
        nxt = rows[i + 1][0] if i + 1 < len(rows) else None
        out.append(
            {
                "user_id": user_id,
                "event_id": eid,
                "ts": pd.Timestamp(ts, unit="us"),
                "value": val,
                "valid_to": pd.Timestamp(nxt, unit="us") if nxt is not None else pd.NaT,
                "is_current": nxt is None,
            }
        )
    pdf = pd.DataFrame(
        out, columns=["user_id", "event_id", "ts", "value", "valid_to", "is_current"]
    )
    # keep NULL values NULL: building the frame coerces value to float64
    # (None -> NaN), and Arrow would emit that NaN as a double NaN, not a
    # SQL NULL — an object column with real None round-trips as NULL
    pdf["value"] = pd.array(
        [None if v is None else float(v) for _, _, v in rows], dtype=object
    )
    return pdf


def scd2_events(changes: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """(user_id, event_id, ts, value) change stream → SCD2 interval stream.

    `gap` doubles as the watermark delay and the quiet-period state
    timeout (one knob, same contract as the other stateful operators)."""
    gap_ms = _interval_ms(gap)

    def fn(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            eids, tss, vals = state.get
            state.remove()
            out = _interval_rows(int(user_id), list(eids), list(tss), list(vals))
            if len(out):
                yield out
            return
        eids: list = []
        tss: list = []
        vals: list = []
        if state.exists:
            p_eids, p_tss, p_vals = state.get
            eids, tss, vals = list(p_eids), list(p_tss), list(p_vals)
        for pdf in pdfs:
            eids.extend(int(v) for v in pdf["event_id"])
            tss.extend((pdf["ts"].astype("int64") // 1_000).tolist())  # ns → us
            # NULL change values arrive as NaN in the pandas batch; keep
            # them None in state so emission preserves SQL NULL (batch
            # parity for nullable value columns)
            vals.extend(None if pd.isna(v) else float(v) for v in pdf["value"])
        state.update((eids, tss, vals))
        state.setTimeoutTimestamp(max(tss) // 1_000 + gap_ms)  # us → ms
        return
        yield  # pragma: no cover - make fn a generator on the update path

    return (
        changes.withWatermark("ts", gap)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SCD2_ROW,
            stateStructType=_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
