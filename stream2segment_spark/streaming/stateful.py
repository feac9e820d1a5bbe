"""Custom stateful Structured Streaming operators (applyInPandasWithState).

The reference is strictly batch; its *incremental* semantics (skip already-
processed segments K3, retry-aware re-download J5) are what these operators
express on an unbounded stream:

- ``streaming_first_seen``: cross-micro-batch first-seen dedup — a row is
  emitted only the first time its key appears, ever (state = one flag per
  key). The streaming twin of the append-mode anti join.
- ``streaming_sessionize``: event-time session windows with a gap timeout,
  emitting one row per CLOSED session (state = open-session aggregate per
  user; event-time timeout closes sessions when the watermark passes
  last_ts + gap).

State stores scale horizontally: state lives per grouping-key partition in
the executor state store (RocksDB-backed on a real cluster), so key
cardinality — not stream length — bounds memory.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType)


def streaming_first_seen(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit each key's FIRST row only, across micro-batches.

    NoTimeout state: one boolean flag per key, forever — correct for true
    exactly-once dedup of ids. (With a TTL requirement, switch to
    ProcessingTimeTimeout and accept re-emission after expiry.)"""
    out_schema = df.schema
    state_schema = StructType([StructField("seen", LongType())])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf):
                pdf = pdf.sort_values(ts_col)
                first = pdf.iloc[:1] if first is None \
                    else pd.concat([first, pdf.iloc[:1]]).sort_values(ts_col).iloc[:1]
        state.update((1,))
        if first is not None:
            yield first

    src = df
    if df.isStreaming:
        src = df.withWatermark(ts_col, watermark)
    return (src.groupBy(*key_cols)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def streaming_sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user with a ``gap_minutes`` inactivity gap;
    emits (user_id, session_start, session_end, n_events) once per CLOSED
    session — closed either by a later event beyond the gap or by the
    event-time timeout when the watermark passes session_end + gap.

    Batch twin: streaming/incremental.sessionize (lag + cumsum) — same
    session boundaries, used as the oracle in tests."""
    # the key column mirrors user_col's NAME and TYPE (a hardcoded
    # 'user_id long' would miscast string/renamed keys at the Arrow
    # boundary — the winnow_fingerprints lesson)
    out_schema = StructType([
        StructField(user_col, df.schema[user_col].dataType),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ])
    state_schema = StructType([
        StructField("start", TimestampType()),
        StructField("last", TimestampType()),
        StructField("n", LongType()),
    ])
    gap = pd.Timedelta(minutes=gap_minutes)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((key[0], start, last, n))
            state.remove()
            yield pd.DataFrame(closed, columns=[f.name for f in out_schema])
            return
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        if state.exists:
            start, last, n = state.get
            start, last = pd.Timestamp(start), pd.Timestamp(last)
        else:
            start = last = None
        for ts in rows[ts_col]:
            ts = pd.Timestamp(ts)
            if start is None:
                start, last, n = ts, ts, 1
            elif ts - last > gap:
                closed.append((key[0], start, last, n))
                start, last, n = ts, ts, 1
            else:
                last, n = max(last, ts), n + 1
        close_ms = int((last + gap).timestamp() * 1000)
        if close_ms <= state.getCurrentWatermarkMs():
            # the watermark already passed this session's close time (it
            # jumped across batches) -> close now; a timeout in the past
            # would be rejected
            closed.append((key[0], start, last, n))
            state.remove()
        else:
            state.update((start.to_pydatetime(), last.to_pydatetime(), int(n)))
            # event-time timeout: when the watermark passes last + gap with
            # no further rows, the open session closes
            state.setTimeoutTimestamp(close_ms)
        if closed:
            yield pd.DataFrame(closed, columns=[f.name for f in out_schema])

    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (src.groupBy(user_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.EventTimeTimeout))
