"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin (operators/asof.py::sessionize) is a lag+cumsum window;
in streaming, per-key session state must live across micro-batches —
exactly what GroupState provides. State per user is O(1) (open session
bounds + count), and the event-time timeout closes idle sessions, so
state is bounded no matter how long the stream runs.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_us, end_us, n = state.get
                state.remove()
                yield _emit(user_id, start_us, end_us, n)
            return
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        ts_us = rows["ts"].astype("int64").sort_values() // 1000  # ns -> us
        closed: list[tuple[int, int, int]] = []
        if state.exists:
            start_us, end_us, n = state.get
        else:
            first = int(ts_us.iloc[0])
            start_us, end_us, n = first, first, 0
        for t in ts_us:
            t = int(t)
            if n > 0 and t - end_us > gap_us:
                closed.append((start_us, end_us, n))
                start_us, n = t, 0
            end_us = max(end_us, t)
            n += 1
        state.update((start_us, end_us, n))
        state.setTimeoutTimestamp(end_us // 1000 + gap_minutes * 60 * 1000)
        for s, e, c in closed:
            yield _emit(user_id, s, e, c)

    return fn


def _emit(user_id: int, start_us: int, end_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
        }
    )


def streaming_sessionize(
    events_stream: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Emit closed sessions (user_id, start, end, n_events) as the
    event-time watermark passes their gap timeout."""
    from delta_lake_experiment_spark.functions.timeutil import ensure_timestamp

    return (
        ensure_timestamp(events_stream, "ts").withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
