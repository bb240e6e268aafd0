"""Watermarked stream-stream interval join.

Spark supports true stream-stream joins only when BOTH sides carry
watermarks and the join condition bounds event time on both sides —
that pair of constraints is what lets the state store evict buffered
rows instead of growing forever. This helper packages the pattern:
each left row pairs with same-key right rows whose timestamp falls in
``[left_ts - lookback, left_ts]`` (the attribution-window shape:
purchases joined to every click in the preceding hour).

State bound: each side buffers at most ``watermark + lookback`` of
event time per key. The identical call works on static DataFrames,
which is how the test proves stream/batch parity.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_experiment_spark.functions.timeutil import ensure_timestamp


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    lookback: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Inner-join ``left`` rows to all same-key ``right`` rows with
    ``left_ts - lookback <= right[right_ts] <= left_ts``.

    ``right_cols`` maps right column -> output alias (the join keys and
    timestamps collide by construction; explicit aliasing keeps the
    output schema unambiguous). ``watermark`` (default = ``lookback``)
    applies to both sides when the inputs are streaming.
    """
    keys = list(on)
    # NTZ-tolerant: watermarks demand TIMESTAMP proper
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise), and the interval
    # arithmetic must agree across sides — normalize both boundaries
    lw = ensure_timestamp(left, left_ts)
    rw = ensure_timestamp(right, right_ts)
    if left.isStreaming:
        lw = lw.withWatermark(left_ts, watermark or lookback)
    if right.isStreaming:
        rw = rw.withWatermark(right_ts, watermark or lookback)
    # the watermarked right timestamp must appear exactly ONCE in the
    # projection (Spark rejects multiple event-time columns per stream),
    # so it always travels as __rts and is renamed/dropped at the end
    ts_alias = right_cols.get(right_ts)
    payload = {c: a for c, a in right_cols.items() if c != right_ts}
    rw = rw.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(a) for c, a in payload.items()],
    )
    cond = [lw[k] == rw[f"__rk_{k}"] for k in keys]
    cond.append(
        rw["__rts"].between(
            lw[left_ts] - F.expr(f"INTERVAL {lookback}"), lw[left_ts]
        )
    )
    out = lw.join(rw, cond, "inner").drop(*[f"__rk_{k}" for k in keys])
    return (
        out.withColumnRenamed("__rts", ts_alias) if ts_alias else out.drop("__rts")
    )
