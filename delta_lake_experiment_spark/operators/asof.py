"""As-of (point-in-time) join and gap-based sessionization.

Spark has no built-in as-of join; the naive formulation (inequality join
+ rank) explodes to O(|L| x |R|) pairs per key before pruning. The
scalable pattern used here is **union + running last_value**:

1. tag left/right rows, align schemas, UNION ALL,
2. one shuffle: window over (keys) ordered by (ts, side, tiebreak),
3. each left row reads the running ``last(right attrs, ignorenulls)`` —
   i.e. the most recent right row at-or-before its timestamp,
4. keep left rows.

Cost: a single hash shuffle on the keys + a sort within partitions —
identical asymptotics to a sort-merge join, with no pair blow-up. This
is the classic stream-table point-in-time pattern (same shape Flink's
temporal join and kdb's aj use).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from delta_lake_experiment_spark.functions.timeutil import ensure_timestamp


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    tiebreak: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the newest right row with
    ``right[right_ts] <= left[left_ts]`` within the same ``on`` keys.

    right_cols maps right column -> output alias. ``tiebreak`` (a right
    column, e.g. an id) makes the winner among equal-timestamp right
    rows deterministic: highest tiebreak wins. ``how``: 'inner' drops
    left rows with no prior right row; 'left' keeps them with nulls.
    """
    on = list(on)
    # NTZ-tolerant: normalize both event-time operands so the unioned
    # __ts column has one type even when the sides' physical types differ
    left = ensure_timestamp(left, left_ts)
    right = ensure_timestamp(right, right_ts)
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.lit(None).cast(dict(right.dtypes)[rc]).alias(alias) for rc, alias in right_cols.items()],
    )
    r = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) if c not in on else F.col(c) for c in lcols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")).alias("__tie"),
        *[F.col(rc).alias(alias) for rc, alias in right_cols.items()],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("__ts"), F.asc("__side"), F.asc_nulls_first("__tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(alias, ignorenulls=True).over(w).alias(alias)
            for alias in right_cols.values()
        ],
    ).filter(F.col("__side") == 1)
    out = filled.drop("__side")
    if how == "inner":
        first_alias = next(iter(right_cols.values()))
        out = out.filter(F.col(first_alias).isNotNull())
    return out


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: int = 30,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous event of the same key exceeds ``gap_minutes``.

    Classic lag + running-sum-of-flags; one shuffle on the key. Returns
    one row per session: (key, session_idx, session_start, session_end,
    n_events). The streaming twin (applyInPandasWithState) lives in
    streaming/sessions.py.
    """
    # NTZ-tolerant: unix_micros below requires TIMESTAMP proper
    df = ensure_timestamp(df, ts)
    order = [F.asc(ts)] + ([F.asc(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    gap_us = gap_minutes * 60 * 1_000_000
    # microsecond arithmetic (unix_micros), not second-truncating casts:
    # sub-second gaps must compare identically across engines
    flagged = df.withColumn(
        "__new_session",
        F.when(
            F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts))).over(w) > gap_us,
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    ).withColumn(
        "session_idx",
        F.sum("__new_session").over(
            Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy(key, "session_idx").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
