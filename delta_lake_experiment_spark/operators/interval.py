"""Interval (range) join: points against [start, end] intervals.

Spark plans a raw ``l.ts BETWEEN r.start AND r.end`` join as a
BroadcastNestedLoopJoin / CartesianProduct — an O(|L| x |R|) pair
blow-up with no partition parallelism. The scalable pattern here is
**bucketization** (the same trick behind Databricks' range-join hint
and time-bin interval indexes):

1. quantize time into ``bucket_seconds``-wide bins;
2. each point maps to ONE bin, each interval EXPLODES to the bins it
   covers (``sequence(floor(start/w), floor(end/w))``);
3. equi-join on (keys..., bin) — a plain hash shuffle join Catalyst
   parallelizes like any other — then filter the exact containment
   predicate.

Cost: |R| grows by the mean interval length / bucket width (pick
``bucket_seconds`` near the typical interval length for ~2x blow-up);
candidate pairs are only those sharing a bin — never all pairs. Skewed
giant intervals fan out over many bins, which *distributes* their work
instead of concentrating it (the opposite of a key-skew pathology).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_experiment_spark.functions.timeutil import ensure_timestamp


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: Optional[Sequence[str]] = None,
    bucket_seconds: float = 3600,
    how: str = "inner",
) -> DataFrame:
    """Attach to each point row every interval row (same ``on`` keys)
    with ``start <= ts <= end`` (inclusive both ends).

    Returns points columns + the intervals' non-key columns. ``how``:
    'inner' keeps matched points only; 'left' keeps unmatched points
    with NULL interval columns.
    """
    keys = list(on or [])
    clash = (set(points.columns) - set(keys)) & {
        c for c in intervals.columns if c not in keys
    }
    if clash:
        # the final rename (__r_c -> c) would otherwise emit duplicate
        # column names, making every downstream reference ambiguous
        raise ValueError(
            f"interval_join: interval payload columns collide with point "
            f"columns {sorted(clash)}; rename one side or add them to `on`"
        )
    # microsecond binning: bucket_seconds may be fractional (e.g. 0.5 s
    # lookbacks) and sub-second interval bounds must not silently floor
    # into the wrong bin. unix_micros also forces the event-time columns
    # through ensure_timestamp, making NTZ inputs bin identically.
    w_us = int(round(float(bucket_seconds) * 1_000_000))
    if w_us <= 0:
        raise ValueError(f"bucket_seconds={bucket_seconds!r} must be > 0")
    points = ensure_timestamp(points, point_ts)
    intervals = ensure_timestamp(intervals, start_col, end_col)

    def _bin(c: str):
        # exact floor division: subtract the positive pmod first so the
        # long/long divide is over an exact multiple of w_us (epoch-µs
        # magnitudes stay under 2^53, so the double quotient is exact) —
        # a bare (x / w).cast("long") truncates toward zero, which would
        # mis-bin pre-epoch timestamps
        um = F.unix_micros(F.col(c))
        return ((um - F.pmod(um, F.lit(w_us))) / F.lit(w_us)).cast("long")

    p_bin = _bin(point_ts)
    i_lo = _bin(start_col)
    i_hi = _bin(end_col)

    left = points.withColumn("__bin", p_bin)
    right = intervals.withColumn("__bin", F.explode(F.sequence(i_lo, i_hi)))
    # disambiguate overlapping column names: interval side keeps only
    # keys + bin + its own payload
    payload = [c for c in intervals.columns if c not in keys]
    right = right.select(
        *keys, "__bin", *[F.col(c).alias(f"__r_{c}") for c in payload]
    )
    cond = [left[k] == right[k] for k in keys] + [left["__bin"] == right["__bin"]]
    contained = (
        F.col(f"__r_{start_col}") <= F.col(point_ts)
    ) & (F.col(point_ts) <= F.col(f"__r_{end_col}"))
    if how == "inner":
        out = left.join(right, cond, "inner").filter(contained)
    elif how == "left":
        # filter containment on the right side of a left join by
        # folding it into the join condition
        out = left.join(right, cond + [contained], "left")
    else:
        raise ValueError(f"how={how!r}")
    out = out.drop(right["__bin"]).drop("__bin")
    for k in keys:
        out = out.drop(right[k])
    renames = {f"__r_{c}": c for c in payload}
    return out.withColumnsRenamed(renames)
