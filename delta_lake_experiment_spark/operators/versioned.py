"""Multi-version semantics over stamped DataFrames.

The reference's scan returns *all* row versions newest-first
(reference reads.go:52); clients resolve current state by keeping the
first version seen per key (reference main_test.go:321-329). That idiom
— a driver-side dict in the reference — is exactly a window rank in
Spark, executed as a single hash shuffle on the key (scales linearly;
no driver involvement).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TX_COL = "_tx_id"
IDX_COL = "_row_idx"


def latest_version_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Optional[Sequence[str]] = None,
    keep_stamps: bool = False,
) -> DataFrame:
    """Current-state view of a multi-versioned table: one row per key,
    the newest version (max ``(_tx_id, _row_idx)``) winning.

    Scale note: `row_number` over `partitionBy(keys)` is one shuffle and
    is skew-tolerant under AQE; prefer this over `groupBy(max_by)` chains
    when several non-key columns must survive.
    """
    order_cols = list(order_cols or (TX_COL, IDX_COL))
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.desc(c) for c in order_cols]
    )
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    if not keep_stamps:
        # only the engine's internal stamp columns are stripped — user
        # order columns (e.g. a timestamp) stay in the result
        out = out.drop(*[c for c in (TX_COL, IDX_COL) if c in out.columns])
    return out
