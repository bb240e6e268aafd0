"""Shared in-plan guard expressions.

One home for the NULL-key/stratum raise guard used across the
sampling/mixing/lm lanes, so the guard's typing trick and message
shape can't drift between copies (each lane passes its own message
prefix; tests match on it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def null_checked(col: Column, prefix: str, what: str) -> Column:
    """``col``, or an execution-time raise if NULL — for columns whose
    NULLs would otherwise be dropped silently by an equi-join or a
    threshold comparison (two different silent behaviors for the same
    bad input is the advisor-flagged failure mode this guard exists
    for). ``raise_error`` is NullType, which coerces to the column's
    own type, so the guard never changes the column's dtype."""
    return F.when(col.isNotNull(), col).otherwise(
        F.raise_error(
            F.lit(
                f"{prefix}: {what} is NULL - must be non-NULL"
                " (filter or coalesce upstream)"
            )
        )
    )
