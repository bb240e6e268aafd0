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


def token_checked(col: Column, prefix: str, what: str) -> Column:
    """``col``, or an execution-time raise unless it is a non-NULL,
    non-empty, lowercased, whitespace-free token — a term that fails
    any of these can NEVER match the lowercased whitespace
    tokenization every text operator here uses, so it would silently
    contribute zero (the exact silent failure the single-query BM25
    guard raises for driver-side; this is its in-plan twin for term
    TABLES)."""
    ok = (
        col.isNotNull()
        & (col != F.lit(""))
        & (col == F.lower(col))
        & (~col.rlike(r"\s"))
    )
    return F.when(ok, col).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"{prefix}: {what} must be a single non-empty"
                    " lowercased token, got "
                ),
                F.coalesce(F.concat(F.lit("'"), col, F.lit("'")), F.lit("NULL")),
                F.lit(" (tokenize/lowercase the query upstream)"),
            )
        )
    )
