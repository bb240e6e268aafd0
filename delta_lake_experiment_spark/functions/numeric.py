"""Deterministic numeric aggregates.

Floating-point SUM/AVG are reduction-order-dependent: on a 1000-executor
cluster (or even local[32]) the partial-aggregate merge order varies run
to run, so ``SUM(double)`` is not reproducible and can never hash-match
an oracle engine. We aggregate through an exact decimal (per-row
double→decimal conversion is order-independent; decimal addition is
exact) and convert back to double once at the end. Same trick works in
any ANSI engine, so oracles use ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS
DOUBLE)`` and values match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL = "decimal(28,6)"
# the oracle-side (DuckDB/ANSI) spelling of the same aggregate
ORACLE_SUM = "CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"
ORACLE_AVG = "(CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr}))"


def exact_sum(col: Column) -> Column:
    """Order-independent SUM over doubles (exact decimal accumulation)."""
    return F.sum(col.cast(DECIMAL)).cast("double")


def exact_avg(col: Column) -> Column:
    """Order-independent AVG: exact-decimal sum (as double) / count.

    double/int64 division is a single IEEE op — deterministic and
    identical across engines given identical inputs."""
    return exact_sum(col) / F.count(col)
