"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one viral document, one null-heavy
join column) can pin a single reducer while 999 executors idle. Two
standard remedies, expressed as composable DataFrame transforms:

- :func:`salted_aggregate` — two-phase aggregation: shuffle once on
  (key, salt) so a hot key fans out over ``salt`` reducers, then a
  second tiny shuffle on key merges the partials. Correct for any
  algebraic aggregate (sum/count/min/max — anything with a merge step).
- :func:`salted_join` — break a hot-key equi-join by salting the big
  side and replicating the small side across all salt values. The
  small side grows ``salt``×, so this fits the dim-side-is-small case
  (the same case AQE's runtime skew-join split targets; this is the
  static, deterministic form).

Both are semantics-preserving: results equal the unsalted equivalent
(tested in tests/test_operators.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: name -> aggregate over the raw rows (phase 1,
    grouped by keys + salt). ``merge_aggs``: name -> aggregate over the
    phase-1 partials (phase 2, grouped by keys), referencing phase-1
    output columns by name.

        salted_aggregate(ev, ["event_type"],
                         {"n": F.count(F.lit(1))},
                         {"n": F.sum("n")})
    """
    salted = df.withColumn(SALT_COL, F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)))
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merge_aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side uniformly, explode the
    small side across every salt value, join on (keys + salt). A key
    carrying 30% of all rows spreads over ``salt`` reducers instead of
    one."""
    big_salted = big.withColumn(
        SALT_COL,
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)),
    )
    small_exploded = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("long"))
    big_salted = big_salted.withColumn(SALT_COL, F.col(SALT_COL).cast("long"))
    joined = big_salted.join(small_exploded, [*on, SALT_COL], how)
    return joined.drop(SALT_COL)
