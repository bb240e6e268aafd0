"""Deterministic, engine-reproducible HyperLogLog cardinality sketch.

Counting distinct keys exactly at 100 TB (vocabulary size, unique
users, unique fingerprints) needs a corpus-wide shuffle on the key;
the standard production answer is HyperLogLog (Flajolet et al. 2007):
one map-side-combinable aggregation into ``m = 2^p`` max-registers —
O(2^p) state regardless of input size, mergeable across partitions,
shards, days, or tables by taking per-register maxima. Spark ships
this as ``approx_count_distinct`` (HLL++), but its estimate is not
reproducible outside Spark — useless under this repo's value-oracle
discipline. This module is HLL rebuilt on the repo's engine-portable
primitives so BOTH engines compute the IDENTICAL estimate:

- hash = the md5 15-hex-digit -> 60-bit integer idiom every sampling/
  sharding lane here uses (`('0x' || substr(md5(k),1,15))::BIGINT`);
- register index = the top ``p`` bits (``h >> q``); rho = leading-zero
  count of the low ``q`` bits + 1, computed EXACTLY via
  ``length(bin(x))`` (both engines print minimal binary digits:
  floor(log2 x) + 1 with no float anywhere);
- the harmonic denominator is an exact INTEGER: ``S = sum over
  registers of 2^(q+1-M_j)`` (max term 2^49 at p=12, m * 2^49 < 2^62 —
  no overflow, no float reassociation, ORDER-INDEPENDENT by
  construction), so the raw estimate ``alpha * m^2 * 2^(q+1) / S`` is
  a few IEEE ops on identical inputs — bit-equal across engines;
- the small-range branch is Flajolet's linear counting
  ``m * ln(m / zeros)``; ``ln`` may differ between libm and the JVM in
  the last ulp, so the REPORTED estimate is rounded to the module grid
  (the repo's standard absorb-the-ulp argument). The classic 32-bit
  large-range correction is a no-op here: the hash space is 2^60 and
  collisions at 2^60 scale are beyond any corpus this counts.

The reference engine has no aggregate surface at all (SURVEY §2.2);
this is LLM-pipeline extension surface (corpus statistics).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 60-bit hash split: p index bits (register count m = 2^p), q value bits
HLL_HASH_BITS = 60


def _hll_alpha(m: int) -> float:
    """The standard bias constant; both engines receive it as the same
    Python-computed double literal, so it can never diverge."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _check_p(p: int) -> None:
    if not 4 <= int(p) <= 18:
        raise ValueError(f"p={p!r} must be in [4, 18]")


def hll_registers(df: DataFrame, key_col: str, p: int = 12) -> DataFrame:
    """``(bucket int, reg int)`` — the sketch's non-zero registers:
    per-bucket max rho over the distinct-hash stream. One partial-agg
    shuffle producing at most ``2^p`` rows; NULL keys raise (a NULL
    would silently vanish from the count — the sampling-lane NULL
    contract). Keys are hashed as strings (cast upstream for
    non-string keys, exactly like the md5 sampling lanes)."""
    _check_p(p)
    q = HLL_HASH_BITS - int(p)
    key = F.when(F.col(key_col).isNotNull(), F.col(key_col).cast("string")).otherwise(
        F.raise_error(
            F.lit(
                f"hll_registers: {key_col} is NULL - must be non-NULL"
                " (filter or coalesce upstream)"
            )
        )
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    bucket = F.shiftrightunsigned(h, q).cast("int")
    rest = h.bitwiseAND(F.lit((1 << q) - 1))
    rho = (
        F.when(rest == 0, F.lit(q + 1))
        .otherwise(F.lit(q) - F.length(F.bin(rest)) + F.lit(1))
        .cast("int")
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Merge sketches (same ``p``) by per-register max — THE property
    that makes HLL the 100 TB counter: shards/days/tables sketch
    independently and union cheaply, no re-scan."""
    if not register_dfs:
        raise ValueError("hll_merge: need at least one sketch")
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy("bucket").agg(F.max("reg").alias("reg"))


def hll_estimate(
    registers: DataFrame, p: int = 12, round_digits: int = 6
) -> DataFrame:
    """One row ``(est_distinct double)`` from a register table —
    exact-integer harmonic sum + the small-range linear-counting
    branch (module docstring), rounded to the report grid."""
    _check_p(p)
    m = 1 << int(p)
    q = HLL_HASH_BITS - int(p)
    alpha = _hll_alpha(m)
    # exact integers: present-bucket terms + (m - n_present) empties
    # (F.shiftleft only takes a literal shift; the SQL form shifts by
    # an expression on both engines)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {q + 1} - reg)")
    agg = registers.agg(
        F.coalesce(F.sum(term), F.lit(0)).cast("long").alias("__s_present"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    s = (
        F.col("__s_present")
        + (F.lit(m) - F.col("__n_present")) * F.lit(1 << (q + 1)).cast("long")
    ).cast("double")
    zeros = (F.lit(m) - F.col("__n_present")).cast("double")
    raw = F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(1 << (q + 1))) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(F.round(est, round_digits).alias("est_distinct"))


def hll_distinct(
    df: DataFrame, key_col: str, p: int = 12, round_digits: int = 6
) -> DataFrame:
    """One-stop ``(est_distinct)`` over a key column."""
    return hll_estimate(hll_registers(df, key_col, p), p, round_digits)


def _hll_hash_sql(key_sql: str) -> str:
    return (
        f"('0x' || substring(md5(CASE WHEN {key_sql} IS NULL THEN"
        " CAST(error('hll_registers: key is NULL - must be non-NULL"
        " (filter or coalesce upstream)') AS VARCHAR)"
        f" ELSE CAST({key_sql} AS VARCHAR) END), 1, 15))::BIGINT"
    )


def hll_registers_sql(src: str, key_sql: str, p: int = 12) -> str:
    """DuckDB twin of :func:`hll_registers` — same hash split, same
    ``length(bin())`` rho, same NULL raise. Emits a SELECT producing
    (bucket, reg)."""
    _check_p(p)
    q = HLL_HASH_BITS - int(p)
    h = _hll_hash_sql(key_sql)
    return f"""
SELECT bucket, MAX(rho) AS reg FROM (
  SELECT CAST(h >> {q} AS INT) AS bucket,
    CAST(CASE WHEN (h & {(1 << q) - 1}) = 0 THEN {q + 1}
         ELSE {q} - length(bin(h & {(1 << q) - 1})) + 1 END AS INT) AS rho
  FROM (SELECT {h} AS h FROM {src})
) GROUP BY bucket"""


def hll_estimate_sql(
    registers_sql: str, p: int = 12, round_digits: int = 6
) -> str:
    """DuckDB twin of :func:`hll_estimate` over a (bucket, reg)
    relation — literals injected from the SAME Python constants, the
    integer S, and an op-for-op identical estimate expression."""
    _check_p(p)
    m = 1 << int(p)
    q = HLL_HASH_BITS - int(p)
    alpha = _hll_alpha(m)
    # all float literals CAST to DOUBLE: DuckDB parses bare decimal
    # literals as DECIMAL and overflows the fixed-point product
    return f"""
SELECT round(CASE WHEN raw <= CAST({2.5 * m!r} AS DOUBLE) AND zeros > 0
             THEN CAST({float(m)!r} AS DOUBLE)
                  * ln(CAST({float(m)!r} AS DOUBLE) / zeros)
             ELSE raw END, {int(round_digits)}) AS est_distinct
FROM (
  SELECT CAST({alpha!r} AS DOUBLE) * CAST({float(m * m)!r} AS DOUBLE)
           * CAST({float(1 << (q + 1))!r} AS DOUBLE)
           / CAST(s AS DOUBLE) AS raw,
         CAST({m} - n_present AS DOUBLE) AS zeros
  FROM (
    SELECT COALESCE(SUM(CAST(1 AS BIGINT) << ({q + 1} - reg)), 0)
             + ({m} - COUNT(*)) * CAST({1 << (q + 1)} AS BIGINT) AS s,
           COUNT(*) AS n_present
    FROM ({registers_sql})
  )
)"""


def hll_distinct_sql(
    src: str, key_sql: str, p: int = 12, round_digits: int = 6
) -> str:
    """DuckDB twin of :func:`hll_distinct`."""
    return hll_estimate_sql(
        hll_registers_sql(src, key_sql, p), p, round_digits
    )


# -- deterministic count-min sketch (heavy hitters) ---------------------
#
# The frequency dual of the HLL above: Cormode & Muthukrishnan's
# count-min sketch (2005) answers "how often did THIS key occur?" from
# O(d·w) integer counters regardless of input size — the 100 TB answer
# to heavy-hitter questions (hot n-grams, spam domains, hot users)
# where an exact groupBy(key) would shuffle the full key stream. Each
# of d rows hashes the key into one of w counters and adds the weight;
# a point estimate is the MIN over the d counters the key touches —
# always >= the true count (one-sided error), and over by at most
# e/w · N with probability 1 - (1/e)^d.
#
# Engine-reproducibility is even cleaner than HLL's: every counter is
# an exact INTEGER sum (commutative, associative — partition order
# cannot matter) of md5-derived placements, so sketch, merge, and
# estimate are bit-identical across engines with NO rounding anywhere.
# Merging sketches ADDS counters cell-wise — but note the contrast
# with HLL's max: addition is NOT idempotent, so replay protection
# for streamed increments rests on the exactly-once sink's txn
# markers, not on the algebra (streaming/sketch.py documents this).

#: counter-table schema (create engine targets with this DDL)
CMS_TABLE_DDL = "r int, c int, cnt bigint"


def _check_cms(d: int, w: int) -> None:
    if not 1 <= int(d) <= 8:
        raise ValueError(f"d={d!r} must be in [1, 8]")
    if int(w) < 2:
        raise ValueError(f"w={w!r} must be >= 2")


def _cms_key(key_col: str) -> Column:
    return F.when(
        F.col(key_col).isNotNull(), F.col(key_col).cast("string")
    ).otherwise(
        F.raise_error(
            F.lit(
                f"cms_counters: {key_col} is NULL - must be non-NULL"
                " (filter or coalesce upstream)"
            )
        )
    )


def _cms_col(key: Column, r: int, w: int) -> Column:
    """Counter column for hash row ``r``: the md5 60-bit idiom with a
    per-row salt, mod w."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{r}:"), key)), 1, 15), 16, 10
    ).cast("long")
    return (h % w).cast("int")


def cms_counters(
    df: DataFrame,
    key_col: str,
    d: int = 3,
    w: int = 1024,
    weight_col: "str | None" = None,
) -> DataFrame:
    """``(r int, c int, cnt bigint)`` — the sketch's non-zero counters:
    one partial-agg shuffle producing at most ``d·w`` rows. ``weight_col``
    (default: 1 per row) supports pre-aggregated inputs. NULL keys
    raise (a NULL would silently vanish from every estimate)."""
    _check_cms(d, w)
    key = _cms_key(key_col)
    wcol = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    placed = df.select(
        F.posexplode(
            F.array(*[_cms_col(key, r, w) for r in range(d)])
        ).alias("r", "c"),
        wcol.alias("__w"),
    ).select(F.col("r").cast("int"), "c", "__w")
    return placed.groupBy("r", "c").agg(F.sum("__w").alias("cnt"))


def cms_merge(*counter_dfs: DataFrame) -> DataFrame:
    """Merge sketches (same d, w) by cell-wise ADDITION — shards/days/
    tables sketch independently and union cheaply. NOT idempotent
    (unlike HLL's max): never merge the same increments twice."""
    if not counter_dfs:
        raise ValueError("cms_merge: need at least one sketch")
    out = counter_dfs[0]
    for other in counter_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    counters: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """``(<key_col>, est bigint)`` — the point estimate for every key
    in ``keys_df``: min over the d counters the key hashes to (absent
    cells count 0). The keys side is O(candidates); the join is
    (r, c)-keyed against at most d·w counter rows — broadcastable."""
    _check_cms(d, w)
    key = _cms_key(key_col)
    probes = keys_df.select(
        F.col(key_col),
        F.posexplode(
            F.array(*[_cms_col(key, r, w) for r in range(d)])
        ).alias("r", "c"),
    ).select(key_col, F.col("r").cast("int"), "c")
    return (
        probes.join(F.broadcast(counters), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def _cms_hash_sql(key_sql: str, r: int, w: int) -> str:
    guarded = (
        f"CASE WHEN {key_sql} IS NULL THEN"
        " CAST(error('cms_counters: key is NULL - must be non-NULL"
        " (filter or coalesce upstream)') AS VARCHAR)"
        f" ELSE CAST({key_sql} AS VARCHAR) END"
    )
    return (
        f"CAST(('0x' || substring(md5('cms{r}:' || {guarded}), 1, 15))::BIGINT"
        f" % {int(w)} AS INT)"
    )


def cms_counters_sql(
    src: str, key_sql: str, d: int = 3, w: int = 1024, weight_sql: str = "1"
) -> str:
    """DuckDB twin of :func:`cms_counters` — same salted md5 hash, same
    NULL raise. Emits a SELECT producing (r, c, cnt)."""
    _check_cms(d, w)
    arms = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_hash_sql(key_sql, r, w)} AS c,"
        f" CAST({weight_sql} AS BIGINT) AS wt FROM {src}"
        for r in range(int(d))
    )
    return f"SELECT r, c, SUM(wt) AS cnt FROM ({arms}) GROUP BY r, c"


def cms_estimate_sql(
    counters_sql: str,
    keys_src: str,
    key_sql: str,
    d: int = 3,
    w: int = 1024,
    key_alias: str = "key",
) -> str:
    """DuckDB twin of :func:`cms_estimate` over a (r, c, cnt) relation.
    Emits a SELECT producing (<key_alias>, est)."""
    _check_cms(d, w)
    probes = " UNION ALL ".join(
        f"SELECT {key_sql} AS {key_alias}, {r} AS r,"
        f" {_cms_hash_sql(key_sql, r, w)} AS c FROM {keys_src}"
        for r in range(int(d))
    )
    return f"""
SELECT p.{key_alias}, CAST(MIN(COALESCE(t.cnt, 0)) AS BIGINT) AS est
FROM ({probes}) p LEFT JOIN ({counters_sql}) t ON t.r = p.r AND t.c = p.c
GROUP BY p.{key_alias}"""
