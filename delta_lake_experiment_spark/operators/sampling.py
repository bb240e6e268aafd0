"""Deterministic hash-based sampling and train/val/test splitting.

The sampling primitives a training-data pipeline actually needs are
REPRODUCIBLE: the same document must land in the same split on every
run, on every cluster size, regardless of partitioning — otherwise
train/test contamination appears the first time the corpus is rebuilt.
``df.sample()``/``randomSplit()`` cannot promise that (seeded per
partition, so any repartition reshuffles assignments). These operators
derive the decision from a hash of a stable key instead:

    bucket(doc) = md5(salt || key)[:8]   (32 hex bits, uniform)

and compare the hex prefix against fixed thresholds. Properties:

- **Map-only.** A filter / CASE over one hash per row: no shuffle, no
  state, embarrassingly parallel at 100 TB.
- **Stable under everything**: partitioning, cluster size, row order,
  incremental re-runs over a growing corpus (a doc's split never flips
  when new docs arrive — the property random assignment lacks).
- **Salt = experiment id — one per STAGE.** A different salt re-rolls
  every assignment (for ablations); the same salt reproduces it
  forever. Because every operator here reads the same md5(salt || key)
  hash, two chained stages MUST use different salts or their decisions
  are fully correlated (a 30% sample followed by an equal-salt 80/10/10
  split lands entirely in 'train').
- **Engine-portable**: md5 of the UTF-8 key bytes is identical in any
  engine, so a DuckDB/BigQuery/Trino pipeline computes bit-identical
  splits — the oracle queries exercise exactly that.

Resolution is 16^8 = 4.3e9 buckets: fraction granularity ~2.3e-10,
far below any corpus-size quantization that matters.

Reference: the reference engine has no sampling surface at all
(SURVEY §2.2); this is part of the LLM-pipeline extension lane.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16 ** 8  # 8 hex chars = 32 bits of md5 prefix


def _hex_prefix(key: Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt || key) — uniform in [0, 16^8).

    NULL keys raise at execution time (same guard style as
    pack_sequences): md5(NULL) is NULL, every comparison against it is
    non-true, and the row would silently fall through — dropped by
    hash_sample but assigned to the TAIL split by split_column, two
    different silent behaviors for the same bad input. A key column
    with NULLs is a data bug the pipeline must hear about."""
    checked = F.when(key.isNotNull(), key.cast("string")).otherwise(
        F.raise_error(
            F.lit(
                "hash sampling/splitting key is NULL - sampling keys must be"
                " non-NULL (filter or coalesce upstream)"
            )
        ).cast("string")
    )
    return F.substring(F.md5(F.concat(F.lit(salt), checked)), 1, 8)


def _threshold_hex(cum_fraction: float) -> str:
    """Hex threshold t such that P[prefix < t] == cum_fraction (up to
    1/16^8). Clamped so 1.0 maps past the last bucket."""
    n = min(max(int(round(cum_fraction * _HEX_SPAN)), 0), _HEX_SPAN)
    return format(n, "08x") if n < _HEX_SPAN else "g"  # 'g' > any hex char


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, decided by
    ``md5(salt || key)`` — same rows on every run and every engine.

    Samples at the same salt are NESTED: ``hash_sample(df, k, 0.1)`` is
    a subset of ``hash_sample(df, k, 0.5)`` (the predicate is a
    threshold on one hash, monotone in the fraction). Scaling-law and
    curriculum experiments get progressively larger corpora where each
    stage contains every smaller one — free, by construction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction={fraction!r} must be in [0, 1]")
    return df.filter(
        _hex_prefix(F.col(key_col), salt) < F.lit(_threshold_hex(fraction))
    )


def split_column(
    key: Column, weights: Mapping[str, float], salt: str = ""
) -> Column:
    """CASE expression assigning a split label by cumulative hash
    threshold. Weights must sum to ~1; the last split absorbs the
    rounding tail so every row gets a label."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights sum to {total!r}, expected 1.0")
    bad = {n: w for n, w in weights.items() if w <= 0}
    if bad:
        # negative/zero weights can still sum to 1 and would silently
        # produce empty or over-full splits instead of erroring
        raise ValueError(f"split weights must be > 0, got {bad!r}")
    names = list(weights)
    prefix = _hex_prefix(key, salt)
    expr = F.lit(names[-1])  # tail absorbs rounding
    cum = 0.0
    branches = []
    for name in names[:-1]:
        cum += weights[name]
        branches.append((F.lit(name), _threshold_hex(cum)))
    for lit_name, thr in reversed(branches):
        expr = F.when(prefix < F.lit(thr), lit_name).otherwise(expr)
    # build nested whens outermost-first so earlier splits win
    return expr


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` assigning each row a deterministic split label
    (e.g. train/val/test) with the given weights."""
    return df.withColumn(split_col, split_column(F.col(key_col), weights, salt))


def hash_shard(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
    shard_col: str = "shard",
) -> DataFrame:
    """Add ``shard_col``: a deterministic shard id in [0, n_shards) —
    md5-prefix modulo, so assignment is stable under partitioning,
    cluster size, and corpus growth (a doc never migrates shards when
    new docs arrive), and reproducible in any engine. The natural
    upstream of :mod:`packing` (one shard per data-loader worker) and
    of sharded corpus export. Map-only; the hash is uniform, so shards
    are balanced to within sampling noise. NULL keys raise (same
    guard as the sample/split operators)."""
    if n_shards < 1:
        raise ValueError(f"n_shards={n_shards!r} must be >= 1")
    bucket = F.conv(_hex_prefix(F.col(key_col), salt), 16, 10).cast("long")
    return df.withColumn(shard_col, (bucket % F.lit(int(n_shards))).cast("int"))


def shard_sql(key_sql: str, n_shards: int, salt: str = "") -> str:
    """DuckDB-dialect twin of :func:`hash_shard`'s column — same md5
    prefix, same modulus. Unlike the threshold predicates above (pure
    hex-string comparisons, genuinely ANSI), a modulus needs hex->int,
    and THAT cast is engine-specific: ``('0x'||h)::BIGINT`` here,
    ``from_base(h, 16)`` on Trino, ``conv(h, 16, 10)`` on
    Spark/MySQL — swap that one sub-expression when porting; the
    assignment is identical everywhere because the hash is."""
    if n_shards < 1:
        raise ValueError(f"n_shards={n_shards!r} must be >= 1")
    prefix = f"substr(md5({_sql_str(salt)} || {key_sql}), 1, 8)"
    return (
        f"CAST(CAST(('0x' || {prefix}) AS BIGINT) % {int(n_shards)} AS INT)"
    )


def _sql_str(s: str) -> str:
    """ANSI SQL string literal (single quotes doubled)."""
    return "'" + s.replace("'", "''") + "'"


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the reproducible version of
    ``df.sampleBy`` (whose seed is applied per partition, so any
    repartition reshuffles membership). Used for domain mixing: keep
    e.g. 100% of wiki, 30% of web, 5% of crawl, by comparing the SAME
    per-row hash against a per-stratum threshold. Strata absent from
    ``fractions`` use ``default_fraction`` (0.0 = drop). Map-only, and
    per-stratum samples keep the nesting property: raising one
    stratum's fraction only adds rows.

    **Use a distinct salt per pipeline stage.** All operators in this
    module share the md5(salt || key) hash; chaining two stages with
    the same (or default ``""``) salt makes their decisions fully
    correlated — e.g. sample at 0.3 then hash_split 80/10/10 with equal
    salts puts EVERY surviving row in 'train' (prefix < t(0.3) <
    t(0.8)), silently emptying val/test. The funnel queries model the
    right pattern: one salt per stage ('exp1' for the split, 'audit'
    for the sample)."""
    for name, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {name!r} is {f!r}, not in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction={default_fraction!r} not in [0, 1]")
    prefix = _hex_prefix(F.col(key_col), salt)
    thr = F.lit(_threshold_hex(default_fraction))
    for name, f in fractions.items():
        thr = F.when(
            F.col(strata_col) == F.lit(name), F.lit(_threshold_hex(f))
        ).otherwise(thr)
    return df.filter(prefix < thr)


def sample_predicate_sql(key_sql: str, fraction: float, salt: str = "") -> str:
    """The ANSI-SQL WHERE predicate equivalent of :func:`hash_sample` —
    derived from the same threshold function, so a fraction/salt change
    in Python can never silently diverge from a hand-copied literal."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction={fraction!r} must be in [0, 1]")
    return (
        f"substr(md5({_sql_str(salt)} || {key_sql}), 1, 8)"
        f" < '{_threshold_hex(fraction)}'"
    )


def stratified_predicate_sql(
    key_sql: str,
    strata_sql: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> str:
    """The ANSI-SQL WHERE predicate equivalent of
    :func:`stratified_hash_sample` — per-stratum thresholds from the
    same threshold function, so Python and oracle cannot diverge."""
    for name, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {name!r} is {f!r}, not in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction={default_fraction!r} not in [0, 1]")
    prefix = f"substr(md5({_sql_str(salt)} || {key_sql}), 1, 8)"
    if not fractions:
        # CASE with zero WHEN branches is a syntax error in ANSI SQL;
        # with no strata listed every row uses the default threshold
        return f"{prefix} < '{_threshold_hex(default_fraction)}'"
    whens = " ".join(
        f"WHEN {_sql_str(name)} THEN '{_threshold_hex(f)}'"
        for name, f in fractions.items()
    )
    return (
        f"{prefix} < (CASE {strata_sql} {whens}"
        f" ELSE '{_threshold_hex(default_fraction)}' END)"
    )


def split_thresholds_sql(
    key_sql: str, weights: Mapping[str, float], salt: str = ""
) -> str:
    """The ANSI-SQL CASE equivalent of :func:`split_column` (for oracle
    queries and for pipelines living in other engines). ``key_sql`` is
    the SQL expression for the key, already stringified."""
    prefix = f"substr(md5({_sql_str(salt)} || {key_sql}), 1, 8)"
    names = list(weights)
    parts, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name]
        parts.append(
            f"WHEN {prefix} < '{_threshold_hex(cum)}' THEN {_sql_str(name)}"
        )
    return "CASE " + " ".join(parts) + f" ELSE {_sql_str(names[-1])} END"


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "",
    key_digits: int = 9,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the
    ``n`` rows with the largest ``u^(1/w)`` where ``u`` is the row's
    md5-derived uniform and ``w`` its weight — the Efraimidis-Spirakis
    A-ES reservoir key, realized engine-portably. Each row's inclusion
    probability is proportional-ish to its weight, the selected SET is
    identical on every run / partitioning / engine (no RNG state), and
    samples at one salt nest as ``n`` grows (the key order is fixed;
    a larger n only extends the prefix) — the weighted sibling of
    :func:`hash_sample`'s fraction monotonicity.

    The pipeline use: quality-weighted subcorpus selection ("take the
    best-ish 1M docs, biased by quality score, but reproducibly and
    without the hard cliff of a top-n by score" — a pure top-n by
    score deterministically excludes everything below the cutoff;
    weighted sampling keeps diversity with a quality tilt).

    Plan: one map-only key projection + TakeOrdered(n) (per-partition
    heap, driver merge of n rows) — NO shuffle of the corpus. Returns
    ``df``'s columns plus ``sample_key`` (rounded to ``key_digits`` —
    pow/log are correctly-rounded-ish but the grid removes any libm
    last-ulp divergence across engines; ties broken by ``key_col``).
    Weights must be > 0 — NULL or non-positive weights raise in-plan
    (a zero weight's key is 0^inf and a negative one is
    1/u^|..| > 1: both silently distort the sample).
    """
    if n < 1:
        raise ValueError(f"n={n!r} must be >= 1")
    w = F.col(weight_col).cast("double")
    checked_w = F.when(w > 0, w).otherwise(
        F.raise_error(
            F.lit(
                f"weighted_sample: weight {weight_col!r} must be > 0 and"
                " non-NULL (filter or clamp upstream)"
            )
        ).cast("double")
    )
    u = F.conv(_hex_prefix(F.col(key_col), salt), 16, 10).cast("double") / F.lit(
        float(_HEX_SPAN)
    )
    key = F.round(F.pow(u, F.lit(1.0) / checked_w), key_digits)
    return (
        df.withColumn("sample_key", key)
        .orderBy(F.desc("sample_key"), F.col(key_col).asc())
        .limit(n)
    )


def weighted_key_sql(
    key_sql: str, weight_sql: str, salt: str = "", key_digits: int = 9
) -> str:
    """DuckDB twin of :func:`weighted_sample`'s ordering key — same
    md5-derived uniform (the engine-specific hex->int cast, see
    :func:`shard_sql`), same power, same rounding, and the SAME
    weight > 0 / non-NULL in-plan raise (a twin accepting what the
    operator rejects is a divergence — the epoch_plan_sql
    convention; NULL > 0 is NULL in SQL, so NULLs fall to the error
    branch too)."""
    prefix = f"substr(md5({_sql_str(salt)} || {key_sql}), 1, 8)"
    u = f"(CAST(('0x' || {prefix}) AS BIGINT) / {float(_HEX_SPAN)!r})"
    w = (
        f"(CASE WHEN ({weight_sql}) > 0 THEN ({weight_sql}) ELSE"
        f" CAST(error('weighted_key_sql: weight must be > 0 and"
        f" non-NULL (filter or clamp upstream)') AS DOUBLE) END)"
    )
    return f"round(power({u}, 1.0 / {w}), {int(key_digits)})"
