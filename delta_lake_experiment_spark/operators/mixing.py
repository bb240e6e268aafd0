"""Corpus composition: temperature-balanced domain mixing and
per-domain caps — the operators that decide HOW MUCH of each language
/ source / domain a training corpus contains.

Two standard levers from published LLM-data practice:

* **Temperature sampling** (multilingual pretraining, e.g. the
  XLM-R/mBERT recipe): sample stratum ``i`` with probability
  proportional to ``count_i ** alpha``. ``alpha = 1`` reproduces the
  raw distribution; ``alpha -> 0`` flattens toward uniform, boosting
  low-resource strata. We realize the target mixture *without
  replacement* via the repo's deterministic md5-threshold machinery
  (operators/sampling.py): per-stratum keep-fraction
  ``min(1, target_total * w_i / count_i)`` with
  ``w_i = count_i**alpha / sum_j count_j**alpha``.
* **Per-domain cap** (Common-Crawl curation practice): at most ``cap``
  documents per domain, chosen deterministically (lowest md5 first) so
  the kept set is stable under partitioning, cluster size, and corpus
  growth *within the kept range*.

Both are fully declarative — the per-stratum statistics stay in the
plan (an O(strata) aggregate joined back, broadcast by AQE), never
collected to the driver — so the DuckDB oracle can recompute the
identical fractions in SQL and hash-match the sampled output.

Determinism / oracle-parity argument (the operators/lm.py rounding
argument, adapted): counts are exact integers; ``pow``/``sum`` over
O(strata) values carry at most a few-ulp (~1e-16 relative) libm +
reassociation difference across engines; the comparison is against
``round(fraction * 16^8)``, an integer near 4.3e9, so engines disagree
only when the unrounded product lies within ~1e-6 of a .5 boundary
(probability ~1e-6 per stratum) AND a row's hash sits exactly on the
one-off threshold (a further ~n/4.3e9). Negligible, and a disagreement
would surface as a one-row diff in the oracle gate, not silent skew.

100 TB design: temperature sampling is one partial-agg shuffle to
O(strata) rows plus a map-side broadcast-join filter — no data-sized
shuffle at all. The cap is one shuffle on the domain key; the
hot-domain window sort spills (Spark's window buffers page to disk)
rather than OOMs, and ``prefilter_margin`` cuts a mega-domain's window
input to ~margin*cap rows first, with an in-plan guard that RAISES if
the prefilter could have clipped the exact answer (whp it cannot;
Chernoff: P[fail] <= exp(-cap*(margin-1)^2/(2*margin))).

The reference has no sampling surface (SURVEY.md §2.2); this extends
the LLM-pipeline lane next to operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from delta_lake_experiment_spark.operators.sampling import (
    _HEX_SPAN,
    _hex_prefix,
    _sql_str,
)


def _checked(col: Column, what: str) -> Column:
    """NULL guard (the sampling-lane convention): a NULL stratum would
    silently fall out of the equi-join on strata and vanish from the
    sample — a data bug the pipeline must hear about."""
    from delta_lake_experiment_spark.functions.guards import null_checked

    return null_checked(col, "mixing", what)


def _prefix_int(key: Column, salt: str) -> Column:
    """md5 prefix as an integer in [0, 16^8) — the numeric twin of
    sampling.py's hex-string comparisons (a data-dependent threshold
    can't be a precomputed hex literal)."""
    return F.conv(_hex_prefix(key, salt), 16, 10).cast("long")


def temperature_fractions(
    df: DataFrame,
    strata_col: str,
    target_total: int,
    alpha: float,
) -> DataFrame:
    """Per-stratum sampling plan: one row per stratum with ``cnt``
    (bigint), ``weight`` (double, ``cnt**alpha`` normalized) and
    ``fraction`` (double in [0,1]) such that hash-sampling each stratum
    at ``fraction`` yields ~``target_total`` rows distributed as
    ``cnt**alpha`` — capped at 1.0 where a stratum is too small to
    supply its share (no replacement; the closed form under-delivers
    the capped strata's shortfall rather than iterating water-filling,
    which keeps the plan and its oracle a single pass)."""
    if target_total < 0:
        raise ValueError(f"target_total={target_total!r} must be >= 0")
    if alpha < 0.0:
        raise ValueError(f"alpha={alpha!r} must be >= 0 (1=raw, 0=uniform)")
    counts = df.groupBy(
        _checked(F.col(strata_col), strata_col).alias(strata_col)
    ).agg(F.count(F.lit(1)).alias("cnt"))
    pw = F.pow(F.col("cnt").cast("double"), F.lit(float(alpha)))
    powed = counts.select(strata_col, "cnt", pw.alias("__pw"))
    total = powed.agg(F.sum("__pw").alias("__total_pw"))
    return powed.crossJoin(F.broadcast(total)).select(
        strata_col,
        "cnt",
        (F.col("__pw") / F.col("__total_pw")).alias("weight"),
        F.least(
            F.lit(1.0),
            F.lit(float(target_total))
            * F.col("__pw")
            / (F.col("__total_pw") * F.col("cnt").cast("double")),
        ).alias("fraction"),
    )


def temperature_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    target_total: int,
    alpha: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic temperature-``alpha`` mixture sample of ``df``:
    rows whose salted md5 falls under their stratum's
    :func:`temperature_fractions` threshold. Same-row membership is
    stable under partitioning and cluster size; growing a stratum
    re-balances that stratum's threshold (fractions are data-dependent
    by design — the mixture tracks the corpus), while the salt pins an
    experiment id. Plan: O(strata) aggregate, broadcast join, map-side
    filter — no data shuffle."""
    fr = temperature_fractions(df, strata_col, target_total, alpha)
    thr = F.round(F.col("fraction") * F.lit(float(_HEX_SPAN))).cast("long")
    return (
        df.join(
            F.broadcast(fr.select(strata_col, thr.alias("__thr"))),
            strata_col,
        )
        .filter(_prefix_int(F.col(key_col), salt) < F.col("__thr"))
        .select(*df.columns)  # the equi-join moved strata_col first
    )


def temperature_fractions_sql(
    src: str, strata_sql: str, target_total: int, alpha: float
) -> str:
    """DuckDB twin of :func:`temperature_fractions` — identical
    formula, identical evaluation shape, so Python and oracle cannot
    diverge beyond the module-docstring ulp argument."""
    if target_total < 0:
        raise ValueError(f"target_total={target_total!r} must be >= 0")
    if alpha < 0.0:
        raise ValueError(f"alpha={alpha!r} must be >= 0")
    return f"""
WITH __mx_counts AS (
  SELECT {strata_sql} AS stratum, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {src} GROUP BY 1
), __mx_pw AS (
  SELECT stratum, cnt, pow(CAST(cnt AS DOUBLE), {float(alpha)!r}) AS pw
  FROM __mx_counts
)
SELECT stratum, cnt,
       pw / (SELECT SUM(pw) FROM __mx_pw) AS weight,
       LEAST(1.0, {float(target_total)!r} * pw /
             ((SELECT SUM(pw) FROM __mx_pw) * CAST(cnt AS DOUBLE))) AS fraction
FROM __mx_pw
"""


def temperature_sample_sql(
    src: str,
    key_sql: str,
    strata_sql: str,
    target_total: int,
    alpha: float,
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`temperature_sample`: SELECT * of the
    sampled rows. ``('0x'||h)::BIGINT`` is the engine-specific hex->int
    (see sampling.py::shard_sql's portability note)."""
    fr = temperature_fractions_sql(src, strata_sql, target_total, alpha)
    return f"""
SELECT d.* FROM {src} d
JOIN ({fr}) f ON {strata_sql} = f.stratum
WHERE CAST(('0x' || substr(md5({_sql_str(salt)} || {key_sql}), 1, 8)) AS BIGINT)
      < CAST(round(f.fraction * {float(_HEX_SPAN)!r}) AS BIGINT)
"""


def cap_per_stratum(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    cap: int,
    salt: str = "",
    prefilter_margin: float | None = None,
) -> DataFrame:
    """At most ``cap`` rows per stratum, chosen deterministically:
    the ``cap`` lowest salted-md5 keys win (ties broken by the key
    itself, so duplicate hashes cannot make the kept set
    partitioning-dependent; keys are assumed unique per row, the
    sampling-lane contract). The kept set is stable under partitioning
    and — unlike a cap applied at ingest order — under *re-crawls*: a
    domain's kept documents change only when lower-hash documents
    arrive.

    Scale: one shuffle on ``strata_col``; each stratum's window sort
    spills rather than OOMs, but a mega-domain still sorts all its
    rows in one task. ``prefilter_margin`` (e.g. ``2.0``) bounds that:
    per-stratum hash-threshold prefilter to ~``margin*cap`` expected
    rows before the exact window. The prefilter keeps exactly the
    lowest-hash rows, so the result is IDENTICAL whenever each stratum
    retains >= min(cap, cnt) rows — and an in-plan guard RAISES if any
    stratum fell short (whp impossible: Chernoff
    P[fail] <= exp(-cap*(margin-1)^2/(2*margin)) per stratum), so the
    fast path can never be silently wrong."""
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"cap={cap!r} must be >= 1")
    strata = _checked(F.col(strata_col), strata_col)
    prefix = _hex_prefix(F.col(key_col), salt)
    base = df
    if prefilter_margin is not None:
        if prefilter_margin <= 1.0:
            raise ValueError(
                f"prefilter_margin={prefilter_margin!r} must be > 1"
            )
        counts = df.groupBy(strata.alias(strata_col)).agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        frac = F.least(
            F.lit(1.0),
            F.lit(float(prefilter_margin) * cap) / F.col("__cnt").cast("double"),
        )
        thr = F.round(frac * F.lit(float(_HEX_SPAN))).cast("long")
        pre = (
            df.join(
                F.broadcast(counts.select(strata_col, thr.alias("__thr"))),
                strata_col,
            )
            .filter(_prefix_int(F.col(key_col), salt) < F.col("__thr"))
            .drop("__thr")
            # pre feeds the survivor-count guard AND the window path;
            # without this the (possibly expensive) upstream corpus
            # pipeline executes once per consumer (the
            # calibrated_score_filter persist rationale)
            .persist()
        )
        # Guard: per-stratum survivor count must reach min(cap, cnt).
        # Built from the PRE-filter counts side (one row per original
        # stratum) so a stratum whose survivors all vanished still
        # gets checked; the broadcast semi-join below forces its
        # evaluation, so a shortfall raises instead of under-capping.
        kept = pre.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__kept"))
        checked_strata = (
            counts.join(kept, strata_col, "left")
            .select(
                strata_col,
                F.when(
                    F.coalesce(F.col("__kept"), F.lit(0))
                    >= F.least(F.lit(cap).cast("long"), F.col("__cnt")),
                    F.lit(True),
                )
                .otherwise(
                    F.raise_error(
                        F.lit(
                            "cap_per_stratum: prefilter clipped a stratum"
                            " below min(cap, count) - rerun with a larger"
                            " prefilter_margin or without prefiltering"
                        )
                    )
                )
                .alias("__ok"),
            )
            .filter(F.col("__ok"))
            .drop("__ok")
        )
        base = pre.join(F.broadcast(checked_strata), strata_col, "left_semi")
    w = (
        Window.partitionBy(strata)
        .orderBy(prefix.asc(), F.col(key_col).asc())
    )
    return (
        base.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.lit(int(cap)))
        .select(*df.columns)  # prefilter joins moved strata_col first
    )


def cap_per_stratum_sql(
    src: str, key_sql: str, strata_sql: str, cap: int, salt: str = ""
) -> str:
    """DuckDB twin of :func:`cap_per_stratum` (exact path): the same
    (md5 prefix, key) window rank. Hex-string comparison orders
    identically to the numeric prefix (fixed-width lowercase hex)."""
    if cap < 1:
        raise ValueError(f"cap={cap!r} must be >= 1")
    prefix = f"substr(md5({_sql_str(salt)} || {key_sql}), 1, 8)"
    return f"""
SELECT * EXCLUDE (__rk) FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {strata_sql} ORDER BY {prefix}, {key_sql}
  ) AS __rk
  FROM {src}
) WHERE __rk <= {int(cap)}
"""


def epoch_plan(
    df: DataFrame,
    strata_col: str,
    tokens_col: str,
    target_total_tokens: int,
    weights: "dict[str, float]",
    round_digits: int = 6,
) -> DataFrame:
    """Data-budget planner: given target mixture ``weights`` (e.g. a
    DoReMi-style domain-weight vector, normalized here) and a token
    budget, how many EPOCHS of each stratum the training run consumes
    — ``(stratum, tokens, weight, target_tokens, epochs,
    full_epochs, tail_fraction)``. ``epochs > 1`` means the source
    repeats (the up-sampling a "4 epochs of wiki" recipe encodes);
    ``tail_fraction`` is the deterministic-sample fraction of the last
    partial epoch (feed it to :func:`temperature_sample`'s machinery /
    operators/sampling.py::hash_sample to realize the plan).

    One partial-agg shuffle to O(strata); weights are a static
    broadcast CASE, so the oracle is a plain aggregate. Strata absent
    from ``weights`` get weight 0 (explicitly planned OUT — they still
    appear in the output with epochs 0, so a dropped domain is visible
    rather than silently missing). Rounding to ``round_digits`` grids
    cross-engine float noise; ``full_epochs = floor(rounded epochs)``
    so both engines floor the same grid value."""
    if target_total_tokens < 0:
        raise ValueError(
            f"target_total_tokens={target_total_tokens!r} must be >= 0"
        )
    for k, v in weights.items():
        if v < 0:
            raise ValueError(f"weight for stratum {k!r} is {v!r}, negative")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    wcol = F.lit(0.0)
    for name, v in weights.items():
        wcol = F.when(
            F.col(strata_col) == F.lit(name), F.lit(float(v) / total_w)
        ).otherwise(wcol)
    # NULL token counts raise (the packing-lane contract): SUM skips
    # NULLs, so a NULL count would silently shrink a stratum's budget
    per = df.groupBy(
        _checked(F.col(strata_col), strata_col).alias(strata_col)
    ).agg(
        F.sum(
            _checked(F.col(tokens_col), tokens_col).cast("long")
        ).alias("tokens")
    )
    epochs = F.round(
        F.lit(float(target_total_tokens))
        * F.col("weight")
        / F.col("tokens").cast("double"),
        round_digits,
    )
    plan = (
        per.withColumn("weight", wcol)
        .withColumn(
            "target_tokens",
            F.round(F.lit(float(target_total_tokens)) * F.col("weight")).cast(
                "long"
            ),
        )
        .withColumn("epochs", epochs)
        .withColumn("full_epochs", F.floor(epochs).cast("int"))
        .withColumn(
            "tail_fraction",
            F.round(F.col("epochs") - F.floor(epochs), round_digits),
        )
        # feeds both the coverage guard aggregate and the plan output
        .persist()
    )
    # Loud-failure coverage guard (the lane convention): a weight key
    # that matches NO stratum (a misspelled domain name) silently
    # absorbs its normalized share and the realized corpus
    # under-delivers the budget — present-strata weights must sum to 1
    wsum = plan.agg(F.sum("weight").alias("__wsum"))
    guard = F.when(
        F.abs(F.col("__wsum") - 1.0) < 1e-9, F.lit(True)
    ).otherwise(
        F.raise_error(
            F.lit(
                "epoch_plan: weight keys absent from the corpus strata -"
                " their normalized share maps to nothing (check the"
                " weight dict's spelling against the strata values)"
            )
        )
    )
    return (
        plan.crossJoin(F.broadcast(wsum))
        .filter(guard)
        .drop("__wsum")
    )


def epoch_plan_sql(
    src: str,
    strata_sql: str,
    tokens_sql: str,
    target_total_tokens: int,
    weights: "dict[str, float]",
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`epoch_plan` — identical normalization,
    formula, rounding grid, AND input validation (a twin that accepts
    what the operator rejects is a divergence too)."""
    if target_total_tokens < 0:
        raise ValueError(
            f"target_total_tokens={target_total_tokens!r} must be >= 0"
        )
    for k, v in weights.items():
        if v < 0:
            raise ValueError(f"weight for stratum {k!r} is {v!r}, negative")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    whens = " ".join(
        f"WHEN {_sql_str(name)} THEN {float(v) / total_w!r}"
        for name, v in weights.items()
    )
    wexpr = f"(CASE {strata_sql} {whens} ELSE 0.0 END)"
    d = int(round_digits)
    t = float(target_total_tokens)
    return f"""
SELECT stratum, tokens, weight,
       CAST(round({t!r} * weight) AS BIGINT) AS target_tokens,
       round({t!r} * weight / CAST(tokens AS DOUBLE), {d}) AS epochs,
       CAST(floor(round({t!r} * weight / CAST(tokens AS DOUBLE), {d})) AS INT)
         AS full_epochs,
       round(round({t!r} * weight / CAST(tokens AS DOUBLE), {d})
             - floor(round({t!r} * weight / CAST(tokens AS DOUBLE), {d})), {d})
         AS tail_fraction
FROM (
  SELECT {strata_sql} AS stratum,
         CAST(SUM({tokens_sql}) AS BIGINT) AS tokens,
         {wexpr} AS weight
  FROM {src} GROUP BY 1, 3
)
"""


def expand_epochs(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    plan: DataFrame,
    salt: str = "",
) -> DataFrame:
    """Realize an :func:`epoch_plan`: the corpus the trainer actually
    iterates — every row repeated ``full_epochs`` times plus one more
    if the row's salted md5 falls inside its stratum's
    ``tail_fraction``, with a 1-based ``epoch`` column (feed it to the
    deterministic shuffle for per-epoch ordering). Rows of strata
    planned at 0 epochs disappear; a stratum's tail sample is the
    same deterministic membership machinery as
    :func:`temperature_sample`, so the expansion is reproducible on
    any partitioning and any engine.

    Plan shape: broadcast join of the O(strata) plan + a map-side
    ``explode(sequence(...))`` — no shuffle; output size is the token
    budget by construction (that's what the plan means)."""
    thr = F.round(F.col("tail_fraction") * F.lit(float(_HEX_SPAN))).cast(
        "long"
    )
    pl = plan.select(
        strata_col,
        F.col("full_epochs").cast("long").alias("__full"),
        thr.alias("__thr"),
    )
    copies = F.col("__full") + F.when(
        _prefix_int(F.col(key_col), salt) < F.col("__thr"), F.lit(1)
    ).otherwise(F.lit(0))
    # sequence(1, 0) in Spark DESCENDS ([1, 0]) rather than returning
    # empty — zero-copy rows must map to an empty array explicitly or
    # a planned-out stratum would be emitted twice per row
    seq = F.when(
        copies >= 1, F.sequence(F.lit(1).cast("long"), copies)
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.join(F.broadcast(pl), strata_col)
        .withColumn("epoch", F.explode(seq))
        .select(*df.columns, F.col("epoch").cast("int").alias("epoch"))
    )


def expand_epochs_sql(
    src: str,
    key_sql: str,
    strata_sql: str,
    tokens_sql: str,
    target_total_tokens: int,
    weights: "dict[str, float]",
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`epoch_plan` + :func:`expand_epochs`:
    SELECT * of the source plus ``epoch``. DuckDB's generate_series
    ascends only (empty when stop < start), matching the guarded
    Spark sequence."""
    plan = epoch_plan_sql(
        src, strata_sql, tokens_sql, target_total_tokens, weights
    )
    return f"""
WITH __ep_plan AS ({plan})
SELECT d.*, CAST(epoch AS INT) AS epoch FROM (
  SELECT d.*, unnest(generate_series(1,
    CAST(p.full_epochs AS BIGINT) + CASE WHEN
      CAST(('0x' || substr(md5({_sql_str(salt)} || {key_sql}), 1, 8)) AS BIGINT)
      < CAST(round(p.tail_fraction * {float(_HEX_SPAN)!r}) AS BIGINT)
    THEN 1 ELSE 0 END)) AS epoch
  FROM {src} d JOIN __ep_plan p ON {strata_sql} = p.stratum
) d
"""
