"""Hashed-feature logistic-regression document classifier.

The quality-filter step real LLM-data pipelines run after heuristics:
train a cheap linear classifier (fastText-style — hashing-trick bag of
words, logistic loss) on weak labels, then score the whole corpus and
gate on the probability. Heuristics (operators/text.py) are the usual
weak-label source: the classifier generalizes them (it can pass a doc
the length heuristic would reject because its vocabulary matches the
positive class) and costs one map-only pass to apply at 100 TB.

100 TB design — the "aggregate distributed, iterate on metadata"
pattern (same as BPE training and IVF centroid refinement here):
- **Featurize** is pure JVM columns: tokenize, md5-hash each token to
  one of ``dim`` buckets, keep the DISTINCT bucket set per doc (binary
  bag-of-words; presence, not counts — bounded per-doc work and the
  standard hashing-trick classifier input).
- **Each training iteration** is ONE distributed job: score every doc
  against the current weights (weights enter the plan as a LITERAL
  array — no join; ``dim`` is small by construction), emit
  ``(bucket, residual)`` per doc-feature, partial-aggregate to at most
  ``dim + 1`` gradient rows (map-side combine absorbs the corpus), and
  collect those O(dim) rows to the driver. Full-batch gradient
  descent: deterministic given the corpus — no sampling, no
  per-partition RNG.
- **The weight update runs on the driver** over O(dim) floats, and
  weights are ROUNDED to ``round_digits`` each iteration: distributed
  double addition is order-sensitive at ~1e-16, and rounding to a grid
  far coarser than that noise (but far finer than the signal) pins the
  whole trajectory — the DuckDB oracle that re-derives every iteration
  as chained CTEs (workloads/extensions.py) lands on identical
  weights, so TRAINING is value-certified, not just scoring.
- **Scoring** is map-only with literal weights; no shuffle at all.

The reference engine has no functions surface (SURVEY §2.2); this is
LLM-pipeline extension surface.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from delta_lake_experiment_spark.functions.guards import null_checked

#: bias lives in the weight table under this pseudo-feature id
BIAS_FEATURE = -1


def _bucket(tok: Column, dim: int) -> Column:
    """md5-derived feature bucket in [0, dim) — engine-portable: the
    same 15-hex-digit prefix -> integer -> mod idiom as the simhash and
    shard lanes (``('0x' || substr(md5(tok), 1, 15))::BIGINT % dim`` in
    DuckDB; both sides are non-negative so ``%`` == ``pmod``)."""
    h = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(dim))


def hashed_feature_sets(
    df: DataFrame, id_col: str, text_col: str, dim: int = 64
) -> DataFrame:
    """(id_col, feats: array<long>) — the DISTINCT hashed token buckets
    per document (binary hashing-trick features). NULL text is treated
    as empty text (one bucket: md5 of the empty token)."""
    if dim < 2:
        raise ValueError(f"dim={dim!r} must be >= 2")
    toks = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    feats = F.array_distinct(F.transform(toks, lambda t: _bucket(t, dim)))
    return df.select(F.col(id_col), feats.alias("feats"))


def _margin(weights: Sequence[float], bias: float) -> Column:
    """bias + sum of weights over the doc's ``feats`` bucket set, as a
    flat conditional sum ``bias + Σ_f (feats contains f ? w_f : 0)``
    — whole-stage-codegen'd (array_contains + Add), where the
    equivalent fold over the feats array is an interpreted
    CodegenFallback lambda per element (measured: the fold dominated
    each GD job at sf0.1). Zero-weight terms are skipped — exact, not
    an approximation: adding 0.0 to a finite double is the identity,
    and buckets keep w=0 only while untouched by every update.
    Summation runs in bucket order instead of the feats array's order;
    the difference is ~1e-16 reassociation noise per doc, immaterial
    against the 1e-9 training grid and the 1e-6 scoring grid (the
    module's engine-reproducibility argument — the DuckDB twin
    already sums in its own order)."""
    expr: Column = F.lit(float(bias))
    for f, w in enumerate(weights):
        if float(w) != 0.0:
            expr = expr + F.when(
                F.array_contains(F.col("feats"), F.lit(f).cast("long")),
                F.lit(float(w)),
            ).otherwise(F.lit(0.0))
    return expr


def train_hashed_logreg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    dim: int = 64,
    iters: int = 8,
    lr: float = 0.5,
    round_digits: int = 9,
    feature_sets: "DataFrame | None" = None,
) -> "tuple[list[float], float]":
    """Full-batch gradient-descent logistic regression on hashed binary
    features; returns ``(weights, bias)`` — ``weights[f]`` for buckets
    ``0..dim-1``, plus the intercept.

    ``label_col`` must be 0/1 (weak labels — e.g. a heuristic quality
    gate); NULL labels raise (a silently-dropped row would make the
    trained model partition-dependent). Gradient of the mean logistic
    loss: ``g_f = sum over docs containing f of (p - y) / N`` and
    ``g_bias = sum over all docs of (p - y) / N``; update
    ``w <- round(w - lr * g, round_digits)`` (the rounding grid is what
    makes the trajectory engine-reproducible — see module docstring).

    ``feature_sets`` optionally supplies a prebuilt
    :func:`hashed_feature_sets` result (``(id_col, feats)``, same
    ``dim``) so a pipeline that trains AND scores over one corpus
    tokenizes+hashes it once — the caller owns that frame's cache
    lifecycle; the label join and the loop's own persist are
    unchanged.
    """
    if iters < 1:
        raise ValueError(f"iters={iters!r} must be >= 1")
    fsets = (
        feature_sets
        if feature_sets is not None
        else hashed_feature_sets(df, id_col, text_col, dim)
    )
    feats = fsets.join(
        df.select(
            F.col(id_col),
            null_checked(
                F.col(label_col), "train_hashed_logreg", f"label {label_col!r}"
            )
            .cast("double")
            .alias("__y"),
        ),
        id_col,
    )
    # the featurized corpus feeds every iteration; persist it so the
    # tokenize+hash work runs once, not ``iters`` times (at true 100 TB
    # scale one would instead write it to a table — the recompute-vs-
    # cache call belongs to the caller's storage budget, the loop only
    # needs SOME materialization of this one intermediate)
    feats = feats.persist()
    n = feats.count()  # also materializes the persist
    if n == 0:
        raise ValueError("train_hashed_logreg: empty input")
    w = [0.0] * dim
    bias = 0.0
    try:
        for _ in range(iters):
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w, bias)))
            # one flat 65-column conditional aggregation instead of an
            # explode + groupBy: g_f = SUM(residual where doc contains
            # bucket f), g_bias = SUM(residual). The explode shape
            # shuffled ~|docs| x |buckets-per-doc| residual rows per
            # iteration; this shape is a map-side partial aggregate of
            # |docs| rows into ONE 65-number row (array_contains is
            # codegen'd, no per-row Python or interpreter dispatch) —
            # measured ~2x per GD job at sf0.1. Summation order
            # differs from the explode plan, which is immaterial by
            # construction: gradient sums carry ~1e-15 reassociation
            # noise against the 1e-9 update grid (the module's
            # partitioning-independence argument, unchanged).
            grad_row = (
                feats.select(
                    ((p - F.col("__y")) / F.lit(float(n))).alias("__g"),
                    "feats",
                )
                .agg(
                    F.sum("__g").alias("gb"),
                    *[
                        F.sum(
                            F.when(
                                F.array_contains(
                                    F.col("feats"), F.lit(f).cast("long")
                                ),
                                F.col("__g"),
                            )
                        ).alias(f"g{f}")
                        for f in range(dim)
                    ],
                )
                .collect()[0]
            )
            bias = round(bias - lr * grad_row["gb"], round_digits)
            for f in range(dim):
                g = grad_row[f"g{f}"]
                if g is not None:  # no doc contains bucket f: no update
                    w[f] = round(w[f] - lr * g, round_digits)
    finally:
        feats.unpersist()
    return w, bias


def score_hashed_logreg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: Sequence[float],
    bias: float,
    prob_digits: int = 6,
    feature_sets: "DataFrame | None" = None,
) -> DataFrame:
    """(id_col, prob, keep) — sigmoid score under a trained model and
    the >= 0.5 gate, map-only (weights are a literal array; no join,
    no shuffle). ``prob`` is rounded for oracle comparability.
    ``feature_sets`` reuses a prebuilt featurization (the
    train-then-score pipeline shape — see train_hashed_logreg)."""
    feats = (
        feature_sets
        if feature_sets is not None
        else hashed_feature_sets(df, id_col, text_col, len(weights))
    )
    prob = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(weights, bias))),
        prob_digits,
    )
    return feats.select(
        F.col(id_col),
        prob.alias("prob"),
        (prob >= 0.5).alias("keep"),
    )


def hashed_logreg_sql(
    src: str,
    id_col: str,
    label_sql: str,
    dim: int = 64,
    iters: int = 8,
    lr: float = 0.5,
    round_digits: int = 9,
) -> str:
    """DuckDB CTE chain re-deriving the ENTIRE training loop of
    :func:`train_hashed_logreg` — machine-generated from the same
    hyperparameters so oracle and operator cannot drift (the BPE-oracle
    pattern: a VALUE oracle for an iterative algorithm).

    Emits CTEs ``lrfeats`` (doc_id, f), ``lrdocs`` (doc_id, y), and one
    ``w{i}`` weight relation (f, w) per iteration — ``f = -1`` is the
    bias — ending at ``w{iters}``. Compose the final SELECT over
    ``w{iters}`` (weights) or join it back for scoring. ``label_sql``
    is a 0/1 expression over ``{src}``'s columns."""
    bucket = "('0x' || substring(md5(tok), 1, 15))::BIGINT % " + str(dim)
    ctes = [
        rf"""lrtoks AS MATERIALIZED (
  SELECT {id_col} AS doc_id, {label_sql} AS y,
         string_split_regex(lower(trim(COALESCE(text, ''))), '\s+') AS t
  FROM {src}
), lrfeats AS MATERIALIZED (
  SELECT DISTINCT doc_id, {bucket} AS f
  FROM (SELECT doc_id, unnest(t) AS tok FROM lrtoks)
), lrdocs AS MATERIALIZED (
  SELECT doc_id, CAST(y AS DOUBLE) AS y FROM lrtoks
), lrn AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lrdocs
), w0 AS MATERIALIZED (
  SELECT CAST(unnest(generate_series(-1, {dim - 1})) AS BIGINT) AS f,
         0.0::DOUBLE AS w
)"""
    ]
    for i in range(iters):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT d.doc_id, d.y,
    1.0 / (1.0 + exp(-(
      (SELECT w FROM w{i} WHERE f = -1)
      + COALESCE((SELECT SUM(wi.w) FROM lrfeats lf JOIN w{i} wi ON wi.f = lf.f
                  WHERE lf.doc_id = d.doc_id), 0.0)
    ))) AS p
  FROM lrdocs d
), g{i} AS MATERIALIZED (
  SELECT lf.f, SUM((p.p - p.y) / lrn.n) AS g
  FROM p{i} p JOIN lrfeats lf ON lf.doc_id = p.doc_id, lrn
  GROUP BY lf.f
  UNION ALL
  SELECT -1::BIGINT AS f, SUM((p.p - p.y) / lrn.n) AS g FROM p{i} p, lrn
), w{i + 1} AS MATERIALIZED (
  SELECT w.f, round(w.w - {lr} * COALESCE(g.g, 0.0), {round_digits}) AS w
  FROM w{i} w LEFT JOIN g{i} g ON g.f = w.f
)"""
        )
    return ",\n".join(ctes)
