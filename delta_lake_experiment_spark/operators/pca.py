"""Deterministic PCA over embedding columns — dimensionality reduction
for the vector lane (ANN indexing, clustering, drift visualization,
whitening before quantization).

Architecture (the 100 TB split, same shape as the k-means / BPE /
logreg lanes): the corpus-sized work is TWO distributed passes —
the per-dimension mean (one aggregation of ``dim`` numbers) and the
centered covariance matrix (Arrow ``mapInPandas`` partial Gram
matrices: each partition emits ONE flattened ``dim x dim`` partial sum
computed by numpy gemm, so shuffle volume is O(partitions · dim²), not
O(rows · dim²) — the explode-pairs plan would shuffle n·d² rows and is
exactly what this lane avoids). Everything after is driver-side
iteration on O(dim²) metadata: top-``k`` eigenvectors by power
iteration with deflation, a FIXED ``p_iters`` steps per component.

Engine-reproducibility (the deterministic-kmeans discipline): every
derived scalar is rounded to a ``round_digits`` grid at pinned points
— the mean, each covariance entry, each matvec coordinate, each norm,
each normalized coordinate, each eigenvalue, each deflated entry —
and the component sign is fixed (the largest-|loading| coordinate,
ties to the LOWEST index, is made positive). Unlike every other
grid-rounded lane in this repo, "close + rounded" is NOT enough here:
grid-aligned state makes sums land structurally near decimal
midpoints, so the iteration's summations are pinned to a
bit-identical fold order (:func:`_fold_dot` == DuckDB
``list_dot_product`` == Spark's zip_with/aggregate) and the driver
rounds with a bit-exact replication of DuckDB's ``round``
(:func:`_round_like_sql`). The DuckDB twin
(:func:`pca_components_sql`) then re-derives the ENTIRE computation —
mean, covariance, every power-iteration step, every deflation — as
chained MATERIALIZED CTEs over matrix/vector-list tables: a VALUE
oracle for an iterative numeric algorithm, exact to the last digit.
The output is defined as "the rounded fixed-iteration power-iteration
result", not "the true eigenvectors": convergence quality depends on
eigengaps and p_iters, parity does not.

The reference engine has no vector surface (SURVEY.md §2.2); this
extends the embedding lane next to operators/similarity.py (ANN) and
operators/semdedup.py (clustering).
"""

from __future__ import annotations

import math
from typing import Iterator, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_mean(
    df: DataFrame, vec_col: str, round_digits: int = 9
) -> List[float]:
    """Per-dimension mean of an embedding column, each coordinate
    rounded — one aggregation of ``dim`` map-side-combined AVG columns
    (the deterministic-kmeans centroid-update shape). NULL vectors
    RAISE in-plan (``null_checked``): AVG would otherwise silently
    skip them, skewing the mean over the non-NULL subset while the
    covariance pass crashed on the same data — the
    two-different-behaviors-for-one-bad-input failure mode the guard
    convention exists for."""
    from delta_lake_experiment_spark.functions.guards import null_checked

    vec = null_checked(F.col(vec_col), "embedding_mean", f"vector {vec_col!r}")
    first = df.select(F.size(vec).alias("d")).first()
    if first is None or first["d"] is None:
        raise ValueError("embedding_mean: empty input")
    dim = int(first["d"])
    row = df.agg(
        *[
            F.avg(F.element_at(vec, i + 1)).alias(f"m{i}")
            for i in range(dim)
        ]
    ).collect()[0]
    return [
        _round_like_sql(float(row[f"m{i}"]), round_digits)
        for i in range(dim)
    ]


def covariance_matrix(
    df: DataFrame,
    vec_col: str,
    mean: Sequence[float],
    round_digits: int = 9,
) -> List[List[float]]:
    """Centered covariance ``C[i][j] = round(Σ (x_i - μ_i)(x_j - μ_j)
    / n, grid)`` with the PRE-ROUNDED mean entering both engines as
    the identical literal (two-pass centering — the one-pass
    ``Σxx - nμμ`` rearrangement is a different float computation and
    is deliberately not used). Partial Gram matrices per Arrow batch
    (numpy gemm), summed exactly on the driver with ``math.fsum`` (so
    the driver total is independent of partition order; only the
    in-batch gemm order contributes reassociation noise, ~1e-16
    against the 1e-9 grid)."""
    import numpy as np
    import pandas as pd

    mu = [float(x) for x in mean]
    dim = len(mu)

    def partials(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if pdf[vec_col].isnull().any():
                raise ValueError(
                    f"covariance_matrix: {vec_col} is NULL - vectors must"
                    " be non-NULL (filter upstream)"
                )
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64) - np.asarray(
                mu, dtype=np.float64
            )
            gram = mat.T @ mat
            yield pd.DataFrame(
                {"n": [len(pdf)], "g": [gram.ravel().tolist()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, f"n long, g array<double>")
        .collect()
    )
    n = sum(int(r["n"]) for r in rows)
    if n == 0:
        raise ValueError("covariance_matrix: empty input")
    flat = [
        math.fsum(float(r["g"][p]) for r in rows) for p in range(dim * dim)
    ]
    return [
        [
            _round_like_sql(flat[i * dim + j] / n, round_digits)
            for j in range(dim)
        ]
        for i in range(dim)
    ]


# re-exported here because this lane DISCOVERED the mismatch class
# (grid-aligned matvec sums landing near decimal midpoints — observed:
# 3/64 coordinates of the very first power-iteration matvec flipped
# between Python round and DuckDB round); the shared home documents
# both reachable input classes
from delta_lake_experiment_spark.functions.rounding import (  # noqa: E402
    round_like_sql as _round_like_sql,
)


def _fold_dot(a: Sequence[float], b: Sequence[float]) -> float:
    """Left-to-right ``acc = acc + a[i] * b[i]`` fold — the ONE
    summation order every engine here reproduces bit-for-bit (Spark
    ``F.aggregate`` over ``zip_with``, DuckDB ``list_dot_product``,
    this loop; pytest-pinned on random grid values). Inside the power
    iteration this matters structurally, not cosmetically: the
    iteration state is grid-aligned (every value a multiple of 1e-9),
    so sums of state products land ON decimal rounding midpoints,
    where a 1e-17 cross-engine difference — harmless everywhere else
    in this repo — flips the rounded digit. (Observed: fsum-vs-SUM
    versions of this lane diverged in ~1/500 coordinates.) With a
    bit-identical fold, both engines hand the SAME double to their
    rounding function — which must then also be the same function:
    see :func:`_round_like_sql` for the second half of the story."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _sign_fixed(v: List[float]) -> List[float]:
    """Flip ``v`` so its largest-|coordinate| (ties -> LOWEST index)
    is positive — the deterministic sign convention both engines pin
    (eigenvectors are sign-ambiguous)."""
    am = max(range(len(v)), key=lambda i: (abs(v[i]), -i))
    return [-x for x in v] if v[am] < 0 else list(v)


def power_pca(
    cov: Sequence[Sequence[float]],
    k: int,
    p_iters: int = 8,
    round_digits: int = 9,
) -> List[Tuple[float, List[float]]]:
    """Top-``k`` (eigenvalue, eigenvector) pairs of a rounded
    covariance matrix by FIXED-iteration power iteration with
    deflation — pure driver-side metadata iteration, every
    intermediate grid-rounded (module docstring). Start vector is the
    uniform unit vector (round(1/sqrt(dim)) in every coordinate).
    Raises on a zero matvec (an all-zero matrix has no direction to
    find; real embedding covariances never hit this)."""
    rd = int(round_digits)
    dim = len(cov)
    if not 1 <= k <= dim:
        raise ValueError(f"k={k!r} must be in [1, {dim}]")
    if p_iters < 1:
        raise ValueError(f"p_iters={p_iters!r} must be >= 1")
    C = [[float(x) for x in row] for row in cov]
    out: List[Tuple[float, List[float]]] = []
    v0 = _round_like_sql(1.0 / math.sqrt(dim), rd)
    for _ in range(k):
        v = [v0] * dim
        for _ in range(p_iters):
            w = [_round_like_sql(_fold_dot(C[i], v), rd) for i in range(dim)]
            n2 = _round_like_sql(_fold_dot(w, w), rd)
            nrm = _round_like_sql(math.sqrt(n2), rd)
            if nrm == 0:
                raise ValueError(
                    "power_pca: zero matvec - the (deflated) matrix has"
                    " rank below k; lower k"
                )
            v = [_round_like_sql(x / nrm, rd) for x in w]
        u = [_round_like_sql(_fold_dot(C[i], v), rd) for i in range(dim)]
        lam = _round_like_sql(_fold_dot(v, u), rd)
        v = _sign_fixed(v)
        out.append((lam, v))
        C = [
            [
                _round_like_sql(C[i][j] - lam * v[i] * v[j], rd)
                for j in range(dim)
            ]
            for i in range(dim)
        ]
    return out


def project_embeddings(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    mean: Sequence[float],
    components: Sequence[Sequence[float]],
    proj_digits: int = 6,
) -> DataFrame:
    """(id_col, pc1..pck) — each vector's centered projection onto the
    trained components, rounded to ``proj_digits``. Map-only JVM fold
    per component (the semdedup literal-dot lane; components are
    O(k · dim) literals — metadata), no shuffle: projecting 100 TB of
    embeddings is one codegen'd scan."""
    mu = F.lit([float(x) for x in mean])
    centered = F.zip_with(
        F.col(vec_col), mu, lambda a, b: a - b
    )
    cols = []
    for c, comp in enumerate(components):
        dot = F.aggregate(
            F.zip_with(
                centered,
                F.lit([float(x) for x in comp]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.round(dot, proj_digits).alias(f"pc{c + 1}"))
    return df.select(F.col(id_col), *cols)


# ---------------------------------------------------------------------------
# DuckDB value-oracle twins: matrices as (i, j, c) tables, vectors as
# (i, val) tables, one chained-CTE block per power-iteration step and
# per deflation — machine-generated from the same hyperparameters
# (the bpe_merges_sql / semantic_dedup_sql precedent). ``dim`` is a
# schema property of the embedding column and enters the generator as
# a parameter (the start coordinate round(1/sqrt(dim), grid) is
# computed by the SAME Python expression power_pca uses, so the two
# can never diverge).
# ---------------------------------------------------------------------------


def _pca_ctes(
    src: str,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    p_iters: int,
    round_digits: int,
) -> "tuple[list[str], list[str]]":
    """Shared CTE chain: mean, centered values, covariance, then per
    component the power-iteration steps, eigenvalue, sign fix, and
    deflation. Returns (ctes, [pvec names per component]). Static
    hyperparameters are validated with the operator's own rules (a
    twin accepting what power_pca rejects is a divergence).

    PRECONDITION (guarded in-query): ``id_col`` must be unique. The
    operator never touches ids (it divides the Gram sum by the raw
    row count), but this twin reconstructs the Gram via a pcen
    self-join USING (id) — duplicate ids would inflate the join
    output AND shrink a COUNT(DISTINCT id) divisor, silently
    disagreeing with (or masking bugs in) the operator (ADVICE r6
    #2). ``pids`` raises via error() when ids repeat, and the
    divisor is the operator's row count (COUNT(*) over pe's i=1
    slice — one row per source row)."""
    if dim < 1:
        raise ValueError(f"dim={dim!r} must be >= 1")
    if not 1 <= k <= dim:
        raise ValueError(f"k={k!r} must be in [1, {dim}]")
    if p_iters < 1:
        raise ValueError(f"p_iters={p_iters!r} must be >= 1")
    rd = int(round_digits)
    v0 = _round_like_sql(1.0 / math.sqrt(dim), rd)
    # Covariance is positional (i, j, c): its inputs are GENERIC
    # doubles (centered raw embeddings), so plain SUM's reassociation
    # noise is measure-zero against the grid — the standard argument.
    # The power iteration is different: its state is grid-ALIGNED, so
    # every summation there is an ordered list_dot_product over lists
    # built with an explicit ORDER BY — bit-identical to the Python
    # _fold_dot loop (see its docstring for why this is load-bearing).
    ctes = [
        f"""pe AS MATERIALIZED (
  SELECT {id_col} AS id,
    unnest(generate_series(1, len(v))) AS i, unnest(v) AS x
  FROM (
    SELECT {id_col},
      CASE WHEN {vec_col} IS NULL
        THEN CAST(error('pca oracle: vector {vec_col} is NULL - must be'
                  || ' non-NULL (filter or coalesce upstream)') AS DOUBLE[])
        ELSE CAST({vec_col} AS DOUBLE[]) END AS v
    FROM {src}
  )
)""",
        f"""pmu AS MATERIALIZED (
  SELECT i, round(AVG(x), {rd}) AS m FROM pe GROUP BY i
)""",
        """pids AS MATERIALIZED (
  SELECT CASE WHEN COUNT(*) = COUNT(DISTINCT id) THEN COUNT(*)
    ELSE CAST(error('pca oracle: duplicate ids - the Gram self-join'
              || ' USING (id) requires unique ids (dedupe upstream)')
         AS BIGINT) END AS n
  FROM pe WHERE i = 1
)""",
        """pcen AS MATERIALIZED (
  SELECT pe.id, pe.i, pe.x - pmu.m AS cx FROM pe JOIN pmu USING (i)
)""",
        f"""pC0 AS MATERIALIZED (
  SELECT a.i, b.i AS j,
    round(SUM(a.cx * b.cx) / (SELECT n FROM pids), {rd}) AS c
  FROM pcen a JOIN pcen b USING (id) GROUP BY 1, 2
)""",
    ]
    vec_names = []
    for comp in range(k):
        ctes.append(
            f"""pM{comp} AS MATERIALIZED (
  SELECT i, list(c ORDER BY j) AS row FROM pC{comp} GROUP BY i
)"""
        )
        cur = f"pv{comp}_0"
        ctes.append(
            f"""{cur} AS MATERIALIZED (
  SELECT list_transform(generate_series(1, {int(dim)}),
                        x -> CAST({v0!r} AS DOUBLE)) AS vec
)"""
        )
        for t in range(p_iters):
            w = f"pw{comp}_{t}"
            wl = f"pwl{comp}_{t}"
            nm = f"pn{comp}_{t}"
            nxt = f"pv{comp}_{t + 1}"
            ctes.append(
                f"""{w} AS MATERIALIZED (
  SELECT m.i, round(list_dot_product(m.row, v.vec), {rd}) AS val
  FROM pM{comp} m, {cur} v
)"""
            )
            ctes.append(
                f"""{wl} AS MATERIALIZED (
  SELECT list(val ORDER BY i) AS w FROM {w}
)"""
            )
            ctes.append(
                f"""{nm} AS MATERIALIZED (
  SELECT round(sqrt(round(list_dot_product(w, w), {rd})), {rd}) AS nrm
  FROM {wl}
)"""
            )
            ctes.append(
                f"""{nxt} AS MATERIALIZED (
  SELECT list_transform(wl.w, x -> round(x / n.nrm, {rd})) AS vec
  FROM {wl} wl, {nm} n
)"""
            )
            cur = nxt
        ctes.append(
            f"""pu{comp} AS MATERIALIZED (
  SELECT list(val ORDER BY i) AS u FROM (
    SELECT m.i, round(list_dot_product(m.row, v.vec), {rd}) AS val
    FROM pM{comp} m, {cur} v
  )
)"""
        )
        ctes.append(
            f"""plam{comp} AS MATERIALIZED (
  SELECT round(list_dot_product(v.vec, u.u), {rd}) AS l
  FROM {cur} v, pu{comp} u
)"""
        )
        ctes.append(
            f"""psgn{comp} AS MATERIALIZED (
  SELECT CASE WHEN (
    SELECT val FROM (
      SELECT unnest(generate_series(1, {int(dim)})) AS i,
             unnest(vec) AS val FROM {cur}
    ) ORDER BY abs(val) DESC, i ASC LIMIT 1
  ) < 0 THEN -1.0 ELSE 1.0 END AS s
)"""
        )
        vec = f"pvec{comp}"
        ctes.append(
            f"""{vec} AS MATERIALIZED (
  SELECT list_transform(v.vec, x -> g.s * x) AS vec
  FROM {cur} v, psgn{comp} g
)"""
        )
        vec_names.append(vec)
        if comp < k - 1:
            ctes.append(
                f"""pC{comp + 1} AS MATERIALIZED (
  SELECT m.i, m.j,
    round(m.c - (SELECT l FROM plam{comp}) * v.vec[m.i] * v.vec[m.j], {rd})
      AS c
  FROM pC{comp} m, {vec} v
)"""
            )
    return ctes, vec_names


def pca_components_sql(
    src: str,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    p_iters: int = 8,
    round_digits: int = 9,
) -> str:
    """DuckDB twin of :func:`embedding_mean` + :func:`covariance_matrix`
    + :func:`power_pca` — emits (component 1-based, eigenvalue, pos
    1-based, loading)."""
    ctes, vecs = _pca_ctes(
        src, id_col, vec_col, dim, k, p_iters, round_digits
    )
    union = "\nUNION ALL ".join(
        f"SELECT {c + 1} AS component, (SELECT l FROM plam{c}) AS eigenvalue,"
        f" unnest(generate_series(1, {int(dim)})) AS pos,"
        f" unnest(vec) AS loading FROM {v}"
        for c, v in enumerate(vecs)
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + f"SELECT component, eigenvalue, pos, loading FROM ({union})"
        + "\nORDER BY component, pos"
    )


def pca_projection_sql(
    src: str,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    p_iters: int = 8,
    round_digits: int = 9,
    proj_digits: int = 6,
) -> str:
    """DuckDB twin of the train-then-project composition
    (:func:`project_embeddings` under the components the same corpus
    trains) — emits (id, pc1..pck)."""
    ctes, vecs = _pca_ctes(
        src, id_col, vec_col, dim, k, p_iters, round_digits
    )
    pd_ = int(proj_digits)
    ctes.append(
        """pcl AS MATERIALIZED (
  SELECT id, list(cx ORDER BY i) AS cx FROM pcen GROUP BY id
)"""
    )
    for c, v in enumerate(vecs):
        ctes.append(
            f"""pj{c} AS MATERIALIZED (
  SELECT cen.id, round(list_dot_product(cen.cx, vec.vec), {pd_}) AS val
  FROM pcl cen, {v} vec
)"""
        )
    sel = ", ".join(f"pj{c}.val AS pc{c + 1}" for c in range(k))
    joins = " ".join(f"JOIN pj{c} USING (id)" for c in range(1, k))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT pj0.id AS id, {sel} FROM pj0 {joins}"
    )
