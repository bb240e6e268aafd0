"""Semantic deduplication over embeddings (SemDeDup-style).

Near-duplicate text dedup (MinHash, SimHash, n-gram Jaccard —
operators/dedup.py) keys on surface overlap; SEMANTIC dedup (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication") removes documents that say the same thing in
different words by clustering their embeddings and thresholding cosine
similarity WITHIN each cluster — the cluster boundary is what bounds
the otherwise-quadratic pair search.

100 TB design:
- **k-means is the "aggregate distributed, iterate on metadata"
  pattern** (BPE / IVF / the logreg classifier here): each Lloyd
  iteration is one map-only assignment pass (centroids enter the plan
  as literal arrays — no join) plus one groupBy shuffle whose output
  is k × (dim + 1) numbers, collected to the driver. Centroid count k
  scales with corpus size (SemDeDup used ~100k clusters for web
  scale), so the within-cluster pair join stays bounded: expected
  cluster size = N/k documents, and the self-join on the cluster id
  never degenerates into a corpus cross-product. The gemm scorer
  additionally TILES every cluster into <= block_size sub-blocks
  (dedup.py's block-bundle pattern), so per-task memory is two tiles
  even when the clustering is skewed or under-k'd — cluster skew can
  cost flops, never executor memory.
- **Everything is engine-reproducible by construction** — this is the
  deliberate twist vs the IVF/PQ lanes (rows-only + recall floors):
  seeds are the k lowest ``md5(salt || id)`` vectors (portable SQL,
  not xxhash), every assignment compares dot products ROUNDED to
  ``round_digits`` with ties broken toward the lower centroid index,
  and every recomputed centroid coordinate is rounded the same way.
  Distributed double addition is order-sensitive at ~1e-16; the
  rounding grid (1e-9) is far coarser than that noise and far finer
  than the signal, so Spark and the DuckDB oracle
  (:func:`semantic_dedup_sql` — chained MATERIALIZED CTEs re-deriving
  every Lloyd step) land on identical clusters, pairs, and survivors:
  a VALUE oracle for the whole pipeline.
- Empty clusters keep their previous centroid (both lanes), so k
  never silently shrinks.

The reference engine has no vector surface at all (SURVEY §2.2); this
is LLM-pipeline extension surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from delta_lake_experiment_spark.functions.guards import null_checked
from delta_lake_experiment_spark.operators.similarity import l2_normalize


def _norm_checked(vec_col: str) -> Column:
    """l2-normalized vector with a NULL guard: a NULL embedding would
    otherwise ride the whole pipeline with a NULL cluster — silently
    unclustered, silently never paired, silently canonical. Raising
    mirrors the sampling/lm lanes' NULL-key contract."""
    return l2_normalize(
        null_checked(F.col(vec_col), "semantic_dedup", f"vector {vec_col!r}")
    )


def _dot_lit(vec: Column, c: Sequence[float]) -> Column:
    """Dot product of an array column with a literal centroid — one
    zip_with + left-to-right fold (the same fold order DuckDB's
    list_dot_product uses; existing embedding oracles hash-match at
    round-9, which certifies the two agree on this data).

    Measured alternative, rejected: unrolling to a k x dim
    element_at sum chain IS whole-stage-codegen-able (HOF lambdas are
    CodegenFallback) and bit-identical, but the 4096-term tree (k=8,
    dim=64) cost MORE in Catalyst analysis/codegen than the
    interpreter dispatches it saved (isolated sf0.1 run: construct
    5.7 s -> 10-15 s). The fold keeps the plan tree O(1) per
    centroid; assignment throughput at true scale is the gemm pair
    stage's job, not this expression's."""
    return F.aggregate(
        F.zip_with(vec, F.lit([float(x) for x in c]), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest(vec: Column, centroids: Sequence[Sequence[float]], round_digits: int) -> Column:
    """Index of the max-dot-product centroid over ROUNDED scores, ties
    to the LOWER index (array_max over (score, -index) structs picks
    max score then max -index = min index) — the rounding + tie rule is
    what makes the assignment engine-reproducible."""
    scored = F.array(
        *[
            F.struct(
                F.round(_dot_lit(vec, c), round_digits).alias("s"),
                F.lit(-j).alias("nj"),
            )
            for j, c in enumerate(centroids)
        ]
    )
    return (-F.array_max(scored)["nj"]).cast("int")


def _assign_arrow(
    norm: DataFrame,
    vec_field: str,
    centroids: Sequence[Sequence[float]],
    round_digits: int,
) -> DataFrame:
    """Arrow fast path for the centroid assignment: same columns as
    ``norm`` plus ``__c`` — value-identical to the ``_nearest``
    expression by construction, not by luck:

    - dot products accumulate column-by-column over the dimension
      (``acc = acc + prod[:, d]``, vectorized across rows) — the
      exact left-to-right association of the JVM zip_with/aggregate
      fold and DuckDB's list_dot_product, NOT a BLAS gemm (pairwise
      summation order);
    - rounding is the vectorized DuckDB replication
      (functions/rounding.py's scale/half-away/divide, applied with
      numpy primitives), so scores equal the ORACLE's to the bit —
      vs the hof path's JVM F.round they can differ only where JVM
      and DuckDB rounding modes split on the same double, the
      measure-zero edge for these generic sums (raw normalized
      vectors against grid centroids), where this path sides with
      the oracle;
    - ``np.argmax`` returns the FIRST maximum — the lower-index
      tie-break ``_nearest`` encodes via max(struct(s, -j)).

    Why it exists: the interpreted HOF fold dispatches
    rows x k x dim lambda calls per assignment pass (CodegenFallback
    — measured seconds per pass at sf0.1 across the four k-means
    consumers); this path is one Arrow batch scan. ``"hof"`` remains
    available and the two are pytest-pinned equal on the fixture."""
    import numpy as np
    import pandas as pd

    from delta_lake_experiment_spark.functions.rounding import (
        round_like_sql_np,
    )

    C = np.asarray([[float(x) for x in c] for c in centroids], dtype=np.float64)
    rd = int(round_digits)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(list(pdf[vec_field]), dtype=np.float64)
            n = len(pdf)
            scores = np.empty((n, C.shape[0]), dtype=np.float64)
            for j in range(C.shape[0]):
                prod = mat * C[j]
                acc = np.zeros(n, dtype=np.float64)
                for d in range(prod.shape[1]):
                    # in-place: identical left-to-right fold, no
                    # per-step temporary (k x dim of them otherwise)
                    np.add(acc, prod[:, d], out=acc)
                scores[:, j] = acc
            rounded = round_like_sql_np(scores, rd)
            out = pdf.copy()
            out["__c"] = np.argmax(rounded, axis=1).astype("int32")
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in norm.schema.fields
    )
    return norm.mapInPandas(run, f"{schema}, __c int")


def seed_centroids(
    df: DataFrame, id_col: str, vec_col: str, k: int, salt: str
) -> list:
    """The k vectors with the smallest ``md5(salt || id)`` (ties by
    id) — a deterministic uniform sample ANY engine can reproduce
    (unlike the xxhash64 IVF seeds). Vectors are l2-normalized here;
    the whole lane works on the unit sphere (dot == cosine)."""
    if k < 1:
        raise ValueError(f"k={k!r} must be >= 1")
    rows = (
        df.select(
            F.col(id_col).alias("i"),
            _norm_checked(vec_col).alias("v"),
        )
        .orderBy(
            F.md5(F.concat(F.lit(salt), F.col("i").cast("string"))), F.col("i")
        )
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r["v"]] for r in rows]


def deterministic_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    salt: str = "sem",
    round_digits: int = 9,
    assign_strategy: str = "arrow",
) -> list:
    """Lloyd's k-means with rounded, engine-reproducible steps; returns
    the final centroid list (each coordinate rounded). One distributed
    job per iteration: map-only assignment + a k x (dim+1) aggregate
    (per-dimension means via map-side-combined ``avg`` columns).
    ``assign_strategy``: ``"arrow"`` (default — the _assign_arrow
    fast path, exact fold order + oracle-replicated rounding) or
    ``"hof"`` (the JVM expression; pytest-pinned equal)."""
    if assign_strategy not in ("arrow", "hof"):
        raise ValueError(f"unknown assign_strategy {assign_strategy!r}")
    cents = seed_centroids(df, id_col, vec_col, k, salt)
    if not cents:
        raise ValueError("deterministic_kmeans: empty input")
    dim = len(cents[0])
    # normalize ONCE and keep the unit vectors cached across Lloyd
    # iterations (each iteration otherwise re-reads and re-normalizes
    # the source); fully consumed inside this call, so eagerly
    # released — the try/finally exception to the functions/cache.py
    # consumer-releases contract
    from delta_lake_experiment_spark.functions.rounding import round_like_sql

    norm = df.select(
        F.col(id_col).alias("i"), _norm_checked(vec_col).alias("v")
    ).persist()
    try:
        for _ in range(iters):
            assigned = (
                _assign_arrow(norm, "v", cents, round_digits)
                if assign_strategy == "arrow"
                else norm.withColumn(
                    "__c", _nearest(F.col("v"), cents, round_digits)
                )
            )
            rows = (
                assigned.groupBy("__c")
                .agg(
                    *[
                        F.avg(F.element_at(F.col("v"), i + 1)).alias(f"m{i}")
                        for i in range(dim)
                    ]
                )
                .collect()
            )
            # round_like_sql, not Python round: the one driver-side
            # rounding in this loop compared against DuckDB round
            # (functions/rounding.py contract; means are generic so
            # the two rarely split, but rarely is not never)
            new = {
                r["__c"]: [
                    round_like_sql(float(r[f"m{i}"]), round_digits)
                    for i in range(dim)
                ]
                for r in rows
            }
            # empty clusters keep their previous centroid
            cents = [new.get(j, cents[j]) for j in range(len(cents))]
    finally:
        norm.unpersist()
    return cents


def kmeans_assignments(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    salt: str = "sem",
    round_digits: int = 9,
    assign_strategy: str = "arrow",
) -> DataFrame:
    """(id_col, cluster) — just the deterministic k-means assignment,
    for consumers that want the CLUSTERING without the dedup pair
    search (topic reports, stratified sampling by semantic cluster,
    per-cluster routing). Same seeds/rounding/tie-breaks as
    :func:`semantic_dedup`; the oracle fragment is
    :func:`semantic_pair_ctes`'s ``sfinal``."""
    if assign_strategy not in ("arrow", "hof"):
        raise ValueError(f"unknown assign_strategy {assign_strategy!r}")
    cents = deterministic_kmeans(
        df, id_col, vec_col, k=k, iters=iters, salt=salt,
        round_digits=round_digits, assign_strategy=assign_strategy,
    )
    return assign_to_centroids(
        df, id_col, vec_col, cents,
        round_digits=round_digits, assign_strategy=assign_strategy,
    )


def assign_to_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: "Sequence[Sequence[float]]",
    round_digits: int = 9,
    assign_strategy: str = "arrow",
) -> DataFrame:
    """(id_col, cluster) — assignment of each (l2-normalized) vector
    to its nearest centroid under the certified rounded-dot +
    lower-index tie-break semantics, for consumers that already HOLD
    a trained centroid list (the ANN recall report probes a
    deterministic_kmeans model whose centroids it also needs
    driver-side for probe selection — retraining inside
    kmeans_assignments would double the Lloyd work). Same oracle
    fragment as :func:`kmeans_assignments` (semantic_pair_ctes'
    ``sfinal``)."""
    if assign_strategy not in ("arrow", "hof"):
        raise ValueError(f"unknown assign_strategy {assign_strategy!r}")
    norm = df.select(F.col(id_col), _norm_checked(vec_col).alias("__v"))
    if assign_strategy == "arrow":
        return _assign_arrow(norm, "__v", centroids, round_digits).select(
            F.col(id_col), F.col("__c").alias("cluster")
        )
    return norm.select(
        F.col(id_col),
        _nearest(F.col("__v"), centroids, round_digits).alias("cluster"),
    )


def _assigned_and_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
    threshold: float,
    salt: str,
    round_digits: int,
    sim_digits: int,
    pair_strategy: str = "gemm",
    block_size: int = 4096,
    assign_strategy: str = "arrow",
) -> "tuple[DataFrame, DataFrame]":
    """Shared core: (assigned, pairs) where ``assigned`` is the
    persisted (``__i``, ``__v`` normalized, ``__c`` cluster) table and
    ``pairs`` the within-cluster cosine matches (id_a < id_b).

    ``pair_strategy`` picks the scorer (identical pair set at the
    ``sim_digits`` rounding grid — the embedding-dedup precedent,
    operators/dedup.py::embedding_near_duplicates):

    - ``"gemm"`` (default): clusters are TILED into sub-blocks of at
      most ~``block_size`` vectors (``pmod(xxhash64(id), ceil(|c| /
      block_size))`` — the block-bundle pattern of
      operators/dedup.py::embedding_near_duplicates), each sub-block
      becomes one bundle row (``collect_list``), and every unordered
      sub-block pair within a cluster is scored with one numpy
      ``mat_a @ mat_b.T`` — BLAS throughput instead of one interpreted
      higher-order fold per candidate pair (CodegenFallback; measured
      ~3x on the sf0.1 fixture). Peak per-task memory is two bundles
      (~``block_size`` · dim · 8 B each) REGARDLESS of cluster skew —
      a degenerate k-means (under-k'd corpus, one giant cluster) costs
      quadratic flops, as SemDeDup inherently does, but never
      materializes more than two tiles in one Arrow row. BLAS sums
      pairwise vs the fold's sequential order: at the 1e-6 grid a
      discrepancy crossing a rounding boundary is astronomically rare
      (and the DuckDB oracle hash-check re-certifies every run).
    - ``"hof"``: the JVM fold join — bit-reproducible against any
      sequential-fold oracle; the strategies are pytest-pinned equal
      on the fixture corpus (as are tiled vs single-tile gemm).
    """
    if pair_strategy not in ("gemm", "hof"):
        raise ValueError(f"unknown pair_strategy {pair_strategy!r}")
    if block_size < 1:
        raise ValueError(f"block_size={block_size!r} must be >= 1")
    if assign_strategy not in ("arrow", "hof"):
        raise ValueError(f"unknown assign_strategy {assign_strategy!r}")
    cents = deterministic_kmeans(
        df, id_col, vec_col, k=k, iters=iters, salt=salt,
        round_digits=round_digits, assign_strategy=assign_strategy,
    )
    base = df.select(
        F.col(id_col).alias("__i"), _norm_checked(vec_col).alias("__v")
    )
    norm = (
        _assign_arrow(base, "__v", cents, round_digits)
        if assign_strategy == "arrow"
        else base.withColumn("__c", _nearest(F.col("__v"), cents, round_digits))
    )
    # the assigned table feeds both sides of the pair join and the
    # final output; persist so normalization + assignment run once
    norm = norm.persist()
    if pair_strategy == "gemm":
        import numpy as np
        import pandas as pd

        thr, rd = float(threshold), int(sim_digits)
        id_dt = df.schema[id_col].dataType.simpleString()
        # Per-cluster tile count: O(k) rows, broadcast back onto the
        # assigned table so the sub-block id is a map-side column.
        sizes = norm.groupBy("__c").agg(
            F.ceil(F.count(F.lit(1)) / F.lit(int(block_size)))
            .cast("int")
            .alias("__nb")
        )
        bundles = (
            norm.join(F.broadcast(sizes), "__c")
            .withColumn(
                "__b",
                F.pmod(F.xxhash64(F.col("__i")), F.col("__nb")).cast("int"),
            )
            .groupBy("__c", "__nb", "__b")
            .agg(
                F.collect_list(
                    F.struct(F.col("__i").alias("id"), F.col("__v").alias("v"))
                ).alias("bundle")
            )
        )
        # Every unordered sub-block pair (b, q), b <= q, within a
        # cluster: explode sequence(b, nb-1) on the left, equi-join the
        # right bundle on (cluster, q) — the P(P+1)/2 tile-pair plan.
        left = bundles.withColumnRenamed("bundle", "bundle_a").withColumn(
            "__q", F.explode(F.sequence(F.col("__b"), F.col("__nb") - 1))
        )
        right = bundles.select(
            "__c", F.col("__b").alias("__q"), F.col("bundle").alias("bundle_b")
        )
        joined = left.join(right, ["__c", "__q"])

        def _score(batches):
            for pdf in batches:
                parts = []
                for blk_b, blk_q, ba, bb in zip(
                    pdf["__b"], pdf["__q"], pdf["bundle_a"], pdf["bundle_b"]
                ):
                    ids_a = np.asarray([e["id"] for e in ba])
                    ids_b = np.asarray([e["id"] for e in bb])
                    mat_a = np.asarray([e["v"] for e in ba], dtype=np.float64)
                    mat_b = np.asarray([e["v"] for e in bb], dtype=np.float64)
                    cos = np.round(mat_a @ mat_b.T, rd)
                    mask = cos >= thr
                    if blk_b == blk_q:
                        mask &= ids_a[:, None] < ids_b[None, :]
                    ii, jj = np.nonzero(mask)
                    if not len(ii):
                        continue
                    ia, ib = ids_a[ii], ids_b[jj]
                    # np.where, not np.minimum/maximum: the min/max
                    # ufuncs have no string loops on numpy 1.x, and
                    # id_dt is derived generically so string ids are
                    # in-contract ('<' comparisons do support strings)
                    lo = np.where(ia < ib, ia, ib)
                    hi = np.where(ia < ib, ib, ia)
                    parts.append(pd.DataFrame({"id_a": lo, "id_b": hi}))
                if parts:
                    yield pd.concat(parts, ignore_index=True)

        pairs = joined.mapInPandas(_score, f"id_a {id_dt}, id_b {id_dt}")
        return norm, pairs
    left = norm.select(
        F.col("__i").alias("id_a"), F.col("__v").alias("__va"), "__c"
    )
    right = norm.select(
        F.col("__i").alias("id_b"), F.col("__v").alias("__vb"), "__c"
    )
    cos = F.round(
        F.aggregate(
            F.zip_with(F.col("__va"), F.col("__vb"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        sim_digits,
    )
    pairs = (
        left.join(right, "__c")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("__cos", cos)
        .filter(F.col("__cos") >= threshold)
        .select("id_a", "id_b")
    )
    return norm, pairs


def semantic_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    salt: str = "sem",
    round_digits: int = 9,
    sim_digits: int = 6,
    pair_strategy: str = "gemm",
    block_size: int = 4096,
    assign_strategy: str = "arrow",
) -> DataFrame:
    """Just the (id_a, id_b) semantic near-duplicate edges — for
    composing with other pair generators (e.g. an ensemble dedup that
    unions lexical and semantic edges before ONE component
    resolution)."""
    _, pairs = _assigned_and_pairs(
        df, id_col, vec_col, k, iters, threshold, salt, round_digits,
        sim_digits, pair_strategy, block_size, assign_strategy,
    )
    return pairs


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    salt: str = "sem",
    round_digits: int = 9,
    sim_digits: int = 6,
    pair_strategy: str = "gemm",
    block_size: int = 4096,
    assign_strategy: str = "arrow",
) -> DataFrame:
    """(id_col, cluster, component, is_canonical) — the SemDeDup
    pipeline: deterministic k-means, within-cluster cosine pairs at
    ``>= threshold`` (rounded to ``sim_digits``), connected components
    over the pair graph, min-id canonical per duplicate group.
    ``filter(is_canonical)`` is the semantically deduplicated corpus.

    The pair search never leaves a cluster (pairs straddling a cluster
    boundary are missed — the SemDeDup trade by construction; raise
    ``k`` for tighter clusters or lower recall loss), so the join cost
    is sum over clusters of |cluster|^2, not N^2."""
    from delta_lake_experiment_spark.operators.cluster import assign_components

    norm, pairs = _assigned_and_pairs(
        df, id_col, vec_col, k, iters, threshold, salt, round_digits,
        sim_digits, pair_strategy, block_size, assign_strategy,
    )
    out = assign_components(
        norm.select(F.col("__i").alias(id_col), F.col("__c").alias("cluster")),
        pairs,
        id_col,
    )
    return out.select(
        id_col,
        "cluster",
        "component",
        (F.col(id_col) == F.col("component")).alias("is_canonical"),
    )


def semantic_pair_ctes(
    src: str,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    salt: str = "sem",
    round_digits: int = 9,
    sim_digits: int = 6,
) -> str:
    """The CTE fragment of the DuckDB twin, ending in ``sem_pairs``
    (id_a, id_b) plus ``sfinal`` (i, j cluster assignment) — for
    composing into larger oracles (semantic_dedup_sql, the ensemble
    dedup). Chained MATERIALIZED stages re-derive seed selection and
    every Lloyd step from the same hyperparameters as the operator
    (double-referenced chained CTEs inline exponentially otherwise —
    the BPE-oracle lesson)."""

    salt_lit = "'" + salt.replace("'", "''") + "'"
    norm = (
        f"CASE WHEN sqrt(list_dot_product(dv, dv)) > 0 THEN "
        f"list_transform(dv, x -> x / sqrt(list_dot_product(dv, dv))) "
        f"ELSE dv END"
    )
    ctes = [
        f"""se AS MATERIALIZED (
  SELECT {id_col} AS i, {norm} AS v
  FROM (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS dv FROM {src})
), sc0 AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5({salt_lit} || CAST(i AS VARCHAR)), i) AS INT) - 1 AS j, v
  FROM (SELECT i, v FROM se ORDER BY md5({salt_lit} || CAST(i AS VARCHAR)), i LIMIT {k})
)"""
    ]
    for it in range(iters):
        ctes.append(
            f"""sa{it} AS MATERIALIZED (
  SELECT i, j FROM (
    SELECT se.i, c.j, ROW_NUMBER() OVER (
      PARTITION BY se.i
      ORDER BY round(list_dot_product(se.v, c.v), {round_digits}) DESC, c.j ASC
    ) AS rn
    FROM se, sc{it} c
  ) WHERE rn = 1
), sm{it} AS MATERIALIZED (
  SELECT j, list(m ORDER BY pos) AS v FROM (
    SELECT j, pos, round(AVG(val), {round_digits}) AS m FROM (
      SELECT a.j AS j,
             unnest(generate_series(1, len(se.v))) AS pos,
             unnest(se.v) AS val
      FROM sa{it} a JOIN se ON se.i = a.i
    ) GROUP BY j, pos
  ) GROUP BY j
), sc{it + 1} AS MATERIALIZED (
  SELECT c.j, COALESCE(m.v, c.v) AS v
  FROM sc{it} c LEFT JOIN sm{it} m ON m.j = c.j
)"""
        )
    ctes.append(
        f"""sfinal AS MATERIALIZED (
  SELECT i, j FROM (
    SELECT se.i, c.j, ROW_NUMBER() OVER (
      PARTITION BY se.i
      ORDER BY round(list_dot_product(se.v, c.v), {round_digits}) DESC, c.j ASC
    ) AS rn
    FROM se, sc{iters} c
  ) WHERE rn = 1
), sem_pairs AS MATERIALIZED (
  SELECT a.i AS id_a, b.i AS id_b
  FROM sfinal a JOIN sfinal b ON a.j = b.j AND a.i < b.i
  JOIN se ea ON ea.i = a.i JOIN se eb ON eb.i = b.i
  WHERE round(list_dot_product(ea.v, eb.v), {sim_digits}) >= {threshold}
)"""
    )
    return ",\n".join(ctes)


def semantic_dedup_sql(
    src: str,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    salt: str = "sem",
    round_digits: int = 9,
    sim_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`semantic_dedup` — machine-generated from
    the same hyperparameters: :func:`semantic_pair_ctes` (seeds, every
    Lloyd step, assignment, within-cluster pairs) plus the component
    fixpoint. Emits a complete query returning
    (id, cluster, component, is_canonical)."""
    comps = """edges AS (
  SELECT id_a AS a, id_b AS b FROM sem_pairs
  UNION ALL
  SELECT id_b, id_a FROM sem_pairs
), reach(id, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, w.r FROM edges e JOIN reach w ON w.id = e.b
), comp AS (
  SELECT id, MIN(r) AS component FROM reach GROUP BY id
)"""
    return (
        "WITH RECURSIVE "
        + semantic_pair_ctes(
            src, id_col, vec_col, k=k, iters=iters, threshold=threshold,
            salt=salt, round_digits=round_digits, sim_digits=sim_digits,
        )
        + ",\n"
        + comps
        + f"""
SELECT f.i AS {id_col}, f.j AS cluster,
  COALESCE(c.component, f.i) AS component,
  f.i = COALESCE(c.component, f.i) AS is_canonical
FROM sfinal f LEFT JOIN comp c ON c.id = f.i
"""
    )
