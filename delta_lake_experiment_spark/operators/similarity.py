"""Embedding similarity search over array<float> columns.

Two tiers, both 100 % JVM-side (higher-order array functions inside
whole-stage codegen — no Python UDF, no Arrow hop):

- :func:`cosine_topk` — exact brute force. One scan + one top-k
  (``orderBy ... limit`` executes as per-partition TakeOrdered + a tiny
  driver merge; no full sort, no shuffle of the data). The right answer
  up to ~10⁸ vectors per query batch.
- :func:`lsh_bucket_topk` — sign-random-projection (SimHash) bucketed
  ANN: vectors hash to a small bucket id; the query searches only its
  own bucket (optionally hamming-adjacent buckets). Deterministic
  projections derived from ``xxhash64`` so the index is reproducible
  with no stored model. This is the scale path: the bucket id is a
  partition key, so a 100 TB index becomes a partition-pruned scan.

Determinism note: dot products fold sequentially over array positions
(``aggregate``), so scores are bit-reproducible and oracle-checkable.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def cosine_score(vec: Column, query: Sequence[float]) -> Column:
    """cos(vec, query) with the query folded in as literals."""
    q = [float(x) for x in query]
    qnorm2 = math.fsum(x * x for x in q)  # driver-side constant
    qcol = F.array(*[F.lit(x) for x in q])
    v = _as_double(vec)
    return _dot(v, qcol) / F.sqrt(_dot(v, v) * F.lit(qnorm2))


def cosine_topk(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    round_digits: int = 9,
) -> DataFrame:
    """Exact top-k by cosine similarity; deterministic tie-break on id.

    Scores are rounded to ``round_digits`` decimals so rankings are
    engine-independent (different-but-valid summation strategies disagree
    in the last ulp; 1e-9 quantization absorbs that without affecting any
    real ranking)."""
    scored = emb_df.withColumn(
        "score", F.round(cosine_score(F.col(vec_col), query), round_digits)
    )
    return (
        scored.select(id_col, "score")
        .orderBy(F.desc("score"), F.col(id_col).asc())
        .limit(k)
    )


# -- deterministic Rademacher signs: a pure-Python implementation of the
# public xxHash64 spec (4-byte input path), bit-identical to Spark's
# ``xxhash64(int, int)`` (verified in tests). Having the signs in Python
# means the query-side bucket needs NO Spark job, and the index-side
# matrix is a plain literal (no 512-node CASE tree for Catalyst to fold).
_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64_int(i: int, seed: int) -> int:
    """XXH64 of one 4-byte little-endian int (public spec, tail path)."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((i & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl64(h, 23) * _P2 + _P3) & _M64
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def srp_signs(dim: int, bits: int) -> list:
    """bits × dim Rademacher ±1 matrix from chained xxh64(bit, comp),
    seed 42 — the same chaining Spark's ``xxhash64(lit(b), lit(j))``
    computes, so Python-side and JVM-side buckets agree exactly."""
    return [
        [1.0 if _xxh64_int(j, _xxh64_int(b, 42)) & 1 == 0 else -1.0 for j in range(dim)]
        for b in range(bits)
    ]


def srp_bucket_py(vec, signs) -> int:
    """Query-side bucket in pure Python. Dot products fold left-to-right
    over binary64 — the identical IEEE op sequence as the JVM fold in
    :func:`srp_bucket`, so both sides land in the same bucket even on
    knife-edge sign boundaries."""
    out = 0
    for b, row in enumerate(signs):
        acc = 0.0
        for x, s in zip(vec, row):
            acc += float(x) * s
        if acc >= 0:
            out |= 1 << b
    return out


def srp_bucket(vec: Column, dim: int, bits: int = 8) -> Column:
    """Sign-random-projection bucket id in [0, 2^bits).

    Projection matrix entries are deterministic Rademacher ±1 derived
    from xxh64(bit, component) — no stored model, identical on every
    executor and every run. The matrix enters the plan as one nested
    literal; the bucket id folds in a single aggregate() pass, keeping
    the expression tree tiny (fast codegen) and each array evaluated
    once per row.
    """
    v = _as_double(vec)
    matrix = F.array(
        *[
            F.array(*[F.lit(s) for s in row])
            for row in srp_signs(dim, bits)
        ]
    )
    # bucket = sum over b of (dot(v, matrix[b]) >= 0) << b, folded in one
    # pass; `row` and `acc` are lambda variables (never re-evaluated).
    zipped = F.zip_with(
        matrix,
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda row, b: F.struct(row.alias("signs"), b.alias("b")),
    )
    out = F.aggregate(
        zipped,
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            F.aggregate(
                F.zip_with(v, e["signs"], lambda x, s: x * s),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            >= 0,
            F.pow(F.lit(2.0), e["b"].cast("double")).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return out.cast("int")


def ivf_assign(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: Sequence[Sequence[float]],
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (IVF lists).

    Centroids arrive as driver-side literals (they are tiny — K vectors)
    so assignment is a map-only pass: an array of K fused dot products
    per row, argmax via ``array_position``/``array_max``. At scale,
    write the table ``partitionBy("centroid_id")`` and a probe becomes a
    partition-pruned scan of n_probe/K of the data.
    """
    v = _as_double(F.col(vec_col))
    scores = F.array(*[cosine_score(F.col(vec_col), c) for c in centroids])
    cid = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    return emb_df.withColumn("centroid_id", cid)


def ivf_sample_centroids(
    emb_df: DataFrame, id_col: str, vec_col: str, k: int
) -> list:
    """Deterministic centroid sample: the K vectors with the smallest
    ``xxhash64(id)`` — a seeded uniform sample with no stored model.
    (A k-means refinement loop can start from these; for IVF recall on
    clustered data, hash-sampling already lands centroids in every
    populated region with high probability.)"""
    rows = (
        emb_df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("i")), F.col("i"))
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r["v"]] for r in rows]


def ivf_refine_centroids(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: Sequence[Sequence[float]],
    iters: int = 1,
) -> list:
    """Distributed Lloyd refinement: assign every vector to its nearest
    centroid, recompute centroids as per-list means, repeat.

    Each iteration is one assignment projection (map-only) + one
    groupBy (centroid, position) shuffle whose output is K×dim rows —
    driver traffic is the centroid matrix, never the data. Empty lists
    keep their previous centroid."""
    cents = [list(map(float, c)) for c in centroids]
    dim = len(cents[0])
    for _ in range(iters):
        assigned = ivf_assign(emb_df, id_col, vec_col, cents)
        means = (
            assigned.select(
                "centroid_id",
                F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x"),
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]
        for r in means:
            new[r["centroid_id"]][r["pos"]] = float(r["m"])
        cents = new
    return cents


def ivf_topk(
    spark,
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: Sequence[Sequence[float]] = None,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: search only the ``n_probe`` inverted lists
    whose centroids are closest to the query, exact-rerank survivors.

    Probing is driver-side math over K tiny centroids; the cluster-side
    work is one partition-prunable filter + :func:`cosine_topk` over
    ~n_probe/K of the vectors."""
    q = [float(x) for x in query]
    if centroids is None:
        centroids = ivf_sample_centroids(emb_df, id_col, vec_col, n_centroids)
    if refine_iters:
        centroids = ivf_refine_centroids(
            emb_df, id_col, vec_col, centroids, iters=refine_iters
        )

    def _cos(a, b):
        dot = math.fsum(x * y for x, y in zip(a, b))
        na = math.sqrt(math.fsum(x * x for x in a))
        nb = math.sqrt(math.fsum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    ranked = sorted(range(len(centroids)), key=lambda c: (-_cos(q, centroids[c]), c))
    probes = ranked[: n_probe]
    assigned = ivf_assign(emb_df, id_col, vec_col, centroids)
    cand = assigned.filter(F.col("centroid_id").isin(probes))
    return cosine_topk(cand, id_col, vec_col, q, k=k)


def lsh_bucket_topk(
    spark,
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    dim: int,
    k: int = 10,
    bits: int = 8,
    probe_hamming: int = 0,
) -> DataFrame:
    """ANN top-k: score only vectors in the query's SRP bucket —
    multiprobing buckets within ``probe_hamming`` bit flips of it
    (standard multiprobe LSH: near neighbors that straddle a projection
    hyperplane land one bit away, so probing adjacent buckets buys
    recall at sum(C(bits, i), i<=h)/2^bits of the scan cost).

    At scale, write the table partitioned by ``bucket`` and this becomes
    partition pruning — the scan touches the probed fraction of the
    data. The query-side bucket set is computed driver-side in pure
    Python (zero Spark jobs) with the same xxh64-derived signs and the
    same IEEE fold order as the index side."""
    q = [float(x) for x in query]
    qbucket = srp_bucket_py(q, srp_signs(dim, bits))
    probes = [qbucket]
    if probe_hamming > 0:
        probes = [
            b
            for b in range(1 << bits)
            if bin(b ^ qbucket).count("1") <= probe_hamming
        ]
    bucketed = emb_df.withColumn("bucket", srp_bucket(F.col(vec_col), dim, bits))
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, id_col, vec_col, q, k=k)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    bits: int = 8,
    out_col: str = "q",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector scalar quantization: ``q[i] =
    round(v[i] / scale)`` with ``scale = max|v| / (2^(bits-1) - 1)`` —
    int8 by default, the standard 4x storage/bandwidth reduction before
    ANN indexing at corpus scale (reconstruction error is bounded by
    scale/2 per component; cosine rankings survive for real embedding
    distributions — both bounds pytest-checked).

    Map-only column expressions (no shuffle, no UDF): at 100 TB this
    is one pass that shrinks every downstream scan/shuffle that touches
    the vectors. All-zero vectors quantize to zeros with scale 0
    (guarded — naive division would produce Inf/NaN). Dequantize with
    :func:`dequantize_embeddings`; oracle-checkable in SQL (the
    deferred ``embedding_quantization`` driver query)."""
    if bits not in (8, 16):
        raise ValueError(f"bits={bits!r} must be 8 or 16 (int8/int16 targets)")
    qmax = float((1 << (bits - 1)) - 1)
    itype = "tinyint" if bits == 8 else "smallint"
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(v, F.abs))
    # materialize scale as a column first so the per-row array_max is
    # evaluated once, not re-derived inside every code expression
    out = df.withColumn(scale_col, max_abs / F.lit(qmax))
    sc = F.col(scale_col)
    q = F.when(
        sc > 0.0,
        F.transform(v, lambda x: F.round(x / sc).cast(itype)),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast(itype)))
    return out.withColumn(out_col, q)


def dequantize_embeddings(
    df: DataFrame,
    q_col: str = "q",
    scale_col: str = "scale",
    out_col: str = "vec_approx",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``v[i] ~= q[i] * scale``
    (float array out — feed straight back into the cosine operators)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col), lambda x: (x.cast("double") * F.col(scale_col))
        ),
    )


# -- product quantization (IVF-PQ's code side) --------------------------
#
# PQ is a dense linear-algebra workload (distances of every subvector
# to every codebook centroid): the right Spark lane is the Arrow-batched
# numpy path (the operators/dedup.py embedding gemm precedent), NOT
# column expressions — an m x k grid of higher-order folds is
# CodegenFallback AND costs Catalyst seconds of analysis on a
# 256-aggregate expression tree (measured ~10 s of plan time per query
# at m=16, k=16 before this lane was vectorized).


def _pq_books_np(codebooks: list):
    import numpy as np

    return np.asarray(codebooks, dtype=np.float64)  # (m, k, sub)


def pq_train_codebooks(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    refine_iters: int = 1,
) -> list:
    """Product-quantization codebooks (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the vector into
    ``m`` contiguous subspaces and learn ``k`` centroids per subspace —
    the memory side of the billion-vector IVF-PQ stack (codes are
    ``m`` small ints per vector: far below even int8 scalar codes,
    `quantize_embeddings`' lane).

    Training is batched across subspaces and Arrow-vectorized: one
    deterministic seed collect (the k smallest ``xxhash64(id)``
    vectors, sliced driver-side into all m books), then per Lloyd
    iteration ONE ``mapInPandas`` pass emitting per-batch partial sums
    (m*k*sub rows per batch) + ONE tiny groupBy — driver traffic is
    the codebook tensor, never the data. Deterministic: partial sums
    are floating-point but the groupBy sums them with Spark's fixed
    combine order per (j, c, pos) key over a deterministic partition
    layout; centroid ulps do not affect recall floors.

    Returns ``codebooks[j][c] = centroid (dim/m floats)``."""
    first = emb_df.select(F.size(_as_double(F.col(vec_col))).alias("d")).first()
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub = dim // m
    seeds = (
        emb_df.select(
            F.col(id_col).alias("i"), _as_double(F.col(vec_col)).alias("v")
        )
        .orderBy(F.xxhash64(F.col("i")), F.col("i"))
        .limit(k)
        .collect()
    )
    books = [
        [[float(x) for x in r["v"][j * sub : (j + 1) * sub]] for r in seeds]
        for j in range(m)
    ]
    if not refine_iters:
        return books
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    part_schema = StructType(
        [
            StructField("j", IntegerType(), False),
            StructField("c", IntegerType(), False),
            StructField("pos", IntegerType(), False),
            StructField("s", DoubleType(), False),
            StructField("n", LongType(), False),
        ]
    )
    src = emb_df.select(_as_double(F.col(vec_col)).alias("__v"))
    for _ in range(refine_iters):
        B = _pq_books_np(books)  # (m, k, sub)

        def partials(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                V = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
                ).reshape(len(pdf), len(books), -1)  # (b, m, sub)
                # (b, m, k): squared dists via the gemm identity
                d2 = (
                    (V ** 2).sum(-1)[:, :, None]
                    - 2.0 * np.einsum("bms,mks->bmk", V, B)
                    + (B ** 2).sum(-1)[None]
                )
                codes = d2.argmin(-1)  # (b, m)
                rows = {"j": [], "c": [], "pos": [], "s": [], "n": []}
                for j in range(B.shape[0]):
                    for c in range(B.shape[1]):
                        mask = codes[:, j] == c
                        cnt = int(mask.sum())
                        if not cnt:
                            continue
                        ssum = V[mask, j, :].sum(0)  # (sub,)
                        for pos in range(B.shape[2]):
                            rows["j"].append(j)
                            rows["c"].append(c)
                            rows["pos"].append(pos)
                            rows["s"].append(float(ssum[pos]))
                            rows["n"].append(cnt)
                yield pd.DataFrame(rows)

        agg = (
            src.mapInPandas(partials, part_schema)
            .groupBy("j", "c", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new = [[list(c) for c in book] for book in books]
        for r in agg:
            if r["n"]:
                new[r["j"]][r["c"]][r["pos"]] = float(r["s"] / r["n"])
        books = new
    return books


def pq_encode(
    emb_df: DataFrame, id_col: str, vec_col: str, codebooks: list
) -> DataFrame:
    """(id, codes array<int>) — each subvector replaced by the index of
    its nearest codebook centroid (L2, the PQ standard). One
    Arrow-batched map pass (gemm distances + argmin), no shuffle."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    B = _pq_books_np(codebooks)
    id_field = emb_df.schema[id_col]
    out_schema = StructType(
        [id_field, StructField("codes", ArrayType(IntegerType()), False)]
    )
    src = emb_df.select(id_col, _as_double(F.col(vec_col)).alias("__v"))

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            V = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
            ).reshape(len(pdf), B.shape[0], -1)
            d2 = (
                (V ** 2).sum(-1)[:, :, None]
                - 2.0 * np.einsum("bms,mks->bmk", V, B)
                + (B ** 2).sum(-1)[None]
            )
            codes = d2.argmin(-1).astype("int32")
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes)}
            )

    return src.mapInPandas(run, out_schema)


def pq_topk(
    spark,
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    codebooks: list,
    k: int = 10,
    rerank: int = 0,
) -> DataFrame:
    """PQ asymmetric-distance top-k: score every vector from its CODES
    only — ``score = sum_j table[j][code_j]`` where the (m, k) lookup
    table holds the query-subvector / centroid inner products,
    computed driver-side (m*k tiny dot products, zero Spark jobs).
    Cluster-side the scan reads m ints per vector instead of dim
    floats — the bandwidth win PQ exists for — and ADC scoring is one
    JVM-side fold over the m codes (a SMALL higher-order expression,
    unlike the encode grid). For COSINE semantics the corpus must be
    :func:`l2_normalize`-d first (ADC ranks by inner product; IP ==
    cosine only on the unit sphere — measured recall 0.7 -> 0.1
    without it on varied-norm fixtures). ``rerank`` > 0 exact-reranks
    that many ADC survivors by true cosine (the standard two-stage
    IVF-PQ refinement; returns the top ``k`` of them).

    Approximate by construction (codebook quantization error), like
    the SRP/IVF lanes: callers assert recall floors vs the exact
    top-k."""
    q = [float(x) for x in query]
    m = len(codebooks)
    kk = len(codebooks[0])
    sub = len(codebooks[0][0])
    table = [
        [math.fsum(q[j * sub + t] * c[t] for t in range(sub)) for c in book]
        for j, book in enumerate(codebooks)
    ]
    flat = F.array(*[F.lit(float(x)) for row in table for x in row])
    jarr = F.array(*[F.lit(j) for j in range(m)])
    coded = pq_encode(emb_df, id_col, vec_col, codebooks).join(
        emb_df.select(id_col, vec_col), id_col
    )
    contribs = F.zip_with(
        F.col("codes"),
        jarr,
        lambda c, j: F.element_at(flat, (j * kk + c + 1).cast("int")),
    )
    scored = coded.withColumn(
        "adc_score",
        F.aggregate(contribs, F.lit(0.0), lambda acc, x: acc + x),
    )
    if rerank > 0:
        cand = scored.orderBy(F.desc("adc_score"), F.col(id_col)).limit(
            int(rerank)
        )
        return cosine_topk(cand, id_col, vec_col, q, k=k)
    return (
        scored.orderBy(F.desc("adc_score"), F.col(id_col))
        .limit(int(k))
        .select(id_col, F.round(F.col("adc_score"), 6).alias("adc_score"))
    )

def l2_normalize(vec: Column) -> Column:
    """Unit-norm copy of an ``array<float/double>`` column (zero
    vectors pass through unchanged). For COSINE semantics, PQ must
    train/encode on normalized vectors: ADC ranks by inner product,
    and IP == cosine only on the unit sphere — unnormalized corpora
    make high-norm distractors dominate the ADC ranking (measured:
    recall 0.7 -> 0.1 on the sf0.1 fixture without this)."""
    v = _as_double(vec)
    n = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.when(
        n > 0, F.transform(v, lambda x: x / n)
    ).otherwise(v)


def ivf_pq_topk(
    spark,
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    codebooks: list,
    coarse_centroids: Sequence[Sequence[float]],
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 100,
) -> DataFrame:
    """The full IVF-PQ stack (Jegou et al. 2011): coarse quantizer
    prunes to the ``n_probe`` nearest inverted lists (partition
    pruning at scale — :func:`ivf_assign`'s note), PQ codes rank the
    survivors by ADC, exact cosine reranks the top ``rerank``. The
    composition every billion-vector ANN service runs: list pruning
    cuts the SCAN, codes cut the BYTES per scanned row, rerank
    restores exact order where it matters."""
    q = [float(x) for x in query]

    def _cos(a, b):
        dot = math.fsum(x * y for x, y in zip(a, b))
        na = math.sqrt(math.fsum(x * x for x in a))
        nb = math.sqrt(math.fsum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    ranked = sorted(
        range(len(coarse_centroids)),
        key=lambda c: (-_cos(q, coarse_centroids[c]), c),
    )
    probes = ranked[:n_probe]
    assigned = ivf_assign(emb_df, id_col, vec_col, coarse_centroids)
    cand = assigned.filter(F.col("centroid_id").isin(probes)).drop(
        "centroid_id"
    )
    return pq_topk(
        spark, cand, id_col, vec_col, q, codebooks, k=k, rerank=rerank
    )


def mutual_nearest_pairs(
    left_df,
    right_df,
    id_col: str,
    vec_col: str,
    threshold: float = 0.0,
    sim_digits: int = 6,
    block_size: int = 4096,
):
    """Bitext-mining pair candidates (the LASER/CCMatrix construction):
    ``(left_id, right_id, score)`` for every MUTUAL nearest-neighbor
    pair across two embedding tables — left's best right AND that
    right's best left — above ``threshold`` cosine. Mutual-NN is the
    standard noise gate for mining aligned pairs (translations,
    image-caption matches, duplicate entities) across corpora: a
    one-directional best match is often a hub vector; mutuality kills
    hubs.

    Plan (no cartesian, bounded memory — the block-bundle construction
    of ``operators/dedup.py::embedding_near_duplicates``, cross-table):
    both sides hash into ~``block_size``-row bundles; every (left
    bundle, right bundle) tile is one equi-joined row scored by a
    single numpy gemm, and each tile emits only its LOCAL argmax rows
    (one per left vector and one per right vector in the tile — never
    the tile's full score matrix). Global argmaxes are two small
    max-struct aggregates over tiles; ties break toward the lower
    candidate id at the rounded score, matching the SQL twin. Exact
    over all pairs — flop-bound at extreme scale like every exact
    lane; route through IVF/PQ candidates first when |L| x |R| gemm is
    infeasible and feed the survivors back through this gate.
    """
    from pyspark.sql import functions as F

    import numpy as np
    import pandas as pd

    ldt = left_df.schema[id_col].dataType.simpleString()
    rdt = right_df.schema[id_col].dataType.simpleString()
    # the tile scorer moves ids through a LONG Arrow column; a string
    # id would crash deep inside a task (or worse, coerce) — fail loud
    # at plan time instead
    for side, dt in (("left", ldt), ("right", rdt)):
        if dt not in ("int", "bigint", "smallint", "tinyint"):
            raise ValueError(
                f"mutual_nearest_pairs: {side} id column {id_col!r} must be"
                f" integral (got {dt}) — map string ids to a surrogate key"
                " upstream"
            )

    def prep(df):
        v = _as_double(F.col(vec_col))
        nrm = F.sqrt(_dot(v, v))
        # a zero-norm vector makes its whole tile's cosines 0/0 = NaN,
        # which poisons the argmax and surfaces as an opaque empty-
        # reduction error deep inside the task — raise loudly instead
        # (the l2_normalize pass-through convention doesn't apply: a
        # zero vector has no nearest neighbor by cosine at all)
        checked = F.when(nrm > 0, nrm).otherwise(
            F.raise_error(
                F.lit(
                    "mutual_nearest_pairs: zero-norm vector - cosine is"
                    " undefined (filter zero/missing embeddings upstream)"
                )
            ).cast("double")
        )
        return df.select(
            F.col(id_col).alias("__id"),
            v.alias("v"),
            checked.alias("nrm"),
        )

    l, r = prep(left_df), prep(right_df)
    nl, nr = l.count(), r.count()
    if nl == 0 or nr == 0:
        raise ValueError("mutual_nearest_pairs: empty side")
    bl = max(1, -(-nl // block_size))
    br = max(1, -(-nr // block_size))

    def bundles(df, nblocks):
        return (
            df.withColumn("p", F.pmod(F.xxhash64(F.col("__id")), F.lit(nblocks)).cast("int"))
            .groupBy("p")
            .agg(
                F.collect_list(
                    F.struct(F.col("__id").alias("id"), "v", "nrm")
                ).alias("bundle")
            )
        )

    lb = (
        bundles(l, bl)
        .withColumnRenamed("bundle", "bundle_l")
        .withColumn("q", F.explode(F.sequence(F.lit(0), F.lit(br - 1))))
    )
    rb = bundles(r, br).select(F.col("p").alias("q"), F.col("bundle").alias("bundle_r"))
    tiles = lb.join(rb, "q")
    thr_digits = int(sim_digits)

    def _score(batches):
        for pdf in batches:
            outs = []
            for ba, bb in zip(pdf["bundle_l"], pdf["bundle_r"]):
                ids_l = np.asarray([e["id"] for e in ba])
                ids_r = np.asarray([e["id"] for e in bb])
                mat_l = np.asarray([e["v"] for e in ba], dtype=np.float64)
                mat_r = np.asarray([e["v"] for e in bb], dtype=np.float64)
                nrm_l = np.asarray([e["nrm"] for e in ba], dtype=np.float64)
                nrm_r = np.asarray([e["nrm"] for e in bb], dtype=np.float64)
                cos = np.round(mat_l @ mat_r.T / np.outer(nrm_l, nrm_r), thr_digits)
                # local argmax per left row / per right row; ties at the
                # rounded score resolve to the LOWER candidate id (the
                # SQL twin's ORDER BY score DESC, id ASC)
                rows = []
                for i in range(cos.shape[0]):
                    m = cos[i].max()
                    cand = ids_r[cos[i] == m]
                    rows.append(("l", int(ids_l[i]), int(cand.min()), float(m)))
                for j in range(cos.shape[1]):
                    m = cos[:, j].max()
                    cand = ids_l[cos[:, j] == m]
                    rows.append(("r", int(ids_r[j]), int(cand.min()), float(m)))
                outs.append(
                    pd.DataFrame(rows, columns=["side", "a", "b", "score"])
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    local = tiles.mapInPandas(_score, "side string, a long, b long, score double")
    # global argmax over tiles: max (score, -candidate) struct per key
    def global_best(side, key_name, cand_name):
        return (
            local.filter(F.col("side") == side)
            .groupBy("a")
            .agg(F.max(F.struct(F.col("score"), (-F.col("b")).alias("nb"))).alias("m"))
            .select(
                F.col("a").alias(key_name),
                (-F.col("m.nb")).alias(cand_name),
                F.col("m.score").alias(f"{side}_score"),
            )
        )

    best_l = global_best("l", "left_id", "right_id")
    best_r = global_best("r", "right_id", "left_id")
    return (
        best_l.join(best_r, ["left_id", "right_id"])
        .filter(F.col("l_score") >= threshold)
        .select(
            F.col("left_id").cast(ldt),
            F.col("right_id").cast(rdt),
            F.col("l_score").alias("score"),
        )
    )


def hard_negative_topk(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: "Sequence",
    k: int = 5,
    lo: float = 0.15,
    hi: float = 0.35,
    round_digits: int = 6,
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training —
    ``(query_id, id_col, cos_sim, rank)``: for each query document,
    the top-``k`` corpus documents whose cosine lies in the
    HARD-NEGATIVE BAND ``[lo, hi)`` — similar enough that a model
    must work to separate them, below the near-duplicate ceiling so
    no true positive is mislabeled negative (the DPR/contrastive
    -training recipe: random negatives are too easy, near-dups are
    false negatives; the band in between is where training signal
    lives). A document is never its own negative.

    Plan: the query rows (a handful of ids) broadcast against one
    corpus scan — O(|queries| · n) fused JVM dot products, no
    shuffle until the per-query top-k window (|queries| independent
    partitions). Cosine folds left-to-right (the list_dot_product
    parity order) and rounds to ``round_digits``; rank ties break by
    id — fully value-oracled, unlike the LSH/IVF lanes."""
    if k < 1:
        raise ValueError(f"k={k!r} must be >= 1")
    if not lo < hi:
        raise ValueError(f"band [{lo!r}, {hi!r}) is empty")
    qids = list(query_ids)
    if not qids:
        raise ValueError("query_ids must be non-empty")
    from pyspark.sql import Window

    v = _as_double(F.col(vec_col))
    raw_nrm = F.sqrt(_dot(v, v))
    # zero-norm guard (the mutual_nearest_pairs contract): a zero
    # vector would otherwise yield NULL cosines that the band filter
    # silently drops — two engines' div-by-zero semantics agreeing is
    # not a correctness argument
    nrm = F.when(raw_nrm > 0, raw_nrm).otherwise(
        F.raise_error(
            F.lit(
                "hard_negative_topk: zero-norm embedding - cosine is"
                " undefined (filter zero vectors upstream)"
            )
        ).cast("double")
    )
    base = emb_df.select(
        F.col(id_col).alias("__id"), v.alias("__v"),
        nrm.alias("__nrm"),
    )
    # limit(|qids|) bounds the broadcast EXPLICITLY in the plan (ids
    # are unique, so it changes nothing; the plan audit rightly
    # refuses fact-derived broadcasts without a bounding node)
    q = (
        base.filter(F.col("__id").isin(qids))
        .select(
            F.col("__id").alias("query_id"),
            F.col("__v").alias("__qv"),
            F.col("__nrm").alias("__qnrm"),
        )
        .limit(len(qids))
    )
    cos = F.round(
        _dot(F.col("__v"), F.col("__qv")) / (F.col("__nrm") * F.col("__qnrm")),
        round_digits,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("__id").asc()
    )
    return (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("__id") != F.col("query_id"))
        .withColumn("cos_sim", cos)
        .filter((F.col("cos_sim") >= lo) & (F.col("cos_sim") < hi))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("__id").alias(id_col), "cos_sim", "rank")
    )


def hard_negative_sql(
    src: str,
    id_col: str,
    vec_col: str,
    query_ids: "Sequence",
    k: int = 5,
    lo: float = 0.15,
    hi: float = 0.35,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`hard_negative_topk` — same cosine fold
    (list_dot_product), same band, same rank tie-break."""
    if k < 1:
        raise ValueError(f"k={k!r} must be >= 1")
    if not lo < hi:
        raise ValueError(f"band [{lo!r}, {hi!r}) is empty")
    qids = list(query_ids)
    if not qids:
        raise ValueError("query_ids must be non-empty")
    def lit(x):
        if isinstance(x, str):
            return "'" + x.replace("'", "''") + "'"
        return repr(x)

    idlist = ", ".join(lit(x) for x in qids)
    return rf"""
WITH hne AS MATERIALIZED (
  SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v,
    CASE WHEN sqrt(list_dot_product(CAST({vec_col} AS DOUBLE[]),
                                    CAST({vec_col} AS DOUBLE[]))) > 0
      THEN sqrt(list_dot_product(CAST({vec_col} AS DOUBLE[]),
                                 CAST({vec_col} AS DOUBLE[])))
      ELSE CAST(error('hard_negative oracle: zero-norm embedding -'
                || ' cosine is undefined') AS DOUBLE) END AS nrm
  FROM {src}
), hnq AS (
  SELECT id AS query_id, v AS qv, nrm AS qnrm FROM hne
  WHERE id IN ({idlist})
), hns AS (
  SELECT q.query_id, e.id,
    round(list_dot_product(e.v, q.qv) / (e.nrm * q.qnrm),
          {int(round_digits)}) AS cos_sim
  FROM hne e, hnq q WHERE e.id != q.query_id
)
SELECT query_id, id AS {id_col}, cos_sim,
       CAST(rank AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, id ASC
  ) AS rank
  FROM hns WHERE cos_sim >= {float(lo)!r} AND cos_sim < {float(hi)!r}
) WHERE rank <= {int(k)}
"""
