"""Deduplication operators: exact and near-duplicate.

Scale design notes (these run over *documents*, the 100 TB case):

- **Exact dedup** is one hash-shuffle on the dedup key. We rank with
  ``row_number`` over the key (keep lowest id) rather than
  ``dropDuplicates`` so the survivor choice is deterministic —
  ``dropDuplicates`` keeps an arbitrary partition-dependent row, which
  can never be oracle-verified or reproduced across runs.
- **MinHash+LSH near-dedup** is the standard shingle → minhash signature
  → banded LSH → candidate-pair join pipeline. Everything is JVM column
  expressions (``xxhash64``, higher-order array functions): no Python in
  the hot path. The only shuffles are the signature groupBy and the
  band-bucket self-join; bucket sizes are bounded by band width, so the
  join never degenerates into a full cross product.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, key_cols: Sequence[str], order_col: str) -> DataFrame:
    """Keep exactly one row per ``key_cols`` group — the one with the
    smallest ``order_col`` (deterministic survivor)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # sliding word n-grams via transform over token positions
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    src = df.select(F.col(id_col).alias("__id"), F.col(text_col))
    # Small single-file inputs arrive as one partition; spread the
    # CPU-heavy shingle generation across the cluster. (Big inputs
    # already have many partitions — repartition to parallelism is a
    # cheap no-op-ish rebalance relative to the explode that follows.)
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < parallelism:
        src = src.repartition(parallelism)
    return (
        src.select("__id", F.explode(grams).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingle_df: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """(id, sig: array<long>) — per-document MinHash signature.

    Hash family: ``xxhash64(seed, shingle)`` — seeding via an extra hash
    input gives ``num_hashes`` independent 64-bit functions, all computed
    in one projection, then one groupBy(id) with ``min`` partial-aggs
    (map-side combine keeps the shuffle tiny: num_hashes longs per doc).
    """
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"__h{i}")
        for i in range(num_hashes)
    ]
    sig = shingle_df.groupBy("__id").agg(*mins)
    return sig.select(
        "__id", F.array(*[f"__h{i}" for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame, num_bands: int = 4
) -> DataFrame:
    """Banded LSH: docs sharing any band-hash become candidate pairs
    (id_a < id_b). One explode + one self-join on (band, band_hash)."""
    n = sig_df.select(F.size("sig")).first()[0]
    rows_per_band = n // num_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]).alias("bh"),
            )
            for b in range(num_bands)
        ]
    )
    exploded = sig_df.select("__id", F.explode(bands).alias("b")).select(
        "__id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs with estimated Jaccard >= threshold.

    Returns (id_a, id_b, est_jaccard). est_jaccard = fraction of
    matching signature components — the standard MinHash estimator.
    """
    sh = shingles(df, id_col, text_col, n=shingle_n)
    # The signature table feeds four plan branches (both sides of the
    # band self-join and both sides of the estimator join). Persist it:
    # without this, Spark recomputes the full shingle+minhash pipeline
    # per branch — 4-5x the work at any scale. At cluster scale the same
    # role is played by writing signatures to a parquet stage.
    sigs = minhash_signatures(sh, num_hashes=num_hashes).persist()
    cands = lsh_candidate_pairs(sigs, num_bands=num_bands)
    a = sigs.select(F.col("__id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("__id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
        .cast("double")
        / F.lit(float(num_hashes))
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash_signature(
    df: DataFrame, id_col: str, text_col: str, bits: int = 60
) -> DataFrame:
    """(id, simhash) — ``bits``-bit SimHash over distinct lowercase
    whitespace tokens.

    Token hash = first 15 hex chars of md5 (60 bits, engine-portable:
    md5 is identical everywhere, so the signature is oracle-checkable
    bit-for-bit in DuckDB). Bit j of the signature is the majority vote
    of token-hash bit j (strict majority; ties -> 0).

    Scale: zero shuffles — the whole signature is a per-row projection
    of higher-order array functions inside whole-stage codegen. At
    100 TB this is a map-only pass.
    """
    assert bits <= 60, "token hash is 60 bits"
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    harr = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    n = F.size(harr)
    sim = F.lit(0).cast("long")
    for j in range(bits):
        cnt = F.size(
            F.filter(harr, lambda h: F.shiftright(h, j).bitwiseAND(F.lit(1)) == F.lit(1))
        )
        sim = sim + F.when(cnt * 2 > n, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col).alias("__id"), sim.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 60,
    num_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """EXACT near-duplicate pairs (id_a, id_b, hamming) with SimHash
    hamming distance <= ``max_hamming``.

    Banding is a pure optimization here, not an approximation: with
    ``max_hamming < num_bands``, pigeonhole guarantees every qualifying
    pair shares at least one identical band, so the band-bucket
    self-join finds all of them — results are oracle-checkable against
    a brute-force SQL cross join. One explode (num_bands rows/doc) +
    one equi-join on (band, band_value); bucket sizes are bounded by
    band width so the join never degenerates quadratically.
    """
    assert max_hamming < num_bands, "exactness needs max_hamming < num_bands"
    width = bits // num_bands
    mask = (1 << width) - 1
    sig = simhash_signature(df, id_col, text_col, bits=bits)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias("bv"),
            )
            for b in range(num_bands)
        ]
    )
    exploded = sig.select("__id", "simhash", F.explode(bands).alias("b")).select(
        "__id", "simhash", F.col("b.band").alias("band"), F.col("b.bv").alias("bv")
    )
    l, r = exploded.alias("l"), exploded.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.col("l.simhash").alias("sim_a"),
            F.col("r.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        pairs.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_duplicates(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    round_digits: int = 9,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a, id_b, cos_sim
    rounded to ``round_digits``) with cos >= threshold.

    All-pairs exact baseline: norms are computed once per vector in a
    pre-projection, then an inequality self-join scores each pair with
    one fused JVM dot product. Quadratic by nature — this is the
    verification baseline; at 100 TB route candidate generation through
    :func:`delta_lake_experiment_spark.operators.similarity.srp_bucket`
    blocking (approximate) and rerank survivors with this scorer.
    """
    from delta_lake_experiment_spark.operators.similarity import _as_double, _dot

    v = _as_double(F.col(vec_col))
    base = emb_df.select(
        F.col(id_col).alias("__id"), v.alias("v"), F.sqrt(_dot(v, v)).alias("nrm")
    )
    a, b = base.alias("a"), base.alias("b")
    cos = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
        round_digits,
    )
    return (
        a.join(b, F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.

    Shuffle-efficient exact variant for moderate corpora: inverted-index
    self-join on shingle (skew-prone hot shingles should be stopworded
    upstream at extreme scale), then |∩| / (|A|+|B|-|∩|).
    """
    sh = shingles(df, id_col, text_col, n=shingle_n).persist()
    sizes = sh.groupBy("__id").agg(F.count("*").alias("n_sh"))
    l = sh.select(F.col("__id").alias("id_a"), "shingle")
    r = sh.select(F.col("__id").alias("id_b"), "shingle")
    inter = (
        l.join(r, ["shingle"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
