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
