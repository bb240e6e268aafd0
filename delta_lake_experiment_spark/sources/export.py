"""Training-shard export sink: the terminal stage of the curation
pipeline — write the corpus as deterministic, shard-addressed files a
training data loader consumes.

Data loaders want: a FIXED number of shards (one per worker), stable
shard membership across corpus rebuilds (so resumable jobs and cache
layers keep working), a deterministic within-shard row order (so run K
reproduces run K-1 byte-for-byte), and a manifest with per-shard row /
token counts (so the loader can plan epochs without listing files).

Layout produced under ``path``::

    shard=<k>/part-*.parquet   one Parquet file per non-empty shard
    (manifest returned as a DataFrame — persist it where the training
    job expects it)

Determinism chain: shard membership is `hash_shard` (salted md5 — a
document never migrates shards when the corpus grows); within-shard
order is the caller's ``order_cols`` (pass a total order — e.g. the
deterministic_shuffle position, or the id column); one-file-per-shard
AND one-shard-per-task come from an exact identity repartition (see
below), so each task sorts and writes exactly its own shard.

Identity partitioning: ``repartition(n, col)`` places a shard at
``pmod(murmur3(col), n)`` — with n distinct shard values in n bins,
collisions are near-certain (birthday), so some tasks would carry 2-3
shards while others idle. Instead, a one-off O(n_shards) local job
finds, for each shard k, a representative integer whose murmur3 hash
lands in bin k; repartitioning on that mapped column places EVERY
shard alone in its own task — per-task data is exactly
corpus/n_shards (hash-uniform), the scale bound a loader-matched
shard count is sized against.

Scale: one shuffle (the identity repartition) + the write. Size
n_shards like any partition count (hundreds to thousands at 100 TB,
matching loader workers).

Empty shards (corpus smaller than n_shards, or hash luck at tiny
scale) get NO ``shard=k`` directory — Spark writes no file for an
empty partition — but DO get a zero-count manifest row: loaders must
treat a manifest row with ``n_rows = 0`` as "no directory".

The reference's sink surface is single-directory JSON objects
(dataobjects.go); sharded export is LLM-pipeline extension surface
(SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _identity_partition_reps(spark: SparkSession, n_shards: int) -> list[int]:
    """For each bin k in [0, n_shards): an integer v with
    ``pmod(hash(v), n_shards) == k`` — so repartitioning on the mapped
    representative sends shard k exactly to task k. One local-only
    Spark job over 32*n_shards candidate ints (each bin missed with
    probability e^-32 per candidate batch — practically never; raises
    if it ever happens rather than silently degrading balance)."""
    cand = spark.range(32 * n_shards).select(
        F.col("id").cast("int").alias("v"),
        F.pmod(F.hash(F.col("id").cast("int")), F.lit(n_shards)).alias("bin"),
    )
    first = {
        r["bin"]: r["v"]
        for r in cand.groupBy("bin").agg(F.min("v").alias("v")).collect()
    }
    missing = [k for k in range(n_shards) if k not in first]
    if missing:
        raise RuntimeError(
            f"no identity-partition representative found for bins {missing} "
            f"in 32*{n_shards} candidates - widen the candidate range"
        )
    return [first[k] for k in range(n_shards)]


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    order_cols: Sequence[str],
    salt: str = "",
    token_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as ``n_shards`` deterministic Parquet shards under
    ``path`` (directories ``shard=0..n_shards-1``, one file per
    non-empty shard, exactly one shard per write task) and return the
    manifest: ``(shard, n_rows[, n_tokens])`` for ALL n_shards shard
    ids (zero-filled for empty shards) — counts computed from the
    WRITTEN files, so the manifest certifies the export rather than
    restating the plan.

    ``order_cols`` must be a total order within each shard (pass the
    unique id last); ties would make file row order depend on task
    scheduling, breaking byte-reproducibility. ``token_col`` adds the
    per-shard token sum the loader plans epochs with.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards={n_shards!r} must be >= 1")
    order = list(order_cols)
    if not order:
        raise ValueError("order_cols must name at least one column")
    from delta_lake_experiment_spark.operators.sampling import hash_shard

    spark = df.sparkSession
    reps = _identity_partition_reps(spark, n_shards)
    sharded = hash_shard(df, key_col, n_shards, salt=salt).withColumn(
        "__rep", F.element_at(F.array(*[F.lit(v) for v in reps]), F.col("shard") + 1)
    )
    (
        sharded.repartition(n_shards, F.col("__rep"))
        .sortWithinPartitions("shard", *order)
        .drop("__rep")
        .write.partitionBy("shard")
        .parquet(path)
    )
    written = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    counts = written.groupBy(F.col("shard").cast("int").alias("shard")).agg(*aggs)
    all_shards = spark.range(n_shards).select(F.col("id").cast("int").alias("shard"))
    zero_fill = [F.coalesce(F.col("n_rows"), F.lit(0)).cast("long").alias("n_rows")]
    if token_col is not None:
        zero_fill.append(
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens")
        )
    return all_shards.join(counts, "shard", "left").select("shard", *zero_fill)
