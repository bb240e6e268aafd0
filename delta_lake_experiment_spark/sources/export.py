"""Training-shard export sink: the terminal stage of the curation
pipeline — write the corpus as deterministic, shard-addressed files a
training data loader consumes.

Data loaders want: a FIXED number of shards (one per worker), stable
shard membership across corpus rebuilds (so resumable jobs and cache
layers keep working), a deterministic within-shard row order (so run K
reproduces run K-1 byte-for-byte), and a manifest with per-shard row /
token counts (so the loader can plan epochs without listing files).

Layout produced under ``path``::

    shard=<k>/part-*.parquet   one Parquet file per shard
    (manifest returned as a DataFrame — persist it where the training
    job expects it)

Determinism chain: shard membership is `hash_shard` (salted md5 — a
document never migrates shards when the corpus grows); within-shard
order is the caller's ``order_cols`` (pass a total order — e.g. the
deterministic_shuffle position, or the id column); the one-file-per-
shard guarantee comes from repartitioning ON THE SHARD COLUMN before
a partitionBy write, so each shard's rows sit in exactly one task and
each ``shard=k`` directory receives exactly one file.

Scale: one shuffle (the repartition on shard) + the write. n_shards
bounds per-task data at corpus/n_shards — size it like any partition
count (hundreds to thousands at 100 TB, matching loader workers).
Shard skew is hash-uniform noise, not data skew.

The reference's sink surface is single-directory JSON objects
(dataobjects.go); sharded export is LLM-pipeline extension surface
(SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_experiment_spark.operators.sampling import hash_shard


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
    ``path`` (directories ``shard=0..n_shards-1``, one file each) and
    return the manifest: ``(shard, n_rows[, n_tokens])`` — computed
    from the WRITTEN files, so the manifest certifies the export
    rather than restating the plan.

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
    sharded = hash_shard(df, key_col, n_shards, salt=salt)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", *order)
        .write.partitionBy("shard")
        .parquet(path)
    )
    spark = df.sparkSession
    written = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    return written.groupBy(F.col("shard").cast("int").alias("shard")).agg(*aggs)
