"""Deterministic corpus shuffle: a reproducible pseudo-random total
order over the corpus, with a SCALABLE global position rank.

Training wants each epoch to visit documents in a different
pseudo-random order, reproducibly: run K of a 100 TB build must
produce byte-identical shard files. The shuffle key is
``md5(salt || key)`` — changing ``salt`` ("epoch0", "epoch1", ...)
re-permutes the corpus; re-running with the same salt reproduces it
exactly, on any cluster size or partitioning (the same
engine-portable-hash contract as operators/sampling.py).

The interesting part is the global position. ``row_number()`` over an
unpartitioned window collapses the whole corpus into ONE task — the
canonical Spark scale trap. This operator computes the exact global
rank with the classic two-phase distributed sort-rank instead:

1. bucket every row by its shuffle key's first ``bucket_hex_digits``
   hex digits (md5 is uniform, so buckets are balanced within
   sampling noise — no skew, no salting needed),
2. count rows per bucket (one partial-agg shuffle producing
   O(buckets) rows), prefix-sum the counts driver-side (O(buckets)
   metadata, same class as the repo's other documented metadata
   collects), and broadcast the offsets back,
3. rank WITHIN each bucket (windows partitioned by bucket — maximum
   partition size corpus/buckets) and add the bucket's offset.

Total cost: one O(buckets) aggregate + one bucket-partitioned window —
both shuffle on the bucket key; no single-task stage anywhere. With
the default 2 hex digits (256 buckets) a 100 TB corpus ranks in
~400 GB windows; pass 3-4 digits (4k-64k buckets) to bound window
partitions at any scale.

The reference has no ordering/shuffle surface (SURVEY.md §2.2); this
is part of the LLM-pipeline extension lane.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shuffle_key(key: Column, salt: str = "") -> Column:
    """The engine-portable shuffle key: ``md5(salt || key)`` (hex
    string). ``key`` must be a string column; NULL keys raise at
    execution time (a NULL would hash to NULL and silently sort into
    one end of every epoch — the sampling-module NULL contract)."""
    guarded = F.when(key.isNotNull(), key).otherwise(
        F.raise_error(
            F.lit("shuffle_key: key is NULL - shuffle keys must be non-NULL"
                  " (filter or coalesce upstream)")
        )
    )
    return F.md5(F.concat(F.lit(salt), guarded))


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "",
    bucket_hex_digits: int = 2,
) -> DataFrame:
    """Add ``shuffle_pos`` (long, 0-based, a permutation of
    ``0..n-1``) giving each row's position in the salt-keyed
    pseudo-random total order. Ties on the md5 key (2^-128 events, but
    determinism must not hinge on "unlikely") break by ``key_col``.

    Rows pass through otherwise unchanged; sort or repartitionByRange
    on ``shuffle_pos`` downstream to materialize the order.

    The keyed input is evaluated twice — once for the bucket
    histogram, once for the ranked output — so it is persisted here
    and BOTH passes read the same materialization: offsets can never
    disagree with the ranked rows, even over a source that changes
    between the two jobs (the incremental.py single-evaluation
    contract). The cached blocks stay pinned until the caller's
    consumption finishes; release them via ``unpersist``/
    ``clearCache`` downstream (the minhash-signature lifecycle
    convention — the consumer owns it).
    """
    if not 1 <= bucket_hex_digits <= 8:
        raise ValueError(
            f"bucket_hex_digits={bucket_hex_digits!r} must be in [1, 8]"
        )
    skey = shuffle_key(F.col(key_col).cast("string"), salt)
    bucket = F.conv(F.substring(skey, 1, bucket_hex_digits), 16, 10).cast("long")
    with_key = df.withColumn("__skey", skey).withColumn("__bucket", bucket).persist()

    # Phase 1+2: O(buckets) histogram -> driver prefix sum. The
    # collect moves ≤ 16^bucket_hex_digits rows of metadata, never
    # data (the similarity.py centroid-collect class).
    hist = (
        with_key.groupBy("__bucket").count().orderBy("__bucket").collect()
    )
    offsets = {}
    acc = 0
    for row in hist:
        offsets[row["__bucket"]] = acc
        acc += row["count"]
    spark = df.sparkSession
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(b, o) for b, o in offsets.items()], "__bucket long, __offset long"
        )
    )

    # Phase 3: rank within bucket + offset. The window partitions by
    # bucket, so no task ever sees more than corpus/buckets rows.
    w = Window.partitionBy("__bucket").orderBy("__skey", key_col)
    return (
        with_key.join(offsets_df, "__bucket")
        .withColumn(
            "shuffle_pos",
            (F.row_number().over(w) - 1 + F.col("__offset")).cast("long"),
        )
        .drop("__skey", "__bucket", "__offset")
    )


def shuffle_pos_sql(src: str, key_sql: str, salt: str = "") -> str:
    """DuckDB twin: the same total order as
    :func:`deterministic_shuffle` via a plain global window (the
    single-node engine can afford it) — ``SELECT *, shuffle_pos FROM
    src``. Derived from the same key construction so a salt change
    cannot diverge the engines."""
    salt_lit = "'" + salt.replace("'", "''") + "'"
    return (
        f"SELECT *, CAST(ROW_NUMBER() OVER ("
        f"ORDER BY md5({salt_lit} || CAST({key_sql} AS VARCHAR)), {key_sql}"
        f") - 1 AS BIGINT) AS shuffle_pos FROM {src}"
    )
