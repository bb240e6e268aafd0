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
    return _offset_rank(
        with_key, ["__bucket"], ["__skey", key_col], "shuffle_pos"
    ).drop("__skey", "__bucket")


def _offset_rank(
    with_key: DataFrame, bucket_cols: list, order_cols: list, out_col: str
) -> DataFrame:
    """Phases 1-3 of the two-phase global rank, shared by the shuffle
    and curriculum lanes: O(buckets) histogram -> driver prefix sum in
    ``bucket_cols`` order -> broadcast offsets -> bucket-partitioned
    window + offset. ``with_key`` must already be persisted (both the
    histogram and the ranked output read it; two evaluations of a
    changing source would disagree). The collect moves <=
    |bucket space| rows of metadata, never data."""
    hist = (
        with_key.groupBy(*bucket_cols).count().orderBy(*bucket_cols).collect()
    )
    rows = []
    acc = 0
    for row in hist:
        rows.append(tuple(row[c] for c in bucket_cols) + (acc,))
        acc += row["count"]
    spark = with_key.sparkSession
    schema = ", ".join(f"{c} long" for c in bucket_cols) + ", __offset long"
    offsets_df = F.broadcast(spark.createDataFrame(rows, schema))
    w = Window.partitionBy(*bucket_cols).orderBy(*order_cols)
    return (
        with_key.join(offsets_df, bucket_cols)
        .withColumn(
            out_col,
            (F.row_number().over(w) - 1 + F.col("__offset")).cast("long"),
        )
        .drop("__offset")
    )


def stage_by_thresholds(score: Column, edges_desc: "list[float]") -> Column:
    """Curriculum stage id from a score: stage = index of the FIRST
    threshold the score meets in ``edges_desc`` (strictly descending),
    ``len(edges_desc)`` if none — e.g. edges [0.6, 0.3] puts
    score >= 0.6 in stage 0 (seen first), >= 0.3 in stage 1, the rest
    in stage 2. A static CASE — map-only, engine-portable. NULL scores
    raise (a NULL would fall through every comparison and silently
    train last)."""
    if list(edges_desc) != sorted(set(edges_desc), reverse=True):
        raise ValueError(
            f"edges_desc={edges_desc!r} must be strictly descending"
        )
    guarded = F.when(score.isNotNull(), score).otherwise(
        F.raise_error(
            F.lit("stage_by_thresholds: score is NULL - stage scores must"
                  " be non-NULL (filter or coalesce upstream)")
        )
    )
    expr = F.lit(len(edges_desc))
    for i, edge in reversed(list(enumerate(edges_desc))):
        expr = F.when(guarded >= F.lit(float(edge)), F.lit(i)).otherwise(expr)
    return expr.cast("long")


def stage_sql(score_sql: str, edges_desc: "list[float]") -> str:
    """DuckDB twin of :func:`stage_by_thresholds` — generated from the
    same edges so the staging can never drift, with the SAME NULL-score
    raise (the operator errors where a bare CASE would silently map a
    NULL score to the last stage — a twin accepting what the operator
    rejects is a divergence; the NULL check is the first WHEN so it
    wins)."""
    if list(edges_desc) != sorted(set(edges_desc), reverse=True):
        raise ValueError(
            f"edges_desc={edges_desc!r} must be strictly descending"
        )
    null_guard = (
        f"WHEN ({score_sql}) IS NULL THEN CAST(error('stage_sql: score"
        f" is NULL - stage scores must be non-NULL (filter or coalesce"
        f" upstream)') AS BIGINT)"
    )
    whens = " ".join(
        f"WHEN ({score_sql}) >= {float(e)!r} THEN {i}"
        for i, e in enumerate(edges_desc)
    )
    return (
        f"CAST(CASE {null_guard} {whens} ELSE {len(edges_desc)} END AS BIGINT)"
    )


def curriculum_order(
    df: DataFrame,
    key_col: str,
    stage_col: str,
    salt: str = "",
    bucket_hex_digits: int = 2,
) -> DataFrame:
    """Add ``curriculum_pos`` (long, 0-based, a permutation of
    ``0..n-1``): the global training order that visits stages in
    ascending ``stage_col`` order and shuffles deterministically
    WITHIN each stage — curriculum learning's data order (easy stages
    first, pseudo-random inside a stage, reproducible across runs /
    cluster sizes; change ``salt`` per epoch to re-permute within
    stages while preserving the stage progression).

    Same scalable construction as :func:`deterministic_shuffle` with a
    composite bucket (stage, hash bucket): no single-partition window
    anywhere; the histogram is O(stages x buckets) metadata.
    ``stage_col`` must be an integral column (build one with
    :func:`stage_by_thresholds`)."""
    if not 1 <= bucket_hex_digits <= 8:
        raise ValueError(
            f"bucket_hex_digits={bucket_hex_digits!r} must be in [1, 8]"
        )
    skey = shuffle_key(F.col(key_col).cast("string"), salt)
    bucket = F.conv(F.substring(skey, 1, bucket_hex_digits), 16, 10).cast("long")
    with_key = (
        df.withColumn("__stage", F.col(stage_col).cast("long"))
        .withColumn("__skey", skey)
        .withColumn("__bucket", bucket)
        .persist()
    )
    return _offset_rank(
        with_key,
        ["__stage", "__bucket"],
        ["__skey", key_col],
        "curriculum_pos",
    ).drop("__skey", "__bucket", "__stage")


def curriculum_pos_sql(
    src: str, key_sql: str, stage_sql_expr: str, salt: str = ""
) -> str:
    """DuckDB twin of :func:`curriculum_order` via a plain global
    window ordered (stage, md5 key, key) — the hash match proves the
    distributed composite-bucket rank equals the global rank."""
    salt_lit = "'" + salt.replace("'", "''") + "'"
    return (
        f"SELECT *, CAST(ROW_NUMBER() OVER ("
        f"ORDER BY ({stage_sql_expr}), md5({salt_lit} || CAST({key_sql} AS VARCHAR)), {key_sql}"
        f") - 1 AS BIGINT) AS curriculum_pos FROM {src}"
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
