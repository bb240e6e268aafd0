"""Readers for the benchmark/test parquet tables.

Single-file parquet reads through Spark's vectorized reader; explicit
helper so every query loads tables the same way and Catalyst sees plain
file scans it can push filters/projections into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # events.ts has drifted across driver regenerations: parquet
        # TIMESTAMP(NANOS) (rejected by the vectorized reader — read as
        # raw long via the legacy conf, then exact ns→µs integer
        # division, matching DuckDB's truncation), and currently
        # timestamp[us] with isAdjustedToUTC=false, which Spark reads
        # as TIMESTAMP_NTZ. Normalize every variant to session-UTC
        # TIMESTAMP here so downstream operators (unix_micros,
        # withWatermark) always see one type. Under the UTC session tz
        # the NTZ cast is a pure re-tag: identical micros, identical
        # wall clock, identical to what DuckDB computes.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
