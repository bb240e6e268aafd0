"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full engine round trip at sf0.001 (ingest
lineitem into an ACID engine table, COW-delete a range, aggregate the
scan). ``queries()``/``oracle_sql()`` — the full workload from
``delta_lake_experiment_spark.workloads`` (relational + engine parity +
LLM-pipeline extensions), each oracle-checked against DuckDB at sf0.01.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from delta_lake_experiment_spark.client import DeltaLakeClient
    from delta_lake_experiment_spark.functions.numeric import exact_avg, exact_sum

    sf_dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    c = DeltaLakeClient(spark, tempfile.mkdtemp(prefix="dles_entry_"))
    c.new_tx()
    c.create_table("lineitem", src.schema)
    c.write_dataframe("lineitem", src)
    c.commit_tx()

    c.new_tx()
    c.delete_rows("lineitem", "l_quantity", 45, 50)  # COW delete
    c.commit_tx()

    c.new_tx()
    scanned = c.scan("lineitem", with_stamps=False)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        scanned.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            exact_sum(disc_price).alias("sum_disc_price"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from delta_lake_experiment_spark.workloads import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; approximate operators
    (MinHash LSH, SRP-bucket ANN) are deliberately omitted -> rows-only."""
    from delta_lake_experiment_spark.workloads import all_oracles

    return all_oracles()
