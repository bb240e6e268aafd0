"""Engine micro-benchmarks for BASELINE.md (M6): ingest throughput,
scan+latest-dedup, COW range delete, and the reference's de-facto perf
canary (500-op randomized tx loop, main_test.go:263-344).

Usage: python tools/micro_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("engine-microbench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000_000).selectExpr("sum(id)").collect()

    from delta_lake_experiment_spark.client import DeltaLakeClient

    out: dict[str, float] = {}

    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_rows = src.count()

    # 1. bulk ingest
    c = DeltaLakeClient(spark, tempfile.mkdtemp(prefix="mb_"))
    c.new_tx()
    c.create_table("lineitem", src.schema)
    t0 = time.time()
    c.write_dataframe("lineitem", src)
    c.commit_tx()
    ingest_s = time.time() - t0
    out["ingest_rows_per_s"] = round(n_rows / ingest_s)
    out["ingest_s"] = round(ingest_s, 2)

    # 2. full scan + latest-version dedup
    c.new_tx()
    t0 = time.time()
    c.scan_latest("lineitem", ["l_orderkey", "l_linenumber"]).write.mode(
        "overwrite"
    ).format("noop").save()
    out["scan_latest_s"] = round(time.time() - t0, 2)
    c.commit_tx()

    # 3. COW range delete
    c.new_tx()
    t0 = time.time()
    c.delete_rows("lineitem", "l_quantity", 25, 30)
    c.commit_tx()
    out["cow_delete_s"] = round(time.time() - t0, 2)

    # 3b. deletion-vector delete (soft delete, no rewrite)
    c.new_tx()
    t0 = time.time()
    c.delete_rows("lineitem", "l_quantity", 40, 43, use_dv=True)
    c.commit_tx()
    out["dv_delete_s"] = round(time.time() - t0, 2)

    # 3c. MERGE upsert (10% updates + 5% inserts) on a keyed orders table
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cm = DeltaLakeClient(spark, tempfile.mkdtemp(prefix="mbm_"))
    cm.new_tx()
    cm.create_table("orders", orders.schema, primary_keys=["o_orderkey"])
    cm.write_dataframe("orders", orders)
    cm.commit_tx()
    from pyspark.sql import functions as F

    src = orders.filter(F.col("o_orderkey") % 10 == 0).unionByName(
        orders.filter(F.col("o_orderkey") % 20 == 0).withColumn(
            "o_orderkey", F.col("o_orderkey") + 100_000_000
        )
    )
    cm.new_tx()
    t0 = time.time()
    cm.merge("orders", src)
    cm.commit_tx()
    out["merge_s"] = round(time.time() - t0, 2)

    # 4. randomized 500-op loop (reference canary: 500 ops, 20 keys,
    # one tx per op — write/delete/read against a dict model)
    c2 = DeltaLakeClient(spark, tempfile.mkdtemp(prefix="mbr_"), dataobject_size=10)
    c2.new_tx()
    c2.create_table("kv", "k BIGINT, v BIGINT")
    c2.commit_tx()
    rng = random.Random(42)
    t0 = time.time()
    n_ops = 500
    for _ in range(n_ops):
        c2.new_tx()
        op = rng.random()
        k = rng.randrange(20)
        if op < 0.5:
            c2.write_row("kv", [k, rng.randrange(1_000_000)])
        elif op < 0.75:
            c2.delete_rows("kv", "k", k, k)
        else:
            sum(1 for _ in c2.scan_iter("kv"))
        c2.commit_tx()
    loop_s = time.time() - t0
    out["randomized_ops_per_s"] = round(n_ops / loop_s, 1)
    out["randomized_loop_s"] = round(loop_s, 2)

    out["n_rows"] = n_rows
    out["sf_dir"] = sf_dir
    print(json.dumps(out))


if __name__ == "__main__":
    main()
