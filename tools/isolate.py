"""Isolated per-query measurement + plan capture (guide §1): times each
named query end-to-end with the noop sink in a FRESH session configured
exactly like bench.py, and optionally writes `.explain("formatted")` to
plans/<tag>/<query>_<suffix>.txt.

Usage:
    python tools/isolate.py [--sf SF_DIR] [--runs N] [--plans TAG:SUFFIX] q1 q2 ...

Timing methodology matches bench.py (release_caches between runs, noop
sink, best-of-N reported alongside all runs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--plans",
        default=None,
        help="TAG:SUFFIX -> write plans/TAG/<query>_SUFFIX.txt",
    )
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        help="extra spark conf k=v (repeatable)",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("isolate")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
    )
    for kv in args.conf:
        k, v = kv.split("=", 1)
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    from delta_lake_experiment_spark.functions.cache import release_caches
    from delta_lake_experiment_spark.workloads import all_queries

    queries = all_queries()
    plan_dir = suffix = None
    if args.plans:
        tag, suffix = args.plans.split(":", 1)
        plan_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            tag,
        )
        os.makedirs(plan_dir, exist_ok=True)

    out = {}
    for name in args.queries:
        fn = queries[name]
        per = []
        for i in range(args.runs):
            release_caches(spark)
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            per.append(round(time.time() - t0, 3))
            if i == 0 and plan_dir:
                with open(
                    os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w"
                ) as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    ))
        out[name] = {"best": min(per), "runs": per}
        print(f"# {name}: best {min(per):.2f}s runs={per}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
