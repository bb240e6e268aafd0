"""Plan-shape audit: assert the physical plans of headline queries keep
the properties that matter at 100 TB — filters pushed to the parquet
scan, column-pruned reads, broadcast joins for filtered dims, partial
(map-side) aggregation before the shuffle.

A query can pass a value-correctness oracle with a catastrophic plan;
this guard catches plan regressions the way the DuckDB oracle catches
value regressions.

Usage: python tools/explain_audit.py [sf_dir]   (exit 1 on violation)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from delta_lake_experiment_spark.workloads import all_queries

    queries = all_queries()
    failures: list[str] = []

    def check(name: str, needles: list[str], forbid: list[str] = ()):  # noqa: B006
        df = queries[name](spark, sf_dir)
        # run once so AQE finalizes the plan, then inspect
        df.write.mode("overwrite").format("noop").save()
        plan = plan_of(df)
        for n in needles:
            if n not in plan:
                failures.append(f"{name}: expected {n!r} in plan")
        for n in forbid:
            if n in plan:
                failures.append(f"{name}: forbidden {n!r} in plan")
        print(f"audited {name}")

    # q1: pushed filter + partial agg before exchange, no join at all
    check(
        "q1_pricing_summary",
        needles=["PushedFilters: [IsNotNull(l_shipdate)", "partial_sum", "HashAggregate"],
        forbid=["CartesianProduct"],
    )
    # q3: filtered dims broadcast; no sort-merge needed at this scale
    check(
        "q3_shipping_priority",
        needles=["BroadcastHashJoin", "PushedFilters"],
        forbid=["CartesianProduct"],
    )
    # q5: the 6-way join chain stays broadcast end-to-end
    check("q5_local_supplier_volume", needles=["BroadcastHashJoin"], forbid=["CartesianProduct"])
    # selective scan: filter reaches parquet, projection prunes columns
    check(
        "projection_filter",
        needles=[
            "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)]",
            "ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>",
        ],
        forbid=["CartesianProduct"],
    )
    # semi/anti joins execute as joins, not subquery re-scans
    check("customers_with_orders", needles=["LeftSemi"])
    check("customers_without_big_orders", needles=["LeftAnti"])
    # top-k executes as TakeOrdered (no global sort of all rows)
    check("top_orders_by_price", needles=["TakeOrderedAndProject"])
    # scalar-subquery shape: per-part averages broadcast back
    check("small_quantity_revenue", needles=["BroadcastHashJoin", "partial_sum"])
    # as-of join: union + running window, NEVER a time-inequality join
    # (which would plan as a nested-loop pair blow-up)
    check(
        "purchase_last_click",
        needles=["Window", "Union"],
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    # latest-per-key: single window rank, no self-join
    check(
        "latest_event_per_user",
        needles=["Window"],
        forbid=["CartesianProduct", "SortMergeJoin"],
    )
    # salted aggregation: two hash-aggregate phases, no plain skew shape
    check("skew_salted_event_stats", needles=["HashAggregate"], forbid=["CartesianProduct"])

    if failures:
        print("\nPLAN AUDIT FAILURES:")
        for f in failures:
            print("  -", f)
        sys.exit(1)
    print("\nall plan audits passed")


if __name__ == "__main__":
    main()
