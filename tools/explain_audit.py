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


# Tables whose size is bounded by the schema (TPC-H dims): safe to force-
# broadcast. Everything else (facts, documents, embeddings, engine scans)
# grows with the data — a static broadcast hint on those is a driver OOM
# at 100x scale even if AQE would have picked broadcast at test scale.
DIM_TABLES = {"region", "nation", "supplier", "customer", "part"}
FACT_MARKERS = ("lineitem", "orders", "events", "documents", "embeddings")
# Analyzed-plan Relation nodes for path-loaded parquet print only the
# COLUMN list (no path, no table name) — name markers alone made this
# check vacuous for every load_table query. Identify fact relations by
# a signature column each fact table uniquely carries.
FACT_COLUMN_MARKERS = {
    "lineitem": "l_orderkey#",
    "orders": "o_orderkey#",
    "events": "event_type#",
    "documents": "doc_id#",
    "embeddings": "vec_id#",
}
# Nodes that bound the broadcast side's cardinality regardless of the
# relation under them: a global/grouped aggregate collapses the fact
# side to its group count (legitimate 1-row / O(strata) stat
# broadcasts), a limit caps rows outright. Grouped aggregates over
# high-cardinality keys slip through this approximation — the check
# catches the raw broadcast(fact-scan) class it previously missed.
BOUNDING_NODES = ("Aggregate [", "GlobalLimit", "LocalLimit")


def broadcast_hint_violations(df) -> list:
    """Parse the analyzed logical plan tree and return every broadcast
    hint whose subtree reads a non-dim-bounded source WITHOUT a
    cardinality-bounding node (aggregate / limit) in between.

    Tree-string parsing: a node's children are the following lines whose
    branch marker (':-' / '+-') sits deeper; the subtree ends at the
    first line at or above the hint's depth."""
    text = df._jdf.queryExecution().analyzed().toString()
    lines = text.splitlines()

    def depth(line: str) -> int:
        for marker in (":- ", "+- "):
            i = line.find(marker)
            if i >= 0:
                return i
        return -1  # root

    def ancestors_within(subtree, k):
        """Lines on the path from the subtree root down to line k: the
        nearest preceding line at each strictly-smaller depth — the
        node's ancestor chain in the indented tree text."""
        chain = []
        d = depth(subtree[k])
        for j in range(k - 1, -1, -1):
            dj = depth(subtree[j])
            if 0 <= dj < d:
                chain.append(subtree[j])
                d = dj
        return chain

    out = []
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line or "BROADCAST" not in line.upper():
            continue
        d = depth(line)
        subtree = []
        for nxt in lines[i + 1:]:
            nd = depth(nxt)
            if nd >= 0 and nd <= d:
                break
            subtree.append(nxt)
        sub = "\n".join(subtree)
        # a bounding node only neutralizes the fact relations BELOW it:
        # check each fact Relation's ancestor PATH back to the hint,
        # not the whole subtree — a sibling-branch aggregate must not
        # whitewash a raw fact broadcast on another branch
        bad = set(m for m in FACT_MARKERS if m in sub)
        for k, ln in enumerate(subtree):
            if "Relation" not in ln:
                continue
            hits = {
                name
                for name, col in FACT_COLUMN_MARKERS.items()
                if col in ln
            }
            if not hits:
                continue
            path = ancestors_within(subtree, k)
            if not any(b in p for p in path for b in BOUNDING_NODES):
                bad |= hits
        if bad:
            out.append(
                "broadcast hint over unbounded fact-derived side "
                f"({', '.join(sorted(bad))})"
            )
    return out


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
    # deterministic shuffle: the global rank must come from the
    # bucket-partitioned window — a SinglePartition exchange anywhere
    # means the two-phase rank collapsed into the canonical
    # one-task-window scale trap the operator exists to avoid
    check(
        "corpus_shuffle",
        needles=["Window", "hashpartitioning(__bucket"],
        forbid=["SinglePartition", "CartesianProduct"],
    )
    # exact embedding near-dup: block-matrix bundle equi-join, never a
    # row-pair cartesian / nested-loop
    check(
        "near_dup_embedding",
        needles=["HashAggregate"],  # the collect_list bundle build
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # Global sweep (plan-only, no execution): every query must be free of
    # row-pair cartesians, and every static broadcast hint must cover
    # only dim-bounded tables. Streaming queries execute on construction
    # and engine_* queries build scratch tables — both too heavy for a
    # plan-only sweep loop; their shapes are covered above / in pytest.
    # incremental_corpus_update commits engine transactions on
    # construction (the engine_* class); its returned scan is the
    # audited engine scan shape and its anti-join is pytest-covered.
    # export_manifest writes the full corpus to scratch on construction
    # (the sink class — only its post-write re-read would be audited);
    # its shard plan is pytest-covered. corpus_shuffle runs an O(corpus)
    # histogram job on construction — same class as the similarity
    # queries' .first() collects, cheap enough to keep in the sweep.
    skip_sweep = {
        "streaming_hourly_windows",
        "incremental_corpus_update",
        "export_manifest",
    }
    for name, fn in queries.items():
        if name in skip_sweep or name.startswith("engine_"):
            continue
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # pragma: no cover - sweep robustness
            failures.append(f"{name}: query construction failed: {e}")
            continue
        for v in broadcast_hint_violations(df):
            failures.append(f"{name}: {v}")
        init_plan = df._jdf.queryExecution().sparkPlan().toString()
        if "CartesianProduct" in init_plan:
            failures.append(f"{name}: CartesianProduct in initial physical plan")
    print("swept all non-engine queries for cartesians + fact broadcasts")

    if failures:
        print("\nPLAN AUDIT FAILURES:")
        for f in failures:
            print("  -", f)
        sys.exit(1)
    print("\nall plan audits passed")


if __name__ == "__main__":
    main()
