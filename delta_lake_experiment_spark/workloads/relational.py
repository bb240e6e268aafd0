"""Relational query workload over the synthetic TPC-H-ish tables.

Covers the operator categories from SURVEY.md §2.2 that the reference
*lacks* but a complete engine needs: projection, rich predicates, joins
(broadcast/shuffle/semi/anti), aggregation (hash, rollup), windows,
sorts/top-k, set ops, scalar functions, and the §2.3 derived semantics
(latest-version-wins) over the events stream table.

Scale notes are inline per query. All float aggregates go through
``exact_sum``/``exact_avg`` (see functions/numeric.py) so results are
reduction-order-independent — reproducible on 1 core or 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_experiment_spark.functions.numeric import exact_avg, exact_sum
from delta_lake_experiment_spark.operators.versioned import latest_version_wins
from delta_lake_experiment_spark.sources.tables import load_table


def _utc(spark: SparkSession) -> None:
    # Pin the session zone so timestamp collection is engine-independent.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# ----------------------------------------------------------------------
# q1 — pricing summary (TPC-H Q1 shape): scan + filter + hash aggregate.
# Partial aggregation (map-side combine) means the shuffle carries only
# |groups| rows per partition; safe at any scale.
# ----------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.expr("l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            exact_sum(disc_price).alias("sum_disc_price"),
            exact_sum(charge).alias("sum_charge"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            exact_avg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ----------------------------------------------------------------------
# q3 — shipping priority: selective filters on both join sides, 3-way
# join, aggregate, deterministic top-10. Catalyst pushes both filters to
# the parquet scans; AQE picks broadcast for the filtered-customer side.
# ----------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate < TIMESTAMP '1998-03-15 00:00:00'")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate > TIMESTAMP '1998-03-15 00:00:00'")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ----------------------------------------------------------------------
# q5 — local supplier volume: 6-table join. region/nation are broadcast
# explicitly (tiny dims — a 100 TB fact table must not shuffle for them).
# ----------------------------------------------------------------------


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(nation, sup.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(exact_sum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# ----------------------------------------------------------------------
# range scan + projection — reference P1/S2 parity (inclusive BETWEEN,
# writes.go:58-88). `.explain` must show PushedFilters + a 4-column
# ReadSchema: predicate and projection reach the parquet scan.
# ----------------------------------------------------------------------


def range_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(10, 15))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


RANGE_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity BETWEEN 10 AND 15
"""


def projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_totalprice")
    )


PROJECTION_SQL = "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'"


def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


# top-k: executes as TakeOrderedAndProject (per-partition heap + driver
# merge of k rows) — no global sort, no shuffle of the full table.
def top_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
"""


def union_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", F.lit("high").alias("bucket")
    )
    lo = orders.filter(F.col("o_totalprice") < 10000).select(
        "o_orderkey", F.lit("low").alias("bucket")
    )
    return hi.unionByName(lo)


UNION_SQL = """
SELECT o_orderkey, 'high' AS bucket FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT o_orderkey, 'low' AS bucket FROM orders WHERE o_totalprice < 10000
"""


# semi/anti joins: Spark plans these as broadcast/shuffled hash joins
# carrying only the key column — never materializing the right side.
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join against a filtered build side (every customer has *some*
    order in this data, so the filter keeps the anti join non-trivial)."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


# ----------------------------------------------------------------------
# §2.3 derived semantics on the events stream table: latest-version-wins
# (the reference's "current state of keyed table" idiom) + count check.
# ----------------------------------------------------------------------


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    latest = latest_version_wins(ev, ["user_id"], order_cols=["ts", "event_id"])
    return latest.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
    )


LATEST_EVENT_SQL = """
SELECT user_id, event_id AS last_event_id, ts AS last_ts, event_type AS last_type
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        exact_sum(F.col("value")).alias("total_value"),
        exact_avg(F.col("value")).alias("avg_value"),
    )


EVENT_STATS_SQL = """
SELECT event_type, COUNT(*) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS avg_value
FROM events GROUP BY event_type
"""


# tumbling-window aggregation — the batch expression of the streaming
# windowed-count pipeline (streaming/ has the readStream twin).
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


def rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(F.col("o_totalprice")).alias("total_price"),
    )


ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.upper("o_orderstatus").alias("status_u"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")).alias(
            "status_prio"
        ),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.length("o_orderpriority").alias("prio_len"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    )


SCALAR_SQL = """
SELECT o_orderkey,
  CAST(year(o_orderdate) AS INT) AS order_year,
  CAST(month(o_orderdate) AS INT) AS order_month,
  upper(o_orderstatus) AS status_u,
  substring(o_orderpriority, 1, 1) AS prio_code,
  o_orderstatus || '-' || o_orderpriority AS status_prio,
  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
  CAST(length(o_orderpriority) AS INT) AS prio_len,
  o_orderkey % 7 AS key_mod7
FROM orders
"""


# ----------------------------------------------------------------------
# q17 shape — correlated scalar subquery: lineitems below 50% of their
# part's average quantity. Expressed as aggregate + self-join (what
# Catalyst's decorrelation produces anyway). The per-part averages side
# has one row per l_partkey — it grows WITH the fact table, so it must
# NOT be hint-broadcast (driver OOM at scale); AQE picks broadcast vs
# shuffle by measured size at runtime, which is the correct policy.
# ----------------------------------------------------------------------


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    part_avg = l.groupBy("l_partkey").agg(
        (exact_avg(F.col("l_quantity")) * 0.5).alias("half_avg_qty")
    )
    return (
        l.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .groupBy("l_partkey")
        .agg(
            exact_sum(F.col("l_extendedprice")).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


SMALL_QTY_SQL = """
SELECT l_partkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS small_qty_revenue,
  COUNT(*) AS n_small
FROM lineitem l
WHERE l_quantity < (
  SELECT 0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity))
  FROM lineitem WHERE l_partkey = l.l_partkey)
GROUP BY l_partkey
"""


# ----------------------------------------------------------------------
# set ops — INTERSECT / EXCEPT (the two the union query doesn't cover).
# Both execute as aggregate + shuffle on the full row key.
# ----------------------------------------------------------------------


def segment_nation_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    buildings = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    machines = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    inter = buildings.intersect(machines).withColumn("op", F.lit("intersect"))
    exc = buildings.exceptAll(machines).distinct().withColumn("op", F.lit("except"))
    return inter.unionByName(exc)


SET_OPS_SQL = """
SELECT c_nationkey, 'intersect' AS op FROM (
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
UNION ALL
SELECT DISTINCT c_nationkey, 'except' AS op FROM (
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT ALL
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
"""


# ----------------------------------------------------------------------
# running totals — window frame (ROWS UNBOUNDED PRECEDING): cumulative
# revenue per customer over order dates. One shuffle on the partition
# key; frame evaluation is streaming within each partition.
# ----------------------------------------------------------------------


def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(28,6)")).over(w).cast("double"), 6).alias(
            "running_revenue"
        ),
    )


RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
    ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS running_revenue
FROM orders WHERE o_custkey <= 100
"""


# ----------------------------------------------------------------------
# statistical aggregates — exact interpolated percentiles per group.
# percentile() is a sort-based aggregate: one shuffle on the group key,
# per-group sort of a numeric column. (approx_percentile trades the
# sort for a t-digest sketch at scale; exact keeps the oracle exact.)
# ----------------------------------------------------------------------


def segment_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("p95"),
        F.round(F.min("o_totalprice"), 6).alias("lo"),
        F.round(F.max("o_totalprice"), 6).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )


PERCENTILES_SQL = """
SELECT c_mktsegment,
  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
  round(quantile_cont(o_totalprice, 0.95), 6) AS p95,
  round(MIN(o_totalprice), 6) AS lo,
  round(MAX(o_totalprice), 6) AS hi,
  COUNT(*) AS n
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


# ----------------------------------------------------------------------
# PIVOT — event counts per (user bucket) x event_type matrix. Spark's
# pivot with an EXPLICIT value list stays a single hash aggregate (no
# extra pass to discover pivot values, bounded output width — the only
# scale-safe way to pivot); the oracle is conditional aggregation.
# ----------------------------------------------------------------------


def pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    out = (
        ev.withColumn("user_bucket", (F.col("user_id") % 10).cast("long"))
        .groupBy("user_bucket")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )
    return out.select("user_bucket", *[F.col(t).alias(f"n_{t}") for t in types])


PIVOT_SQL = """
SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
  CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
  CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error
FROM events GROUP BY 1
"""


# ----------------------------------------------------------------------
# LEAD/LAG — inter-order gap per customer: one window sort per
# customer partition, no self-join (the naive formulation). Covers the
# offset-window-function category.
# ----------------------------------------------------------------------


def order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.when(
            prev.isNotNull(),
            (F.unix_timestamp("o_orderdate") - F.unix_timestamp(prev)) / 86400.0,
        ).alias("days_since_prev"),
    )


ORDER_GAPS_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(date_diff('second',
    LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
    o_orderdate) AS DOUBLE) / 86400.0 AS days_since_prev
FROM orders
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "pivot_event_matrix": pivot_event_matrix,
    "order_gaps": order_gaps,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "range_filter_scan": range_filter_scan,
    "projection_filter": projection_filter,
    "distinct_segments": distinct_segments,
    "top_orders_by_price": top_orders_by_price,
    "union_price_buckets": union_price_buckets,
    "customers_with_orders": customers_with_orders,
    "customers_without_big_orders": customers_without_big_orders,
    "latest_event_per_user": latest_event_per_user,
    "event_type_stats": event_type_stats,
    "hourly_event_windows": hourly_event_windows,
    "rollup_order_counts": rollup_order_counts,
    "scalar_functions_showcase": scalar_functions_showcase,
    "small_quantity_revenue": small_quantity_revenue,
    "segment_nation_overlap": segment_nation_overlap,
    "customer_running_total": customer_running_total,
    "segment_price_percentiles": segment_price_percentiles,
}

ORACLES = {
    "segment_price_percentiles": PERCENTILES_SQL,
    "pivot_event_matrix": PIVOT_SQL,
    "order_gaps": ORDER_GAPS_SQL,
    "small_quantity_revenue": SMALL_QTY_SQL,
    "segment_nation_overlap": SET_OPS_SQL,
    "customer_running_total": RUNNING_TOTAL_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "range_filter_scan": RANGE_SQL,
    "projection_filter": PROJECTION_SQL,
    "distinct_segments": DISTINCT_SQL,
    "top_orders_by_price": TOPK_SQL,
    "union_price_buckets": UNION_SQL,
    "customers_with_orders": SEMI_SQL,
    "customers_without_big_orders": ANTI_SQL,
    "latest_event_per_user": LATEST_EVENT_SQL,
    "event_type_stats": EVENT_STATS_SQL,
    "hourly_event_windows": HOURLY_SQL,
    "rollup_order_counts": ROLLUP_SQL,
    "scalar_functions_showcase": SCALAR_SQL,
}
