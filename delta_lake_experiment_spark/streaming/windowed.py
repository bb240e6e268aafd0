"""Structured Streaming: watermarked tumbling-window aggregation.

The streaming twin of ``workloads.relational.hourly_event_windows`` —
the same logical plan over ``readStream``, with a watermark bounding
state for late data. With ``Trigger.AvailableNow`` the stream drains
existing files and stops, so batch and stream results are comparable
(tested in tests/test_streaming.py).

Scale notes: windowed aggregation state is per (window, event_type);
the watermark evicts windows older than the threshold, so state size is
bounded regardless of stream length. File-source listing scales with
directory size — at production scale feed from a streaming-friendly
source (Kafka) or this engine's log (each commit's `add` actions are an
exactly-once file feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_experiment_spark.functions.numeric import exact_sum
from delta_lake_experiment_spark.functions.timeutil import ensure_timestamp

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    schema: T.StructType = EVENTS_STREAM_SCHEMA,
) -> DataFrame:
    """Streaming DataFrame of per-window, per-type counts and sums.

    ``schema`` lets callers read sources whose physical timestamp type
    drifted (e.g. NTZ parquet); event time is normalized either way.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    stream = ensure_timestamp(stream, "ts")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
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


def run_available_now(stream_df: DataFrame, query_name: str, tmp_dir: str):
    """Drain all available input into a memory sink and stop; returns the
    finished StreamingQuery. Read results via spark.table(query_name)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", f"{tmp_dir}/_ckpt_{query_name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
