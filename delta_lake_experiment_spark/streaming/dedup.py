"""Streaming deduplication — the streaming twin of operators/dedup.py's
exact dedup, for continuous document ingestion.

``dropDuplicatesWithinWatermark`` keeps the first arrival per key and
drops later duplicates arriving within the watermark delay; state for a
key is evicted once the watermark passes it, so state stays bounded on
an unbounded stream (the property that makes this runnable forever over
a 100 TB/day feed — an unbounded ``dropDuplicates`` would accrete state
without limit).

Typical key: the md5 content fingerprint from operators/text.py —
exact-dedup semantics, O(1) state per distinct document in the
watermark horizon.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from delta_lake_experiment_spark.functions.timeutil import ensure_timestamp


def streaming_dedup(
    stream_df: DataFrame,
    key_cols: Sequence[str],
    watermark_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins streaming dedup with bounded state."""
    stream_df = ensure_timestamp(stream_df, watermark_col)
    return stream_df.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
