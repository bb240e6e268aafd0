"""Event-time normalization shared by every temporal operator.

Parquet written without timezone adjustment (``isAdjustedToUTC=false``,
e.g. pandas/pyarrow defaults) reads back as ``TIMESTAMP_NTZ`` in Spark
3.4+, and several timestamp-only APIs reject that type outright:
``unix_micros`` raises DATATYPE_MISMATCH and ``withWatermark`` raises
EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. Under a UTC session timezone
(which this engine pins everywhere) ``CAST(ntz AS TIMESTAMP)`` is a
pure re-tag — identical micros, identical wall clock — so operators can
accept either type by normalizing at their boundary instead of pushing
the burden onto every caller.

Reference analogue: the reference's only timestamp handling is JSON
float coercion (utils/utils.go:38-48); the typed upgrade (SURVEY §7.1)
owns this class of physical-type drift.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: dtypes ensure_timestamp() will normalize — only the LOSSLESS casts
#: (NTZ re-tag under UTC, date -> midnight). Strings are deliberately
#: excluded: cast('timestamp') turns unparseable strings into NULLs
#: row-by-row, which would silently empty a watermarked stream instead
#: of failing loudly; anything else is left untouched so genuine type
#: errors still surface downstream.
_CASTABLE = {"timestamp_ntz", "date"}


def ensure_timestamp(df: DataFrame, *cols: str) -> DataFrame:
    """Return ``df`` with each named column cast to ``TIMESTAMP`` iff it
    currently carries an NTZ or date event time.

    No-op (and no plan change) when the column is already ``timestamp``
    or absent; works identically on batch and streaming DataFrames (a
    cast is a stateless projection, legal before ``withWatermark``).
    """
    dtypes = dict(df.dtypes)
    to_cast = [c for c in cols if dtypes.get(c) in _CASTABLE]
    if to_cast:
        # the NTZ re-tag is lossless ONLY under a UTC session timezone;
        # in any other zone the cast shifts wall clocks (and is ambiguous
        # across DST transitions). The engine pins UTC at its entry
        # points, but a library caller may not — warn loudly instead of
        # silently shifting their event times. (Checked only when a cast
        # will actually happen: one conf read, no plan change otherwise.)
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
        if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            warnings.warn(
                f"ensure_timestamp: casting {to_cast} from NTZ/date under "
                f"session timezone {tz!r}; this re-tag is only lossless "
                "under UTC — set spark.sql.session.timeZone=UTC",
                stacklevel=2,
            )
        for c in to_cast:
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
