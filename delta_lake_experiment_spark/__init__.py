"""delta_lake_experiment_spark — a PySpark-native ACID table engine.

A from-scratch reimplementation of the capabilities of
``rptynan/delta-lake-experiment`` (a ~1.1 kLoC Go Delta-Lake-style table
layer: JSON transaction log, optimistic concurrency, snapshot isolation,
copy-on-write deletes, full-table scan) re-expressed Spark-first:

- data objects are **Parquet** files read/written through Spark DataFrames
  (the reference's own stated goal, reference README.md:33-34),
- the transaction log is versioned JSON files committed with atomic
  put-if-absent (reference transactions.go:133-146),
- query optimization is Catalyst's job: scans are plain
  ``spark.read.parquet(*live_files)`` so predicate pushdown, column
  pruning, and vectorized execution come for free,
- the reference's reverse-chronological multi-version scan contract
  (reference reads.go:52) is expressed with explicit ``_tx_id`` /
  ``_row_idx`` stamp columns, since DataFrames carry no implicit order.

On top of the storage engine sits a query/operator layer (``operators/``,
``functions/``) covering relational queries, text analysis, dedup,
similarity search, and multimodal plumbing designed for 100 TB scale.
"""

from delta_lake_experiment_spark.client import DeltaLakeClient
from delta_lake_experiment_spark.errors import (
    ConcurrentCommitError,
    ExistingTxError,
    HistoryTruncatedError,
    NoTxError,
    TableDroppedError,
    TableExistsError,
    TableNotFoundError,
    TypeMismatchError,
    UnsupportedCheckpointError,
    UnsupportedTableFeatureError,
)
from delta_lake_experiment_spark.storage.objectstore import LocalObjectStorage, ObjectStorage

__all__ = [
    "DeltaLakeClient",
    "LocalObjectStorage",
    "ObjectStorage",
    "ConcurrentCommitError",
    "ExistingTxError",
    "HistoryTruncatedError",
    "NoTxError",
    "TableDroppedError",
    "TableExistsError",
    "TableNotFoundError",
    "TypeMismatchError",
    "UnsupportedCheckpointError",
    "UnsupportedTableFeatureError",
]

__version__ = "0.1.0"
