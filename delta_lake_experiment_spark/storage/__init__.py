from delta_lake_experiment_spark.storage.objectstore import (
    LocalObjectStorage,
    MemoryObjectStorage,
    ObjectStorage,
)
from delta_lake_experiment_spark.storage.s3 import S3ObjectStorage

__all__ = [
    "LocalObjectStorage",
    "MemoryObjectStorage",
    "ObjectStorage",
    "S3ObjectStorage",
]
