from delta_lake_experiment_spark.storage.objectstore import LocalObjectStorage, ObjectStorage

__all__ = ["LocalObjectStorage", "ObjectStorage"]
