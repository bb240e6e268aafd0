"""Query-level operators built on the engine and on plain DataFrames."""

from delta_lake_experiment_spark.operators.versioned import latest_version_wins

__all__ = ["latest_version_wins"]
