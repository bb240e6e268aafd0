from delta_lake_experiment_spark.functions.numeric import exact_avg, exact_sum

__all__ = ["exact_sum", "exact_avg"]
