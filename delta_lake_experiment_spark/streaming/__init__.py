from delta_lake_experiment_spark.streaming.change_feed import ChangeFeedReader
from delta_lake_experiment_spark.streaming.windowed import windowed_event_counts
from delta_lake_experiment_spark.streaming.sessions import streaming_sessionize

__all__ = ["ChangeFeedReader", "windowed_event_counts", "streaming_sessionize"]
