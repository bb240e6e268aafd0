from delta_lake_experiment_spark.plans.actions import (
    Action,
    AddDataObject,
    ChangeMetadata,
    RemoveDataObject,
)
from delta_lake_experiment_spark.plans.snapshot import Snapshot, replay_log

__all__ = [
    "Action",
    "AddDataObject",
    "RemoveDataObject",
    "ChangeMetadata",
    "Snapshot",
    "replay_log",
]
