from excel_to_database_spark.sync.policy import SyncAction, decide_sync_action
from excel_to_database_spark.sync.sinks import (
    Destination,
    JdbcDestination,
    LocalDestination,
    sync_table,
)

__all__ = [
    "SyncAction",
    "decide_sync_action",
    "Destination",
    "LocalDestination",
    "JdbcDestination",
    "sync_table",
]
