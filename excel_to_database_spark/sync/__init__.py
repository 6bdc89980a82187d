from excel_to_database_spark.sync.bucketing import write_bucketed
from excel_to_database_spark.sync.layout import files_overlapping_box, zorder_value, zorder_write
from excel_to_database_spark.sync.merge import compact_table, merge_upsert, scd2_apply, scd2_init
from excel_to_database_spark.sync.policy import SyncAction, decide_sync_action
from excel_to_database_spark.sync.sinks import (
    CloudCopyDestination,
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
    "CloudCopyDestination",
    "sync_table",
    "write_bucketed",
    "zorder_write",
    "zorder_value",
    "files_overlapping_box",
    "merge_upsert",
    "compact_table",
    "scd2_apply",
    "scd2_init",
]
