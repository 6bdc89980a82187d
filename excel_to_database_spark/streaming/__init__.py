from excel_to_database_spark.streaming.ingest import (
    read_events_stream,
    stream_dedup,
    stream_sync,
    stream_upsert,
    windowed_counts,
)

__all__ = ["read_events_stream", "windowed_counts", "stream_dedup", "stream_sync", "stream_upsert"]
