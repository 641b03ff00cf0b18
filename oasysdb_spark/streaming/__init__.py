from oasysdb_spark.streaming.ingest import (
    stream_ingest_records,
    windowed_event_counts,
)

__all__ = ["stream_ingest_records", "windowed_event_counts"]
