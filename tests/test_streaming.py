"""Structured-Streaming ingest + watermarked windows.

Streaming is ABSENT in the reference (request/response server —
SURVEY.md §2.5); these tests pin the extension surface: micro-batch ingest
through the same insert path as batch writes, and windowed aggregation
whose availableNow result matches the equivalent batch query.
"""

import pytest
from pyspark.sql import functions as F

from oasysdb_spark.core.database import Database, RECORD_SCHEMA
from oasysdb_spark.sources.tables import load_table
from oasysdb_spark.streaming.ingest import stream_ingest_records, windowed_event_counts


def test_stream_ingest_records(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    dbdir = str(tmp_path / "db")

    rows = [(f"s{i:04d}", [float(i), float(i)], {}, {"n": float(i)}, {}) for i in range(50)]
    spark.createDataFrame(rows, RECORD_SCHEMA).write.parquet(src)

    db = Database.configure(spark, dbdir, dimension=2, density=16)
    stream = spark.readStream.schema(RECORD_SCHEMA).parquet(src)
    q = stream_ingest_records(db, stream, ckpt)
    q.awaitTermination(120)

    assert db.count() == 50
    res = db.query([3.0, 3.0], k=1)
    assert res[0]["id"] == "s0003"

    # second batch of files lands in the same stream directory
    more = [(f"t{i:04d}", [100.0 + i, 0.0], {}, {}, {}) for i in range(10)]
    spark.createDataFrame(more, RECORD_SCHEMA).write.mode("append").parquet(src)
    q2 = stream_ingest_records(db, spark.readStream.schema(RECORD_SCHEMA).parquet(src), ckpt)
    q2.awaitTermination(120)
    # checkpoint ensures the original 50 are not re-ingested
    assert db.count() == 60


def test_windowed_event_counts_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    windowed = windowed_event_counts(stream, window_duration="6 hours")
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }

    batch = (
        events.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .collect()
    )
    expected = {(r["w"]["start"], r["event_type"]): (r["n"], r["sv"]) for r in batch}
    # availableNow emits every window that is final at stream end; with
    # bounded input and watermark semantics, closed windows must agree
    assert got
    for key, val in got.items():
        assert expected.get(key) == val