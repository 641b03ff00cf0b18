"""Structured-Streaming ingest + watermarked windows.

Streaming is ABSENT in the reference (request/response server —
SURVEY.md §2.5); these tests pin the extension surface: micro-batch ingest
through the same insert path as batch writes, and windowed aggregation
whose availableNow result matches the equivalent batch query.
"""

import pytest
from pyspark.sql import functions as F

from oasysdb_spark.core.database import Database, RECORD_SCHEMA
from oasysdb_spark.functions.time import epoch_ms
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

def test_session_window_counts_matches_batch(spark, sf_dir, tmp_path):
    """Streaming session windows on bounded input agree with the batch
    sessionizer on the (user, n_events, sum_value) multiset."""
    from oasysdb_spark.operators.relational import sessionize_events
    from oasysdb_spark.streaming.ingest import session_window_counts

    events = load_table(spark, sf_dir, "events").select("ts", "user_id", "value")
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        session_window_counts(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_counts").collect()
    )
    # append mode only emits FINAL sessions: one whose end (last event +
    # gap) is at or before the final watermark (max ts - delay). Sessions
    # still open at stream end are correctly withheld.
    import datetime as dt

    max_ts = events.agg(F.max("ts")).first()[0]
    cutoff = max_ts - dt.timedelta(hours=1) - dt.timedelta(minutes=30)
    from pyspark.sql import Window

    order = Window.partitionBy("user_id").orderBy("ts")
    ms = epoch_ms(F.col("ts"))
    gap_ms = ms - F.lag(ms).over(order)
    sess = events.withColumn(
        "new_sess", F.when(gap_ms.isNull() | (gap_ms > 1800000), 1).otherwise(0)
    ).withColumn(
        "session_seq",
        F.sum("new_sess").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    batch = (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    )
    expected_final = sorted(
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in batch
        if r["last_ts"] <= cutoff
    )
    expected_all = sorted((r["user_id"], r["n_events"], r["sum_value"]) for r in batch)
    # every finalized session is emitted exactly once, nothing extra
    assert set(got) <= set(expected_all)
    assert sorted(set(expected_final) - set(got)) == []
    assert len(got) >= len(expected_final)
    # sanity: the batch twin from the operator module agrees with the
    # inline recomputation
    op = sorted(
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in sessionize_events(spark, sf_dir).collect()
    )
    assert op == expected_all


def test_late_events_dropped_past_watermark(spark, tmp_path):
    """Two-phase availableNow run against one checkpoint: events older
    than (max_seen - watermark) arriving in phase 2 must NOT re-emit or
    alter windows already finalized in phase 1 (append mode)."""
    import datetime as dt

    from oasysdb_spark.streaming.ingest import windowed_event_counts

    src = tmp_path / "late_src"
    src.mkdir()
    ckpt = str(tmp_path / "late_ckpt")
    schema = "ts timestamp, event_type string, value double"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    out = str(tmp_path / "late_out")

    def run_phase():
        # memory sink can't recover from a checkpoint; a file sink can —
        # restart-with-late-data requires one
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            windowed_event_counts(
                stream, window_duration="10 minutes", watermark_delay="10 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in spark.read.parquet(out).collect()
        }

    # phase 1: events at t0 and t0+40min — watermark advances to t0+30min,
    # so the [t0, t0+10m) window is final and emitted
    write_batch("b1", [(t0, "a", 1.0), (t0 + dt.timedelta(minutes=40), "a", 1.0)])
    got1 = run_phase()
    assert got1.get((t0, "a")) == 1

    # phase 2: a LATE duplicate at t0 (25 min behind the watermark)
    write_batch("b2", [(t0, "a", 99.0)])
    got2 = run_phase()
    assert got2.get((t0, "a")) == 1  # unchanged — late row dropped


def test_user_running_totals_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    phase 2 totals include phase 1 rows (state restored from checkpoint)."""
    import datetime as dt

    from oasysdb_spark.streaming.ingest import user_running_totals

    src = tmp_path / "tot_src"
    src.mkdir()
    ckpt = str(tmp_path / "tot_ckpt")
    schema = "ts timestamp, user_id bigint, value double"
    t0 = dt.datetime(2024, 1, 1)

    out = str(tmp_path / "tot_out")

    def run_phase(qname):
        # file sink (recovery-capable) in append mode: each phase appends
        # its emitted rows; the LATEST row per user (max n_events) is the
        # current running total
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            user_running_totals(stream, output_mode="append")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        totals = {}
        for r in spark.read.parquet(out).collect():
            cur = totals.get(r["user_id"])
            if cur is None or r["n_events"] > cur[0]:
                totals[r["user_id"]] = (r["n_events"], r["sum_value"])
        return totals

    spark.createDataFrame(
        [(t0, 1, 2.0), (t0, 1, 3.0), (t0, 2, 10.0)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    got1 = run_phase("tot1")
    assert got1[1] == (2, 5.0) and got1[2] == (1, 10.0)

    spark.createDataFrame([(t0, 1, 5.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    got2 = run_phase("tot2")
    assert got2[1] == (3, 10.0)  # state carried: 2+1 events, 5+5 value


def test_dedup_stream_drops_redeliveries(spark, tmp_path):
    """Two-phase availableNow run: a key re-delivered in a later
    micro-batch (within the watermark) must not re-emit; a genuinely new
    key must. State is watermark-bounded (dropDuplicatesWithinWatermark)."""
    import datetime as dt

    from oasysdb_spark.streaming.ingest import dedup_stream

    src = tmp_path / "dd_src"
    src.mkdir()
    ckpt = str(tmp_path / "dd_ckpt")
    out = str(tmp_path / "dd_out")
    schema = "ts timestamp, event_id bigint, value double"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )

    def run_phase():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            dedup_stream(stream, ["event_id"], watermark_delay="10 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        ids = sorted(r["event_id"] for r in rows)
        return ids

    write_batch([(t0, 1, 1.0), (t0 + dt.timedelta(minutes=1), 2, 2.0)])
    assert run_phase() == [1, 2]

    # re-delivery of id=2 (same key, within watermark) + new id=3
    write_batch(
        [(t0 + dt.timedelta(minutes=2), 2, 99.0), (t0 + dt.timedelta(minutes=3), 3, 3.0)]
    )
    assert run_phase() == [1, 2, 3]


def test_ingest_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: simulate every replay window of the
    epoch protocol directly against the ingest function.

    - replay of a fully committed epoch → skipped outright;
    - crash between append and commit marker (committed marker rolled
      back, started marker present) → recovery anti-join drops the
      already-appended rows;
    - a genuinely new epoch still appends.
    """
    import os

    from oasysdb_spark.streaming.ingest import (
        _COMMITTED,
        make_epoch_idempotent_ingest,
    )

    dbdir = str(tmp_path / "db")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)
    db = Database.configure(spark, dbdir, dimension=2, density=16)
    ingest = make_epoch_idempotent_ingest(db, ckpt)

    batch0 = spark.createDataFrame(
        [(f"a{i}", [float(i), 0.0], {}, {}, {}) for i in range(20)], RECORD_SCHEMA
    )
    ingest(batch0, 0)
    assert db.count() == 20

    # full replay of committed epoch 0 -> no-op
    ingest(batch0, 0)
    assert db.count() == 20

    # crash between append and commit: epoch 1 appends, then dies before
    # writing the committed marker
    batch1 = spark.createDataFrame(
        [(f"b{i}", [float(i), 1.0], {}, {}, {}) for i in range(5)], RECORD_SCHEMA
    )
    ingest(batch1, 1)
    assert db.count() == 25
    with open(os.path.join(ckpt, _COMMITTED), "w") as f:
        f.write("0")  # roll back the commit marker; started marker stays at 1

    ingest(batch1, 1)  # Spark re-delivers epoch 1
    assert db.count() == 25  # recovery anti-join: no duplicates

    # next epoch is not a replay and appends normally
    batch2 = spark.createDataFrame(
        [("c0", [9.0, 9.0], {}, {}, {})], RECORD_SCHEMA
    )
    ingest(batch2, 2)
    assert db.count() == 26


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked time-bounded stream-stream join == the identical batch
    join (availableNow drains the whole fixture, so no rows are lost to
    watermark eviction mid-run)."""
    from oasysdb_spark.streaming.ingest import stream_click_view_join

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    src = str(tmp_path / "ev_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    joined = stream_click_view_join(stream)
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["view_id"], r["gap_ms"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }

    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    views = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 30 minutes"))
    )
    want = {
        (r["click_id"], r["view_id"], r["gap_ms"])
        for r in clicks.join(views, cond)
        .select(
            "click_id", "view_id",
            (epoch_ms("click_ts") - epoch_ms("view_ts")).cast("bigint").alias("gap_ms"),
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_near_dedup_stream_matches_batch_lsh(spark, sf_dir, tmp_path):
    """Streaming MinHash-LSH flags exactly the docs the batch LSH marks as
    non-first in some band bucket (earlier = smaller doc_id), including
    across a restart with new data (state persists in the checkpoint)."""
    from oasysdb_spark.operators.dedup import minhash_signatures
    from oasysdb_spark.streaming.ingest import near_dedup_stream_flags

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "nd_ckpt")
    docs.write.parquet(src)

    out_dir = str(tmp_path / "nd_out")

    def drain():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = (
            near_dedup_stream_flags(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out_dir)

    flags = drain()
    got_dups = {
        r["doc_id"]
        for r in flags.where(F.col("collided")).select("doc_id").distinct().collect()
    }

    # batch twin: doc is a near-dup candidate iff it is not the min doc_id
    # in at least one of its band buckets
    sigs = minhash_signatures(docs)
    n_bands = 8
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.concat_ws(
                "_",
                F.element_at(F.col("sig"), b * 2 + 1).cast("string"),
                F.element_at(F.col("sig"), b * 2 + 2).cast("string"),
            ).alias("band_key"),
        ),
    )
    bands = sigs.select("doc_id", F.explode(band_structs).alias("band")).select(
        "doc_id", "band.band_id", "band.band_key"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("band_id", "band_key")
    want_dups = {
        r["doc_id"]
        for r in bands.withColumn("first", F.min("doc_id").over(w))
        .where(F.col("doc_id") != F.col("first"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert got_dups == want_dups and len(want_dups) > 0

    # restart with an exact copy of doc 0's text under a new id: the
    # checkpointed bucket state flags it immediately
    dup_text = docs.where(F.col("doc_id") == 0).first()["text"]
    spark.createDataFrame([(990001, dup_text)], "doc_id bigint, text string") \
        .write.mode("append").parquet(src)
    flags2 = drain()
    new_rows = flags2.where(F.col("doc_id") == 990001)
    assert new_rows.count() == 8  # one row per band
    assert new_rows.where(F.col("collided")).count() == 8


def test_decontaminate_stream_matches_batch_and_survives_restart(
    spark, sf_dir, tmp_path
):
    """Streaming decontamination replayed over the train corpus must flag
    exactly what batch decontaminate_against flags (same best-match rows),
    across a two-phase availableNow run with a checkpoint restart; a
    third phase re-delivering already-flagged docs must not re-emit."""
    from oasysdb_spark.operators import dedup
    from oasysdb_spark.streaming.ingest import decontaminate_stream_flags

    docs = dedup.load_documents(spark, sf_dir).select("doc_id", "text")
    train = docs.where("doc_id % 10 <> 3")
    eval_docs = docs.where("doc_id % 10 = 3")
    expected = {
        (r["doc_id"], r["eval_doc_id"], r["jaccard"])
        for r in dedup.decontaminate_against(train, eval_docs, threshold=0.5).collect()
    }
    assert expected  # the fixture's near-dup families cross the split

    src = str(tmp_path / "train_src")
    out = str(tmp_path / "flags_out")
    ckpt = str(tmp_path / "decon_ckpt")

    def drain():
        stream = spark.readStream.schema(train.schema).parquet(src)
        q = (
            decontaminate_stream_flags(stream, eval_docs, threshold=0.5)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["doc_id"], r["eval_doc_id"], r["jaccard"])
            for r in spark.read.parquet(out).collect()
        }

    # phase 1: half the train corpus
    train.where("doc_id % 2 = 0").write.parquet(src)
    got1 = drain()
    assert got1 == {t for t in expected if t[0] % 2 == 0}

    # phase 2 (restart from checkpoint): the other half
    train.where("doc_id % 2 = 1").write.mode("append").parquet(src)
    got2 = drain()
    assert got2 == expected

    # phase 3: re-deliver phase-1 rows — the per-doc state suppresses
    # re-emission, so the flag set is unchanged
    train.where("doc_id % 2 = 0").write.mode("append").parquet(src)
    got3 = drain()
    assert got3 == expected

    # the size-guard fallback (broadcast hint dropped, shuffled
    # stream-static equi-join) must flag the identical set
    out2, ckpt2 = str(tmp_path / "flags_out2"), str(tmp_path / "decon_ckpt2")
    stream = spark.readStream.schema(train.schema).parquet(src)
    q = (
        decontaminate_stream_flags(
            stream, eval_docs, threshold=0.5, eval_broadcast_limit=0
        )
        .writeStream.format("parquet")
        .option("path", out2)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt2)
        .start()
    )
    q.awaitTermination(120)
    got_shuffled = {
        (r["doc_id"], r["eval_doc_id"], r["jaccard"])
        for r in spark.read.parquet(out2).collect()
    }
    assert got_shuffled == expected


def test_heavy_hitter_stream_captures_batch_hitters_across_restart(
    spark, sf_dir, tmp_path
):
    """Streaming MG sketches: after draining the corpus (split across a
    checkpoint restart), every batch heavy hitter is present in its
    shard's final sketch with est <= true tf, and per-shard state stayed
    bounded (<= sketch_k entries)."""
    from oasysdb_spark.functions.text import tokens as tokens_expr
    from oasysdb_spark.streaming.ingest import heavy_hitter_stream_sketches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "hh_src")
    ckpt = str(tmp_path / "hh_ckpt")
    out_dir = str(tmp_path / "hh_out")
    half_a.write.parquet(src)

    def drain():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = (
            heavy_hitter_stream_sketches(stream, sketch_k=64, shards=4)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out_dir)

    drain()  # first half
    half_b.write.mode("append").parquet(src)
    sketches = drain()  # second half resumes from checkpointed state

    # final sketch per shard = rows with the max shard_n (update mode
    # appends one emission per batch)
    from pyspark.sql import Window

    w = Window.partitionBy("shard")
    final = (
        sketches.withColumn("max_n", F.max("shard_n").over(w))
        .where(F.col("shard_n") == F.col("max_n"))
        .select("shard", "term", "est")
        .collect()
    )
    est = {r["term"]: r["est"] for r in final}
    per_shard: dict = {}
    for r in final:
        per_shard.setdefault(r["shard"], set()).add(r["term"])
    assert all(len(s) <= 64 for s in per_shard.values())

    truth = {
        r["term"]: r["tf"]
        for r in docs.select(F.explode(tokens_expr(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
        .collect()
    }
    n_total = sum(truth.values())
    hitters = {t for t, f in truth.items() if f * 64 > n_total}
    assert hitters  # fixture has heavy hitters at 1/64
    for t in hitters:
        assert t in est, f"heavy hitter {t} missing from final sketches"
    for t, e in est.items():
        assert e <= truth[t]


def test_stream_jsonl_corpus_matches_batch_and_survives_restart(spark, tmp_path):
    """The streaming jsonl ingest must route clean/quarantine EXACTLY
    like the batch reader on the same files (shared predicate), and a
    restarted query must pick up only files added since the checkpoint
    — never re-ingesting."""
    import json as _json

    from oasysdb_spark.sources import corpus

    src = tmp_path / "corpus_in"
    src.mkdir()
    out_clean = str(tmp_path / "clean_out")
    out_quar = str(tmp_path / "quar_out")
    ck1, ck2 = str(tmp_path / "ck_clean"), str(tmp_path / "ck_quar")

    def doc(i, txt):
        return _json.dumps(
            {"doc_id": i, "text": txt, "lang": "en", "source": "web"}
        )

    (src / "a.jsonl").write_text(
        "\n".join([doc(1, "one"), '{"doc_id": 2, "broken', doc(3, "three")])
    )

    def run_once():
        clean, quar = corpus.stream_jsonl_corpus(spark, str(src))
        q1 = (
            clean.writeStream.format("parquet")
            .option("path", out_clean)
            .option("checkpointLocation", ck1)
            .trigger(availableNow=True)
            .start()
        )
        q2 = (
            quar.writeStream.format("parquet")
            .option("path", out_quar)
            .option("checkpointLocation", ck2)
            .trigger(availableNow=True)
            .start()
        )
        q1.awaitTermination(120)
        q2.awaitTermination(120)

    run_once()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out_clean).collect()
    ) == [1, 3]
    assert spark.read.parquet(out_quar).count() == 1

    # batch twin on the same directory agrees exactly
    b_clean, b_quar = corpus.read_jsonl_corpus(spark, str(src))
    assert sorted(r["doc_id"] for r in b_clean.collect()) == [1, 3]
    assert b_quar.count() == 1

    # a second file lands; the restarted queries ingest ONLY it
    (src / "b.jsonl").write_text(
        "\n".join([doc(4, "four"), _json.dumps({"renamed": "drift"})])
    )
    run_once()
    clean_rows = sorted(r["doc_id"] for r in spark.read.parquet(out_clean).collect())
    assert clean_rows == [1, 3, 4]  # no re-ingest duplication
    assert spark.read.parquet(out_quar).count() == 2


def test_stream_wet_corpus_matches_batch_and_is_exactly_once(spark, tmp_path):
    """Streaming WET ingest over a growing crawl directory: parses
    identically to the batch reader (shared transform), and a restart
    after new files land processes only the delta."""
    from oasysdb_spark.sources import corpus
    from tests.test_sources import _wet_record

    src = tmp_path / "crawl"
    src.mkdir()
    (src / "f1.warc.wet").write_bytes(
        _wet_record("a1", "https://x.org/a", "alpha text")
        + _wet_record("a2", "https://x.org/b", "beta text")
    )
    out = str(tmp_path / "landed")
    ck = str(tmp_path / "ck")

    def run_once():
        q = (
            corpus.stream_wet_corpus(spark, str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = {r["record_id"] for r in spark.read.parquet(out).collect()}
    batch = {
        r["record_id"]
        for r in corpus.read_wet_corpus(spark, str(src)).collect()
    }
    assert got == batch == {"<urn:uuid:a1>", "<urn:uuid:a2>"}

    (src / "f2.warc.wet").write_bytes(
        _wet_record("b1", "https://y.org/c", "gamma text")
    )
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3  # no re-ingest of f1
    assert {r["record_id"] for r in rows} == {
        "<urn:uuid:a1>", "<urn:uuid:a2>", "<urn:uuid:b1>"
    }


def test_ngram_overlap_stream_matches_batch_and_survives_restart(
    spark, sf_dir, tmp_path
):
    """Streaming exact n-gram decontamination replayed over the
    (injection-augmented) train corpus must report exactly what batch
    ngram_overlap_flags reports — every doc, including zero-hit docs —
    across a two-phase availableNow run with a checkpoint restart; a
    third phase re-delivering docs must not re-emit; the size-guard
    fallback (shuffled stream-static join) flags the identical set."""
    from oasysdb_spark.operators.dedup import ngram_overlap_flags
    from oasysdb_spark.operators.textops import BOILERPLATE_TEMPLATE
    from oasysdb_spark.streaming.ingest import ngram_overlap_stream_flags

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    aug_train = docs.where(F.col("doc_id") % 10 != 3).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0, F.lit(" " + BOILERPLATE_TEMPLATE)
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    aug_eval = docs.where(F.col("doc_id") % 10 == 3).select(
        "doc_id", F.concat("text", F.lit(" " + BOILERPLATE_TEMPLATE)).alias("text")
    )
    expected = {
        tuple(r) for r in ngram_overlap_flags(aug_train, aug_eval).collect()
    }
    assert expected and any(r[2] > 0 for r in expected)  # real hits
    assert any(r[2] == 0 for r in expected)  # and zero-hit docs reported

    src = str(tmp_path / "ngram_src")
    out = str(tmp_path / "ngram_out")
    ckpt = str(tmp_path / "ngram_ckpt")

    def drain(limit=10_000_000, out_dir=None, ckpt_dir=None):
        stream = spark.readStream.schema(aug_train.schema).parquet(src)
        q = (
            ngram_overlap_stream_flags(
                stream, aug_eval, eval_broadcast_limit=limit
            )
            .writeStream.format("parquet")
            .option("path", out_dir or out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt_dir or ckpt)
            .start()
        )
        q.awaitTermination(120)
        return {
            tuple(r) for r in spark.read.parquet(out_dir or out).collect()
        }

    aug_train.where("doc_id % 2 = 0").write.parquet(src)
    got1 = drain()
    assert got1 == {t for t in expected if t[0] % 2 == 0}

    aug_train.where("doc_id % 2 = 1").write.mode("append").parquet(src)
    got2 = drain()
    assert got2 == expected

    # re-delivery: the one-bit state suppresses duplicate emission
    aug_train.where("doc_id % 2 = 0").write.mode("append").parquet(src)
    got3 = drain()
    assert got3 == expected

    # size-guard fallback path
    got_shuffled = drain(
        limit=0,
        out_dir=str(tmp_path / "ngram_out2"),
        ckpt_dir=str(tmp_path / "ngram_ckpt2"),
    )
    assert got_shuffled == expected


def test_line_dedup_stream_matches_batch_and_survives_restart(
    spark, sf_dir, tmp_path
):
    """Streaming CCNet line dedup must keep exactly one copy of every
    distinct line across a two-phase availableNow run with a checkpoint
    restart (set-of-survivors invariant, checked via the same mod-1e9+7
    checksum the batch op exposes); a re-delivery phase must flag every
    re-delivered line cut without ever re-keeping; and a single-batch
    replay of the whole corpus must reproduce batch line_dedup_stats'
    per-doc kept counts EXACTLY (within one micro-batch the group sorts
    by (doc_id, p), so the stream's first winner is batch's winner)."""
    from oasysdb_spark.operators.textops import LINE_TEMPLATE, line_dedup_stats
    from oasysdb_spark.streaming.ingest import line_dedup_stream_flags

    batch = {
        r["doc_id"]: r for r in line_dedup_stats(spark, sf_dir).collect()
    }
    want_kept = sum(r["n_kept"] for r in batch.values())
    want_lines = sum(r["n_lines"] for r in batch.values())
    want_checksum = sum(r["kept_hash_sum"] for r in batch.values())
    assert want_kept < want_lines  # injected duplicates actually dropped

    aug = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.concat(
                F.when(
                    F.col("doc_id") % 3 == 0, F.lit(LINE_TEMPLATE + " ")
                ).otherwise(F.lit("")),
                F.col("text"),
            ).alias("text"),
        )
    )

    src = str(tmp_path / "ld_src")
    out = str(tmp_path / "ld_out")
    ckpt = str(tmp_path / "ld_ckpt")

    def drain(out_dir=None, ckpt_dir=None):
        stream = spark.readStream.schema(aug.schema).parquet(src)
        q = (
            line_dedup_stream_flags(stream)
            .writeStream.format("parquet")
            .option("path", out_dir or out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt_dir or ckpt)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir or out)

    aug.where("doc_id % 2 = 0").write.parquet(src)
    got1 = drain()
    kept1 = {tuple(r) for r in got1.where("keep").collect()}
    # phase 1 survivors: one copy per distinct hash seen so far
    assert len(kept1) == len({k[2] for k in kept1})

    aug.where("doc_id % 2 = 1").write.mode("append").parquet(src)
    got2 = drain()
    kept2 = {tuple(r) for r in got2.where("keep").collect()}
    hashes2 = {k[2] for k in kept2}
    assert len(kept2) == len(hashes2) == want_kept
    assert sum(h % 1_000_000_007 for h in hashes2) == want_checksum
    assert got2.select("doc_id", "p").distinct().count() == want_lines
    # restart kept phase-1 state: phase-1 winners never re-keyed
    assert kept1 <= kept2

    # re-delivery: every re-delivered line is already seen -> cut
    aug.where("doc_id % 2 = 0").write.mode("append").parquet(src)
    got3 = drain()
    kept3 = {tuple(r) for r in got3.where("keep").collect()}
    assert kept3 == kept2

    # single-batch replay == batch op exactly (per-doc kept counts)
    src1 = str(tmp_path / "ld_src1")
    aug.write.parquet(src1)
    stream = spark.readStream.schema(aug.schema).parquet(src1)
    q = (
        line_dedup_stream_flags(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "ld_out1"))
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ld_ckpt1"))
        .start()
    )
    q.awaitTermination(120)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(str(tmp_path / "ld_out1"))
        .where("keep")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for d, r in batch.items():
        assert per_doc.get(d, 0) == r["n_kept"], d


def test_funnel_stream_matches_batch_and_survives_restart(
    spark, sf_dir, tmp_path
):
    """Streaming funnel progress: a single-batch replay reproduces the
    batch funnel's step counts exactly (in-batch sort makes greedy
    matching identical); a two-phase time-split delivery with a
    checkpoint restart converges to the same counts (the fixture's
    per-user event order is delivered chronologically, so the
    no-retraction guard never bites); users only ever advance."""
    from oasysdb_spark.operators.relational import event_funnel
    from oasysdb_spark.streaming.ingest import funnel_stream_progress

    batch = {r["step"]: r["n_users"] for r in event_funnel(spark, sf_dir).collect()}

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    cut = events.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.5) p"
    ).first()["p"]

    src = str(tmp_path / "fn_src")
    out = str(tmp_path / "fn_out")
    ckpt = str(tmp_path / "fn_ckpt")

    def drain():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            funnel_stream_progress(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    # phase 1: first half of time; phase 2: the rest (chronological
    # delivery — the streaming-funnel contract)
    events.where(
        f"unix_micros(cast(ts as timestamp)) <= {int(cut)}"
    ).write.parquet(src)
    drain()
    events.where(
        f"unix_micros(cast(ts as timestamp)) > {int(cut)}"
    ).write.mode("append").parquet(src)
    got = drain()

    # latest reached per user (max: users only advance)
    per_user = {
        r["user_id"]: r["m"]
        for r in got.groupBy("user_id").agg(F.max("reached").alias("m")).collect()
    }
    for s in (1, 2, 3):
        assert sum(1 for v in per_user.values() if v >= s) == batch[s], s

    # progress is monotone per user across emissions
    from collections import defaultdict

    seen = defaultdict(list)
    for r in got.collect():
        seen[r["user_id"]].append(r["reached"])
    assert all(len(set(v)) == len(v) for v in seen.values())


def test_funnel_stream_out_of_order_is_conservative(spark, sf_dir, tmp_path):
    """The documented no-retraction approximation pinned: delivering the
    LATE half of time first, then the early half, never crashes, never
    over-counts (per-step counts <= batch truth), and per-user progress
    stays monotone — late-arriving earlier events cannot retro-improve
    a match."""
    from oasysdb_spark.operators.relational import event_funnel
    from oasysdb_spark.streaming.ingest import funnel_stream_progress

    batch = {r["step"]: r["n_users"] for r in event_funnel(spark, sf_dir).collect()}
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    cut = events.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.5) p"
    ).first()["p"]

    src = str(tmp_path / "fo_src")
    out = str(tmp_path / "fo_out")
    ckpt = str(tmp_path / "fo_ckpt")

    def drain():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            funnel_stream_progress(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    # REVERSED phases: late half first
    events.where(
        f"unix_micros(cast(ts as timestamp)) > {int(cut)}"
    ).write.parquet(src)
    drain()
    events.where(
        f"unix_micros(cast(ts as timestamp)) <= {int(cut)}"
    ).write.mode("append").parquet(src)
    got = drain()

    per_user = {
        r["user_id"]: r["m"]
        for r in got.groupBy("user_id").agg(F.max("reached").alias("m")).collect()
    }
    for s in (1, 2, 3):
        streamed = sum(1 for v in per_user.values() if v >= s)
        assert streamed <= batch[s], (s, streamed, batch[s])
    assert sum(1 for v in per_user.values() if v >= 1) > 0


def test_event_rate_anomaly_stream_matches_batch(spark, sf_dir, tmp_path):
    """The streaming anomaly scorer over the fixture events, with the
    baseline fit on the same history, must flag exactly the rows the
    batch op returns (identical integer-moment z expression on both
    paths). Also pins that a checkpointed restart over the same source
    re-emits nothing (exactly-once on re-delivery)."""
    from oasysdb_spark.operators import temporal
    from oasysdb_spark.streaming.ingest import event_rate_anomaly_stream_flags

    events = load_table(spark, sf_dir, "events").select("ts", "event_type")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    baseline = temporal.event_rate_baseline(events)

    out = str(tmp_path / "anom_out")

    def run():
        stream = spark.readStream.schema(events.schema).parquet(src)
        flags = event_rate_anomaly_stream_flags(stream, baseline)
        q = (
            flags.writeStream.format("parquet")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt_anom"))
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["event_type"], r["hour_ts"]): (r["n_events"], r["z_score"])
            for r in spark.read.parquet(out).collect()
        }

    got = run()
    expected = {
        (r["event_type"], r["hour_ts"]): (r["n_events"], r["z_score"])
        for r in temporal.event_rate_anomalies(spark, sf_dir).collect()
    }
    # availableNow closes every window at end-of-stream, so the flagged
    # sets must be identical — including z values, which are the same
    # integer-moment expression both sides
    assert got == expected
    assert got

    # restart over the same checkpoint + source: the sink must be
    # unchanged (no duplicate emission on re-delivery)
    rerun = run()
    assert rerun == got


def test_embedding_decontaminate_stream_matches_batch(spark, sf_dir, tmp_path):
    """The streaming semantic decontaminator must flag exactly the rows
    the batch op flags (same closure, same arithmetic), a checkpointed
    restart must not re-emit, and an oversized eval side must raise the
    documented boundary error instead of silently cutting recall."""
    import pytest as _pytest

    from oasysdb_spark.errors import InvalidArgumentError
    from oasysdb_spark.operators import dedup
    from oasysdb_spark.streaming.ingest import embedding_decontaminate_stream_flags

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    train = embs.where(F.col("vec_id") % 10 != 0).select("vec_id", "embedding")
    evals = embs.where(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    src = str(tmp_path / "train_src")
    train.write.parquet(src)

    out = str(tmp_path / "edc_out")

    def run():
        stream = spark.readStream.schema(train.schema).parquet(src)
        flags = embedding_decontaminate_stream_flags(stream, evals, threshold=0.35)
        q = (
            flags.writeStream.format("parquet")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt_edc"))
            .start()
        )
        q.awaitTermination(120)
        return sorted(tuple(r) for r in spark.read.parquet(out).collect())

    got = run()
    expected = sorted(
        tuple(r)
        for r in dedup.embedding_decontaminate(train, evals, threshold=0.35).collect()
    )
    assert got == expected
    assert got

    # restart over the same checkpoint + source: sink unchanged
    assert run() == got

    with _pytest.raises(InvalidArgumentError):
        embedding_decontaminate_stream_flags(
            spark.readStream.schema(train.schema).parquet(src),
            evals,
            eval_broadcast_limit=3,
        )


def test_stream_ingest_maintains_hnsw(spark, tmp_path):
    """maintain_hnsw=True keeps the graph tier serveable across
    streamed appends: after the stream drains, approx='hnsw' queries
    work WITHOUT a manual extend and find the streamed records; a
    checkpointed replay extends nothing and the graph still serves."""
    from oasysdb_spark.index.hnsw import build_hnsw

    src = str(tmp_path / "hnsw_src")
    ckpt = str(tmp_path / "hnsw_ckpt")
    dbdir = str(tmp_path / "hnsw_db")

    db = Database.configure(spark, dbdir, dimension=2, density=16)
    base = [(f"s{i:04d}", [float(i), float(i)], {}, {}, {}) for i in range(20)]
    db.insert_batch(spark.createDataFrame(base, RECORD_SCHEMA))
    build_hnsw(db, m=4, ef_construction=20, shards=2)

    more = [(f"t{i:04d}", [100.0 + i, 0.0], {}, {}, {}) for i in range(10)]
    spark.createDataFrame(more, RECORD_SCHEMA).write.parquet(src)
    q = stream_ingest_records(
        db, spark.readStream.schema(RECORD_SCHEMA).parquet(src), ckpt,
        maintain_hnsw=True,
    )
    q.awaitTermination(120)

    assert db.count() == 30
    # no manual extend: the graph must be fresh and contain the new rows
    res = db.query([100.0, 0.0], k=1, approx="hnsw")
    assert res[0]["id"] == "t0000" and res[0]["distance"] == 0.0

    # replay over the same checkpoint: nothing re-ingested, still serves
    q2 = stream_ingest_records(
        db, spark.readStream.schema(RECORD_SCHEMA).parquet(src), ckpt,
        maintain_hnsw=True,
    )
    q2.awaitTermination(120)
    assert db.count() == 30
    assert db.query([109.0, 0.0], k=1, approx="hnsw")[0]["id"] == "t0009"


def test_stream_ingest_maintains_cosine_hnsw_with_zero_norm_rows(
    spark, tmp_path
):
    """Streaming HNSW maintenance under COSINE with zero-norm rows in
    the micro-batch (r8 judge task 6): the zero-norm exclusion is
    pinned for batch build/extend — this is the streaming-epoch twin.
    A micro-batch containing zero vectors under a cosine Database with
    maintain_hnsw=True must (1) store every row, (2) keep the zero-norm
    ids OUT of the graph (at the origin they'd sit distance 1 from
    every unit vector and crowd the beam), and (3) leave a graph
    BIT-IDENTICAL to a from-scratch rebuild over the grown table."""
    import math as _math

    from oasysdb_spark.core.tables import VersionedTable
    from oasysdb_spark.index.hnsw import GRAPH_DIR, build_hnsw

    src = str(tmp_path / "cos_src")
    ckpt = str(tmp_path / "cos_ckpt")
    dbdir = str(tmp_path / "cos_db")

    db = Database.configure(spark, dbdir, dimension=3, metric="cosine")
    base = []
    for i in range(24):
        th = _math.radians(12.0 * i)
        base.append(
            (
                f"s{i:04d}",
                [_math.cos(th), _math.sin(th), 0.5],
                {},
                {"number": float(i)},
                {},
            )
        )
    db.insert_batch(spark.createDataFrame(base, RECORD_SCHEMA))
    build_hnsw(db, m=4, ef_construction=20, shards=2)

    # the streamed epoch: real vectors interleaved with ZERO vectors
    more = []
    for i in range(12):
        vec = (
            [0.0, 0.0, 0.0]
            if i % 3 == 0
            else [float(i), 1.0, -float(i)]
        )
        more.append((f"t{i:04d}", vec, {}, {"number": float(100 + i)}, {}))
    spark.createDataFrame(more, RECORD_SCHEMA).write.parquet(src)
    q = stream_ingest_records(
        db, spark.readStream.schema(RECORD_SCHEMA).parquet(src), ckpt,
        maintain_hnsw=True,
    )
    q.awaitTermination(120)
    assert db.count() == 36  # zero-norm rows are STORED

    graph_tbl = VersionedTable(f"{dbdir}/{GRAPH_DIR}")
    graph_ids = {
        r["vec_id"] for r in graph_tbl.read(spark).select("vec_id").collect()
    }
    zero_ids = {f"t{i:04d}" for i in range(0, 12, 3)}
    assert zero_ids & graph_ids == set(), "zero-norm rows entered the graph"
    assert {f"t{i:04d}" for i in (1, 2, 4, 5)} <= graph_ids

    # extended-in-epoch graph == from-scratch rebuild, bit for bit
    ext_rows = sorted(
        tuple(map(str, r)) for r in graph_tbl.read(spark).collect()
    )
    build_hnsw(db, m=4, ef_construction=20, shards=2)
    fresh_rows = sorted(
        tuple(map(str, r)) for r in graph_tbl.read(spark).collect()
    )
    assert ext_rows == fresh_rows

    # and the served result matches the exact cosine query
    qv = [5.0, 1.0, -5.0]
    exact = db.query(qv, k=5)
    approx = db.query(qv, k=5, approx="hnsw")
    assert [r["id"] for r in approx] == [r["id"] for r in exact]


def test_fuzzy_match_stream_matches_batch_and_truth(spark, sf_dir, tmp_path):
    """The streaming fuzzy-name lookup must flag exactly the rows the
    batch op flags (same closure), both must equal a Python quadratic
    Levenshtein truth over the bipartite (stream x reference) grid, a
    checkpointed restart must not re-emit, and an oversized reference
    side must raise the documented boundary error."""
    import pytest as _pytest

    from oasysdb_spark.errors import InvalidArgumentError
    from oasysdb_spark.operators.similarity_join import fuzzy_match_against
    from oasysdb_spark.streaming.ingest import fuzzy_match_stream_flags

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    stream_names = cust.where(F.col("c_custkey") % 3 != 0).select(
        F.col("c_name").alias("name")
    )
    reference = cust.where(F.col("c_custkey") % 3 == 0).select(
        F.col("c_name").alias("name")
    )
    src = str(tmp_path / "names_src")
    stream_names.write.parquet(src)

    out = str(tmp_path / "fz_out")

    def run():
        stream = spark.readStream.schema(stream_names.schema).parquet(src)
        flags = fuzzy_match_stream_flags(stream, reference)
        q = (
            flags.writeStream.format("parquet")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt_fz"))
            .start()
        )
        q.awaitTermination(120)
        return sorted(tuple(r) for r in spark.read.parquet(out).collect())

    got = run()
    batch = sorted(
        tuple(r)
        for r in fuzzy_match_against(stream_names, reference).collect()
    )
    assert got == batch
    assert got  # sequential customer names guarantee dist-1 hits

    # quadratic truth over the bipartite grid (python DP)
    def lev(s, t):
        if len(s) < len(t):
            s, t = t, s
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (cs != ct))
                )
            prev = cur
        return prev[-1]

    s_names = [r["name"] for r in stream_names.collect()]
    r_names = sorted({r["name"] for r in reference.collect()})
    truth = sorted(
        (nm, ref, lev(nm, ref))
        for nm in s_names
        for ref in r_names
        if lev(nm, ref) <= 1
    )
    assert got == truth
    # bipartite: no same-side pairs, dist 0 impossible here (disjoint
    # key slices), every dist is exactly 1
    assert all(d == 1 for (_, _, d) in got)

    # restart over the same checkpoint + source: sink unchanged
    assert run() == got

    with _pytest.raises(InvalidArgumentError):
        fuzzy_match_stream_flags(
            spark.readStream.schema(stream_names.schema).parquet(src),
            reference,
            max_reference=3,
        )


def test_markov_stream_matches_batch_and_replays(spark, sf_dir, tmp_path):
    """Streaming Markov transition extraction: chronological two-phase
    delivery with a checkpointed restart reproduces the batch
    transition matrix EXACTLY (grouping the emitted log by the pair
    equals event_markov_transitions' n_transitions for every pair),
    and a third drain over the same source emits nothing new
    (idempotent re-delivery through the ordered-after guard)."""
    from oasysdb_spark.operators.temporal import event_markov_transitions
    from oasysdb_spark.streaming.ingest import markov_stream_transitions

    batch = {
        (r["prev_type"], r["next_type"]): r["n_transitions"]
        for r in event_markov_transitions(spark, sf_dir).collect()
    }

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    cut = events.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.5) p"
    ).first()["p"]

    src = str(tmp_path / "mk_src")
    out = str(tmp_path / "mk_out")
    ckpt = str(tmp_path / "mk_ckpt")

    def drain():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            markov_stream_transitions(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    events.where(
        f"unix_micros(cast(ts as timestamp)) <= {int(cut)}"
    ).write.parquet(src)
    drain()
    events.where(
        f"unix_micros(cast(ts as timestamp)) > {int(cut)}"
    ).write.mode("append").parquet(src)
    got = drain()

    streamed = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in got.groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert streamed == batch

    # ROW-level idempotent re-delivery: append the SAME events again as
    # NEW files (the file source would skip identical committed files,
    # so a same-directory drain proves nothing about the guard) — every
    # re-delivered row sits at or before its user's stored (ts, eid)
    # mark and must be skipped by the ordered-after guard
    n_before = got.count()
    events.write.mode("append").parquet(src)
    assert drain().count() == n_before


def test_markov_stream_out_of_order_is_conservative(spark, sf_dir, tmp_path):
    """The documented no-retraction approximation pinned: delivering
    the LATE half of time first, then the early half, never crashes and
    never over-counts — the consumed per-user subsequence is increasing
    in (ts, event_id), so the emitted total is at most the batch total
    and every emitted pair is an ordered pair of the true sequence."""
    from oasysdb_spark.operators.temporal import event_markov_transitions
    from oasysdb_spark.streaming.ingest import markov_stream_transitions

    batch_total = sum(
        r["n_transitions"]
        for r in event_markov_transitions(spark, sf_dir).collect()
    )
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    cut = events.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.5) p"
    ).first()["p"]

    src = str(tmp_path / "mo_src")
    out = str(tmp_path / "mo_out")
    ckpt = str(tmp_path / "mo_ckpt")

    def drain():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            markov_stream_transitions(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    events.where(
        f"unix_micros(cast(ts as timestamp)) > {int(cut)}"
    ).write.parquet(src)
    drain()
    events.where(
        f"unix_micros(cast(ts as timestamp)) <= {int(cut)}"
    ).write.mode("append").parquet(src)
    got = drain()

    from pyspark.sql import Window

    total = got.count()
    assert 0 < total <= batch_total
    # REAL chain pin (not ts-monotonicity, which any ts-ordered window
    # yields by construction): ordering each user's emissions by the
    # consumed successor's (ts, event_id), every row's prev_type must
    # equal the PREVIOUS row's next_type — the consumed subsequence is
    # one path, so the emitted log must chain link-by-link
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bad = (
        got.withColumn("link", F.lag("next_type").over(w))
        .where(F.col("link").isNotNull()
               & (F.col("link") != F.col("prev_type")))
        .count()
    )
    assert bad == 0


def test_markov_stream_same_ts_group_split_across_batches(spark, tmp_path):
    """The batch-boundary tie edge: a user's same-TIMESTAMP event group
    split across two delivery phases. The stored mark is the full
    (ts, event_id) tuple, so phase 2's events at ts == mark but larger
    event_id MUST still be consumed — a ts-only guard would drop them
    and silently lose transitions. Chain: a@t1, then b,c (same t2) in
    phase 1; d (ALSO t2, higher eid) + e@t3 in phase 2 → the full
    a→b→c→d→e path."""
    import datetime as dt

    from oasysdb_spark.streaming.ingest import markov_stream_transitions

    t1 = dt.datetime(2024, 5, 1, 0, 0, 0)
    t2 = dt.datetime(2024, 5, 1, 0, 1, 0)
    t3 = dt.datetime(2024, 5, 1, 0, 2, 0)
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    src = str(tmp_path / "tie_src")
    out = str(tmp_path / "tie_out")
    ckpt = str(tmp_path / "tie_ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            markov_stream_transitions(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    spark.createDataFrame(
        [(1, t1, 7, "a", 0.0, "{}"), (2, t2, 7, "b", 0.0, "{}"),
         (3, t2, 7, "c", 0.0, "{}")],
        schema,
    ).write.parquet(src)
    drain()
    spark.createDataFrame(
        [(4, t2, 7, "d", 0.0, "{}"), (5, t3, 7, "e", 0.0, "{}")],
        schema,
    ).write.mode("append").parquet(src)
    got = sorted(
        (r["prev_type"], r["next_type"], r["event_id"])
        for r in drain().collect()
    )
    assert got == [("a", "b", 2), ("b", "c", 3), ("c", "d", 4),
                   ("d", "e", 5)]
