"""Multimodal columns: images/audio/video as opaque ``binary`` columns with
typed metadata, processed through Arrow-batched ``mapInPandas`` pipelines.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested; the codec step is STUBBED because no
image/audio libraries ship in this container:

- :func:`decode_image` raises NotImplementedError (the integration point
  where PIL/libvips/ffmpeg would plug in), and
- :func:`fake_decode_stats` is the deterministic stand-in used by tests
  and pipelines: byte-level statistics standing in for pixel statistics.

At scale the pattern matters more than the codec: media bytes stay in
executor-side Arrow batches end-to-end (never driver-side), batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition
of large blobs can't OOM an executor, and derived features land in plain
columns where every downstream operator (dedup, ANN, filters) applies.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType(), False),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_std", T.DoubleType(), False),
        T.StructField("entropy8", T.DoubleType(), False),
    ]
)


def decode_image(content: bytes) -> "object":
    """Real codec integration point — intentionally unimplemented here
    (no imaging libraries in this environment). Replace with PIL/libvips."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use fake_decode_stats for the pipeline plumbing"
    )


def fake_decode_stats(content: bytes) -> tuple[int, float, float, float]:
    """Deterministic stand-in for decode + feature extraction: byte count,
    mean, std, and order-0 byte entropy."""
    import math

    import numpy as np

    arr = np.frombuffer(content, dtype=np.uint8)
    if arr.size == 0:
        return 0, 0.0, 0.0, 0.0
    counts = np.bincount(arr, minlength=256)
    p = counts[counts > 0] / arr.size
    entropy = float(-(p * np.log2(p)).sum())
    return int(arr.size), float(arr.mean()), float(arr.std()), entropy


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media content.

    ``mapInPandas`` streams partition-local Arrow batches through Python;
    blobs never aggregate on the driver and the output is a narrow typed
    feature table suitable for joins/dedup downstream.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                n, mean, std, ent = fake_decode_stats(bytes(content))
                media_type = meta["media_type"] if isinstance(meta, dict) else meta[0]
                rows.append((int(media_id), media_type, n, round(mean, 6), round(std, 6), round(ent, 6)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "media_type", "n_bytes", "byte_mean", "byte_std", "entropy8"],
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode per-media frame indices
    (0, n, 2n, …) from metadata — the real pipeline would decode those
    frames via the codec stub; here the schedule itself is the output."""
    frames = F.filter(
        F.sequence(F.lit(0), F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1),
        lambda i: i % every_n == 0,
    )
    return media.select(
        "media_id",
        F.explode(frames).alias("frame_index"),
    )


def synthesize_media_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministic fake media table built from the documents fixture
    (utf-8 text bytes standing in for encoded media) — gives the
    multimodal pipeline a reproducible input in any environment."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.col("n_chars") % 100 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def multimodal_features(spark, sf_dir: str) -> DataFrame:
    """Oracle-checkable end-to-end multimodal pipeline: synthesize media →
    Arrow-batched feature extraction → frame-sample schedule, joined into
    one narrow table. byte_std/entropy8 are computed but excluded from
    this surface — their float formulas differ across engines at ulp level
    and would make the hash-compare flaky; byte_mean is an exact integer
    sum divided once, identical everywhere."""
    media = synthesize_media_from_documents(spark, sf_dir)
    feats = extract_features(media).select(
        "media_id", "media_type", "n_bytes", "byte_mean"
    )
    frames = frame_sample(media).groupBy("media_id").agg(
        F.count("*").cast("bigint").alias("n_sampled_frames")
    )
    return feats.join(frames, "media_id").select(
        F.col("media_id").cast("bigint").alias("media_id"),
        "media_type",
        "n_bytes",
        "byte_mean",
        "n_sampled_frames",
    )
