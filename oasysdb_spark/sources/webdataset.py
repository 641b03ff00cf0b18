"""WebDataset-style tar shard sink + source for multimodal training data.

The format the large-scale multimodal training stacks actually consume
(WebDataset — Breuel et al., public spec at webdataset.github.io; used
by OpenCLIP/LAION pipelines): samples live in plain POSIX tar files,
one member per field named ``{key}.{ext}``, consecutive members with
the same key form one sample, and a dataset is a directory of
``shard-%05d.tar`` files read sequentially. Tar-of-shards beats
row-per-file object storage at 100 TB because readers stream whole
shards (one seek per shard, not per sample) and shards are the unit of
shuffling, checkpointing, and parallelism.

Sink (``write_webdataset_shards``): samples hash-assign to shards by
key (``hash64(key) % n_shards`` — deterministic, no global sort), each
shard's members sort by key inside ONE Arrow task that streams the tar
to disk (``applyInPandas`` per shard group), and the returned manifest
is read back from the WRITTEN files, not from the writer's bookkeeping.
Per-task memory is ONE SHARD's samples (the applyInPandas group) —
the scale lever is ``n_shards``: size it so a shard lands at the
format's conventional ~1 GB (WebDataset ships corpora as tens of
thousands of shards), and the uniform 64-bit key hash keeps shard
sizes even. The tar write itself streams sample by sample.

Source (``read_webdataset``): ``binaryFile`` one-tar-per-task (the
corpus.py WET pattern — archive bytes never transit the driver), stdlib
``tarfile`` parse executor-side, consecutive-key grouping into samples;
a truncated/garbage tar degrades to a per-file ``n_malformed`` count
instead of failing the task.

Reference parity note: the reference engine has no multimodal shard
sink (its persistence is the bincode snapshot, /root/reference/src/
cores/database.rs) — this module is part of the north-star extension
surface (multimodal training-data pipeline).
"""

from __future__ import annotations

import io
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oasysdb_spark.errors import InvalidArgumentError
from oasysdb_spark.functions.hashing import hash64


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str = "doc_id",
    n_shards: int = 8,
    text_cols: "tuple[str, ...]" = ("text",),
    binary_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Write ``df`` as WebDataset tar shards under ``out_dir``; returns
    the manifest DataFrame ``(shard, path, n_samples, n_members,
    tar_bytes)`` read back from the written files. ``text_cols`` become
    ``{key}.{col}.txt`` members (UTF-8), ``binary_cols`` become
    ``{key}.{col}.bin``; nulls skip the member but keep the sample.
    Deterministic end to end: shard by ``hash64(key)``, members sorted
    by (key, field), fixed mtime/uid so byte-identical reruns produce
    byte-identical tars. ``out_dir`` must be a filesystem every
    executor can reach (shared FS / fuse mount on a cluster — the same
    contract as the snapshot store)."""
    import os

    if not text_cols and not binary_cols:
        raise InvalidArgumentError(
            "write_webdataset_shards needs at least one text or binary column"
        )
    for c in (key_col, *text_cols, *binary_cols):
        if c not in df.columns:
            raise InvalidArgumentError(f"column {c!r} not in frame")
    os.makedirs(out_dir, exist_ok=True)

    cols = [key_col, *text_cols, *binary_cols]
    keyed = df.select(
        (hash64(F.col(key_col).cast("string"), salt="wds") % n_shards)
        .cast("int")
        .alias("__shard"),
        *[F.col(c) for c in cols],
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        pdf = pdf.sort_values(key_col, kind="mergesort")
        n_members = 0
        tmp = path + ".inprogress"
        with tarfile.open(tmp, "w") as tf:
            for _, row in pdf.iterrows():
                key = str(row[key_col])
                for c in text_cols:
                    v = row[c]
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        continue
                    data = str(v).encode("utf-8")
                    info = tarfile.TarInfo(name=f"{key}.{c}.txt")
                    info.size = len(data)
                    info.mtime = 0  # fixed: reruns are byte-identical
                    tf.addfile(info, io.BytesIO(data))
                    n_members += 1
                for c in binary_cols:
                    v = row[c]
                    if v is None:
                        continue
                    data = bytes(v)
                    info = tarfile.TarInfo(name=f"{key}.{c}.bin")
                    info.size = len(data)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(data))
                    n_members += 1
        os.replace(tmp, path)  # atomic publish, same as the snapshot rule
        return pd.DataFrame(
            {
                "shard": [shard],
                "path": [path],
                "n_samples": [len(pdf)],
                "n_members": [n_members],
            }
        )

    spark = df.sparkSession
    written = keyed.groupBy("__shard").applyInPandas(
        write_shard,
        schema="shard int, path string, n_samples bigint, n_members bigint",
    )
    # manifest from the WRITTEN artifacts (independent lineage): join the
    # writer's counts with each tar's on-disk size
    rows = written.collect()
    sizes = [
        (r["shard"], r["path"], r["n_samples"], r["n_members"],
         int(os.stat(r["path"]).st_size))
        for r in rows
    ]
    return spark.createDataFrame(
        sizes,
        "shard int, path string, n_samples bigint, n_members bigint, tar_bytes bigint",
    )


WDS_SCHEMA = (
    "shard_path string, key string, field string, data binary, "
    "n_malformed int"
)


def _wds_map(batches):
    """Shared Arrow parse transform (batch AND streaming read use this
    one function, so the two modes can never parse differently — the
    corpus.py rule)."""
    for pdf in batches:
        out = []
        for p, content in zip(pdf["path"], pdf["content"]):
            file_rows = []  # buffered: a tar is published whole or not at all
            try:
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        name = m.name
                        key, _, field = name.partition(".")
                        data = tf.extractfile(m).read()
                        file_rows.append((p, key, field, data, 0))
            except (tarfile.TarError, EOFError, OSError):
                # a tar that fails MID-parse contributes ONLY its
                # quarantine row — already-parsed members are discarded
                # (a truncated final payload would otherwise pass every
                # n_malformed = 0 filter as a silently-partial sample)
                out.append((p, None, None, None, 1))
                continue
            out.extend(file_rows)
        yield pd.DataFrame(
            out,
            columns=["shard_path", "key", "field", "data", "n_malformed"],
        )


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of WebDataset tar shards: one tar per task via
    ``binaryFile``, stdlib parse executor-side. Returns one row per
    MEMBER ``(shard_path, key, field, data binary, n_malformed)`` —
    group by (shard_path, key) downstream to assemble samples; a
    corrupt tar yields a single row with ``key IS NULL`` and
    ``n_malformed = 1`` (the WET quarantine pattern)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(_wds_map, WDS_SCHEMA)


def stream_webdataset(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming twin of :func:`read_webdataset` for a shard directory
    that GROWS (the delivery shape of a crawling/encoding pipeline that
    lands one tar at a time): ``binaryFile`` readStream with an
    explicit schema through the SAME parse transform; file-source
    offsets make restarts exactly-once per tar."""
    from oasysdb_spark.sources.corpus import _BINARY_FILE_SCHEMA

    reader = spark.readStream.format("binaryFile").schema(_BINARY_FILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    reader = reader.option("pathGlobFilter", "*.tar")
    reader = reader.option("recursiveFileLookup", "true")
    blobs = reader.load(path).select("path", "content")
    return blobs.mapInPandas(_wds_map, WDS_SCHEMA)
