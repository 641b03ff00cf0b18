"""Web-corpus ingestion front-ends: JSONL(.gz) and WARC/WET.

The two formats an LLM training corpus actually arrives in:

- **JSONL** (one JSON document per line, optionally gzipped) —
  ``read_jsonl_corpus`` wraps Spark's native json reader with an
  explicit schema (no sampling-based inference pass over 100 TB) and
  PERMISSIVE corrupt-line capture, splitting the result into a clean
  frame and a quarantine frame instead of silently dropping or
  poisoning rows. Spark decompresses ``.gz`` transparently; gzip is
  non-splittable, so at scale the corpus must be many files — each
  file is one task either way, and that is the parallelism unit.

- **WARC/WET** (Common-Crawl-style text extracts) —
  ``read_wet_corpus`` reads whole files via ``binaryFile`` and parses
  records executor-side in an Arrow ``mapInPandas``: raw archive bytes
  never transit the driver, one file per task (the same unit Common
  Crawl shards by: ~150 MB per WET file). The parser is pure stdlib —
  multi-member gzip via repeated ``zlib`` decompressobj, then
  ``WARC/1.0`` record framing with Content-Length honored exactly;
  malformed trailing bytes degrade to a per-file ``n_malformed`` count
  rather than failing the task (lossy web archives are normal).

Both produce frames shaped like the ``documents`` fixture table so the
whole dedup/quality/tokenizer tier composes directly on top.
"""

from __future__ import annotations

import io
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

JSONL_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = JSONL_CORPUS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """JSONL(.gz) → (clean_df, quarantine_df).

    The explicit schema skips Spark's inference pass (a full extra read
    at corpus scale). PERMISSIVE mode lands unparseable lines in
    ``_corrupt_record``; the quarantine frame carries the raw line so a
    cleanup job can reprocess it. A line that parses but misses every
    schema field (all-null row) is quarantined too — that is how a
    schema drift (renamed keys) shows up, and silently emitting
    all-null docs would poison every downstream operator."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return _split_corrupt(raw, schema)


def _split_corrupt(raw: DataFrame, schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    """The clean/quarantine routing shared by the batch and streaming
    jsonl readers — one definition, so the two ingest modes can never
    disagree on what counts as corrupt."""
    data_cols = [f.name for f in schema.fields]
    all_null = F.expr(" AND ".join(f"{c} IS NULL" for c in data_cols))
    bad = F.col(_CORRUPT).isNotNull() | all_null
    clean = raw.where(~bad).select(*data_cols)
    quarantine = raw.where(bad)
    return clean, quarantine


def stream_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = JSONL_CORPUS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of :func:`read_jsonl_corpus`: a file-source
    ``readStream`` over a GROWING corpus directory with the identical
    clean/quarantine split (shared routing predicate). Returns two
    streaming frames; each started sink tracks file progress in its own
    checkpoint, so the clean and quarantine queries advance and recover
    independently — file-source offsets are the processed-file log, so
    a restart resumes exactly, never re-ingesting a file.
    ``max_files_per_trigger`` bounds micro-batch size on backfills."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    reader = (
        spark.readStream.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(path)
    return _split_corrupt(raw, schema)


def _iter_gzip_members(data: bytes) -> bytes:
    """Decompress possibly-multi-member gzip (Common Crawl WET files are
    per-record gzip members concatenated); plain bytes pass through."""
    if not data.startswith(b"\x1f\x8b"):
        return data
    out = io.BytesIO()
    rest = data
    while rest.startswith(b"\x1f\x8b"):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.write(d.decompress(rest))
        except zlib.error:
            # a corrupt member must degrade to the malformed count, not
            # fail the task: keep whatever inflated cleanly so far — the
            # record parser will count the torn tail
            break
        rest = d.unused_data
    return out.getvalue()


def parse_wet_records(data: bytes) -> tuple[list[dict], int]:
    """Parse one WET file's bytes → (records, n_malformed).

    WARC framing: a ``WARC/1.0`` version line, header lines until a
    blank line, then exactly Content-Length payload bytes, then two
    CRLFs. Only ``WARC-Type: conversion`` records (the text extracts)
    are emitted; ``warcinfo`` headers are skipped. Anything that stops
    framing cleanly counts as malformed and parsing moves on."""
    data = _iter_gzip_members(data)
    records: list[dict] = []
    n_malformed = 0
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        # a record may be CRLF- or LF-framed: take whichever blank line
        # comes FIRST (searching for CRLFCRLF across the whole buffer
        # would swallow an LF-framed record whenever a later record is
        # CRLF-framed)
        crlf = data.find(b"\r\n\r\n", pos)
        lf = data.find(b"\n\n", pos)
        if crlf != -1 and (lf == -1 or crlf <= lf):
            head_end, sep = crlf, 4
        elif lf != -1:
            head_end, sep = lf, 2
        else:
            n_malformed += 1
            break
        head = data[pos:head_end].decode("utf-8", errors="replace")
        lines = head.splitlines()
        if not lines or not lines[0].startswith("WARC/"):
            n_malformed += 1
            # resync: jump to the next version line
            nxt = data.find(b"WARC/1.", head_end)
            if nxt == -1:
                break
            pos = nxt
            continue
        headers = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
            if length < 0:
                # negative slices would read from the file tail — and a
                # crafted value can stall pos entirely (infinite loop)
                raise ValueError("negative Content-Length")
        except ValueError:
            n_malformed += 1
            nxt = data.find(b"WARC/1.", head_end)
            if nxt == -1:
                break
            pos = nxt
            continue
        body_start = head_end + sep
        body_end = body_start + length
        if body_end > n:
            n_malformed += 1
            break
        if headers.get("warc-type") == "conversion":
            records.append(
                {
                    "record_id": headers.get("warc-record-id", ""),
                    "target_uri": headers.get("warc-target-uri", ""),
                    "warc_date": headers.get("warc-date", ""),
                    "n_bytes": length,
                    "text": data[body_start:body_end].decode(
                        "utf-8", errors="replace"
                    ),
                }
            )
        pos = body_end
    return records, n_malformed


WET_SCHEMA = (
    "file string, record_id string, target_uri string, warc_date string, "
    "n_bytes int, text string, n_malformed int"
)


def _wet_map(batches):
    """The blob → record-rows Arrow transform shared by the batch and
    streaming WET readers — one definition so the two modes parse
    identically."""
    for pdf in batches:
        out = []
        for fname, blob in zip(pdf["path"], pdf["content"]):
            recs, bad = parse_wet_records(bytes(blob))
            if not recs:
                out.append(
                    {
                        "file": fname,
                        "record_id": None,
                        "target_uri": None,
                        "warc_date": None,
                        "n_bytes": None,
                        "text": None,
                        "n_malformed": bad,
                    }
                )
            for r in recs:
                out.append({"file": fname, **r, "n_malformed": bad})
        yield pd.DataFrame(
            out,
            columns=[
                "file",
                "record_id",
                "target_uri",
                "warc_date",
                "n_bytes",
                "text",
                "n_malformed",
            ],
        )


def read_wet_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Directory (or glob) of ``.warc.wet(.gz)`` files → one row per
    conversion record, plus the per-file ``n_malformed`` count repeated
    on each of the file's rows (a file that parses to zero records
    still emits one all-null marker row carrying its count, so wholly
    corrupt inputs are visible, not silently absent)."""
    blobs = spark.read.format("binaryFile").load(path).select("path", "content")
    return blobs.mapInPandas(_wet_map, WET_SCHEMA)


_BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def stream_wet_corpus(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming twin of :func:`read_wet_corpus` for a crawl directory
    that GROWS (the Common Crawl delivery shape — new WET files land per
    fetch): a ``binaryFile`` readStream (explicit schema — streaming
    file sources cannot infer) through the SAME Arrow parse transform,
    so the two modes can never parse differently. One file per task
    either way; file-source offsets make restarts exactly-once per
    file. Feed the output to a parquet sink and the batch text tier
    composes on the landed table."""
    reader = spark.readStream.format("binaryFile").schema(_BINARY_FILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    blobs = reader.load(path).select("path", "content")
    return blobs.mapInPandas(_wet_map, WET_SCHEMA)


def wet_to_documents(wet: DataFrame) -> DataFrame:
    """Shape a WET frame like the ``documents`` fixture table so the
    text tier composes directly: deterministic doc_id from the record
    id, source = registry/host bucket of the target URI."""
    from oasysdb_spark.functions.hashing import hash64

    recs = wet.where(F.col("record_id").isNotNull())
    return recs.select(
        hash64(F.col("record_id")).alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        # regexp_extract returns '' (never null) on no-match; (?i) keeps
        # mixed-case schemes (HTTPS://) from bucketing to ''
        F.regexp_extract("target_uri", r"(?i)^[a-z]+://([^/]+)", 1).alias(
            "source"
        ),
        F.length("text").cast("bigint").alias("n_chars"),
    )
