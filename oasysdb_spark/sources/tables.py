"""Fixture-table loaders.

``events.parquet`` stores its timestamp as parquet TIMESTAMP(NANOS), which
Spark's vectorized reader refuses by default. We flip the documented
escape hatch (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a
microsecond timestamp column with integer division — DuckDB performs the
same nanos→micros truncation when it reads the file, so both engines see
identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANO_TS_TABLES = {"events": "ts"}


_READ_MEMO: dict = {}


def read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    """Memoized ``spark.read.parquet``: every call re-infers the schema
    from parquet footers, ~90-115 ms of driver time (r15 gap profiling
    — the q-series queries load 5-6 tables each, so this was the single
    largest per-query driver cost in the bench). DataFrames are
    immutable and reusable within a SparkContext, so the loaded frame
    is memoized per (application id, mtime_ns+size file signature): a
    rewritten or appended path changes the signature and re-reads;
    non-local paths skip memoization. This caches a PLAN, never data —
    every action over the frame still scans the parquet inputs."""
    sig = _local_files_sig(path)
    if sig is None:
        return spark.read.parquet(path)
    # keyed by the SESSION object, not the applicationId (r15 review: a
    # newSession() shares the appId but carries its own confs, and a
    # frame is bound to the session that created it), and by abspath
    # with the signature stored in the VALUE — a rewritten path
    # replaces its entry instead of accumulating one per version.
    key = (spark, sig[0])
    hit = _READ_MEMO.get(key)
    if hit is not None and hit[0] == sig:
        return hit[1]
    df = spark.read.parquet(path)
    _READ_MEMO[key] = (sig, df)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Date extraction/rendering must agree with the DuckDB oracle (which is
    # timezone-naive); pin the session to UTC regardless of who built it.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ts_col = NANO_TS_TABLES.get(name)
    if ts_col is None:
        return read_parquet_cached(spark, f"{sf_dir}/{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = read_parquet_cached(spark, f"{sf_dir}/{name}.parquet")
    if dict(df.dtypes).get(ts_col) == "bigint":
        df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    return df


_SPREAD_MEMO: dict = {}


def _local_files_sig(path: str):
    """mtime_ns+size signature of a local parquet file/dir, or None
    (non-local/unreadable → memoization disabled). Directories are
    walked RECURSIVELY (r15 review: a partitioned layout's leaf rewrite
    updates only the leaf directory's mtime, so a top-level-only scan
    would return a stale signature and serve a memoized frame over a
    changed dataset)."""
    import os

    try:
        if os.path.isfile(path):
            st = os.stat(path)
            return (os.path.abspath(path), st.st_mtime_ns, st.st_size)
        if os.path.isdir(path):
            entries = []
            for root, _dirs, files in os.walk(path):
                rel = os.path.relpath(root, path)
                for name in files:
                    st = os.stat(os.path.join(root, name))
                    entries.append((rel, name, st.st_mtime_ns, st.st_size))
            return (os.path.abspath(path), tuple(sorted(entries)))
    except OSError:
        return None
    return None


def spread_scan(
    spark: SparkSession, df: DataFrame, key_path: "str | None" = None
) -> DataFrame:
    """Scale-adaptive parallelism for compute-heavy row-local stages
    (r15, guide §2.5 "input skew"): when a scan plans FEWER input splits
    than the session's parallelism (the local fixtures are single small
    parquet files → one task → every per-row expression/UDF runs
    serially), round-robin repartition to the default parallelism so the
    expensive per-row work uses every core. On a real corpus the file
    count/split size already provides the parallelism, the condition is
    false, and NO exchange is added — the 100 TB plan is unchanged (an
    unconditional repartition here would be a full shuffle of the raw
    payload, the exact anti-pattern the no-text-exchange plan pins
    exist to catch).

    Only use under a row-local compute stage whose cost dominates one
    extra small-input exchange; never on a path whose plan contract
    forbids payload-bearing exchanges outright.

    ``key_path``: the parquet path ``df`` is a plain scan/projection of.
    When given (and local), the split-count probe — a full
    analysis+planning pass via ``df.rdd``, ~40-70 ms of driver time per
    call (r15 review note) — is memoized per (file signature,
    parallelism): split planning depends only on the files, the reader
    confs and the session parallelism, never on the projected columns
    or pushed filters, so every projection of the same files shares one
    probe. The mtime_ns+size signature makes a rewritten path miss."""
    par = spark.sparkContext.defaultParallelism
    memo_key = None
    sig = None
    if key_path is not None:
        sig = _local_files_sig(key_path)
        if sig is not None:
            # abspath-keyed with the signature in the value (r15
            # review): a rewritten path replaces its entry rather than
            # growing the memo one entry per version
            memo_key = (sig[0], par)
            hit = _SPREAD_MEMO.get(memo_key)
            if hit is not None and hit[0] == sig:
                n = hit[1]
                return df.repartition(par) if n < par else df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if memo_key is not None:
        _SPREAD_MEMO[memo_key] = (sig, n)
    if n < par:
        return df.repartition(par)
    return df


FORMATS = ("parquet", "csv", "json", "orc")


def write_table_as(df: DataFrame, path: str, fmt: str) -> None:
    """Write a table copy in another format (connector parity helper)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode("overwrite")
    if fmt in ("csv", "json"):
        # ISO-8601 micros: both text writers default to millisecond
        # precision and would silently truncate event timestamps. NTZ
        # columns (what parquet micros now load as) use the separate
        # timestampNTZFormat option — set both.
        w = w.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        w = w.option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    if fmt == "csv":
        w = w.option("header", "true")
    getattr(w, fmt)(path)


def load_table_format(spark: SparkSession, path: str, fmt: str, schema=None) -> DataFrame:
    """Read a table in any supported format. Text formats (csv/json) take
    the authoritative schema explicitly — inference is both slow (extra
    pass) and lossy (ints vs longs, timestamp parsing), so at scale you
    always pass the schema."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt in ("csv", "json"):
        r = r.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        r = r.option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    if fmt == "csv":
        r = r.option("header", "true")
    return getattr(r, fmt)(path)


ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_tables(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every fixture table as a temp view so the whole engine
    surface is reachable from ``spark.sql(...)`` — the same declarative
    plans Catalyst builds for the DataFrame API, just SQL-authored.
    Returns the registered view names."""
    names = []
    for t in ALL_TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
