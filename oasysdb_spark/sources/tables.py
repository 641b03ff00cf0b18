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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Date extraction/rendering must agree with the DuckDB oracle (which is
    # timezone-naive); pin the session to UTC regardless of who built it.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ts_col = NANO_TS_TABLES.get(name)
    if ts_col is None:
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if dict(df.dtypes).get(ts_col) == "bigint":
        df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    return df
