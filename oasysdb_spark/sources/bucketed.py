"""Bucketed managed tables: the co-located fact⋈fact join path.

The reference never joins two large collections (its only join-like op is
one query vector against probed clusters, /root/reference/src/cores/
index.rs:182-211), but at 100 TB the repeated lineitem⋈orders shuffle is
the dominant cost of the relational surface. Bucketing both facts by the
join key at write time (``bucketBy`` + ``sortBy`` into managed parquet
tables) lets every subsequent equi-join on that key run with ZERO
exchanges — each task sort-merges one matching bucket pair. One shuffle
paid once at load time, amortized over every downstream join.

Bucket counts must match on both sides (Spark joins b and k·b buckets
only with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``); pick a
count that keeps each bucket << executor memory at the target SF.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from oasysdb_spark.sources.tables import load_table

_BUCKETED: set[tuple[str, str]] = set()


def bucketed_table_name(sf_dir: str, table: str) -> str:
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    return f"bkt_{sf_tag}_{table}"


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
) -> str:
    """Write ``table`` as a managed parquet table bucketed+sorted by
    ``bucket_col`` (idempotent per process; reuses an existing table)."""
    name = bucketed_table_name(sf_dir, table)
    key = (name, bucket_col)
    if key in _BUCKETED:
        return name
    if not spark.catalog.tableExists(name):
        # the in-memory catalog dies with the process but the warehouse
        # directory survives — clear a stale location or saveAsTable
        # fails with LOCATION_ALREADY_EXISTS
        import shutil

        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        stale = f"{warehouse}/{name}"
        if os.path.exists(stale):
            shutil.rmtree(stale)
        (
            load_table(spark, sf_dir, table)
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(num_buckets, bucket_col)
            .sortBy(bucket_col)
            .saveAsTable(name)
        )
    _BUCKETED.add(key)
    return name


def bucketed_join(
    spark: SparkSession,
    sf_dir: str,
    left: str,
    right: str,
    left_key: str,
    right_key: str,
    num_buckets: int = 8,
) -> DataFrame:
    """Equi-join two fixture tables through their bucketed twins — plans
    as a SortMergeJoin with no Exchange on either side."""
    lname = ensure_bucketed(spark, sf_dir, left, left_key, num_buckets)
    rname = ensure_bucketed(spark, sf_dir, right, right_key, num_buckets)
    ldf = spark.table(lname)
    rdf = spark.table(rname)
    return ldf.join(rdf, ldf[left_key] == rdf[right_key])
