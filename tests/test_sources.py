"""Connector parity: the engine is format-agnostic — any table read
through csv/json/orc yields the same rows and the same query results as
the parquet original (SURVEY.md §2.2: Spark's readers come for free; these
tests make the claim concrete)."""

import pytest
from pyspark.sql import functions as F

from oasysdb_spark.sources.tables import load_table, load_table_format, write_table_as


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_lineitem_roundtrip(spark, sf_dir, tmp_path, fmt):
    orig = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / f"lineitem_{fmt}")
    write_table_as(orig, path, fmt)
    back = load_table_format(spark, path, fmt, schema=orig.schema)
    assert back.schema == orig.schema
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_events_timestamps_roundtrip(spark, sf_dir, tmp_path, fmt):
    """events has microsecond timestamps — the text formats must not
    truncate them."""
    orig = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    path = str(tmp_path / f"events_{fmt}")
    write_table_as(orig, path, fmt)
    back = load_table_format(spark, path, fmt, schema=orig.schema)
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


def test_query_results_format_agnostic(spark, sf_dir, tmp_path):
    """A real aggregation over the CSV copy equals the parquet answer."""
    orig = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_csv")
    write_table_as(orig, path, "csv")
    back = load_table_format(spark, path, "csv", schema=orig.schema)

    def agg(df):
        return sorted(
            (r["o_orderstatus"], r["n"], r["total"])
            for r in df.groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
            .collect()
        )

    assert agg(orig) == agg(back)


def test_unsupported_format_raises(spark, sf_dir, tmp_path):
    orig = load_table(spark, sf_dir, "region")
    with pytest.raises(ValueError, match="unsupported format"):
        write_table_as(orig, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError, match="unsupported format"):
        load_table_format(spark, str(tmp_path / "x"), "xml")


def test_versioned_table_time_travel_and_compaction(spark, tmp_path):
    """Micro-batch appends pile up small files; compact() rewrites the
    current version into few files behind the atomic pointer swap, and
    retained historical versions stay readable (VERSION AS OF)."""
    import os

    from pyspark.sql import functions as F

    from oasysdb_spark.core.tables import VersionedTable

    t = VersionedTable(str(tmp_path / "vt"))
    t.write(spark.range(0, 100).withColumn("v", F.col("id") * 2))
    v1 = t.current_version()
    for i in range(5):  # five appended micro-batches -> many small files
        t.append(spark.range(100 + i * 10, 110 + i * 10).withColumn("v", F.col("id") * 2))
    files_before = [
        f for f in os.listdir(t.current_path()) if f.endswith(".parquet")
    ]
    assert len(files_before) > 4

    v2 = t.compact(spark, target_partitions=1)
    assert t.current_version() == v2
    files_after = [
        f for f in os.listdir(t.current_path()) if f.endswith(".parquet")
    ]
    assert len(files_after) == 1
    assert t.read(spark).count() == 150
    # the row multiset survives compaction
    assert t.read(spark).agg(F.sum("v")).first()[0] == sum(2 * i for i in range(150))

    # time travel: v1 (pre-compaction, incl. its appends) is still retained
    assert v1 in t.versions()
    assert t.read_version(spark, v1).count() == 150  # appends went into v1
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t.read_version(spark, "v999999")


def test_register_tables_sql_surface(spark, sf_dir):
    """spark.sql over the registered views produces the same results as
    the DataFrame-built operator (same Catalyst plans, SQL-authored)."""
    from oasysdb_spark.operators import relational as rel
    from oasysdb_spark.sources.tables import ALL_TABLES, register_tables

    names = register_tables(spark, sf_dir)
    assert names == list(ALL_TABLES)
    assert spark.sql("SELECT count(*) n FROM lineitem").first()["n"] > 0

    got = {
        (r["l_returnflag"], r["l_linestatus"]): r["count_order"]
        for r in spark.sql(
            """SELECT l_returnflag, l_linestatus, count(*) AS count_order
               FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
               GROUP BY l_returnflag, l_linestatus"""
        ).collect()
    }
    want = {
        (r["l_returnflag"], r["l_linestatus"]): r["count_order"]
        for r in rel.q1_pricing_summary(spark, sf_dir).collect()
    }
    assert got == want


def test_append_rejects_schema_mismatch(spark, tmp_path):
    """A wrong-schema append must fail BEFORE any file lands (it would
    silently poison the live version directory otherwise)."""
    from pyspark.sql import functions as F

    from oasysdb_spark.core.tables import VersionedTable

    t = VersionedTable(str(tmp_path / "vt2"))
    t.write(spark.range(5).withColumn("v", F.col("id").cast("double")))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(spark.range(5).withColumn("v", F.lit("oops")))
    # matching schema still appends, in any column order
    t.append(
        spark.range(5, 8)
        .withColumn("v", F.col("id").cast("double"))
        .select("v", "id")
    )
    assert t.read(spark).count() == 8
