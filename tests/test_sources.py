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
