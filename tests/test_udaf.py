"""UDAF surface: GROUPED_AGG pandas UDFs cross-validated against their
native expression twins (the scale path — partial-aggregatable, codegen).
The reference has no user-extensible functions (closed metric enum,
/root/reference/src/types/metric.rs:19-22); this is the §2.5 'UDF/UDAF'
extension row."""

import pytest
from pyspark.sql import functions as F

from oasysdb_spark.functions import stats


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    from oasysdb_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "lineitem")


def _by_flag(df, expr_col):
    # Spark disallows mixing GROUPED_AGG pandas UDFs with non-pandas
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so each
    # side aggregates separately and we compare by group key.
    rows = df.groupBy("l_returnflag").agg(expr_col.alias("v")).collect()
    return {r["l_returnflag"]: r["v"] for r in rows}


def test_geomean_udaf_matches_native(li):
    udaf = _by_flag(li, stats.geomean_udaf("l_extendedprice"))
    native = _by_flag(li, stats.geomean_expr("l_extendedprice"))
    assert len(udaf) >= 2 and udaf.keys() == native.keys()
    for k in udaf:
        assert udaf[k] == pytest.approx(native[k], rel=1e-9)


def test_harmonic_mean_udaf_matches_native(li):
    udaf = _by_flag(li, stats.harmonic_mean_udaf("l_quantity"))
    native = _by_flag(li, stats.harmonic_mean_expr("l_quantity"))
    assert udaf.keys() == native.keys()
    for k in udaf:
        assert udaf[k] == pytest.approx(native[k], rel=1e-9)


def test_native_twin_partial_aggregates(spark, li):
    """The expression twin must plan as partial+final HashAggregate (the
    UDAF plans as a single non-partial AggregateInPandas — group-in-memory)."""
    plan = (
        li.groupBy("l_returnflag")
        .agg(stats.geomean_expr("l_extendedprice").alias("g"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_" in plan
