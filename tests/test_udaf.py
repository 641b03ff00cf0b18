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


def test_shingle_udtf_matches_native_twin(spark, sf_dir):
    """UDTF surface: the Python row-generator must emit exactly the
    (doc_id, pos, shingle) rows of the codegen'd posexplode twin."""
    from oasysdb_spark.functions import text as T
    from oasysdb_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("shingles_udtf", T.shingle_udtf())
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT doc_id, s.pos, s.shingle FROM udtf_docs, "
            "LATERAL shingles_udtf(text) s"
        ).collect()
    )
    native = sorted(
        tuple(r)
        for r in docs.select(
            "doc_id",
            F.posexplode(T.word_shingles(T.tokens("text"), 3)).alias("pos", "shingle"),
        ).collect()
    )
    assert got == native and len(got) > 100
