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


def test_misra_gries_capture_guarantee():
    """Pure-sketch property: on a skewed synthetic stream, every item
    with frequency > n/k is present after the pass AND after a merge of
    two half-stream sketches; estimates never exceed truth."""
    import random

    from collections import Counter

    from oasysdb_spark.functions.stats import misra_gries_merge, misra_gries_update

    rng = random.Random(7)
    # zipf-ish: item i appears ~ 1/(i+1)
    stream = [f"w{i}" for i in range(50) for _ in range(1000 // (i + 1))]
    rng.shuffle(stream)
    n = len(stream)
    truth = Counter(stream)
    k = 16

    whole: dict = {}
    for x in stream:
        misra_gries_update(whole, x, k)
    half_a: dict = {}
    half_b: dict = {}
    for x in stream[: n // 2]:
        misra_gries_update(half_a, x, k)
    for x in stream[n // 2 :]:
        misra_gries_update(half_b, x, k)
    merged = misra_gries_merge(half_a, half_b)

    for sk in (whole, merged):
        assert len(sk) <= 2 * k  # merged may hold up to 2k entries
        for item, f in truth.items():
            if f > n / k:
                assert item in sk
        for item, est in sk.items():
            assert est <= truth[item]


def test_heavy_hitter_terms_equals_exact(spark, sf_dir):
    """The sketch prune must not change the answer: heavy_hitter_terms
    == the exact GROUP BY ... HAVING computation, at more than one
    threshold, and under a repartitioned (multi-sketch) input."""
    from pyspark.sql import functions as F

    from oasysdb_spark.functions.text import tokens
    from oasysdb_spark.operators import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    n = terms.count()

    for denom in (32, 64):
        got = [
            (r["term"], r["tf"])
            for r in textops.heavy_hitter_terms(spark, sf_dir, share_denom=denom).collect()
        ]
        exact = (
            terms.groupBy("term")
            .agg(F.count("*").alias("tf"))
            .where(F.col("tf") * denom > n)
            .orderBy(F.col("tf").desc(), "term")
            .collect()
        )
        assert got == [(r["term"], r["tf"]) for r in exact]
        assert got  # non-degenerate on the fixture
