"""Single-shot pin release (r16): the audit queries that eagerly pin a
key/vocab-bounded intermediate (localCheckpoint) must not leave its
executor blocks behind once the caller has consumed and dropped the
result — a long-lived serving session issuing thousands of audit calls
would otherwise accumulate pinned blocks until nondeterministic
GC/ContextCleaner cleanup."""

import gc

import pytest


def _persistent_rdd_ids(spark):
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


@pytest.mark.parametrize(
    "call",
    [
        lambda sp, sf: __import__(
            "oasysdb_spark.operators.relational", fromlist=["x"]
        ).join_key_skew_stats(sp, sf),
        lambda sp, sf: __import__(
            "oasysdb_spark.operators.relational", fromlist=["x"]
        ).skew_salted_user_join(sp, sf),
        lambda sp, sf: __import__(
            "oasysdb_spark.operators.relational", fromlist=["x"]
        ).q11_important_parts(sp, sf),
        lambda sp, sf: __import__(
            "oasysdb_spark.operators.textops", fromlist=["x"]
        ).term_pmi_collocations(sp, sf),
        lambda sp, sf: __import__(
            "oasysdb_spark.operators.textops", fromlist=["x"]
        ).source_token_divergence(sp, sf),
        lambda sp, sf: __import__(
            "oasysdb_spark.operators.textops", fromlist=["x"]
        ).source_length_drift(sp, sf),
        lambda sp, sf: __import__(
            "oasysdb_spark.operators.textops", fromlist=["x"]
        ).source_vocab_overlap_matrix(sp, sf),
        lambda sp, sf: __import__(
            "oasysdb_spark.operators.textops", fromlist=["x"]
        ).domain_mixture_sample(sp, sf),
    ],
    ids=[
        "join_key_skew_stats",
        "skew_salted_user_join",
        "q11_important_parts",
        "term_pmi_collocations",
        "source_token_divergence",
        "source_length_drift",
        "source_vocab_overlap_matrix",
        "domain_mixture_sample",
    ],
)
def test_single_shot_pins_release_on_result_gc(spark, sf_dir, call):
    before = _persistent_rdd_ids(spark)
    df = call(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    pinned = _persistent_rdd_ids(spark) - before
    assert pinned, "expected the query to pin at least one frame"
    del df
    gc.collect()
    leaked = (_persistent_rdd_ids(spark) - before) & pinned
    assert not leaked, f"pinned blocks survived result GC: {leaked}"


def test_release_pins_with_keeps_pin_alive_while_result_lives(spark):
    """The pin must stay readable while the result is referenced — the
    finalizer fires on result GC, never earlier."""
    from pyspark.sql import functions as F

    from oasysdb_spark.session import release_pins_with

    before = _persistent_rdd_ids(spark)
    pin = spark.range(0, 10).localCheckpoint(eager=True)
    pinned = _persistent_rdd_ids(spark) - before
    assert pinned
    res = release_pins_with(pin.agg(F.sum("id").alias("s")), pin)
    del pin
    gc.collect()  # result still referenced: pin must survive
    assert res.first()["s"] == 45
    del res
    gc.collect()
    assert not (_persistent_rdd_ids(spark) & pinned), "pin outlived result"
