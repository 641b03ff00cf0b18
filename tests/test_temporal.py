"""Temporal operators: as-of join semantics, band join, window buckets.

The as-of join semantics mirror DuckDB's ``ASOF LEFT JOIN ... ON r.ts <=
l.ts`` (backward, ties match); the oracle gate cross-checks full-table
results, these tests pin the edge cases on tiny hand-built frames.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from oasysdb_spark.operators import temporal as tmp


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),   # tie with right at 10:00
            (1, _ts("2024-01-01 12:30:00"), "b"),   # latest-of-several wins
            (2, _ts("2024-01-01 09:00:00"), "c"),   # no right row at all
            (1, _ts("2024-01-01 09:59:59"), "d"),   # before every right row
        ],
        "k bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100),
            (1, _ts("2024-01-01 11:00:00"), 200),
            (1, _ts("2024-01-01 12:00:00"), 300),
        ],
        "k bigint, ts timestamp, payload bigint",
    )
    return left, right


def test_asof_join_backward_with_ties(spark, asof_frames):
    left, right = asof_frames
    out = tmp.asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", payload={"payload": "payload"}
    )
    got = {r["tag"]: r["payload"] for r in out.collect()}
    assert got == {"a": 100, "b": 300, "c": None, "d": None}


def test_asof_join_preserves_left_rowcount(spark, asof_frames):
    left, right = asof_frames
    out = tmp.asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", payload={"p": "payload"}
    )
    assert out.count() == left.count()
    assert out.columns == ["k", "ts", "tag", "p"]


def test_asof_join_rejects_colliding_payload_name(spark, asof_frames):
    left, right = asof_frames
    with pytest.raises(ValueError, match="collide"):
        tmp.asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", payload={"tag": "payload"}
        )


def test_asof_join_single_shuffle(spark, asof_frames):
    """Scale contract: the union+window formulation shuffles ONCE on the
    key — no join-explosion, no broadcast requirement on either side."""
    left, right = asof_frames
    out = tmp.asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", payload={"p": "payload"}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_range_join_broadcasts_band_dim(spark, sf_dir):
    df = tmp.range_join_price_bands(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    rows = {r["band"]: r["n_orders"] for r in df.collect()}
    assert set(rows) <= {"low", "mid", "high"} and sum(rows.values()) > 0


def test_tumbling_windows_partition_count(spark, sf_dir):
    df = tmp.events_tumbling_hourly(spark, sf_dir)
    rows = df.collect()
    assert all(r["window_start"].minute == 0 for r in rows)
    # every event lands in exactly one bucket
    total = tmp._t(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in rows) == total


def test_sliding_windows_double_count(spark, sf_dir):
    """1 h windows on a 30 min slide: every event is in exactly 2 windows."""
    df = tmp.events_sliding_windows(spark, sf_dir)
    rows = df.collect()
    assert all(r["window_start"].minute in (0, 30) for r in rows)
    total = tmp._t(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in rows) == 2 * total


# ---------------------------------------------------------------------------
# interval-overlap join
# ---------------------------------------------------------------------------


@pytest.fixture()
def interval_frames(spark):
    # bucket width in tests = 100 so intervals span multiple buckets;
    # cases: touching endpoints, containment, same-bucket-no-overlap,
    # multi-bucket spans, disjoint
    left = spark.createDataFrame(
        [(1, 0, 150), (2, 200, 210), (3, 340, 360), (4, 900, 1000)],
        "lid bigint, ls bigint, le bigint",
    )
    right = spark.createDataFrame(
        [(10, 150, 160), (11, 205, 206), (12, 361, 380), (13, 0, 950)],
        "rid bigint, rs bigint, re bigint",
    )
    return left, right


def test_interval_overlap_matches_naive(spark, interval_frames):
    left, right = interval_frames
    fast = tmp.interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket_width=100
    )
    naive = left.join(
        right, (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
    )
    got = sorted((r["lid"], r["rid"]) for r in fast.collect())
    want = sorted((r["lid"], r["rid"]) for r in naive.collect())
    assert got == want
    # touching endpoints DO match, same-bucket non-overlap does not
    assert (1, 10) in got and (3, 12) not in got


def test_interval_overlap_no_duplicate_pairs(spark, interval_frames):
    """An interval spanning many buckets collides with a partner in each;
    the pair must still come out exactly once."""
    left, right = interval_frames
    out = tmp.interval_overlap_join(left, right, "ls", "le", "rs", "re", bucket_width=100)
    rows = [(r["lid"], r["rid"]) for r in out.collect()]
    assert len(rows) == len(set(rows))
    assert (4, 13) in rows  # right 13 spans 10 buckets, overlaps left 4 once


def test_interval_overlap_sessions_plan_no_nlj(spark, sf_dir):
    """The scale contract: candidate generation is an EQUI-join on bucket
    id — never BroadcastNestedLoopJoin/CartesianProduct."""
    df = tmp.interval_overlap_sessions(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_property_random_intervals(spark):
    """Property check: for random interval sets (including degenerate
    points, duplicates, bucket-boundary endpoints, and spans far wider
    than the bucket), the bucketized equi-join equals the naive
    inequality join. One generated batch, many adversarial cases."""
    import random

    rng = random.Random(20260813)
    rows_l, rows_r = [], []
    for i in range(120):
        s = rng.randrange(0, 2000)
        rows_l.append((i, s, s + rng.choice([0, 1, 37, 100, 250, 999])))
    for j in range(120):
        s = rng.randrange(0, 2000)
        rows_r.append((j, s, s + rng.choice([0, 3, 100, 400, 1500])))
    # exact bucket-boundary endpoints
    rows_l += [(200, 100, 200), (201, 300, 300)]
    rows_r += [(300, 200, 300), (301, 0, 100)]

    left = spark.createDataFrame(rows_l, "lid bigint, ls bigint, le bigint")
    right = spark.createDataFrame(rows_r, "rid bigint, rs bigint, re bigint")
    from pyspark.sql import functions as F

    fast = sorted(
        (r["lid"], r["rid"])
        for r in tmp.interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_width=100
        ).collect()
    )
    naive = sorted(
        (r["lid"], r["rid"])
        for r in left.join(
            right, (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
        ).collect()
    )
    assert fast == naive and len(naive) > 100
