"""HNSW serving/maintenance probes — the judge's r7 measurement tasks.

A. Residency steady state (task 2): 10 consecutive query_many batches
   against a 20k-vector graph; per-call wall should drop hard after the
   first (workers memoize decoded shards) and stay flat.
B. Batch-size amortization (task 2): warm per-query cost vs batch size
   1 / 8 / 64 / 256 — the broadcast batch + one fan-out per call.
C. Filtered worst case (task 7): a needle filter (≈0.1% selectivity)
   walks the doubling ladder; with residency each rung re-beams warm
   graphs, so the cost is rungs × (beam + join), not rungs × scan.
D. Churn crossover (task 5): extend cost vs append size, tombstone cost
   vs delete size, and a full rebuild for the amortization line.
E. Streaming epoch extension (task 8): per-epoch extend_hnsw wall as
   the batch touches 1 / ~8 / ~32 of 32 shards (ids picked against the
   build's own shard hash).

Run SOLO (the bench rule): concurrent Spark jobs inflate walls 2-3x.
Usage: python tools/hnsw_probe.py [n_vectors] [dim] [shards]
"""

from __future__ import annotations

import hashlib
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SHARDS = int(sys.argv[3]) if len(sys.argv) > 3 else 32


def shard_of(rid: str, shards: int) -> int:
    """Python twin of index.hnsw._shard_of (md5 -> 15 hex -> int64)."""
    h = int(hashlib.md5(f"{rid}#hnsw".encode()).hexdigest()[:15], 16)
    return h % shards


def main() -> None:
    from oasysdb_spark.core.database import RECORD_SCHEMA, Database
    from oasysdb_spark.index.hnsw import build_hnsw, extend_hnsw, tombstone_hnsw
    from oasysdb_spark.session import get_spark

    spark = get_spark(app_name="hnsw_probe")
    out: dict = {"n": N, "dim": DIM, "shards": SHARDS}

    d = tempfile.mkdtemp(prefix="hnsw_probe_")
    db = Database.configure(spark, d, dimension=DIM, metric="euclidean")
    rows = [
        (
            f"r{i:06d}",
            [float((i * 37 + j * 101) % 997) for j in range(DIM)],
            {},
            {"number": float(i)},
            {},
        )
        for i in range(N)
    ]
    db.insert_batch(spark.createDataFrame(rows, RECORD_SCHEMA))
    t0 = time.time()
    build_hnsw(db, m=16, ef_construction=100, shards=SHARDS)
    out["build_s"] = round(time.time() - t0, 2)

    qs = [rows[i * (N // 8)][1] for i in range(8)]

    # A: consecutive identical batches — cold vs warm
    walls = []
    for _ in range(10):
        t0 = time.time()
        db.query_many(qs, k=10, approx="hnsw")
        walls.append(round(time.time() - t0, 3))
    out["A_consecutive_query_many_s"] = walls
    out["A_warm_over_cold"] = round(
        (sum(walls[1:]) / 9) / walls[0], 3
    )

    # B: warm per-query amortization vs batch size
    amort = {}
    for bs in (1, 8, 64, 256):
        batch = [rows[(i * 131) % N][1] for i in range(bs)]
        db.query_many(batch, k=10, approx="hnsw")  # warm the path
        t0 = time.time()
        db.query_many(batch, k=10, approx="hnsw")
        amort[bs] = round((time.time() - t0) / bs, 4)
    out["B_warm_s_per_query_by_batch"] = amort

    # C: needle filter — doubling ladder on warm graphs
    db.query([0.0] * DIM, k=10, approx="hnsw")  # warm
    t0 = time.time()
    got = db.query(
        [0.0] * DIM, k=10, filter=f"number > {N - 20}", approx="hnsw"
    )
    out["C_needle_filter_s"] = round(time.time() - t0, 2)
    out["C_needle_rows"] = len(got)
    t0 = time.time()
    db.query([0.0] * DIM, k=10)
    out["C_exact_unfiltered_s"] = round(time.time() - t0, 2)

    # D: churn — appends (extend), deletes (tombstone), rebuild
    churn = {}
    base = N
    for nb in (16, 256, 2048):
        more = [
            (
                f"a{base + i:06d}",
                [float((i * 53 + j * 71) % 997) for j in range(DIM)],
                {},
                {"number": float(base + i)},
                {},
            )
            for i in range(nb)
        ]
        base += nb
        db.insert_batch(spark.createDataFrame(more, RECORD_SCHEMA))
        touched = len({shard_of(r[0], SHARDS) for r in more})
        t0 = time.time()
        assert extend_hnsw(db) == nb
        churn[f"extend_{nb}_touching_{touched}_shards_s"] = round(
            time.time() - t0, 2
        )
    for nd in (8, 128):
        for i in range(nd):
            db.delete(f"r{i + (0 if nd == 8 else 8):06d}")
        t0 = time.time()
        tombstone_hnsw(db, max_tombstones=4096)
        churn[f"tombstone_{nd}_deletes_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    build_hnsw(db, m=16, ef_construction=100, shards=SHARDS)
    churn["full_rebuild_s"] = round(time.time() - t0, 2)
    out["D_churn"] = churn

    # E: epoch-shaped extension vs touched-shard count (ids picked by
    # the build's own shard hash so the batch lands on exactly t shards)
    epoch = {}
    pool = [
        f"e{i:06d}"
        for i in range(200_000)
    ]
    for t_shards in (1, 8, 32):
        want = {s for s in range(t_shards)}
        ids = [rid for rid in pool if shard_of(rid, SHARDS) in want][:512]
        taken = set(ids)
        pool = [rid for rid in pool if rid not in taken]
        more = [
            (
                rid,
                [float((k * 29 + j * 13) % 997) for j in range(DIM)],
                {},
                {"number": 0.0},
                {},
            )
            for k, rid in enumerate(ids)
        ]
        db.insert_batch(spark.createDataFrame(more, RECORD_SCHEMA))
        t0 = time.time()
        assert extend_hnsw(db) == len(more)
        epoch[f"extend_512_rows_{t_shards}_shards_s"] = round(
            time.time() - t0, 2
        )
    out["E_epoch_extension"] = epoch

    print(json.dumps(out))


if __name__ == "__main__":
    main()
