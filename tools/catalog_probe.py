"""Catalog scale probe (r11 verdict task 8): manifest-mutation latency
and vacuum wall time at a realistic collection count, so the blue-green
reindex claim carries a number.

Creates N small collections, then times the name-indirection operations
whose latency a production catalog lives on: create (staging), rename,
swap, drop, open, list, and a vacuum over the accumulated displaced
directories. Every mutation is one read-modify-write of the single
manifest under the advisory flock, so the expectation is O(N) JSON
(de)serialization — microseconds of real work — dominated by the two
fsyncs of the atomic write; vacuum is O(dirs on disk).

Usage: python tools/catalog_probe.py [n_collections] [out_root]
Prints one JSON line with per-op latencies (median + p95 over the runs).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def _stats(samples):
    s = sorted(samples)
    return {
        "n": len(s),
        "med_ms": round(1000 * statistics.median(s), 2),
        "p95_ms": round(1000 * s[max(0, int(len(s) * 0.95) - 1)], 2),
        "max_ms": round(1000 * s[-1], 2),
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    root = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="catalog_probe_"
    )

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from oasysdb_spark.core.catalog import Catalog
    from oasysdb_spark.session import get_spark

    spark = get_spark(app_name="catalog_probe")
    cat = Catalog.init(spark, root, overwrite=True)

    df = spark.createDataFrame(
        [(f"r{i}", [float(i), 0.0], None, None, None) for i in range(4)],
        "id string, embedding array<float>, m_text map<string,string>, "
        "m_num map<string,double>, m_bool map<string,boolean>",
    )

    create_t = []
    for i in range(n):
        t0 = time.time()
        cat.save_collection(f"coll_{i:04d}", df, dimension=2)
        create_t.append(time.time() - t0)

    # name ops at full manifest size (the blue-green primitive set)
    rename_t, swap_t, open_t = [], [], []
    for i in range(0, min(n, 50)):
        t0 = time.time()
        cat.rename_collection(f"coll_{i:04d}", f"renamed_{i:04d}")
        rename_t.append(time.time() - t0)
        t0 = time.time()
        cat.swap_collections(f"renamed_{i:04d}", f"coll_{n - 1 - i:04d}")
        swap_t.append(time.time() - t0)
        t0 = time.time()
        cat.open_collection(f"renamed_{i:04d}")
        open_t.append(time.time() - t0)

    t0 = time.time()
    listing = cat.list_collections()
    list_s = time.time() - t0

    # displaced-directory pressure: overwrite half the LIVE collections
    # (each save displaces its old dir, which the r12 grace policy
    # leaves for vacuum), then time the vacuum that reclaims them all
    over_t = []
    live = [c["name"] for c in cat.list_collections()]
    for nm in live[: n // 2]:
        t0 = time.time()
        cat.save_collection(nm, df, dimension=2)
        over_t.append(time.time() - t0)
    t0 = time.time()
    removed = cat.vacuum(min_age_seconds=0)
    vacuum_s = time.time() - t0

    drop_t = []
    for c in [c["name"] for c in cat.list_collections()][:50]:
        t0 = time.time()
        cat.drop_collection(c)
        drop_t.append(time.time() - t0)

    print(json.dumps({
        "n_collections": n,
        "create_or_replace": _stats(create_t),
        "rename": _stats(rename_t),
        "swap": _stats(swap_t),
        "open": _stats(open_t),
        "list_sec": round(list_s, 3),
        "overwrite_half": _stats(over_t),
        "vacuum_removed": len(removed),
        "vacuum_sec": round(vacuum_s, 3),
        "drop": _stats(drop_t),
    }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
