"""Per-entry executor-metrics sweep over the NON-bench ``queries()``
entries (r15 'Not yet optimized' #6): run each once against the noop sink
with a job label, then report wall + summed executor metrics per entry,
sorted by executor run time. The static self-join sweep (#12/#13 in
OPTIMIZATION_r15.md) catches duplicated subtrees by reading plans; this
catches whatever duplicated WORK that reading missed.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/entry_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

from tools.ab_metrics import metrics_for  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from oasysdb_spark.session import get_spark

    spark = get_spark(
        app_name="entry_sweep", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    skip = set(bench.BENCH_QUERIES) | set(bench.EXTRA_BENCH)
    rows = []
    for name, fn in entry.queries().items():
        if name in skip:
            continue
        # label ends with a delimiter so metrics_for's startswith match
        # can never absorb a longer entry name that shares this prefix
        label = f"sweep:{name}|"
        sc.setJobDescription(label)
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            err = ""
        except Exception as e:  # record, keep sweeping
            err = f"{type(e).__name__}: {e}"[:200]
        wall = time.time() - t0
        sc.setJobDescription(None)
        try:
            m = metrics_for(spark, label)
        except Exception as e:  # UI REST hiccup: keep the wall, keep going
            m, err = {}, err or f"metrics: {type(e).__name__}: {e}"[:200]
        m["name"], m["wall_s"], m["err"] = name, round(wall, 3), err
        rows.append(m)
        print(json.dumps(m), flush=True)
        # ops cache without unpersisting by documented contract; clear
        # between entries so later rows aren't distorted by accumulated
        # cache pressure (the r15 sweep's range_join exec anomaly)
        spark.catalog.clearCache()

    rows.sort(key=lambda r: -r.get("executorRunTime_s", 0.0))
    print("\n=== top by executor run time ===")
    for r in rows[:25]:
        print(
            f"{r['name']:45s} exec {r.get('executorRunTime_s', 0.0):7.2f}s "
            f"cpu {r.get('executorCpuTime_s', 0.0):6.2f}s "
            f"wall {r['wall_s']:6.2f}s "
            f"in {r.get('inputBytes_mb', 0.0):7.1f}MB "
            f"sh {r.get('shuffleRead_mb', 0.0):6.1f}MB "
            f"stages {r.get('stages', 0):3d} {r['err']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
