"""Run one bench query twice (cold+warm) and print the warm pass's
heaviest stages (summed executorRunTime) — duplicate near-identical
heavy stages inside one pass are the signature of a cold-cache fan-out
race recomputing an expensive subtree.

Usage: python tools/heavy_stages.py <query> [min_exec_s]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


def main():
    name = sys.argv[1]
    min_exec = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from oasysdb_spark.session import get_spark

    spark = get_spark(
        app_name=f"heavy_{name}", extra_conf={"spark.ui.enabled": "true"}
    )
    qs = dict(entry.queries())
    qs.update(bench.EXTRA_BENCH)
    fn = qs[name]

    sc = spark.sparkContext
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    base = f"http://localhost:4040/api/v1/applications/{sc.applicationId}"
    jobs0 = json.load(urllib.request.urlopen(f"{base}/jobs"))
    first_new = (max(j["jobId"] for j in jobs0) + 1) if jobs0 else 0

    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    print(f"warm wall {time.time() - t0:.2f}s")

    jobs = [
        j
        for j in json.load(urllib.request.urlopen(f"{base}/jobs"))
        if j["jobId"] >= first_new
    ]
    stage_ids = set()
    for j in jobs:
        stage_ids.update(j.get("stageIds", []))
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    rows = []
    tot = 0.0
    for s in stages:
        if s["stageId"] in stage_ids:
            ex = s.get("executorRunTime", 0) / 1e3
            tot += ex
            if ex >= min_exec:
                rows.append(
                    (ex, s["stageId"], s.get("numCompleteTasks"), s.get("name", "")[:90])
                )
    rows.sort(reverse=True)
    print(f"warm total executorRunTime {tot:.1f}s, {len(rows)} stages >= {min_exec}s:")
    for ex, sid, nt, nm in rows:
        print(f"  {ex:7.2f}s stage {sid:>4} tasks={nt:>3} {nm}")


if __name__ == "__main__":
    main()
