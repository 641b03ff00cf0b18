"""Profile one bench query: run it with the Spark UI enabled and dump
per-job wall times + per-stage metrics from the REST API.

Usage: python tools/profile_query.py <query> [passes]
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
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from oasysdb_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile_{name}", extra_conf={"spark.ui.enabled": "true"}
    )
    qs = dict(entry.queries())
    qs.update(bench.EXTRA_BENCH)
    fn = qs[name]

    sc = spark.sparkContext
    for p in range(passes):
        sc.setJobDescription(f"{name} pass {p}")
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        print(f"pass {p}: {time.time() - t0:.3f}s", flush=True)
    sc.setJobDescription(None)

    app_id = sc.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
    print(f"\n{len(jobs)} jobs (newest first):")
    total = 0.0
    for j in jobs:
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        try:
            dur = (
                datetime.strptime(j["completionTime"], fmt)
                - datetime.strptime(j["submissionTime"], fmt)
            ).total_seconds()
        except Exception:
            dur = float("nan")
        total += dur if dur == dur else 0
        print(
            f"  job {j['jobId']:>3} {dur:7.3f}s stages={len(j.get('stageIds', []))} "
            f"tasks={j.get('numTasks')} desc={str(j.get('description'))[:90]}"
        )
    print(f"sum of job walls: {total:.3f}s")


if __name__ == "__main__":
    main()
