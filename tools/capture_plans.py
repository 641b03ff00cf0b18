"""Capture .explain("formatted") for bench queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
  tag     e.g. r15  -> writes plans/r15/<name>_<suffix>.txt
  suffix  e.g. before | after
  query   names (default: every BENCH_QUERIES entry)

Plan capture is driver-side; operators that run eagerly during plan
construction (prepare_training_corpus) still execute their stages, so
run this solo when wall-clock matters (it never does for plan text).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or list(bench.BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from oasysdb_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    qs = dict(entry.queries())
    qs.update(bench.EXTRA_BENCH)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
