"""Solo A/B timer for prepare_training_corpus (r11 verdict task 2).

Times ONLY the composed pipeline, best-of-N noop-written passes, in a
fresh session — run it once per (checkout, sf_dir) with no concurrent
Spark jobs. Usage:

    python tools/ptc_ab.py <sf_dir> [passes]

Prints one JSON line {"sf_dir": ..., "passes": [...], "best": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas-UDF type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from oasysdb_spark.operators.textops import prepare_training_corpus
    from oasysdb_spark.session import get_spark

    spark = get_spark(app_name="ptc_ab")
    # warm the JVM + python workers like bench.py does
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(x: pd.Series) -> pd.Series:
        return x

    ncpu = spark.sparkContext.defaultParallelism
    spark.range(ncpu * 2).repartition(ncpu).select(_warm("id")).write.mode(
        "overwrite"
    ).format("noop").save()

    times = []
    for _ in range(passes):
        t0 = time.time()
        prepare_training_corpus(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"sf_dir": sf_dir, "passes": times, "best": min(times)}))


if __name__ == "__main__":
    main()
