"""ANN recall/latency trade-off measurement: IVF probe depth and LSH
table count vs the brute-force oracle, averaged over several queries.

Usage: python tools/ann_tradeoff.py [sf_dir] [n_queries]

Prints one JSON line per configuration:
  {"index": "ivf", "probes": 4, "recall_at_10": 0.9, "avg_sec": 0.41}
The point of this tool is the measurement culture the changelog of the
reference shows (recall measured against brute force / HNSWLib,
/root/reference/docs/changelog.md:110-116) — tune knobs by numbers, not
vibes.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    k = 10

    from oasysdb_spark.operators import vectorops as vec
    from oasysdb_spark.session import get_spark

    spark = get_spark(app_name="ann_tradeoff")

    exact_euc = {}
    exact_cos = {}
    for qid in range(n_queries):
        exact_euc[qid] = [
            r["vec_id"]
            for r in vec.knn_bruteforce(spark, sf_dir, query_vec_id=qid, k=k).collect()
        ]
        exact_cos[qid] = [
            r["vec_id"]
            for r in vec.knn_bruteforce(
                spark, sf_dir, query_vec_id=qid, k=k, metric="cosine"
            ).collect()
        ]

    # IVF: shared pre-built index, vary probe depth
    work = tempfile.mkdtemp(prefix="ann_tradeoff_ivf_")
    vec.ivf_knn(spark, sf_dir, work_dir=work).collect()  # build untimed
    from oasysdb_spark.core.database import Database

    n_clusters = len(Database.open(spark, work).centroid_rows())
    for probes in sorted({1, 2, 4, 8, n_clusters}):
        if probes > n_clusters:
            continue
        hits, t0 = 0, time.time()
        for qid in range(n_queries):
            got = [
                r["vec_id"]
                for r in vec.ivf_knn(
                    spark, sf_dir, query_vec_id=qid, k=k, probes=probes, work_dir=work
                ).collect()
            ]
            hits += len(set(got) & set(exact_euc[qid]))
        print(
            json.dumps(
                {
                    "index": "ivf",
                    "probes": probes,
                    "n_clusters": n_clusters,
                    "recall_at_10": round(hits / (n_queries * k), 3),
                    "avg_sec": round((time.time() - t0) / n_queries, 3),
                }
            )
        )

    # PQ: shared codebooks + codes, vary re-rank depth
    _pq_sweep(spark, sf_dir, n_queries, k, exact_euc)

    # SQ8: the 4x near-exact rung — small reranks should already saturate
    _sq_sweep(spark, sf_dir, n_queries, k, exact_euc)

    # LSH: shared layouts, vary table count
    for n_tables in (1, 2, 4):
        wd = tempfile.mkdtemp(prefix=f"ann_tradeoff_lsh{n_tables}_")
        vec.lsh_knn_indexed(spark, sf_dir, num_tables=n_tables, work_dir=wd).collect()
        hits, t0 = 0, time.time()
        for qid in range(n_queries):
            got = [
                r["vec_id"]
                for r in vec.lsh_knn_indexed(
                    spark, sf_dir, query_vec_id=qid, k=k,
                    num_tables=n_tables, work_dir=wd,
                ).collect()
            ]
            hits += len(set(got) & set(exact_cos[qid]))
        print(
            json.dumps(
                {
                    "index": "lsh",
                    "tables": n_tables,
                    "recall_at_10": round(hits / (n_queries * k), 3),
                    "avg_sec": round((time.time() - t0) / n_queries, 3),
                }
            )
        )


def _sq_sweep(spark, sf_dir, n_queries, k, exact_euc):
    from oasysdb_spark.index import sq

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = sq.fit_sq(embs)
    codes = sq.encode_sq(embs, model).cache()
    codes.count()  # materialize untimed (encode-once-at-ingest shape)
    for rerank in (10, 16, 32):
        hits, t0 = 0, time.time()
        for qid in range(n_queries):
            got = [
                r["vec_id"]
                for r in sq.sq_knn(
                    spark, sf_dir, query_vec_id=qid, k=k, rerank=rerank,
                    codes_df=codes, model=model,
                ).collect()
            ]
            hits += len(set(got) & set(exact_euc[qid]))
        print(
            json.dumps(
                {
                    "index": "sq8",
                    "rerank": rerank,
                    "recall_at_10": round(hits / (n_queries * k), 3),
                    "avg_sec": round((time.time() - t0) / n_queries, 3),
                }
            )
        )
    codes.unpersist()


def _pq_sweep(spark, sf_dir, n_queries, k, exact_euc):
    from pyspark.sql import functions as F

    from oasysdb_spark.index import pq

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq.fit_codebooks(embs.select("embedding"))
    codes = pq.encode(embs, books).cache()
    codes.count()  # materialize untimed (encode-once-at-ingest shape)
    for rerank in (32, 64, 128, 256):
        hits, t0 = 0, time.time()
        for qid in range(n_queries):
            got = [
                r["vec_id"]
                for r in pq.pq_knn(
                    spark, sf_dir, query_vec_id=qid, k=k, rerank=rerank,
                    codes_df=codes, codebooks=books,
                ).collect()
            ]
            hits += len(set(got) & set(exact_euc[qid]))
        print(
            json.dumps(
                {
                    "index": "pq",
                    "rerank": rerank,
                    "recall_at_10": round(hits / (n_queries * k), 3),
                    "avg_sec": round((time.time() - t0) / n_queries, 3),
                }
            )
        )

    # IVFADC: residual coding under the coarse quantizer — sweep the
    # probes×rerank grid (the two independent levers)
    codes_r, cents, books_r = pq.build_ivfpq(spark, sf_dir, n_clusters=16)
    codes_r = codes_r.cache()
    codes_r.count()  # materialize untimed
    for probes in (2, 4, 8, 16):
        for rerank in (32, 128):
            hits, t0 = 0, time.time()
            for qid in range(n_queries):
                got = [
                    r["vec_id"]
                    for r in pq.ivfpq_knn(
                        spark, sf_dir, query_vec_id=qid, k=k,
                        probes=probes, rerank=rerank,
                        codes_df=codes_r, centroids=cents, codebooks=books_r,
                    ).collect()
                ]
                hits += len(set(got) & set(exact_euc[qid]))
            print(
                json.dumps(
                    {
                        "index": "ivfpq",
                        "probes": probes,
                        "rerank": rerank,
                        "recall_at_10": round(hits / (n_queries * k), 3),
                        "avg_sec": round((time.time() - t0) / n_queries, 3),
                    }
                )
            )


if __name__ == "__main__":
    main()
