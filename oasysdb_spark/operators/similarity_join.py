"""Similarity joins — the all-pairs analog of the reference's single-query
search (SURVEY.md §2.5 'joins': query = a similarity join between one
vector and the probed subset; here both sides are tables).

Two strategies:

- :func:`knn_join_blocked` — exact within a blocking key (here ``label``;
  in production any coarse partitioner). The blocked self-join shuffles
  both sides on the key once and never materializes the full cross
  product. Deterministic → DuckDB oracle in __spark_entry__.py.
- :func:`knn_join_ivf` — the scale path: both sides carry an IVF
  cluster_id, so the join is a **partition-aligned equi-join** on
  cluster_id (each pair of matching partitions joins locally; candidate
  count ≈ N·density instead of N²). Approximate at cluster borders, like
  any single-probe IVF; recall is tested against the blocked-exact result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oasysdb_spark.functions.vectors import sqeuclidean


def _topk_pairs(pairs: DataFrame, k: int) -> DataFrame:
    dist = sqeuclidean(F.col("a.embedding"), F.col("b.embedding"))
    w = Window.partitionBy("vec_a").orderBy("distance", "vec_b")
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(dist, 6).alias("distance"),
        )
        # multi-probe candidate generation can surface a pair once per
        # shared cluster; dedupe before ranking
        .dropDuplicates(["vec_a", "vec_b"])
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= k)
    )


def knn_join_blocked(
    spark: SparkSession, sf_dir: str, k: int = 3, max_left: int = 100
) -> DataFrame:
    """For each of the first ``max_left`` vectors: its top-k nearest
    neighbors sharing the same label (exact within the block)."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    left = embs.where(F.col("vec_id") < max_left).alias("a")
    right = embs.alias("b")
    pairs = left.join(
        right,
        (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") != F.col("b.vec_id")),
    )
    return _topk_pairs(pairs, k)


def knn_join_ivf(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    max_left: int = 100,
    probes: int = 3,
    work_dir: str | None = None,
) -> DataFrame:
    """IVF-bucketed k-NN join with multi-probe: each query-side row fans
    out to its ``probes`` nearest clusters (explode), candidates = the
    partition-aligned equi-join on cluster_id. Candidate count ≈
    N·probes·density — linear, never N². Recall/cost tunes with ``probes``
    exactly like the reference's query knob
    (/root/reference/src/cores/index.rs:176-182)."""
    import tempfile

    from oasysdb_spark.operators.vectorops import ivf_knn  # index bootstrap

    work_dir = work_dir or tempfile.mkdtemp(prefix="oasys_simjoin_")
    # build (or reuse) the index tables via the shared bootstrap
    ivf_knn(spark, sf_dir, k=1, work_dir=work_dir)

    from oasysdb_spark.core.database import Database
    from oasysdb_spark.index.ivf import topk_cluster_assigner

    db = Database.open(spark, work_dir)
    rec = db.records_df().select(
        F.col("id").cast("bigint").alias("vec_id"),
        "embedding",
        F.col("m_num")["label"].cast("int").alias("label"),
        "cluster_id",
    )
    ordered = sorted(db.centroid_rows())
    id_map = F.array(*[F.lit(c) for c, _ in ordered])
    top_p = topk_cluster_assigner(spark, [v for _, v in ordered], db.params.metric, probes)
    left = (
        rec.where(F.col("vec_id") < max_left)
        .drop("cluster_id")
        .withColumn("__probe", F.explode(top_p(F.col("embedding"))))
        .withColumn("cluster_id", F.element_at(id_map, F.col("__probe") + 1))
        .alias("a")
    )
    right = rec.alias("b")
    pairs = left.join(
        right,
        (F.col("a.cluster_id") == F.col("b.cluster_id"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    )
    return _topk_pairs(pairs, k)
