"""IVF index build & maintenance — the Spark re-expression of the
reference's incrementally-maintained cluster index
(/root/reference/src/cores/index.rs).

Design (SURVEY.md §1.4, §7): the index IS data —

- ``centroids`` table ``(cluster_id int, centroid array<double>, size bigint)``
  — tiny (≈ N/density rows), broadcast/driver-collected everywhere.
- the **records table itself is rewritten partitioned by cluster_id** —
  probing `p` clusters = reading `p` partition directories, which Catalyst
  turns into partition pruning. No separate assignments table to join: at
  100 TB an extra id-join per query would dominate the cost; the clustered
  layout gives data locality for free and similarity *joins* become
  partition-aligned equi-joins.

Build strategy: the reference grows its index one insert at a time,
splitting any cluster that exceeds ``density`` via local 2-means
(/root/reference/src/cores/index.rs:101-135,277-308). That is the right
shape for a single-node online server but wrong for bulk analytics — we
instead bulk-train MLlib KMeans (k ≈ N/density, ``initMode="k-means||"``
which is the distributed k-means++ of /root/reference/src/utils/kmeans.rs:93-131)
in ONE pass over the data, then keep the online semantics for increments:
new batches are assigned to the nearest existing centroid (broadcast
argmin, /root/reference/src/cores/index.rs:241-253) and a maintenance job
splits oversized clusters with per-cluster seeded 2-means via
``applyInPandas`` (many small problems — one distributed KMeans per
oversized cluster would be scheduler-bound).

Centroid updates use the *correct* running/recomputed mean — the
reference's incremental formula is buggy (grows unboundedly,
/root/reference/src/cores/index.rs:224-239; divergence SURVEY.md §2.6.1).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oasysdb_spark.errors import InvalidArgumentError


def _records_with_vec(df: DataFrame) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn("__vec", array_to_vector(F.col("embedding").cast("array<double>")))


def build_index(db, k: int | None = None, seed: int = 42, max_iter: int = 20) -> int:
    """Bulk-build the IVF index: KMeans over all records, rewrite the
    records table partitioned by cluster_id, write the centroids table.

    Returns the number of clusters. ``k`` defaults to ceil(N / density),
    matching the reference's steady-state cluster count under its
    density-split rule (/root/reference/src/cores/index.rs:127-132).
    """
    from pyspark.ml.clustering import KMeans

    records = db.records_df()
    if "cluster_id" in records.columns:
        records = records.drop("cluster_id")
    n = records.count()
    if n == 0:
        raise InvalidArgumentError("cannot build an index over zero records")
    if k is None:
        k = max(1, math.ceil(n / db.params.density))
    k = min(k, n)

    if k == 1:
        # MLlib KMeans requires k > 1; a single cluster is just the global mean.
        assigned = records.withColumn("cluster_id", F.lit(0))
        db.records.write(assigned, partition_by=["cluster_id"])
        refresh_centroids(db)
        return 1

    with_vec = _records_with_vec(records)
    kmeans = KMeans(
        k=k,
        seed=seed,
        maxIter=max_iter,
        initMode="k-means||",
        featuresCol="__vec",
        predictionCol="cluster_id",
        distanceMeasure="euclidean" if db.params.metric == "euclidean" else "cosine",
    )
    model = kmeans.fit(with_vec.select("__vec"))
    assigned = model.transform(with_vec).drop("__vec")

    db.records.write(assigned, partition_by=["cluster_id"])

    # Centroids + sizes from the clustered table (one cheap agg; sizes feed
    # the density-split maintenance job).
    sizes = {
        r["cluster_id"]: r["cnt"]
        for r in db.records_df().groupBy("cluster_id").agg(F.count("*").alias("cnt")).collect()
    }
    cents = [
        (i, [float(x) for x in c], int(sizes.get(i, 0)))
        for i, c in enumerate(model.clusterCenters())
    ]
    _write_centroids(db, cents)
    return k


def _write_centroids(db, rows: list[tuple[int, list[float], int]]) -> None:
    df = db.spark.createDataFrame(
        rows, "cluster_id int, centroid array<double>, size bigint"
    )
    db.centroids.write(df)
    db.invalidate_centroid_cache()


def assign_clusters(db, df: DataFrame) -> DataFrame:
    """Assign each row of ``df`` (schema: record schema) to its nearest
    existing centroid — broadcast argmin (/root/reference/src/cores/index.rs:241-253
    re-expressed as a broadcast join + min_by).

    Stays fully JVM-side: centroids are exploded to rows, broadcast, and
    the per-record argmin is a groupBy ``min_by`` — no Python in the loop.
    """
    from oasysdb_spark.functions.vectors import distance_expr

    cents = db.centroids.read(db.spark).select("cluster_id", "centroid")
    dist = distance_expr(db.params.metric, F.col("embedding"), F.col("centroid"))
    joined = df.crossJoin(F.broadcast(cents)).withColumn("__d", dist)
    best = (
        joined.groupBy("id")
        .agg(F.min_by("cluster_id", F.when(F.col("__d").isNull(), float("inf")).otherwise(F.col("__d"))).alias("cluster_id"))
    )
    return df.join(best, "id", "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.lit(0))
    )


def refresh_centroids(db) -> None:
    """Recompute every centroid as the true mean of its members — the
    correct version of the reference's incremental update (SURVEY.md §2.6.1)
    — plus sizes, in one aggregation over the clustered table.

    Uses posexplode + avg per dimension: shuffles (cluster_id, pos) pairs
    only, so the reduce state is tiny regardless of table size.
    """
    records = db.records_df()
    dim = db.params.dimension
    means = (
        records.select("cluster_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"))
        .groupBy("cluster_id", "pos")
        .agg(F.avg("val").alias("mean"), F.count("*").alias("cnt"))
        .groupBy("cluster_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mean"))
            ).alias("pairs"),
            (F.sum("cnt") / dim).cast("bigint").alias("size"),
        )
        .select(
            "cluster_id",
            F.transform(F.col("pairs"), lambda s: s["mean"]).alias("centroid"),
            "size",
        )
    )
    db.centroids.write(means)
    db.invalidate_centroid_cache()


def split_oversized_clusters(db, seed: int = 42, max_iter: int = 25) -> int:
    """Maintenance job: split every cluster whose size exceeds ``density``
    into two via per-cluster seeded 2-means (applyInPandas — many small
    local problems, /root/reference/src/cores/index.rs:277-308 semantics),
    then rewrite the clustered records table and centroids.

    Returns the number of clusters split. Unlike the reference this is
    batched and off the ingest hot path; repeated application converges to
    all clusters ≤ ~density (the reference applies it per-insert).
    """
    import numpy as np
    import pandas as pd

    records = db.records_df()
    sizes = records.groupBy("cluster_id").agg(F.count("*").alias("cnt"))
    oversized = [r["cluster_id"] for r in sizes.where(F.col("cnt") > db.params.density).collect()]
    if not oversized:
        return 0

    max_id = db.centroids.read(db.spark).agg(F.max("cluster_id")).first()[0] or 0
    # Deterministic new ids: cluster c's second half becomes max_id + rank(c) + 1.
    new_ids = {c: max_id + i + 1 for i, c in enumerate(sorted(oversized))}

    big = records.where(F.col("cluster_id").isin(oversized))
    rest = records.where(~F.col("cluster_id").isin(oversized))

    bc_new_ids = db.spark.sparkContext.broadcast(new_ids)

    def _split(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(pdf["cluster_id"].iloc[0])
        mat = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
        labels = _two_means(mat, seed=seed, max_iter=max_iter)
        out = pdf.copy()
        out["cluster_id"] = np.where(labels == 0, cid, bc_new_ids.value[cid])
        return out

    schema = big.schema
    resplit = big.groupBy("cluster_id").applyInPandas(_split, schema=schema)
    updated = rest.unionByName(resplit)
    db.records.write(updated, partition_by=["cluster_id"])
    refresh_centroids(db)
    return len(oversized)


def _two_means(mat, seed: int = 42, max_iter: int = 25):
    """Seeded local 2-means with k-means++-style init (farthest-point
    flavor of /root/reference/src/utils/kmeans.rs:93-131) over a small
    in-memory matrix. Returns a 0/1 label array."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = mat.shape[0]
    if n < 2:
        return np.zeros(n, dtype=np.int64)
    first = int(rng.integers(n))
    d0 = ((mat - mat[first]) ** 2).sum(axis=1)
    total = d0.sum()
    if total == 0:  # all points identical: arbitrary balanced split
        return (np.arange(n) % 2).astype(np.int64)
    second = int(rng.choice(n, p=d0 / total))
    centers = mat[[first, second]].copy()
    labels = np.zeros(n, dtype=np.int64)
    for _ in range(max_iter):
        d = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        new_labels = d.argmin(axis=1)
        if (new_labels == labels).all():
            break
        labels = new_labels
        for j in (0, 1):
            members = mat[labels == j]
            if len(members):
                centers[j] = members.mean(axis=0)
    return labels
