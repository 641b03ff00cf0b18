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


def edit_distance_pairs(
    df: DataFrame,
    col: str = "name",
    max_dist: int = 1,
) -> DataFrame:
    """Fuzzy STRING self-join — the entity-resolution blocking step
    (SymSpell's deletion-neighborhood trick, Garbe 2012): every pair of
    distinct values within Levenshtein distance ``max_dist`` of each
    other, found WITHOUT the quadratic all-pairs scan. Returns
    ``(name_a, name_b, dist)`` with ``name_a < name_b``.

    Blocking is EXHAUSTIVE at ``max_dist=1``: let D(s) = {s} ∪ {s with
    one char deleted}. If lev(a,b)=1 then either b is a one-char
    deletion of a (so b ∈ D(a) ∩ D(b) — D includes self), or a
    substitution at position i (deleting i from both yields the same
    string), or symmetric insertion — in every case D(a) ∩ D(b) ≠ ∅,
    so the equi-join on deletion variants surfaces every true pair and
    the ``levenshtein`` verify removes the false ones (sharing a
    deletion does NOT imply lev ≤ 1: "abc"/"acb" share "ab" at lev 2 —
    the verify is load-bearing, and the pytest pins banding == the
    quadratic truth). ``max_dist >= 2`` would need deletion-2
    neighborhoods (|D₂| ≈ len²/2 variants per string) — refused with a
    clean error rather than served approximately.

    Scale shape: |s|+1 variant rows per string, one equi-join on the
    variant key (hot variants are bounded by alphabet fan-in, not
    corpus size), distinct pair collapse, then a codegen'd
    ``levenshtein`` verify on candidates only — linear in true pairs,
    never n². The quadratic is only ever run by the ORACLE."""
    from oasysdb_spark.errors import InvalidArgumentError

    if max_dist != 1:
        raise InvalidArgumentError(
            "edit_distance_pairs blocking is exhaustive only for "
            f"max_dist=1 (got {max_dist}); deletion-2 neighborhoods are "
            "quadratic in string length — run the exact join instead"
        )
    names = df.select(F.col(col).alias("nm")).where(
        F.col("nm").isNotNull() & (F.length("nm") > 0)
    ).distinct()
    variants = names.select(
        "nm",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("nm")),
                    F.expr(
                        "transform(sequence(1, length(nm)), i -> "
                        "concat(substring(nm, 1, i-1), "
                        "substring(nm, i+1, 2147483647)))"
                    ),
                )
            )
        ).alias("v"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (
        a.join(b, F.col("a.v") == F.col("b.v"))
        .where(F.col("a.nm") < F.col("b.nm"))
        .select(
            F.col("a.nm").alias("name_a"), F.col("b.nm").alias("name_b")
        )
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).where(F.col("dist") <= max_dist)


def customer_fuzzy_matches(
    spark: SparkSession, sf_dir: str, top_n: int = 50
) -> DataFrame:
    """Driver-shaped :func:`edit_distance_pairs` over the customer
    names — the classic ER demo (find records one typo apart): the
    ``top_n`` lexicographically-first matched pairs, fully ordered for
    the cross-engine hash (no floats anywhere — strings and ints
    only). The DuckDB oracle runs the QUADRATIC levenshtein join, so
    the two engines find the same pairs by genuinely different
    algorithms."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pairs = edit_distance_pairs(cust, col="c_name", max_dist=1)
    return pairs.orderBy("name_a", "name_b").limit(top_n)
