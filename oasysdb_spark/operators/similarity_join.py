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


def fuzzy_match_against(
    df: DataFrame,
    reference_df: DataFrame,
    col: str = "name",
    ref_col: str = "name",
    max_reference: int = 200_000,
) -> DataFrame:
    """Bipartite fuzzy LOOKUP — the serving half of entity resolution:
    for every row of ``df``, the reference names within Levenshtein
    distance 1 of its ``col`` value (including exact matches at dist
    0). Returns ``(name, ref_name, dist)`` rows, one per (input row,
    matching reference), no duplicates by construction.

    The reference side builds a SymSpell deletion index ONCE at
    plan-build time (every reference name keys itself plus each
    one-char deletion) and ships inside the ``mapInPandas`` closure;
    each Arrow batch looks up its names' deletion neighborhoods
    row-locally and verifies candidates with an exact DP Levenshtein —
    the same exhaustiveness argument as :func:`edit_distance_pairs`
    (any dist ≤ 1 pair shares a deletion variant), with the verify
    again load-bearing against transposition false positives.

    Completely STATELESS — no shuffle, no state store, no watermark —
    so the identical plan serves batch frames and ingest STREAMS
    unchanged (``streaming.ingest.fuzzy_match_stream_flags`` is this
    function); per-row cost is O(|s|) dict probes against a reference
    index bounded by ``max_reference`` (beyond it the call refuses with
    a clean error rather than broadcasting an unbounded dict — shard
    the reference across parallel lookups if you genuinely need more).
    """
    from oasysdb_spark.errors import InvalidArgumentError

    refs_df = (
        reference_df.select(F.col(ref_col).alias("r"))
        .where(F.col("r").isNotNull() & (F.length("r") > 0))
        .distinct()
    )
    n_ref = refs_df.count()
    if n_ref > max_reference:
        raise InvalidArgumentError(
            f"fuzzy_match_against broadcasts a deletion index over the "
            f"whole reference side; {n_ref} names exceed max_reference="
            f"{max_reference} (shard the reference across parallel "
            "lookups or run the banded batch join)"
        )
    ref_names = [r["r"] for r in refs_df.collect()]

    def _d1(s: str):
        yield s
        for i in range(len(s)):
            yield s[:i] + s[i + 1:]

    index: dict = {}
    for ref in ref_names:
        for v in _d1(ref):
            index.setdefault(v, set()).add(ref)

    def _dist_within1(s: str, t: str) -> int:
        """Exact Levenshtein for the d ≤ 1 contract WITHOUT the O(|s|²)
        DP (the full DP measured as the hot-path bottleneck — 37 s at
        15k names before this): equal strings → 0; equal length → one
        substitution iff exactly one position differs; length gap 1 →
        one indel iff the shorter is the longer minus one char
        (two-pointer); anything else → 2 (meaning "> 1")."""
        if s == t:
            return 0
        ls, lt = len(s), len(t)
        if ls == lt:
            diff = 0
            for a, b in zip(s, t):
                if a != b:
                    diff += 1
                    if diff > 1:
                        return 2
            return 1
        if ls < lt:
            s, t, ls, lt = t, s, lt, ls
        if ls - lt != 1:
            return 2
        i = j = 0
        skipped = False
        while i < ls and j < lt:
            if s[i] == t[j]:
                i += 1
                j += 1
            elif skipped:
                return 2
            else:
                skipped = True
                i += 1
        return 1

    import pandas as pd  # noqa: PLC0415 — worker-side import

    def _flags(batches):
        for pdf in batches:
            rows = []
            for nm in pdf["__nm"]:
                if nm is None or nm == "":
                    continue
                cands: set = set()
                for v in _d1(nm):
                    hit = index.get(v)
                    if hit:
                        cands |= hit
                for ref in sorted(cands):
                    d = _dist_within1(nm, ref)
                    if d <= 1:
                        rows.append((nm, ref, d))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["name", "ref_name", "dist"]
                )

    return df.select(F.col(col).alias("__nm")).mapInPandas(
        _flags, schema="name string, ref_name string, dist int"
    )
