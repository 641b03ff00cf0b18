"""Build a synthetic sf1 fixture: sf0.1 replicated 10x with shifted keys.

Each copy i gets a disjoint key space (order/part/supp/cust/event/doc/vec
keys offset per copy) so joins and groupBys see 10x the distinct keys —
the realistic 10x-growth model — while foreign-key relationships stay
intact within a copy. Two deliberate choices:

- ``events.ts`` shifts by i*366 days per copy: 10x the events over 10x
  the wall-clock span, so cross-user session-overlap pairs grow ~10x
  (linear), matching how a real stream grows. Leaving timestamps equal
  would grow overlap candidates ~100x — a change in query *semantics*
  (denser time), not in data scale.
- ``documents.text`` goes through a per-copy character substitution
  (``translate`` over 7 frequent letters): intra-copy duplicate and
  NEAR-duplicate structure is preserved exactly (the same bijection is
  applied to every doc in a copy), while cross-copy texts decorrelate in
  shingle AND simhash space. A weaker salt (suffix tag) was measured to
  make every doc a true near-duplicate of its 9 copies — near-dup pair
  count then grows quadratically in copies, a fixture artifact that
  swamps the engine-scaling signal (simhash probe ratio 54x vs ~2x).
- ``embeddings.embedding`` gets a per-copy signed coordinate
  permutation (seeded): an exact isometry, so intra-copy near-dup and
  cluster structure is untouched while cross-copy cosine decorrelates —
  otherwise every vector keeps 9 exact cosine-1.0 cross-copy twins and
  any embedding-dedup scale probe measures the fixture, not the engine.
- order/lineitem dates are NOT shifted: the TPC-H queries' date-range
  predicates must keep their selectivity under scaling.

Usage: python tools/make_scale_fixture.py [out_dir]   (default /tmp/scale_sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"

    from pyspark.sql import functions as F

    from oasysdb_spark.session import get_spark

    spark = get_spark(app_name="make_scale_fixture")

    def copies(name, transform):
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = [transform(df, i) for i in range(COPIES)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{name}.parquet")

    def shift(df, col, step, i):
        return df.withColumn(col, (F.col(col) + F.lit(i * step)).cast("bigint"))

    # tiny shared dimensions: single copy, unchanged
    for name in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )

    copies("customer", lambda df, i: shift(df, "c_custkey", 10_000_000, i))
    copies("supplier", lambda df, i: shift(df, "s_suppkey", 1_000_000, i))
    copies("part", lambda df, i: shift(df, "p_partkey", 10_000_000, i))
    copies(
        "orders",
        lambda df, i: shift(
            shift(df, "o_orderkey", 1_000_000_000, i), "o_custkey", 10_000_000, i
        ),
    )
    copies(
        "lineitem",
        lambda df, i: shift(
            shift(
                shift(df, "l_orderkey", 1_000_000_000, i), "l_partkey", 10_000_000, i
            ),
            "l_suppkey",
            1_000_000,
            i,
        ),
    )
    copies(
        "events",
        lambda df, i: shift(
            shift(df, "event_id", 1_000_000_000, i), "user_id", 10_000_000, i
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 366} DAYS")),
    )
    # 10 distinct bijections over 7 frequent letters — enough to push
    # cross-copy Jaccard near zero and simhash hamming past any near-dup
    # threshold, while copy 0 stays the original corpus
    perms = [
        "aeiousc", "eiouasc", "iouaesc", "ouaeisc", "uaeiosc",
        "scaeiou", "cseaiou", "aseciou", "esaciou", "isaceou",
    ]
    copies(
        "documents",
        lambda df, i: shift(df, "doc_id", 100_000_000, i).withColumn(
            "text",
            F.col("text") if i == 0 else F.translate(F.col("text"), "aeiousc", perms[i]),
        ),
    )
    # per-copy signed coordinate permutation: an exact isometry, so
    # intra-copy distances/cosines are preserved bit-for-bit while
    # cross-copy cosine decorrelates toward 0 (the embedding analog of
    # the documents translate() bijection). Without it every vector kept
    # 9 exact cosine-1.0 cross-copy twins — the quadratic near-dup
    # fixture artifact this file's docstring rules out for documents.
    import numpy as np

    dim = len(
        spark.read.parquet(f"{SRC}/embeddings.parquet")
        .select("embedding")
        .first()["embedding"]
    )

    def rotate(df, i):
        df = shift(df, "vec_id", 10_000_000, i)
        # labels get disjoint spaces per copy too (like every other key):
        # label-blocked operators then see 10x the blocks at the same
        # block size, not 10x-bigger blocks (which would grow their
        # within-block pair count 100x — fixture artifact, not scale)
        df = df.withColumn("label", (F.col("label") + F.lit(i * 1000)).cast("int"))
        if i == 0:
            return df
        rng = np.random.default_rng(1234 + i)
        perm = rng.permutation(dim)
        signs = rng.choice([-1.0, 1.0], size=dim)
        rotated = F.array(
            *[
                (
                    F.element_at(F.col("embedding"), int(perm[j]) + 1)
                    * float(signs[j])
                ).cast("float")
                for j in range(dim)
            ]
        )
        return df.withColumn("embedding", rotated)

    copies("embeddings", rotate)

    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        n = spark.read.parquet(f"{out}/{name}.parquet").count()
        print(name, n)
    print("written to", out)


if __name__ == "__main__":
    main()
