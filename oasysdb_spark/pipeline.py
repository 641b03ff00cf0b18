"""End-to-end corpus pipeline: raw files in, tokenized shards out.

``corpus_to_shards`` chains the tested public operators into the full
production path a pretraining data team runs:

    ingest (jsonl/.gz with quarantine, or WARC/WET) →
    quality + language filter →
    exact dedup (fingerprint, keep min id) →
    near-dup clustering (MinHash components, keep the longest-doc
    representative) →
    BPE train + encode + one-exchange shard write

Each stage IS the corresponding oracle/pytest-gated operator — this
module adds no new semantics, only the composition and a per-stage
count manifest (the numbers a pipeline owner actually watches: how many
docs each stage dropped). The richer boilerplate/repetition stages are
available through ``textops.prepare_training_corpus`` and slot in the
same way.

Scale shape: the filter stages are row-local; dedup shuffles only
8-byte digests and band keys; the tokenizer's corpus pass is one
pretoken aggregation; the artifact write is one exchange. Nothing in
the chain materializes corpus text on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oasysdb_spark.functions.text import (
    doc_fingerprint,
    predict_lang,
    token_count_bpe,
    tokens,
)
from oasysdb_spark.operators.dedup import dedup_components
from oasysdb_spark.operators.textops import quality_rules
from oasysdb_spark.operators.tokenizer import tokenize_and_shard
from oasysdb_spark.sources import corpus as corpus_src


def ingest(spark: SparkSession, in_path: str, fmt: str = "jsonl"):
    """Stage 0: raw files → (docs, quarantine-or-None). ``fmt`` is
    ``jsonl`` (quarantine frame returned) or ``wet`` (malformed bytes
    are already folded into per-file counts by the parser)."""
    if fmt == "jsonl":
        clean, quarantine = corpus_src.read_jsonl_corpus(spark, in_path)
        docs = clean.withColumn(
            "n_chars", F.length("text").cast("bigint")
        )
        return docs, quarantine
    if fmt == "wet":
        wet = corpus_src.read_wet_corpus(spark, in_path)
        return corpus_src.wet_to_documents(wet), None
    raise ValueError(f"unknown corpus format {fmt!r}; one of jsonl, wet")


def corpus_to_shards(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    fmt: str = "jsonl",
    min_quality: int = 3,
    lang: str | None = "en",
    near_threshold: float = 0.5,
    n_shards: int = 8,
    n_merges: int = 256,
    min_token_count: int = 2,
) -> dict:
    """Run the whole pipeline; returns the manifest dict:
    per-stage doc counts plus the per-shard (docs, tokens) rows read
    back from the written artifact."""
    docs, quarantine = ingest(spark, in_path, fmt=fmt)
    toks = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        "text",
        "source",
        quality_rules(F.col("text"), toks).alias("q"),
        predict_lang(toks).alias("pl"),
        doc_fingerprint(F.col("text")).alias("fp"),
        token_count_bpe(F.col("text")).cast("bigint").alias("bpe"),
    ).cache()
    n_raw = scored.count()
    n_quarantined = quarantine.count() if quarantine is not None else 0

    clean = scored.where(F.col("q") >= min_quality)
    if lang is not None:
        clean = clean.where(F.col("pl") == lang)
    clean = clean.cache()
    n_clean = clean.count()

    keep_exact = (
        clean.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    )
    exact_unique = clean.join(keep_exact, "doc_id").cache()
    n_exact = exact_unique.count()

    # near-dup components over survivors; keep the member with the most
    # tokens (tie -> min doc_id) — the representative_pick contract
    comps = dedup_components(
        spark,
        threshold=near_threshold,
        docs=exact_unique.select("doc_id", "text"),
    )
    reps = (
        comps.join(exact_unique.select("doc_id", "bpe"), "doc_id")
        .groupBy("component_id")
        .agg(
            F.max(F.struct(F.col("bpe"), (-F.col("doc_id")).alias("neg"))).alias(
                "best"
            )
        )
        .select((-F.col("best.neg")).alias("doc_id"))
    )
    survivors = exact_unique.join(reps, "doc_id").cache()
    n_near = survivors.count()

    manifest_df = tokenize_and_shard(
        spark,
        sf_dir="",
        out_dir=out_dir,
        n_shards=n_shards,
        n_merges=n_merges,
        min_count=min_token_count,
        docs=survivors.select("doc_id", "text", "source"),
    )
    shards = [
        {"shard": r["shard"], "n_docs": r["n_docs"], "n_tokens": r["n_tokens"]}
        for r in manifest_df.collect()
    ]
    for frame in (scored, clean, exact_unique, survivors):
        frame.unpersist()
    return {
        "n_raw": n_raw,
        "n_quarantined": n_quarantined,
        "n_clean": n_clean,
        "n_exact_unique": n_exact,
        "n_survivors": n_near,
        "n_shards": len(shards),
        "total_tokens": sum(s["n_tokens"] for s in shards),
        "shards": shards,
    }
