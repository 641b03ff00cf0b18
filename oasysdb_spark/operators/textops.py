"""Text-analysis operators over ``documents``: language ID, quality
scoring, token counting, fingerprinting. All row-local column expressions
(embarrassingly parallel — no shuffle except final aggregations), each with
an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oasysdb_spark.functions.text import (
    doc_fingerprint,
    mean_token_len,
    predict_lang,
    punct_ratio,
    stopword_ratio,
    token_count_bpe,
    token_count_ws,
    tokens,
    uniq_token_ratio,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language prediction per document, summarized as
    (pred_lang, n_docs, n_matching_label) — the last column compares the
    prediction with the fixture's ``lang`` label."""
    docs = _docs(spark, sf_dir)
    pred = docs.select(
        "doc_id", "lang", predict_lang(tokens(F.col("text"))).alias("pred_lang")
    )
    return (
        pred.groupBy("pred_lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_matching_label"),
        )
        .orderBy("pred_lang")
    )


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics: length, token stats, punctuation /
    stopword / uniqueness ratios, and a composite quality bucket."""
    docs = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    out = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_m"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(mean_token_len(toks), 6).alias("mean_token_len"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(stopword_ratio(toks), 6).alias("stopword_ratio"),
        F.round(uniq_token_ratio(toks), 6).alias("uniq_ratio"),
    )
    score = (
        F.when(F.col("n_tokens") >= 20, 1).otherwise(0)
        + F.when(F.col("punct_ratio") <= 0.1, 1).otherwise(0)
        + F.when(F.col("stopword_ratio") >= 0.05, 1).otherwise(0)
        + F.when(F.col("uniq_ratio") >= 0.3, 1).otherwise(0)
    )
    return out.withColumn("quality", score.cast("bigint"))


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token statistics: whitespace vs BPE-ish token counts per
    language (total + mean)."""
    docs = _docs(spark, sf_dir)
    per_doc = docs.select(
        "lang",
        token_count_ws(F.col("text")).alias("ws_tokens"),
        token_count_bpe(F.col("text")).alias("bpe_tokens"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("ws_tokens").cast("bigint").alias("total_ws_tokens"),
            F.sum("bpe_tokens").cast("bigint").alias("total_bpe_tokens"),
            F.round(F.avg("ws_tokens"), 6).alias("mean_ws_tokens"),
        )
        .orderBy("lang")
    )


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit content fingerprints (hash of normalized text) — the cheap
    primary key for exact-dup detection across shards."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


def clean_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-training-data prep story as ONE declarative plan:

        score (quality + language) -> filter -> exact-dedup -> corpus stats

    Everything before the final aggregates is row-local (zero shuffle);
    the dedup groupBy on the 64-bit fingerprint is the single data
    shuffle, and ``min(struct(doc_id, bpe))`` picks the kept doc per
    duplicate group without a join-back (DuckDB twin: ``arg_min``). At
    100 TB this is the plan you want: one pass, one shuffle on a
    uniformly-distributed hash key, counters as conditional aggregates.
    """
    docs = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    quality = (
        F.when(F.size(toks) >= 20, 1).otherwise(0)
        + F.when(F.round(punct_ratio(F.col("text")), 6) <= 0.1, 1).otherwise(0)
        + F.when(F.round(stopword_ratio(toks), 6) >= 0.05, 1).otherwise(0)
        + F.when(F.round(uniq_token_ratio(toks), 6) >= 0.3, 1).otherwise(0)
    )
    scored = docs.select(
        "doc_id",
        predict_lang(toks).alias("pred_lang"),
        quality.alias("quality"),
        doc_fingerprint(F.col("text")).alias("fp"),
        token_count_bpe(F.col("text")).cast("bigint").alias("bpe"),
    )
    keep = (F.col("quality") >= 3) & (F.col("pred_lang") == "en")
    # Single pass: rejected docs get a NULL group key, so the expensive
    # text expressions evaluate once per row and the whole pipeline is one
    # scan + one shuffle. The NULL group is not a skew hazard: partial
    # (map-side) aggregation collapses it to one row per task before the
    # exchange.
    grouped = (
        scored.select(
            F.when(keep, F.col("fp")).alias("fp_clean"), "doc_id", "bpe"
        )
        .groupBy("fp_clean")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(F.struct("doc_id", "bpe")).alias("k"),
        )
    )
    is_clean = F.col("fp_clean").isNotNull()
    return grouped.agg(
        F.sum("n_rows").cast("bigint").alias("n_raw"),
        F.sum(F.when(is_clean, F.col("n_rows")).otherwise(0)).cast("bigint").alias("n_clean"),
        F.count(F.when(is_clean, 1)).cast("bigint").alias("n_unique"),
        F.sum(F.when(is_clean, F.col("k.bpe"))).cast("bigint").alias("total_bpe_tokens"),
        F.round(F.avg(F.when(is_clean, F.col("k.bpe"))), 6).alias("mean_bpe"),
    )
