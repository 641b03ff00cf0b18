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
