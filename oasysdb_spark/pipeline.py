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
from oasysdb_spark.operators.textops import exact_then_near_dedup, quality_rules
from oasysdb_spark.operators.tokenizer import tokenize_and_shard
from oasysdb_spark.session import free_local_checkpoint, release_frame
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


def _filter_and_dedup(
    spark: SparkSession,
    in_path: str,
    fmt: str,
    min_quality: int,
    lang: "str | None",
    near_threshold: float,
):
    """Shared front half of every corpus pipeline entry point: ingest
    (quarantine) → quality + language filter → exact dedup → near-dup
    representative pick. ONE definition, so the terminal artifacts
    (tokenized parquet, WebDataset tars, ...) can never filter or dedup
    differently. Returns ``(counts, survivors, to_unpersist, comps,
    obs_final)`` — the caller runs its terminal stage, then unpersists
    the frames and frees the components checkpoint in its ``finally``;
    on failure BEFORE returning, this helper cleans up its own caches.
    ``obs_final`` is the survivor-count ``Observation`` (metric ``n``)
    — read it only AFTER the terminal stage has consumed ``survivors``
    (r15: the per-stage counts ride ``observe()`` metrics on jobs the
    pipeline runs anyway instead of dedicated count() passes — at
    corpus scale each count was a full extra scan if its cache
    evicted, and the raw scored text no longer needs caching at all)."""
    from pyspark.sql import Observation

    docs, quarantine = ingest(spark, in_path, fmt=fmt)
    toks = tokens(F.col("text"))
    obs_raw = Observation()
    obs_clean = Observation()
    scored = docs.select(
        "doc_id",
        "text",
        "source",
        quality_rules(F.col("text"), toks).alias("q"),
        predict_lang(toks).alias("pl"),
        doc_fingerprint(F.col("text")).alias("fp"),
        token_count_bpe(F.col("text")).cast("bigint").alias("bpe"),
    ).observe(obs_raw, F.count(F.lit(1)).alias("n"))
    to_unpersist = []
    comps = None
    try:
        n_quarantined = quarantine.count() if quarantine is not None else 0

        clean = scored.where(F.col("q") >= min_quality)
        if lang is not None:
            clean = clean.where(F.col("pl") == lang)
        # NOT cached (r16): exact_then_near_dedup's window-based exact
        # dedup reads this exactly once into the exact_unique checkpoint,
        # so a cache would materialize the scored text a second time
        # with no second reader (obs_raw/obs_clean fire on that one pass)
        clean = clean.observe(obs_clean, F.count(F.lit(1)).alias("n"))

        # the dedup-survivors stage shared verbatim with
        # textops.prepare_training_corpus — one definition, so the
        # pipeline entry points can never dedup differently. Its
        # exact_unique checkpoint consumes clean in one pass, firing
        # obs_raw/obs_clean/obs_exact on the way.
        exact_unique, survivors, comps, obs_exact, obs_final = (
            exact_then_near_dedup(spark, clean, near_threshold)
        )
        to_unpersist += [exact_unique, survivors]
        counts = {
            "n_raw": int(obs_raw.get["n"]),
            "n_quarantined": n_quarantined,
            "n_clean": int(obs_clean.get["n"]),
            "n_exact_unique": int(obs_exact.get["n"]),
        }
    except Exception:
        for frame in to_unpersist:
            release_frame(frame)
        if comps is not None:
            free_local_checkpoint(comps)
        raise
    return counts, survivors, to_unpersist, comps, obs_final


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
    counts, survivors, to_unpersist, comps, obs_final = _filter_and_dedup(
        spark, in_path, fmt, min_quality, lang, near_threshold
    )
    try:
        manifest_df = tokenize_and_shard(
            spark,
            sf_dir="",
            out_dir=out_dir,
            n_shards=n_shards,
            n_merges=n_merges,
            min_count=min_token_count,
            docs=survivors.select("doc_id", "text", "source"),
        )
        # manifest rows come from the WRITTEN parquet (independent
        # lineage) — after this collect, nothing can re-read the dedup
        # frames, so the finally below may safely free the components
        # checkpoint
        shards = [
            {"shard": r["shard"], "n_docs": r["n_docs"], "n_tokens": r["n_tokens"]}
            for r in manifest_df.collect()
        ]
        # the shard write consumed survivors, so the observation has
        # fired — the survivor count is free (no dedicated pass)
        n_near = int(obs_final.get["n"])
    finally:
        for frame in to_unpersist:
            release_frame(frame)
        if comps is not None:
            free_local_checkpoint(comps)
    return {
        **counts,
        "n_survivors": n_near,
        # the REQUESTED layout; empty shard partitions write no files,
        # so the read-back list below may be shorter
        "n_shards": n_shards,
        "n_nonempty_shards": len(shards),
        "total_tokens": sum(s["n_tokens"] for s in shards),
        "shards": shards,
    }


def corpus_to_wds(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    fmt: str = "jsonl",
    min_quality: int = 3,
    lang: str | None = "en",
    near_threshold: float = 0.5,
    n_shards: int = 8,
) -> dict:
    """Raw corpus files in, WebDataset tar shards out — the multimodal-
    stack delivery format (`sources/webdataset.py`) instead of
    tokenized parquet: ingest (quarantine) → quality + language filter
    → exact dedup → near-dup representative pick, then the survivors'
    ``(doc_id, text, source)`` stream into deterministic tar shards
    (source rides along as a second text member per sample). The
    filter/dedup stages are the same tested operators
    :func:`corpus_to_shards` runs — this entry point only swaps the
    terminal artifact. Returns the manifest dict with per-stage doc
    counts plus the per-shard rows read back from the written tars."""
    counts, survivors, to_unpersist, comps, _obs_final = _filter_and_dedup(
        spark, in_path, fmt, min_quality, lang, near_threshold
    )
    try:
        from oasysdb_spark.sources.webdataset import write_webdataset_shards

        manifest_df = write_webdataset_shards(
            survivors.select("doc_id", "text", "source"),
            out_dir,
            n_shards=n_shards,
            text_cols=("text", "source"),
        )
        shards = [
            {
                "shard": r["shard"],
                "n_samples": r["n_samples"],
                "n_members": r["n_members"],
                "tar_bytes": r["tar_bytes"],
            }
            for r in manifest_df.collect()
        ]
    finally:
        for frame in to_unpersist:
            release_frame(frame)
        if comps is not None:
            free_local_checkpoint(comps)
    return {
        **counts,
        "n_survivors": sum(s["n_samples"] for s in shards),
        "n_shards": n_shards,
        "n_nonempty_shards": len(shards),
        "shards": shards,
    }


def corpus_audit_report(
    spark: SparkSession, data_dir: str, limit: int = 25
) -> dict:
    """ONE corpus-health report — every audit in the tier over a
    fixture-shaped data directory (``documents``/``embeddings``/
    ``events`` parquet tables, whichever each audit needs), returned as
    a JSON-able dict: per audit the exact row count and the first
    ``limit`` rows. The one-call answer to "is this ingest batch safe
    to train on", and what the ``corpus-audit --audit all`` CLI verb
    emits.

    Audits that need a table the directory lacks are reported as
    ``{"error": ...}`` rather than failing the report — a corpus
    without embeddings still gets its text/event audits."""
    from oasysdb_spark.operators import dedup, embed, relational, temporal, textops
    from oasysdb_spark.operators import vectorops as vec

    audits = {
        "tfidf_top_terms": textops.tfidf_top_terms,
        "term_burstiness": textops.term_burstiness,
        "zipf_slope": textops.zipf_slope,
        "source_length_drift": textops.source_length_drift,
        "source_token_divergence": textops.source_token_divergence,
        "encoding_quality_stats": textops.encoding_quality_stats,
        "dedup_saturation_curve": dedup.dedup_saturation_curve,
        "minhash_jaccard_calibration": dedup.minhash_jaccard_calibration,
        "simhash_band_health": dedup.simhash_band_health,
        "embedding_outlier_stats": embed.embedding_outlier_stats,
        "embedding_norm_stats": embed.embedding_norm_stats,
        "label_centroid_similarity": embed.label_centroid_similarity,
        "sq_reconstruction_stats": vec.sq_reconstruction_stats,
        "embedding_decontaminate": dedup.embedding_decontaminate_stats,
        "event_rate_anomalies": temporal.event_rate_anomalies,
        "join_key_skew_stats": relational.join_key_skew_stats,
    }
    report: dict = {}
    for name, fn in audits.items():
        try:
            res = fn(spark, data_dir).cache()
            n = res.count()
            rows = [r.asDict() for r in res.limit(limit).collect()]
            res.unpersist()
            report[name] = {"n_rows": n, "rows": rows}
        except Exception as exc:  # noqa: BLE001 — report, don't abort the rest
            report[name] = {"error": f"{type(exc).__name__}: {exc}"}
    return report
