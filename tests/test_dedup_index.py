"""Incremental signature-index gates: delta probe cross-checked against
the driver-verified two-corpus decontamination op, broadcast-vs-shuffle
path agreement, index extension, and parameter-mismatch safety."""

import pytest
from pyspark.sql import functions as F

from oasysdb_spark.errors import InvalidArgumentError
from oasysdb_spark.operators import dedup, dedup_index


def _corpus(spark, sf_dir):
    return dedup.load_documents(spark, sf_dir, spread=True)


def _batch(spark, corpus):
    """A refresh batch: 30 corpus docs verbatim (guaranteed dups), 30
    lightly-edited corpus docs, and 30 brand-new docs."""
    verbatim = corpus.where(F.col("doc_id") % 17 == 0).limit(30).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    edited = corpus.where(F.col("doc_id") % 17 == 1).limit(30).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailing edit token")).alias("text"),
    )
    fresh = spark.createDataFrame(
        [
            (3_000_000 + i, f"entirely novel document number {i} "
             + " ".join(f"uniqword{i}x{j}" for j in range(30)))
            for i in range(30)
        ],
        "doc_id bigint, text string",
    )
    return verbatim.unionByName(edited).unionByName(fresh)


def test_delta_probe_matches_decontaminate(spark, sf_dir, tmp_path):
    """delta_near_dups(batch, index(corpus)) must return exactly
    decontaminate_against(batch, corpus): same candidates, same
    verification arithmetic, same best-match tie-breaks — the persisted
    index changes the physics, never the answer."""
    corpus = _corpus(spark, sf_dir)
    idx = str(tmp_path / "sigidx")
    meta = dedup_index.build_signature_index(corpus, idx)
    assert meta["n_docs"] > 0

    batch = _batch(spark, corpus)
    got = sorted(
        tuple(r)
        for r in dedup_index.delta_near_dups(spark, batch, idx, threshold=0.5).collect()
    )
    want = sorted(
        tuple(r)
        for r in dedup.decontaminate_against(
            batch, corpus, threshold=0.5
        ).collect()
    )
    assert got == want and len(got) >= 30  # at least every verbatim copy


def test_delta_probe_broadcast_and_shuffle_paths_agree(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir)
    idx = str(tmp_path / "sigidx")
    dedup_index.build_signature_index(corpus, idx)
    batch = _batch(spark, corpus)
    bc = sorted(
        tuple(r)
        for r in dedup_index.delta_near_dups(spark, batch, idx).collect()
    )
    sh = sorted(
        tuple(r)
        for r in dedup_index.delta_near_dups(
            spark, batch, idx, batch_broadcast_limit=0
        ).collect()
    )
    assert bc == sh and len(bc) > 0


def test_extend_makes_next_batch_see_prior_batch(spark, sf_dir, tmp_path):
    """After extending the index with a scrubbed batch, a later batch
    duplicating one of ITS docs is flagged against it — and the scrubbed
    (excluded) dups are NOT in the index."""
    corpus = _corpus(spark, sf_dir)
    idx = str(tmp_path / "sigidx")
    dedup_index.build_signature_index(corpus, idx)

    batch1 = _batch(spark, corpus)
    flagged = dedup_index.delta_near_dups(spark, batch1, idx)
    n_before = dedup_index.load_index_meta(idx)["n_docs"]
    n_added = dedup_index.extend_signature_index(
        batch1, idx, exclude_ids=flagged.select("doc_id")
    )
    meta = dedup_index.load_index_meta(idx)
    assert meta["n_docs"] == n_before + n_added
    n_flagged = flagged.count()
    # every batch doc that signature-qualified is either flagged or added
    assert n_added <= 90 and n_added + n_flagged >= 60

    # batch 2 copies one of batch 1's NOVEL docs verbatim
    novel = batch1.where(F.col("doc_id") >= 3_000_000).limit(1).collect()[0]
    batch2 = spark.createDataFrame(
        [(9_000_000, novel["text"])], "doc_id bigint, text string"
    )
    hits = dedup_index.delta_near_dups(spark, batch2, idx).collect()
    assert len(hits) == 1 and hits[0]["corpus_doc_id"] == novel["doc_id"]
    assert hits[0]["jaccard"] == 1.0

    # a doc duplicating a SCRUBBED (excluded) batch-1 dup matches the
    # ORIGINAL corpus doc it was scrubbed for, not the excluded id
    dup_row = flagged.limit(1).collect()[0]
    src_text = {r["doc_id"]: r["text"] for r in batch1.collect()}[dup_row["doc_id"]]
    batch3 = spark.createDataFrame(
        [(9_500_000, src_text)], "doc_id bigint, text string"
    )
    hits3 = dedup_index.delta_near_dups(spark, batch3, idx).collect()
    assert len(hits3) == 1
    assert hits3[0]["corpus_doc_id"] != dup_row["doc_id"]


def test_index_meta_required_and_param_validation(spark, sf_dir, tmp_path):
    with pytest.raises(InvalidArgumentError, match="not a signature index"):
        dedup_index.delta_near_dups(
            spark, _corpus(spark, sf_dir), str(tmp_path / "nope")
        )
    with pytest.raises(InvalidArgumentError, match="divisible"):
        dedup_index.build_signature_index(
            _corpus(spark, sf_dir), str(tmp_path / "bad"), num_hashes=16, band_size=3
        )
    # a torn/corrupt meta (crash mid-write) fails LOUD with the rebuild
    # remedy, not a raw JSONDecodeError traceback
    torn = tmp_path / "torn"
    torn.mkdir()
    (torn / "_META.json").write_text('{"num_hashes": 16, "band_')
    with pytest.raises(InvalidArgumentError, match="corrupt"):
        dedup_index.load_index_meta(str(torn))


def test_extend_invalidates_meta_until_both_appends_land(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A crash between the bands append and the shingles append must
    leave the index failing LOUD (meta gone) instead of silently
    under-deduping — extend mirrors build's invalidate-first/restore-
    after discipline, and the restore goes through the atomic
    _write_meta."""
    import os as _os

    idx = str(tmp_path / "idx")
    corpus = _corpus(spark, sf_dir).where("doc_id < 100")
    dedup_index.build_signature_index(corpus, idx)

    batch = _corpus(spark, sf_dir).where("doc_id >= 100 AND doc_id < 150")
    real_bands = dedup_index.lsh_bands

    def exploding_bands(*a, **k):
        raise RuntimeError("simulated crash before the shingles append")

    monkeypatch.setattr(dedup_index, "lsh_bands", exploding_bands)
    with pytest.raises(RuntimeError, match="simulated crash"):
        dedup_index.extend_signature_index(batch, idx)
    assert not _os.path.exists(_os.path.join(idx, "_META.json"))
    with pytest.raises(InvalidArgumentError, match="not a signature index"):
        dedup_index.load_index_meta(idx)

    # a rebuild restores service; a successful extend keeps meta intact
    monkeypatch.setattr(dedup_index, "lsh_bands", real_bands)
    dedup_index.build_signature_index(corpus, idx)
    n = dedup_index.extend_signature_index(batch, idx)
    assert n > 0
    assert dedup_index.load_index_meta(idx)["n_docs"] == 100 + n


def test_delta_probe_plan_has_no_nested_loops(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir)
    idx = str(tmp_path / "sigidx")
    dedup_index.build_signature_index(corpus, idx)
    df = dedup_index.delta_near_dups(spark, _batch(spark, corpus), idx)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the batch side broadcast
