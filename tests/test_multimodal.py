"""Multimodal plumbing: binary columns + typed metadata through
Arrow-batched mapInPandas, with the codec step stubbed (no imaging libs in
this environment — the decode integration point must raise cleanly)."""

import math

import pytest
from pyspark.sql import functions as F

from oasysdb_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.synthesize_media_from_documents(spark, sf_dir)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "meta"]
    assert media.schema["content"].dataType.typeName() == "binary"
    assert media.schema["meta"].dataType["media_type"].dataType.typeName() == "string"


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG...")


def test_extract_features(media):
    feats = mm.extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == media.count()
    # cross-check one row against the local reference implementation
    sample = media.orderBy("media_id").first()
    n, mean, std, ent = mm.fake_decode_stats(bytes(sample["content"]))
    got = rows[sample["media_id"]]
    assert got["n_bytes"] == n
    assert got["byte_mean"] == pytest.approx(round(mean, 6))
    assert got["entropy8"] == pytest.approx(round(ent, 6))
    assert 0 <= got["entropy8"] <= 8.0


def test_frame_sample(media):
    frames = mm.frame_sample(media, every_n=10)
    agg = frames.groupBy("media_id").agg(
        F.count("*").alias("n"), F.max("frame_index").alias("mx")
    )
    meta = media.select("media_id", F.col("meta.n_frames").alias("nf"))
    joined = {r["media_id"]: r for r in agg.join(meta, "media_id").collect()}
    for r in joined.values():
        assert r["n"] == math.ceil(r["nf"] / 10)
        assert r["mx"] <= r["nf"] - 1
        assert r["mx"] % 10 == 0