"""End-to-end pipeline gate: raw jsonl/WET files through ingest →
filter → dedup → tokenized shards, manifest counts pinned stage by
stage against hand-constructed corpus contents."""

import json

import pytest
from pyspark.sql import functions as F

from oasysdb_spark import pipeline


STORY_A = (
    "the quick brown fox jumps over the lazy dog near the river and "
    "then walks back home with a small bag of red apples for everyone"
)
STORY_B = (
    "a tall grey mountain rises over the quiet valley where the old "
    "shepherd keeps his flock of white sheep through the long winter"
)
STORY_C = (
    "deep in the green forest the children found an ancient stone "
    "bridge covered with soft moss and carved letters from another age"
)


def _doc(i, text, source="web"):
    return json.dumps(
        {"doc_id": i, "text": text, "lang": "en", "source": source}
    )


def test_corpus_to_shards_jsonl_end_to_end(spark, tmp_path):
    lines = [
        _doc(1, STORY_A),
        _doc(2, STORY_B),
        # exact duplicate of doc 1 (higher id -> dropped, keep min)
        _doc(3, STORY_A),
        # near duplicate of doc 2 (trailing edit; longer -> becomes rep)
        _doc(4, STORY_B + " indeed truly and forever more"),
        # junk that fails the quality rules
        _doc(5, "!!! ??? *** ### $$$"),
        # corrupt line -> quarantine
        '{"doc_id": 6, "text": "broken',
        _doc(7, STORY_C),
    ]
    src = tmp_path / "in"
    src.mkdir()
    (src / "part0.jsonl").write_text("\n".join(lines))
    out = str(tmp_path / "shards")

    m = pipeline.corpus_to_shards(
        spark, str(src), out, fmt="jsonl", n_shards=2, n_merges=32,
        near_threshold=0.5, lang="en",
    )
    assert m["n_raw"] == 6  # corrupt line never reaches the pipeline
    assert m["n_quarantined"] == 1
    assert m["n_clean"] == 5  # junk doc 5 dropped
    assert m["n_exact_unique"] == 4  # doc 3 collapsed into doc 1
    # docs 2 and 4 are near-dups: the LONGER doc 4 is the representative
    assert m["n_survivors"] == 3
    back = spark.read.parquet(out)
    ids = sorted(r["doc_id"] for r in back.collect())
    assert ids == [1, 4, 7]
    assert m["total_tokens"] == back.agg(
        F.sum(F.size("bpe_ids"))
    ).first()[0] > 0
    assert m["n_shards"] == 2  # the REQUESTED layout
    assert 1 <= m["n_nonempty_shards"] <= 2  # empty partitions write no files
    assert sum(s["n_docs"] for s in m["shards"]) == 3


def test_corpus_to_shards_wet_input(spark, tmp_path):
    from tests.test_sources import _wet_record

    stories = [STORY_A, STORY_B, STORY_C,
               STORY_A.replace("fox", "hare").replace("river", "lake")
               .replace("apples", "pears").replace("dog", "cat")
               .replace("quick", "slow").replace("brown", "white")
               .replace("small", "large").replace("red", "green")]
    recs = b"".join(
        _wet_record(f"r{i}", f"https://site{i % 2}.org/p{i}", stories[i])
        for i in range(4)
    )
    src = tmp_path / "wet"
    src.mkdir()
    (src / "crawl.warc.wet").write_bytes(recs)
    out = str(tmp_path / "shards")

    m = pipeline.corpus_to_shards(
        spark, str(src), out, fmt="wet", n_shards=2, n_merges=16, lang="en"
    )
    assert m["n_raw"] == 4 and m["n_survivors"] == 4
    back = spark.read.parquet(out)
    assert back.count() == 4
    assert {r["source"] for r in back.collect()} == {"site0.org", "site1.org"}


def test_unknown_format_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown corpus format"):
        pipeline.corpus_to_shards(spark, str(tmp_path), str(tmp_path / "o"), fmt="csv")


def test_cli_corpus_and_sigindex_verbs(spark, tmp_path, capsys):
    """The corpus CLI family end to end: corpus-to-shards over a jsonl
    dir, then sigindex build -> probe -> scrubbed extend over parquet
    doc tables, all emitting one JSON line per verb."""
    from oasysdb_spark.cli import main

    def run(*argv):
        assert main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    src = tmp_path / "in"
    src.mkdir()
    (src / "c.jsonl").write_text(
        "\n".join([_doc(1, STORY_A), _doc(2, STORY_B), _doc(3, STORY_A)])
    )
    out = str(tmp_path / "shards")
    m = run(
        "corpus-to-shards", "--in", str(src), "--out", out,
        "--n-shards", "2", "--n-merges", "16", "--lang", "any",
    )
    assert m["n_raw"] == 3 and m["n_survivors"] == 2
    assert spark.read.parquet(out).count() == 2

    corpus_pq = str(tmp_path / "corpus_pq")
    spark.createDataFrame(
        [(1, STORY_A), (2, STORY_B)], "doc_id bigint, text string"
    ).write.parquet(corpus_pq)
    batch_pq = str(tmp_path / "batch_pq")
    spark.createDataFrame(
        [(10, STORY_A), (11, STORY_C)], "doc_id bigint, text string"
    ).write.parquet(batch_pq)

    idx = str(tmp_path / "sigidx")
    meta = run("sigindex-build", "--index", idx, "--docs", corpus_pq)
    assert meta["ok"] and meta["n_docs"] == 2

    probe = run("sigindex-probe", "--index", idx, "--batch", batch_pq)
    assert probe["n_flagged"] == 1
    assert probe["flagged"][0] == {
        "doc_id": 10, "corpus_doc_id": 1, "jaccard": 1.0
    }

    ext = run("sigindex-extend", "--index", idx, "--batch", batch_pq, "--scrub")
    assert ext == {"ok": True, "n_appended": 1}  # the dup was scrubbed
    # the extended index now flags a copy of the NEW doc
    batch2 = str(tmp_path / "batch2_pq")
    spark.createDataFrame(
        [(20, STORY_C)], "doc_id bigint, text string"
    ).write.parquet(batch2)
    probe2 = run("sigindex-probe", "--index", idx, "--batch", batch2)
    assert probe2["n_flagged"] == 1
    assert probe2["flagged"][0]["corpus_doc_id"] == 11


def test_corpus_to_wds_end_to_end(spark, tmp_path):
    """Same front half as corpus_to_shards (quarantine, quality+lang
    filter, exact dedup, near-dup pick), terminal artifact swapped to
    WebDataset tars: manifest counts pinned stage by stage, survivors'
    text round-trips byte-exact from the written tars."""
    lines = [
        _doc(1, STORY_A),
        _doc(2, STORY_B),
        _doc(3, STORY_A),  # exact dup of 1 -> dropped
        _doc(4, STORY_B + " indeed truly and forever more"),  # near-dup rep
        _doc(5, "!!! ??? *** ### $$$"),  # fails quality
        '{"doc_id": 6, "text": "broken',  # corrupt -> quarantine
        _doc(7, STORY_C),
    ]
    src = tmp_path / "in_wds"
    src.mkdir()
    (src / "part0.jsonl").write_text("\n".join(lines))
    out = str(tmp_path / "wds_shards")

    m = pipeline.corpus_to_wds(spark, str(src), out, n_shards=2)
    assert m["n_raw"] == 6 and m["n_quarantined"] == 1
    assert m["n_clean"] == 5  # junk doc dropped
    assert m["n_exact_unique"] == 4  # exact dup of STORY_A gone
    assert m["n_survivors"] == 3  # near-dup pair collapsed to one rep
    assert m["n_nonempty_shards"] <= 2
    assert sum(s["n_members"] for s in m["shards"]) == 6  # text + source

    from oasysdb_spark.sources.webdataset import read_webdataset

    back = read_webdataset(spark, out).where("n_malformed = 0")
    texts = {
        int(r["key"]): bytes(r["data"]).decode("utf-8")
        for r in back.where("field = 'text.txt'").collect()
    }
    assert set(texts) == {2, 4, 7} or set(texts) == {1, 4, 7} or len(texts) == 3
    assert STORY_C in texts.values()


def test_cli_corpus_to_wds_verb(spark, tmp_path, capsys):
    """corpus-to-wds CLI verb: one JSON manifest line, tars on disk,
    survivors readable back."""
    from oasysdb_spark.cli import main

    def run(*argv):
        assert main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    src = tmp_path / "in_cliwds"
    src.mkdir()
    (src / "c.jsonl").write_text(
        "\n".join([_doc(1, STORY_A), _doc(2, STORY_B), _doc(3, STORY_A)])
    )
    out = str(tmp_path / "cli_wds")
    m = run(
        "corpus-to-wds", "--in", str(src), "--out", out,
        "--n-shards", "2", "--lang", "any",
    )
    assert m["n_raw"] == 3 and m["n_survivors"] == 2

    from oasysdb_spark.sources.webdataset import read_webdataset

    back = read_webdataset(spark, out).where(
        "n_malformed = 0 AND field = 'text.txt'"
    )
    assert back.count() == 2


def test_cli_corpus_audit_verb(spark, sf_dir, capsys):
    """The corpus-audit CLI verb runs each audit over a fixture-shaped
    data directory and emits one JSON object with exact counts and
    bounded rows."""
    import json

    from oasysdb_spark.cli import main

    for audit, key in [
        ("tfidf-top-terms", "score"),
        ("event-anomalies", "z_score"),
        ("label-separation", "cos_sim"),
        ("sq-reconstruction", "mean_abs_err"),
        ("join-key-skew", "entropy_bits"),
    ]:
        rc = main(["corpus-audit", "--data", sf_dir, "--audit", audit,
                   "--limit", "5"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["audit"] == audit
        assert out["n_rows"] > 0
        assert len(out["rows"]) <= 5
        assert key in out["rows"][0]


def test_cli_fuzzy_match_verb(spark, sf_dir, tmp_path, capsys):
    """The fuzzy-match CLI verb resolves a names file against a
    reference file (text or parquet), emits exact match counts with
    bounded rows, and honors --max-dist=2."""
    import json

    from pyspark.sql import functions as F

    from oasysdb_spark.cli import main

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ref_pq = str(tmp_path / "ref.parquet")
    cust.where(F.col("c_custkey") % 2 == 0).select(
        F.col("c_name").alias("name")
    ).write.parquet(ref_pq)
    names_txt = str(tmp_path / "names.txt")
    probe = [
        r["c_name"]
        for r in cust.where(F.col("c_custkey") % 2 == 1).limit(40).collect()
    ]
    with open(names_txt, "w") as fh:
        fh.write("\n".join(probe) + "\n")

    rc = main(["fuzzy-match", "--names", names_txt, "--reference", ref_pq,
               "--limit", "5"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_matches"] > 0
    assert len(out["matches"]) <= 5
    assert {"name", "ref_name", "dist"} <= set(out["matches"][0])
    assert all(m["dist"] <= 1 for m in out["matches"])

    rc = main(["fuzzy-match", "--names", names_txt, "--reference", ref_pq,
               "--max-dist", "2", "--limit", "5"])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["n_matches"] >= out["n_matches"]


def test_corpus_audit_report_all(spark, sf_dir, capsys):
    """corpus_audit_report runs the whole audit tier in one call; every
    audit over the full fixture dir succeeds with exact counts, a
    directory missing a table degrades that audit to an error entry
    instead of failing the report, and the CLI 'all' verb emits it."""
    import json
    import shutil

    from oasysdb_spark.cli import main
    from oasysdb_spark.pipeline import corpus_audit_report

    report = corpus_audit_report(spark, sf_dir, limit=3)
    assert len(report) == 16
    for name, entry in report.items():
        assert "error" not in entry, (name, entry)
        assert entry["n_rows"] > 0
        assert len(entry["rows"]) <= 3

    # text-only directory: embeddings/events audits degrade gracefully
    import os as _os
    import tempfile

    tdir = tempfile.mkdtemp(prefix="audit_textonly_")
    shutil.copy(_os.path.join(sf_dir, "documents.parquet"),
                _os.path.join(tdir, "documents.parquet"))
    partial = corpus_audit_report(spark, tdir, limit=3)
    assert "error" not in partial["tfidf_top_terms"]
    assert "error" in partial["embedding_outlier_stats"]
    assert "error" in partial["event_rate_anomalies"]

    rc = main(["corpus-audit", "--data", sf_dir, "--audit", "all",
               "--limit", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["audit"] == "all"
    assert set(out["report"]) == set(report)
