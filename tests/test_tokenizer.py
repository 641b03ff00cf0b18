"""BPE tokenizer trainer/encoder gates: pinned hand-computed merges,
local==distributed equivalence, encode==training-replay equivalence,
overlap/greedy semantics, floors, determinism, and the fixture run."""

import pytest
from pyspark.sql import functions as F

from oasysdb_spark.operators import tokenizer as tok


def _counts_df(spark, pairs):
    return spark.createDataFrame(pairs, "pretoken string, cnt bigint")


def test_merges_pinned_on_classic_corpus(spark):
    """Sennrich-style toy corpus, merges hand-computed. Corpus:
    low x5, lower x2, newest x6, widest x3 (each ending in </w>).

    Round 1 pair counts: (e,s) = (s,t) = (t,</w>) = 9 (newest+widest),
    (w,e) = 8, (l,o) = (o,w) = 7 — the three-way tie at 9 breaks to the
    lexicographically smallest (left, right) tuple, ("e","s").
    Round 2: (es,t) and (t,</w>) tie at 9 → ("es","t") wins ("es" <
    "t"). Round 3: (est,</w>) = 9 beats everything else (≤ 8)."""
    df = _counts_df(
        spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    )
    merges = tok.bpe_train(df, n_merges=3, min_count=1)
    assert [(l, r) for l, r, _ in merges] == [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
    ]
    assert [c for _, _, c in merges] == [9, 9, 9]


def test_local_equals_distributed(spark):
    """Both trainer paths must learn the identical ranked merge table,
    including on tie-heavy and overlap-heavy inputs."""
    words = [
        ("aaa", 4),       # overlap-inclusive counting: (a,a) counts twice
        ("aaaa", 1),
        ("banana", 3),
        ("bandana", 2),
        ("abracadabra", 2),
        ("cab", 7),
        ("abc", 7),       # tie pressure on (a,b)/(b,c)/(c,a)
    ]
    df = _counts_df(spark, words)
    local = tok.bpe_train(df, n_merges=10, min_count=1)
    dist = tok.bpe_train(df, n_merges=10, min_count=1, force_distributed=True)
    assert local == dist
    assert len(local) > 0


def test_greedy_overlap_semantics():
    """'aaaa' under (a,a) merges greedily left-to-right → (aa, aa);
    'aaa' → (aa, a). Counting stays overlap-inclusive."""
    assert tok._merge_word(("a", "a", "a", "a"), "a", "a") == ("aa", "aa")
    assert tok._merge_word(("a", "a", "a"), "a", "a") == ("aa", "a")
    assert tok._pairs(("a", "a", "a")) == [("a", "a"), ("a", "a")]


def test_min_count_and_min_pair_floors(spark):
    df = _counts_df(spark, [("aa", 10), ("zz", 1)])
    # min_count floors 'zz' out entirely: no (z,z) merge can appear
    merges = tok.bpe_train(df, n_merges=5, min_count=2)
    assert all(l != "z" for l, _, _ in merges)
    # min_pair_count stops training before singleton pairs get slots
    df2 = _counts_df(spark, [("ab", 1)])
    assert tok.bpe_train(df2, n_merges=5, min_count=1, min_pair_count=2) == []


def test_encode_replays_training(spark):
    """Encoding a training pretoken with the learned ranks reproduces
    the exact symbol sequence training left it with — pinned by
    re-deriving the training-side sequences via sequential replay."""
    words = [("banana", 3), ("bandana", 2), ("low", 5), ("lowest", 4)]
    df = _counts_df(spark, words)
    merges = tok.bpe_train(df, n_merges=8, min_count=1)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    for w, _ in words:
        replay = tok._initial_symbols(w)
        for l, r, _ in merges:
            replay = tok._merge_word(replay, l, r)
        assert tuple(tok.encode_pretoken(w, ranks, merges)) == replay, w


def test_encode_roundtrip_and_monotone_compression(spark):
    """Concatenating a pretoken's symbols (marker stripped) recovers the
    pretoken; a larger merge budget never increases its token count."""
    df = _counts_df(spark, [("internationalization", 3), ("nation", 9), ("inter", 4)])
    merges = tok.bpe_train(df, n_merges=12, min_count=1)
    prev = None
    for cut in range(len(merges) + 1):
        sub = merges[:cut]
        ranks = {(l, r): i for i, (l, r, _) in enumerate(sub)}
        sym = tok.encode_pretoken("internationalization", ranks, sub)
        assert "".join(sym).replace(tok.END_OF_WORD, "") == "internationalization"
        n = len(sym)
        if prev is not None:
            assert n <= prev
        prev = n
    # unseen characters stay single-symbol (byte-fallback analogue)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    sym = tok.encode_pretoken("xyz", ranks, merges)
    assert sym == ["x", "y", "z", tok.END_OF_WORD]


def test_tokenizer_stats_fixture_run(spark, sf_dir):
    """End-to-end on the sf0.001 documents fixture: deterministic
    across two runs, per-source rows, sane bounds (every pretoken
    yields at least one token so fertility ≥ 1; chars_per_token can
    dip below 1 only via the </w> marker on unmerged short words)."""
    a = tok.tokenizer_stats(spark, sf_dir, n_merges=64, min_count=2)
    b = tok.tokenizer_stats(spark, sf_dir, n_merges=64, min_count=2)
    ra, rb = a.collect(), b.collect()
    assert ra == rb and len(ra) > 0
    for r in ra:
        assert r["tokens"] > 0 and r["pretokens"] > 0
        assert r["chars_per_token"] > 0
        assert r["fertility"] >= 1.0
    # more merges ⇒ corpus-wide token count must not increase
    small = tok.tokenizer_stats(spark, sf_dir, n_merges=8, min_count=2)
    tot_small = small.agg(F.sum("tokens")).collect()[0][0]
    tot_big = a.agg(F.sum("tokens")).collect()[0][0]
    assert tot_big <= tot_small


def test_pretoken_counts_matches_duckdb(spark, sf_dir):
    """The corpus-scale aggregation hash-matches a DuckDB replay —
    the SQL-expressible half of the tokenizer tier."""
    import os
    import sys

    import duckdb

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.check_correctness import compare

    got = (
        tok.pretoken_counts(spark.read.parquet(f"{sf_dir}/documents.parquet"))
        .orderBy(F.desc("cnt"), F.asc("pretoken"))
        .limit(50)
    )
    spark_cols = got.columns
    spark_rows = [tuple(r) for r in got.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    res = con.execute("""
        WITH toks AS (
          SELECT unnest(
            list_filter(
              string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''
            )
          ) AS pretoken
          FROM documents
        )
        SELECT pretoken, CAST(count(*) AS BIGINT) AS cnt FROM toks
        GROUP BY pretoken ORDER BY cnt DESC, pretoken ASC LIMIT 50
    """)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    issues = compare("pretoken_counts", spark_rows, spark_cols, duck_rows, duck_cols)
    assert not issues, issues
    # the sf0.001 fixture vocabulary is small (~31 distinct pretokens),
    # so the LIMIT 50 cap is not binding there — both engines must agree
    # on the full ranked list regardless
    assert len(spark_rows) > 10


def _zipf_corpus(n_words=600, seed=7):
    """Deterministic synthetic pretoken table with a fat Zipf head and
    enough symbol diversity to support >512 distinct merges."""
    import random

    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    out = []
    for i in range(n_words):
        ln = 4 + (i % 9)
        w = "".join(rng.choice(alpha) for _ in range(ln))
        out.append((w, max(1, n_words // (i + 1))))
    # dedupe keeping the max count (createDataFrame rows need not be
    # unique, but the trainer contract is a (pretoken, cnt) AGGREGATE)
    agg = {}
    for w, c in out:
        agg[w] = max(agg.get(w, 0), c)
    return sorted(agg.items())


def test_distributed_block_trainer_job_count(spark):
    """The r6 block Zipf-head trainer must spend Spark jobs per BLOCK,
    not per merge: >=512 merges on the distributed path must launch far
    fewer jobs than the one-aggregation-per-merge loop it replaced
    (which cost >=3 jobs x 512 merges), while learning the exact same
    table as the local trainer."""
    words = _zipf_corpus()
    df = _counts_df(spark, words)
    local = tok.bpe_train(df, n_merges=512, min_count=1)
    assert len(local) >= 512

    sc = spark.sparkContext
    sc.setJobGroup("bpe_block_probe", "job-count gate")
    try:
        dist = tok.bpe_train(
            df, n_merges=512, min_count=1, force_distributed=True
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup("bpe_block_probe")
    assert dist == local
    # one block (complete ranking) is ~5 jobs; leave headroom for limit
    # re-evaluation — but nowhere near one job per merge
    assert len(jobs) <= 40, f"{len(jobs)} jobs for 512 merges"


def test_multiblock_distributed_equals_local(spark):
    """Forcing tiny head/ranking budgets makes the block trainer run
    many blocks, threshold retries, and the single-merge fallback — the
    learned table must still be IDENTICAL to the sequential local
    algorithm (the exactness proof in _bpe_train_distributed's
    docstring, exercised end to end)."""
    words = [
        ("aaa", 4), ("aaaa", 1), ("banana", 3), ("bandana", 2),
        ("abracadabra", 2), ("cab", 7), ("abc", 7), ("low", 5),
        ("lower", 2), ("newest", 6), ("widest", 3), ("nation", 9),
        ("inter", 4), ("internationalization", 3), ("zebra", 1),
        ("quartz", 2), ("jigsaw", 2), ("mixing", 5), ("boxing", 5),
    ]
    df = _counts_df(spark, words)
    local = tok.bpe_train(df, n_merges=64, min_count=1)
    dist = tok._bpe_train_distributed(
        df, n_merges=64, min_pair_count=2, head_limit=4, head_pairs=8
    )
    # same floors as bpe_train's default min_pair_count=2
    local2 = tok.bpe_train(df, n_merges=64, min_count=1, min_pair_count=2)
    assert dist == local2
    assert len(dist) > 8
    # and the default-budget distributed path agrees with the unfloored
    # local table too
    assert (
        tok.bpe_train(df, n_merges=64, min_count=1, force_distributed=True)
        == local
    )


def _n_stored_rdds(spark):
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_distributed_trainer_releases_checkpoint_storage(spark):
    """unpersist() is a no-op on localCheckpointed frames; the trainer
    must free each superseded round's blocks explicitly or n_merges
    symbol-table copies pile up in executor storage. Only the merges
    list leaves the function, so storage must return to its baseline."""
    df = _counts_df(spark, [("banana", 3), ("bandana", 2), ("cabana", 4)])
    before = _n_stored_rdds(spark)
    merges = tok.bpe_train(df, n_merges=6, min_count=1, force_distributed=True)
    assert len(merges) > 0
    assert _n_stored_rdds(spark) <= before


def test_zero_token_source_yields_zero_ratios(spark, sf_dir):
    """A source whose docs contain no [a-z0-9] at all must report 0.0
    compression ratios, not silent nulls."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en", "web", 19),
            (2, "!!! ??? ***", "xx", "punct", 11),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    rows = {
        r["source"]: r
        for r in tok.tokenizer_stats(
            spark, sf_dir, n_merges=4, min_count=1, docs=docs
        ).collect()
    }
    assert rows["punct"]["tokens"] == 0
    assert rows["punct"]["chars_per_token"] == 0.0
    assert rows["punct"]["fertility"] == 0.0
    assert rows["web"]["fertility"] >= 1.0


def test_encode_ids_decode_roundtrip(spark):
    """Token-ID sequences decode back to the document's pretokens, and
    unseen characters map to UNK_ID."""
    counts = _counts_df(spark, [("hello", 5), ("world", 5), ("held", 2)])
    merges = tok.bpe_train(counts, n_merges=6, min_count=1)
    vocab = tok.build_vocab(counts, merges)
    assert vocab[tok.UNK_ID] == "<unk>"
    assert len(vocab) == len(set(vocab)), "vocab ids must be unique"
    docs = spark.createDataFrame(
        [(1, "Hello, WORLD!"), (2, "held hello"), (3, "qqq")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["bpe_ids"] for r in tok.encode_ids(docs, merges, vocab).collect()}
    for did, text in [(1, "hello world"), (2, "held hello")]:
        decoded = "".join(vocab[i] for i in got[did])
        assert decoded.replace(tok.END_OF_WORD, " ").strip() == text
    # 'q' never appeared in training: every char of doc 3 is <unk>,
    # but the </w> marker itself IS in-vocab
    assert got[3].count(tok.UNK_ID) == 3 and len(got[3]) == 4


def test_tokenize_and_shard_writes_balanced_artifact(spark, sf_dir, tmp_path):
    """The written shard artifact: manifest matches a direct re-read,
    partition layout is shard=K dirs, every doc appears exactly once,
    assignment is deterministic (two writes identical), and balance is
    within the same 2x-of-mean bound shard_plan is gated on."""
    import os

    out = str(tmp_path / "shards")
    manifest = tok.tokenize_and_shard(
        spark, sf_dir, out, n_shards=4, n_merges=32, min_count=2
    ).collect()
    assert {r["shard"] for r in manifest} == {0, 1, 2, 3}
    sizes = [r["n_docs"] for r in manifest]
    mean = sum(sizes) / len(sizes)
    assert max(sizes) <= 2 * mean, f"skewed shards: {sizes}"
    assert sorted(os.listdir(out))[:1] and any(
        d.startswith("shard=") for d in os.listdir(out)
    )
    back = spark.read.parquet(out)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert back.count() == n_docs
    assert back.select("doc_id").distinct().count() == n_docs
    assert dict(back.dtypes)["bpe_ids"] == "array<int>"
    # determinism: a second run writes the identical artifact
    out2 = str(tmp_path / "shards2")
    tok.tokenize_and_shard(spark, sf_dir, out2, n_shards=4, n_merges=32, min_count=2)
    a = sorted(
        (r["doc_id"], r["shard"], tuple(r["bpe_ids"]))
        for r in spark.read.parquet(out).collect()
    )
    b = sorted(
        (r["doc_id"], r["shard"], tuple(r["bpe_ids"]))
        for r in spark.read.parquet(out2).collect()
    )
    assert a == b


def test_tokenizer_save_load_roundtrip(spark, tmp_path):
    """Persisted tokenizer reloads to identical merges + vocab, and the
    reloaded artifact encodes identically; wrong files raise cleanly."""
    import pytest as _pytest

    from oasysdb_spark.errors import InvalidArgumentError

    counts = _counts_df(spark, [("hello", 5), ("help", 3), ("world", 4)])
    merges = tok.bpe_train(counts, n_merges=8, min_count=1)
    vocab = tok.build_vocab(counts, merges)
    path = str(tmp_path / "bpe.json")
    tok.save_tokenizer(path, merges, vocab)
    m2, v2 = tok.load_tokenizer(path)
    assert m2 == merges and v2 == vocab

    docs = spark.createDataFrame([(1, "hello world help")], "doc_id bigint, text string")
    a = tok.encode_ids(docs, merges, vocab).collect()[0]["bpe_ids"]
    b = tok.encode_ids(docs, m2, v2).collect()[0]["bpe_ids"]
    assert a == b and len(a) > 0

    (tmp_path / "junk.json").write_text('{"format": "nope"}')
    with _pytest.raises(InvalidArgumentError, match="not an oasysdb_bpe_v1"):
        tok.load_tokenizer(str(tmp_path / "junk.json"))
    with _pytest.raises(InvalidArgumentError, match="cannot read"):
        tok.load_tokenizer(str(tmp_path / "missing.json"))
