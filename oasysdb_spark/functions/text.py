"""Text-analysis column functions for the LLM-pipeline surface:
tokenization, shingling, quality metrics, language ID, fingerprinting.

Everything is built from codegen'd built-ins (regexp_*, transform,
aggregate, sequence) so the hot path stays JVM-side; every function has an
exact DuckDB SQL equivalent used by the correctness oracle (the
tokenization regex is deliberately a simple character class so Java regex
and RE2 agree).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from oasysdb_spark.functions.hashing import hash64

# Tokens = maximal runs of ascii alphanumerics on the lowered text.
TOKEN_RE = "[a-z0-9]+"
# BPE-ish lexer: words, numbers, or single non-space symbols.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small & frozen: the oracle replicates them.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "que", "dans"),
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(c: Column | str) -> Column:
    """Lowercased alphanumeric tokens, empties removed."""
    c = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != "")


def token_count_ws(c: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(c) if isinstance(c, str) else c
    return F.size(F.filter(F.split(c, "\\s+"), lambda t: t != ""))


def token_count_bpe(c: Column | str) -> Column:
    """BPE-ish token count: words + numbers + individual symbols."""
    c = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_RE), 0))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) of a token array. Guarded so
    short docs yield an empty array (Spark's ``sequence(1, 0)`` would count
    *down*, not produce an empty list)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def char_shingles(c: Column | str, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized (lower, squashed
    whitespace) text."""
    c = F.col(c) if isinstance(c, str) else c
    norm = F.regexp_replace(F.lower(c), "\\s+", " ")
    idx = F.sequence(F.lit(1), F.length(norm) - (n - 1))
    grams = F.array_distinct(F.transform(idx, lambda i: F.substring(norm, i, n)))
    return F.when(F.length(norm) >= n, grams).otherwise(F.array().cast("array<string>"))


def normalized_text(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def punct_ratio(c: Column | str) -> Column:
    """Fraction of characters that are neither alphanumeric nor whitespace."""
    c = F.col(c) if isinstance(c, str) else c
    stripped = F.regexp_replace(F.lower(c), "[a-z0-9\\s]", "")
    return F.length(stripped) / F.nullif(F.length(c), F.lit(0))


def stopword_ratio(toks: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.nullif(F.size(toks), F.lit(0))


def uniq_token_ratio(toks: Column) -> Column:
    return F.size(F.array_distinct(toks)) / F.nullif(F.size(toks), F.lit(0))


def mean_token_len(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.nullif(F.size(toks), F.lit(0))


def lang_scores(toks: Column) -> dict[str, Column]:
    """Stopword-hit count per candidate language."""
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def predict_lang(toks: Column) -> Column:
    """argmax language by stopword hits; ties and all-zero scores resolve
    to the lexicographically-first language / 'und' deterministically."""
    scores = lang_scores(toks)
    pairs = F.array(
        *[F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang")) for lang in sorted(scores)]
    )
    # array_max on (score, lang) structs: max score, then max lang — to make
    # ties deterministic *lexicographically first*, invert via min over
    # (-score, lang).
    inv = F.transform(pairs, lambda s: F.struct((-s["score"]).alias("nscore"), s["lang"].alias("lang")))
    best = F.array_min(inv)
    return F.when(-best["nscore"] > 0, best["lang"]).otherwise(F.lit("und"))


def simhash32(toks: Column, bits: int = 32) -> Column:
    """32-bit SimHash over the distinct token set — entirely row-local
    (no shuffle): for each bit, sum ±1 over token hashes, set the bit when
    the sum is positive; empty token sets hash to 0.

    Single fold with a ``bits``-wide array accumulator instead of ``bits``
    unrolled aggregates — a ~30× smaller expression tree, which cuts the
    whole-stage-codegen compile from ~5 s to well under 1 s. Shift amounts
    can't be Columns, so bit b of h is tested as ``h % 2^(b+1) >= 2^b``
    with 2^b built by ``pow`` (exact in doubles up to 2^53)."""
    toks_h = F.transform(F.array_distinct(toks), lambda t: hash64(t))
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))

    def p2(b):  # 2^b as bigint, b a Column
        return F.pow(F.lit(2.0), b).cast("bigint")

    zeros = F.array_repeat(F.lit(0), bits)
    sums = F.aggregate(
        toks_h,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            bit_idx,
            lambda a, b: a + F.when((h % (p2(b) * 2)) >= p2(b), 1).otherwise(-1),
        ),
    )
    weighted = F.zip_with(
        sums, bit_idx, lambda s, b: F.when(s > 0, p2(b)).otherwise(F.lit(0).cast("bigint"))
    )
    return F.aggregate(weighted, F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def doc_fingerprint(c: Column | str) -> Column:
    """64-bit content fingerprint: hash of the whitespace-normalized text."""
    return hash64(normalized_text(c))


def simhash32_text_udf(bits: int = 32):
    """Arrow-batched twin of ``simhash32(tokens(text))`` taking the raw
    text column — bit-identical (asserted in tests/test_operators.py).
    Same rationale as the MinHash UDF (operators/dedup.py): the
    aggregate/zip_with fold is interpreted per element, ~0.4 ms/doc; the
    numpy bit-matrix path computes identical values an order of magnitude
    faster. Distinctness matches ``array_distinct`` (first occurrence;
    order is irrelevant to the ±1 sums)."""
    import hashlib
    import re

    import numpy as np

    split = re.compile("[^a-z0-9]+")
    bit_range = np.arange(bits, dtype=np.int64)
    # token→hash memo: Zipf repetition means most tokens recur across
    # docs, so the md5 work per token amortizes to ~once per worker
    # lifetime. Capped so an adversarial vocabulary can't grow unbounded.
    memo: dict = {}
    memo_cap = 1 << 20

    @F.pandas_udf("bigint")
    def udf(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None:
                out.append(None)
                continue
            toks = list(dict.fromkeys(w for w in split.split(t.lower()) if w))
            if not toks:
                out.append(0)
                continue
            h = np.empty(len(toks), dtype=np.int64)
            for i, w in enumerate(toks):
                v = memo.get(w)
                if v is None:
                    v = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
                    if len(memo) < memo_cap:
                        memo[w] = v
                h[i] = v
            signs = 2 * ((h[:, None] >> bit_range[None, :]) & 1) - 1
            sums = signs.sum(axis=0)
            out.append(int(((sums > 0).astype(np.int64) << bit_range).sum()))
        return pd.Series(out, dtype="object")

    return udf


_LAZY_UDTFS: dict = {}


def shingle_udtf():
    """Python UDTF surface (SURVEY.md §2.5 'UDF/UDAF/UDTF' row): explode a
    document into its distinct word 3-shingles, one output row per
    shingle. The native twin is ``posexplode(word_shingles(tokens(text)))``
    — that expression form is the scale path (codegen, no Python workers);
    the UDTF exists so callers can write arbitrary Python row-generators
    against the same contract. Built lazily (decoration parses the DDL
    return type, which needs an active SparkSession) and cached.
    """
    if "shingle_udtf" not in _LAZY_UDTFS:
        from pyspark.sql.functions import udtf

        @udtf(returnType="pos int, shingle string")
        class ShingleUDTF:
            def eval(self, text: str):
                import re

                toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
                seen = set()
                pos = 0
                for i in range(len(toks) - 2):
                    g = " ".join(toks[i : i + 3])
                    if g not in seen:
                        seen.add(g)
                        yield pos, g
                        pos += 1

        _LAZY_UDTFS["shingle_udtf"] = ShingleUDTF
    return _LAZY_UDTFS["shingle_udtf"]



def simhash_words_udf(words: int = 2, bits: int = 60):
    """Arrow-batched WIDE simhash: ``words`` independent ``bits``-bit
    simhashes (token hashes salted per word with the standard suffix
    family — ``hash64(token, salt="s{j}")``, oracle-replayable via
    ``hash64_sql``)
    returned as ``array<bigint>`` — the scale variant of
    :func:`simhash32_text_udf`. Why: banded near-pair search over a
    fixed-width hash has random band collisions ~n²/2^band_bits, so
    the 32-bit/16-bit-half tier goes quadratic past ~10⁵ docs (the
    sf1→sf10 probe measured 15.3×); two 60-bit words give four 30-bit
    bands — exhaustive for hamming ≤ 3 by pigeonhole and ~zero random
    collisions at any corpus size. 60 bits (15 md5 hex chars) keeps
    every word int64-positive in both engines, same as ``hash64``."""
    import hashlib
    import re

    import numpy as np

    split = re.compile("[^a-z0-9]+")
    bit_range = np.arange(bits, dtype=np.int64)
    # per-salt token→hash memos (see simhash32_text_udf): md5 amortizes
    # to once per distinct (token, salt) per worker lifetime, capped.
    memos: list[dict] = [{} for _ in range(words)]
    memo_cap = 1 << 20

    @F.pandas_udf("array<bigint>")
    def udf(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None:
                out.append(None)
                continue
            toks = list(dict.fromkeys(w for w in split.split(t.lower()) if w))
            if not toks:
                out.append([0] * words)
                continue
            ws = []
            for j in range(words):
                suf = f"#s{j}".encode()
                memo = memos[j]
                h = np.empty(len(toks), dtype=np.int64)
                for i, w in enumerate(toks):
                    v = memo.get(w)
                    if v is None:
                        v = int(
                            hashlib.md5(w.encode("utf-8") + suf).hexdigest()[
                                :15
                            ],
                            16,
                        )
                        if len(memo) < memo_cap:
                            memo[w] = v
                    h[i] = v
                signs = 2 * ((h[:, None] >> bit_range[None, :]) & 1) - 1
                sums = signs.sum(axis=0)
                ws.append(int(((sums > 0).astype(np.int64) << bit_range).sum()))
            out.append(ws)
        return pd.Series(out, dtype="object")

    return udf
