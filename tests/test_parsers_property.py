"""Property/fuzz gates for the byte-level parsers: arbitrary (including
adversarial) bytes must never hang, loop, or raise anything but the
documented error types — the WET negative-Content-Length infinite loop
was exactly this class of bug.

Every strategy mixes pure noise with structure-bearing mutations
(real headers spliced into garbage) so the fuzz reaches past the first
magic-byte check.
"""

import gzip

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oasysdb_spark.operators import multimodal as mm
from oasysdb_spark.operators import tokenizer as tok
from oasysdb_spark.sources import corpus


def _wet_fragmenty():
    frags = st.sampled_from(
        [
            b"WARC/1.0\r\n",
            b"WARC/1.0\n",
            b"WARC-Type: conversion\r\n",
            b"Content-Length: 5\r\n",
            b"Content-Length: -5\r\n",
            b"Content-Length: 99999999\r\n",
            b"Content-Length: x\r\n",
            b"\r\n\r\n",
            b"\n\n",
            b"hello",
            b"\x1f\x8b",
            b"\x00" * 7,
        ]
    )
    return st.lists(frags, min_size=0, max_size=12).map(b"".join)


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.one_of(st.binary(max_size=400), _wet_fragmenty()))
def test_wet_parser_total_on_arbitrary_bytes(data):
    """parse_wet_records terminates on ANY input and returns well-typed
    records plus a non-negative malformed count — never an exception,
    never an infinite loop (hypothesis' deadline guards the latter via
    the example count staying bounded in time)."""
    records, bad = corpus.parse_wet_records(data)
    assert bad >= 0
    for r in records:
        assert isinstance(r["text"], str) and r["n_bytes"] >= 0


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=300))
def test_gzip_member_walk_total(data):
    """_iter_gzip_members never raises: corrupt members degrade to the
    cleanly-inflated prefix."""
    out = corpus._iter_gzip_members(b"\x1f\x8b" + data)
    assert isinstance(out, bytes)
    # a valid member followed by garbage keeps the member's payload
    ok = corpus._iter_gzip_members(gzip.compress(b"payload") + b"\x1f\x8b" + data)
    assert ok.startswith(b"payload")


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.one_of(
        st.binary(max_size=300),
        st.binary(max_size=200).map(lambda b: b"YUV4MPEG2 " + b),
        st.binary(max_size=100).map(
            lambda b: b"YUV4MPEG2 W4 H4 F25:1 C420\nFRAME\n" + b
        ),
    )
)
def test_y4m_decoder_total_on_arbitrary_bytes(data):
    """decode_y4m either returns well-formed frames or raises exactly
    ValueError / NotImplementedError — nothing else, and never hangs."""
    try:
        frames, meta = mm.decode_y4m(data)
    except (ValueError, NotImplementedError):
        return
    assert meta["n_frames"] == len(frames) > 0
    for y, _, _ in frames:
        assert y.shape == (meta["height"], meta["width"])


@settings(max_examples=80, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.text(alphabet="ab</w>", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    ),
    st.text(alphabet="ab", min_size=1, max_size=3),
    st.text(alphabet="ab<>/w", min_size=1, max_size=3),
)
def test_merge_word_invariants(sym, left, right):
    """_merge_word conserves content (concatenation is unchanged),
    never grows the sequence, and a merged output contains no adjacent
    (left, right) pair."""
    out = tok._merge_word(tuple(sym), left, right)
    assert "".join(out) == "".join(sym)
    assert len(out) <= len(sym)
    assert (left, right) not in tok._pairs(out)


def _lev_reference(s: str, t: str) -> int:
    """Textbook full-DP Levenshtein — the truth the fuzzy tier's fast
    verifiers are fuzzed against."""
    if len(s) < len(t):
        s, t = t, s
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.text(alphabet="abcé", max_size=12),
    st.text(alphabet="abcé", max_size=12),
)
def test_fuzzy_verifiers_match_full_dp(s, t):
    """The fuzzy tier's two fast verifiers are exact within their caps
    on arbitrary strings (small alphabet maximizes near-miss density;
    é keeps codepoint-vs-byte counting honest): the structural
    two-pointer check == min(lev, 2), the banded Ukkonen DP ==
    min(lev, cap+1) at caps 1-3."""
    from oasysdb_spark.operators import similarity_join as sj

    true = _lev_reference(s, t)
    assert sj._dist_within1(s, t) == min(true, 2)
    for cap in (1, 2, 3):
        assert sj._lev_capped(s, t, cap) == min(true, cap + 1)


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.text(alphabet="abc", min_size=1, max_size=8), min_size=2, max_size=12, unique=True),
    st.sampled_from([1, 2]),
)
def test_deletion_banding_exhaustive_on_arbitrary_names(names, d):
    """The SymSpell banding theorem the Spark join relies on, fuzzed in
    pure Python (same _deletions_upto neighborhoods, dict-join instead
    of Spark): candidates-sharing-a-variant + exact verify finds
    EXACTLY the pairs within lev <= d — no true pair escapes blocking,
    no false pair survives the verify."""
    from oasysdb_spark.operators import similarity_join as sj

    index: dict = {}
    for nm in names:
        for v in sj._deletions_upto(nm, d):
            index.setdefault(v, set()).add(nm)
    cands = set()
    for nm in names:
        hits = set()
        for v in sj._deletions_upto(nm, d):
            hits |= index.get(v, set())
        for other in hits:
            if nm < other:
                cands.add((nm, other))
    got = sorted(
        (a, b)
        for (a, b) in cands
        if _lev_reference(a, b) <= d
    )
    truth = sorted(
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if _lev_reference(*sorted((a, b))) <= d
    )
    truth = sorted((min(a, b), max(a, b)) for a, b in truth)
    assert got == truth


# ---------------------------------------------------------------------------
# watermark helpers (sources/jdbc.py) — pure-Python properties, no Spark
# ---------------------------------------------------------------------------

def _wm_values():
    import datetime
    import decimal

    from hypothesis import strategies as st

    return st.one_of(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.decimals(
            allow_nan=False, allow_infinity=False, places=6,
            min_value=-10**18, max_value=10**18,
        ).map(decimal.Decimal),
        st.datetimes(
            min_value=datetime.datetime(1900, 1, 1),
            max_value=datetime.datetime(2200, 1, 1),
        ),
        st.dates(
            min_value=datetime.date(1900, 1, 1),
            max_value=datetime.date(2200, 1, 1),
        ),
    )


@settings(max_examples=300, deadline=None)
@given(_wm_values())
def test_watermark_state_roundtrip_lossless(value):
    """The persisted state form must reload to the ORIGINAL value under
    each kind's parse (the partitioned path re-parses persisted marks
    for cut arithmetic): str(datetime) keeps microseconds through
    fromisoformat, str(Decimal) through Decimal(), ints/floats pass
    native. A lossy round-trip would silently shift the next sync's
    window bound."""
    import datetime
    import decimal

    from oasysdb_spark.sources.jdbc import watermark_kind, watermark_state

    kind, out = watermark_state(value)
    assert kind == watermark_kind(value)
    if kind == "num":
        parsed = (
            out if isinstance(out, (int, float))
            else decimal.Decimal(str(out))
        )
        assert parsed == value
    elif kind == "ts":
        assert datetime.datetime.fromisoformat(str(out)) == value
    elif kind == "date":
        assert datetime.date.fromisoformat(str(out)) == value


def _wm_pairs():
    """A (low, high) pair of the SAME kind with low <= high — drawn as
    a sorted pair from one kind's strategy, so nothing filters."""
    import datetime
    import decimal

    from hypothesis import strategies as st

    kinds = [
        st.integers(min_value=-(2**62), max_value=2**62),
        st.decimals(
            allow_nan=False, allow_infinity=False, places=6,
            min_value=-10**18, max_value=10**18,
        ).map(decimal.Decimal),
        st.datetimes(
            min_value=datetime.datetime(1900, 1, 1),
            max_value=datetime.datetime(2200, 1, 1),
        ),
        st.dates(
            min_value=datetime.date(1900, 1, 1),
            max_value=datetime.date(2200, 1, 1),
        ),
    ]
    return st.one_of(
        *[st.tuples(k, k).map(lambda t: (min(t), max(t))) for k in kinds]
    )


@settings(max_examples=200, deadline=None)
@given(_wm_pairs(), st.integers(min_value=1, max_value=16), st.booleans())
def test_watermark_range_predicates_structure(pair, n, include_low):
    """Structural exhaustiveness of the parallel-range split, for every
    kind and bound pair: exactly n predicates; the FIRST predicate's
    lower literal is exactly literal(low) with the requested
    inclusivity, the LAST predicate's upper literal is exactly
    literal(high); adjacent predicates share one identical cut literal
    (`> c` follows `<= c`), so coverage of (low, high] — or
    [low, high] — is exact by construction regardless of how the cut
    interpolation rounds."""
    from oasysdb_spark.sources.jdbc import (
        quote_sql_ident,
        watermark_kind,
        watermark_literal,
        watermark_range_predicates,
    )

    low, high = pair
    kind = watermark_kind(low)

    preds = watermark_range_predicates(
        "wm", low, high, kind, n, include_low=include_low
    )
    assert len(preds) == n
    qcol = quote_sql_ident("wm")
    first_op = ">=" if include_low else ">"
    lo_lit = watermark_literal(low, kind, remote=True)
    hi_lit = watermark_literal(high, kind, remote=True)
    assert preds[0].startswith(f"{qcol} {first_op} {lo_lit} AND ")
    assert preds[-1].endswith(f" {hi_lit}")
    # adjacency: predicate i's upper literal == predicate i+1's lower
    # literal, verbatim — the shared-literal exactness argument
    uppers = [p.split(f" AND {qcol} <= ", 1)[1] for p in preds]
    lowers = [
        p.split(" AND ", 1)[0].split(" ", 2)[2] for p in preds
    ]
    for i in range(n - 1):
        assert uppers[i] == lowers[i + 1]
    # interior operators strict
    for p in preds[1:]:
        assert p.split(" AND ")[0].split(" ")[1] == ">"
