"""Property-based check of the filter DSL: for randomly generated filter
expressions, the Spark-compiled predicate must select exactly the rows a
pure-Python evaluator of the reference's truth table selects
(/root/reference/src/types/filter.rs:74-118: missing key → false, literal
type mismatch → false, ordered ops on text/bool → false; number → bool →
quote-trimmed-text literal coercion, record.rs:55-77).

Each hypothesis example costs one Spark job, so examples are capped and
deadline is disabled; the generator never emits " AND "/" OR " inside a
value (the reference splits on connectives before term parsing, so such a
value changes the parse — reference quirk, not an evaluator concern).
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oasysdb_spark.filters import ColumnLayout, compile_filter, parse_filter

KEYS = ("name", "age", "gpa", "active", "city")

# fixture rows: typed columns name/city text, age/gpa number, active bool;
# Nones model "missing key" (filter.rs:75-79)
ROWS = [
    (0, "Alice", 20.0, 3.5, True, "paris"),
    (1, "Bob", 35.0, None, False, "oslo"),
    (2, "carol jones", None, 2.0, None, "new york"),
    (3, "", 0.0, -1.5, True, None),
    (4, "Dave", -7.0, 4.0, False, "true"),
    (5, "true", 42.0, 0.0, True, "12"),
]
SCHEMA = "rid bigint, name string, age double, gpa double, active boolean, city string"
COLTYPE = {"name": "text", "age": "num", "gpa": "num", "active": "bool", "city": "text"}


def _eval_term(row: dict, term) -> bool:
    actual = row.get(term.key)
    if actual is None:
        return False  # missing key → false
    kind = COLTYPE.get(term.key)
    if kind != term.vtype:
        return False  # literal/value type mismatch → false
    if kind == "text":
        if term.op == "=":
            return actual == term.value
        if term.op == "!=":
            return actual != term.value
        if term.op == "CONTAINS":
            return term.value in actual
        return False  # ordered ops on text → false
    if kind == "bool":
        if term.op == "=":
            return actual is term.value
        if term.op == "!=":
            return actual is not term.value
        return False
    # number: the six comparisons; CONTAINS on a number → false
    if term.op == "CONTAINS":
        return False
    return {
        "=": actual == term.value,
        "!=": actual != term.value,
        ">": actual > term.value,
        ">=": actual >= term.value,
        "<": actual < term.value,
        "<=": actual <= term.value,
    }[term.op]


def _eval_filter(row: dict, flt) -> bool:
    if flt.is_match_all:
        return True
    results = (_eval_term(row, t) for t in flt.terms)
    return all(results) if flt.connective == "AND" else any(results)


_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789", min_size=1, max_size=8
)
_value = st.one_of(
    st.integers(-50, 50).map(str),
    st.floats(-100, 100, allow_nan=False).map(lambda f: f"{f:.3f}"),
    st.sampled_from(["true", "false"]),
    _word,
    _word.map(lambda w: f"'{w} x'"),  # quoted text with a space
    st.sampled_from(["Alice", "Bob", "carol jones", "paris", "new york", "12"]),
)
_term = st.builds(
    lambda k, o, v: f"{k} {o} {v}",
    st.sampled_from(KEYS + ("missing",)),
    st.sampled_from(["=", "!=", ">", ">=", "<", "<=", "CONTAINS"]),
    _value,
)
_expr = st.one_of(
    st.just(""),
    _term,
    st.lists(_term, min_size=2, max_size=3).map(" AND ".join),
    st.lists(_term, min_size=2, max_size=3).map(" OR ".join),
)


@settings(max_examples=60, deadline=None)
@given(
    k=st.sampled_from(KEYS),
    o=st.sampled_from(["=", "!=", ">", ">=", "<", "<=", "CONTAINS"]),
    v=_value,
    post=st.sampled_from([" ", "  ", "   "]),
    trail=st.sampled_from(["", " ", "  "]),
)
def test_padded_terms_parse_like_reference_trim(k, o, v, post, trail):
    """filter.rs:127-132 trims every splitn(3, ' ') token: extra spaces
    between the operator and the value, or trailing the value, must parse
    to the same Term as the canonical single-spaced string."""
    canonical = parse_filter(f"{k} {o} {v}")
    padded = parse_filter(f"{k} {o}{post}{v}{trail}")
    assert padded == canonical


@pytest.fixture(scope="module")
def fdf(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=_expr)
def test_spark_matches_reference_truth_table(fdf, expr):
    flt = parse_filter(expr)
    expected = {
        r[0]
        for r in ROWS
        if _eval_filter(
            {k: v for k, v in zip(("rid",) + KEYS, r) if v is not None}, flt
        )
    }
    got = {
        r["rid"]
        for r in fdf.where(compile_filter(expr, ColumnLayout(fdf))).collect()
    }
    assert got == expected, f"filter {expr!r}: spark={got} expected={expected}"
