"""Metadata-filter DSL: parser + compiler to Spark Columns.

Grammar and semantics follow the reference exactly
(/root/reference/src/types/filter.rs, /root/reference/src/types/record.rs:55-77):

- A filter string is a flat conjunction **or** disjunction of
  ``key op literal`` terms: split on ``" OR "`` if present, else ``" AND "``;
  mixing AND and OR in one expression is an error
  (/root/reference/src/types/filter.rs:43-46). Empty string → match-all
  (/root/reference/src/types/filter.rs:32-34).
- A term is ``splitn(3, ' ')`` → key, operator, value — the key cannot
  contain spaces, the value may (/root/reference/src/types/filter.rs:128-136).
  Fewer than 3 tokens raises InvalidArgumentError (the reference panics —
  divergence per SURVEY.md §2.6.3).
- Literal typing precedence: f64 → bool → quote-trimmed text
  (/root/reference/src/types/record.rs:55-77). Quote trimming strips all
  leading/trailing ``'`` and ``"`` characters.
- Operators: ``= != > >= < <= CONTAINS``
  (/root/reference/src/types/filter.rs:143-173).
- Evaluation truth table (/root/reference/src/types/filter.rs:74-118):
  missing key → false; value-type ≠ literal-type → false; text supports
  ``= != CONTAINS`` only (ordered ops on text → false); number supports all
  six comparisons; bool supports ``= !=`` only. We encode this with
  null-coalescing so SQL three-valued logic can't leak NULLs into results.

Two metadata layouts are supported:

- :class:`MapLayout` — the record-store layout: three typed map columns
  ``m_text: map<string,string>``, ``m_num: map<string,double>``,
  ``m_bool: map<string,boolean>`` (FIXTURES.md F1). Typed maps (instead of
  one stringly-typed map) keep filter predicates sargable.
- :class:`ColumnLayout` — metadata as top-level typed DataFrame columns
  (the idiomatic Spark endpoint, e.g. ``embeddings.label``); predicates
  compile to plain column comparisons, so Catalyst pushes them into the
  parquet scan (PushedFilters) — the distributed analog of the reference
  evaluating the filter inside the probe loop
  (/root/reference/src/cores/index.rs:197-199).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oasysdb_spark.errors import InvalidArgumentError

OPERATORS = ("=", "!=", ">", ">=", "<", "<=", "CONTAINS")
_ORDERED_OPS = (">", ">=", "<", "<=")


@dataclass(frozen=True)
class Term:
    """One ``key op literal`` term with the literal's inferred type."""

    key: str
    op: str
    value: str | float | bool

    @property
    def vtype(self) -> str:
        if isinstance(self.value, bool):
            return "bool"
        if isinstance(self.value, float):
            return "num"
        return "text"


@dataclass(frozen=True)
class Filter:
    """Parsed filter: terms joined by a single connective ('AND' | 'OR'),
    or the match-all filter (no terms)."""

    connective: str
    terms: tuple[Term, ...]

    @property
    def is_match_all(self) -> bool:
        return not self.terms


def _parse_value(raw: str) -> str | float | bool:
    """Literal coercion: number → bool → quote-trimmed text
    (/root/reference/src/types/record.rs:55-77).

    Python ``float()`` accepts underscore digit separators ('1_0' → 10.0)
    but Rust ``f64::from_str`` does not — such a literal must type as Text
    here too, or the type-mismatch → false truth table flips for the term.
    """
    if "_" not in raw:
        try:
            return float(raw)
        except ValueError:
            pass
    # Rust bool::from_str accepts exactly "true" / "false".
    if raw == "true":
        return True
    if raw == "false":
        return False
    return raw.strip("'\"")


def _parse_term(raw: str) -> Term:
    # splitn(3, ' ') + per-token trim, exactly like the reference
    # (/root/reference/src/types/filter.rs:127-132): "name =  a " parses
    # as ('name', '=', 'a'); doubled spaces BEFORE the operator still
    # yield an empty operator token -> clean error, both engines.
    parts = [p.strip() for p in raw.split(" ", 2)]
    if len(parts) < 3:
        raise InvalidArgumentError(
            f"malformed filter term {raw!r}: expected 'key op value'"
        )
    key, op, value = parts
    if op not in OPERATORS:
        raise InvalidArgumentError(
            f"unknown filter operator {op!r}; supported: {', '.join(OPERATORS)}"
        )
    return Term(key=key, op=op, value=_parse_value(value))


def parse_filter(expr: str | None) -> Filter:
    """Parse a filter string into a :class:`Filter` AST."""
    if expr is None or expr.strip() == "":
        return Filter(connective="AND", terms=())
    if " OR " in expr:
        if " AND " in expr:
            raise InvalidArgumentError(
                "mixing AND and OR in one filter is not supported"
            )
        return Filter("OR", tuple(_parse_term(t) for t in expr.split(" OR ")))
    return Filter("AND", tuple(_parse_term(t) for t in expr.split(" AND ")))


# ---------------------------------------------------------------------------
# Layouts: how metadata keys resolve to Spark columns.
# ---------------------------------------------------------------------------


class MapLayout:
    """Metadata stored as three typed maps: m_text / m_num / m_bool."""

    def __init__(
        self,
        text_col: str = "m_text",
        num_col: str = "m_num",
        bool_col: str = "m_bool",
    ):
        self.text_col, self.num_col, self.bool_col = text_col, num_col, bool_col

    def term_column(self, term: Term) -> Column:
        if term.vtype == "num":
            val = F.col(self.num_col).getItem(term.key)
            return _numeric_predicate(val, term)
        if term.vtype == "bool":
            val = F.col(self.bool_col).getItem(term.key)
            return _bool_predicate(val, term)
        val = F.col(self.text_col).getItem(term.key)
        return _text_predicate(val, term)


class ColumnLayout:
    """Metadata as top-level typed columns; requires the DataFrame to
    resolve column types (for the type-mismatch → false rule)."""

    def __init__(self, df: DataFrame):
        self._types = dict(df.dtypes)

    def term_column(self, term: Term) -> Column:
        dtype = self._types.get(term.key)
        if dtype is None:
            # Missing key → false (/root/reference/src/types/filter.rs:75-79).
            return F.lit(False)
        # Spark renders decimal dtypes as 'decimal(p,s)' — prefix match
        is_num = dtype in (
            "double", "float", "int", "bigint", "smallint", "tinyint"
        ) or dtype.startswith("decimal")
        is_bool = dtype == "boolean"
        is_text = dtype in ("string", "varchar")
        val = F.col(term.key)
        if term.vtype == "num":
            return _numeric_predicate(val.cast("double"), term) if is_num else F.lit(False)
        if term.vtype == "bool":
            return _bool_predicate(val, term) if is_bool else F.lit(False)
        return _text_predicate(val, term) if is_text else F.lit(False)


def _numeric_predicate(val: Column, term: Term) -> Column:
    lit = F.lit(float(term.value))
    ops = {
        "=": val == lit,
        "!=": val != lit,
        ">": val > lit,
        ">=": val >= lit,
        "<": val < lit,
        "<=": val <= lit,
    }
    pred = ops.get(term.op)
    if pred is None:  # CONTAINS on a number → false (:99-109 covers 6 ops only)
        return F.lit(False)
    return F.coalesce(pred, F.lit(False))


def _bool_predicate(val: Column, term: Term) -> Column:
    lit = F.lit(bool(term.value))
    if term.op == "=":
        pred = val == lit
    elif term.op == "!=":
        pred = val != lit
    else:  # ordered/CONTAINS on bool → false (:111-117)
        return F.lit(False)
    return F.coalesce(pred, F.lit(False))


def _text_predicate(val: Column, term: Term) -> Column:
    lit = F.lit(str(term.value))
    if term.op == "=":
        pred = val == lit
    elif term.op == "!=":
        pred = val != lit
    elif term.op == "CONTAINS":
        pred = val.contains(lit)
    else:  # ordered ops on text → false (:89-97)
        return F.lit(False)
    return F.coalesce(pred, F.lit(False))


def compile_filter(expr: str | None, layout) -> Column:
    """Compile a filter string into a boolean Column under the given layout."""
    ast = parse_filter(expr)
    if ast.is_match_all:
        return F.lit(True)
    preds = [layout.term_column(t) for t in ast.terms]
    out = preds[0]
    for p in preds[1:]:
        out = (out | p) if ast.connective == "OR" else (out & p)
    return out


# ---------------------------------------------------------------------------
# SQL rendering (for the DuckDB correctness oracle over ColumnLayout tables).
# ---------------------------------------------------------------------------


def filter_to_sql(expr: str | None, column_types: dict[str, str]) -> str:
    """Render the same truth table as ANSI SQL (DuckDB-compatible) for
    metadata stored as top-level columns. Used to generate oracle queries."""
    ast = parse_filter(expr)
    if ast.is_match_all:
        return "TRUE"

    def term_sql(term: Term) -> str:
        dtype = column_types.get(term.key)
        if dtype is None:
            return "FALSE"
        is_num = dtype in (
            "double", "float", "int", "bigint", "integer"
        ) or dtype.startswith("decimal")
        is_bool = dtype == "boolean"
        is_text = dtype in ("string", "varchar")
        if term.vtype == "num":
            if not is_num or term.op == "CONTAINS":
                return "FALSE"
            return f"COALESCE({term.key} {term.op.replace('!=', '<>')} {float(term.value)!r}, FALSE)"
        if term.vtype == "bool":
            if not is_bool or term.op not in ("=", "!="):
                return "FALSE"
            lit = "TRUE" if term.value else "FALSE"
            return f"COALESCE({term.key} {term.op.replace('!=', '<>')} {lit}, FALSE)"
        if not is_text:
            return "FALSE"
        lit = "'" + str(term.value).replace("'", "''") + "'"
        if term.op == "=":
            return f"COALESCE({term.key} = {lit}, FALSE)"
        if term.op == "!=":
            return f"COALESCE({term.key} <> {lit}, FALSE)"
        if term.op == "CONTAINS":
            return f"COALESCE(contains({term.key}, {lit}), FALSE)"
        return "FALSE"

    joiner = f" {ast.connective} "
    return "(" + joiner.join(term_sql(t) for t in ast.terms) + ")"
