"""Filter DSL truth table, mirroring /root/reference/src/types/filter.rs:180-231
and the literal-coercion rules of /root/reference/src/types/record.rs:55-77
over the canonical metadata row ("Alice", 20.0, 3.5, true) (FIXTURES.md F3).
"""

import pytest
from pyspark.sql import functions as F

from oasysdb_spark.errors import InvalidArgumentError
from oasysdb_spark.filters import (
    ColumnLayout,
    MapLayout,
    compile_filter,
    filter_to_sql,
    parse_filter,
)


@pytest.fixture(scope="module")
def alice_df(spark):
    return spark.createDataFrame(
        [
            (
                "r1",
                {"name": "Alice"},
                {"age": 20.0, "gpa": 3.5},
                {"active": True},
            )
        ],
        "id string, m_text map<string,string>, m_num map<string,double>, m_bool map<string,boolean>",
    )


def _matches(df, expr) -> bool:
    return df.where(compile_filter(expr, MapLayout())).count() == 1


TRUTH_TABLE = [
    ("name CONTAINS Alice", True),
    ("name = Bob", False),
    ("name = Alice", True),
    ("age >= 20 AND gpa < 4.0", True),
    ("age >= 20 AND gpa < 3.0", False),
    ("active = true", True),
    ("active != true", False),
    ("gpa >= 3.0 OR age < 21", True),
    ("gpa >= 4.0 OR age < 15", False),
    # missing key → false (/root/reference/src/types/filter.rs:75-79)
    ("height > 1", False),
    # type mismatch → false (:81-87): name is text, literal is number
    ("name > 5", False),
    # ordered ops on text → false (:89-97)
    ("name > Alice", False),
    # CONTAINS on a number key → false
    ("age CONTAINS 2", False),
    ("", True),  # empty filter passes everything (:32-34)
]


@pytest.mark.parametrize("expr,expected", TRUTH_TABLE)
def test_truth_table(alice_df, expr, expected):
    assert _matches(alice_df, expr) is expected


def test_parse_shapes():
    f = parse_filter("gpa >= 3.0 OR age < 21")
    assert f.connective == "OR" and len(f.terms) == 2
    assert f.terms[0].value == 3.0 and f.terms[0].vtype == "num"

    f = parse_filter("name = 'Bob Smith'")
    assert f.terms[0].value == "Bob Smith"  # quote-trimmed, value may contain spaces

    f = parse_filter('name = "quoted"')
    assert f.terms[0].value == "quoted"

    # coercion precedence: number → bool → text
    assert parse_filter("x = 42").terms[0].vtype == "num"
    assert parse_filter("x = true").terms[0].vtype == "bool"
    assert parse_filter("x = True").terms[0].vtype == "text"  # Rust bool parse is lowercase-only


def test_mixed_connectives_error():
    with pytest.raises(InvalidArgumentError):
        parse_filter("a = 1 AND b = 2 OR c = 3")


def test_malformed_term_error():
    # reference panics on <3 tokens (/root/reference/src/types/filter.rs:129-135);
    # we raise a clean error (SURVEY.md §2.6.3)
    with pytest.raises(InvalidArgumentError):
        parse_filter("age >=")
    with pytest.raises(InvalidArgumentError):
        parse_filter("age ~~ 3")


def test_column_layout(spark):
    df = spark.createDataFrame(
        [(1, "Alice", 20.0, True)], "id int, name string, age double, active boolean"
    )
    layout = ColumnLayout(df)
    assert df.where(compile_filter("age >= 20 AND name CONTAINS lic", layout)).count() == 1
    assert df.where(compile_filter("name > 5", layout)).count() == 0
    assert df.where(compile_filter("missing = 1", layout)).count() == 0
    assert df.where(compile_filter("active = true", layout)).count() == 1


def test_filter_to_sql_duckdb_parity(spark):
    import duckdb

    types = {"name": "string", "age": "double", "active": "boolean"}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 'Alice' AS name, 20.0::DOUBLE AS age, TRUE AS active")
    df = spark.createDataFrame([("Alice", 20.0, True)], "name string, age double, active boolean")
    layout = ColumnLayout(df)
    for expr, expected in [
        ("name CONTAINS lic AND age >= 20", True),
        ("name = Bob OR active = true", True),
        ("name > 5", False),
        ("missing = 1", False),
    ]:
        sql = filter_to_sql(expr, types)
        duck = con.execute(f"SELECT count(*) FROM t WHERE {sql}").fetchone()[0] == 1
        sparkside = df.where(compile_filter(expr, layout)).count() == 1
        assert duck == sparkside == expected


def test_underscore_literal_types_as_text():
    """Python float() accepts '1_0' (= 10.0); Rust f64::from_str does not,
    so the reference types such a literal as Text. Match Rust."""
    from oasysdb_spark.filters import parse_filter

    term = parse_filter("x = 1_0").terms[0]
    assert term.value == "1_0" and term.vtype == "text"
    # plain numerics still parse as numbers
    assert parse_filter("x = 10").terms[0].vtype == "num"
    assert parse_filter("x = 1.5e3").terms[0].vtype == "num"


def test_decimal_column_numeric_filter(spark):
    """Spark renders decimal dtypes as 'decimal(p,s)'; the numeric-type
    check must prefix-match or decimal terms silently compile to FALSE."""
    import duckdb
    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal("12.50"),), (Decimal("99.99"),)], "price decimal(10,2)"
    )
    layout = ColumnLayout(df)
    assert df.where(compile_filter("price > 50", layout)).count() == 1

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 12.50::DECIMAL(10,2) AS price UNION ALL SELECT 99.99")
    sql = filter_to_sql("price > 50", dict(df.dtypes))
    assert con.execute(f"SELECT count(*) FROM t WHERE {sql}").fetchone()[0] == 1
