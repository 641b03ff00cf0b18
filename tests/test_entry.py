"""Driver-contract smoke: entry() runs and yields rows with a stable
schema; every queries() key has either an oracle or is documented
non-SQL; all callables run at sf0.001."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"query_id", "vec_id", "distance", "rn"}


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # currently every query is SQL-expressible → full oracle coverage
    assert set(oracles) == set(qs)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_each_query_runs_smoke(spark, sf_dir, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, sf_dir)
    # non-empty column list and evaluable plan
    assert df.columns
    df.limit(5).collect()