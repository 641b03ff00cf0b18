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
    # every query is SQL-expressible → oracle twin — except the learned
    # BPE merge table (iterative argmax fixpoint; rows-only check)
    assert set(qs) - set(oracles) == {"text_bpe_tokenizer"}


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_each_query_runs_smoke(spark, sf_dir, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, sf_dir)
    # non-empty column list and evaluable plan
    assert df.columns
    df.limit(5).collect()

def test_driver_window_rotation_closes_coverage():
    """The driver oracle-checks only the FIRST 50 queries() entries. The
    round-7 rotation contract: every NEW entry and every entry whose
    underlying code changed this round must be inside the window; every
    entry pushed OUTSIDE must already hold a green hash-matched row from
    the MOST RECENT round that checked it, and that row may be at most
    two rounds old (r05 at r7) — so no query ever goes three rounds
    unchecked. The entries deferred at the two-round limit are pinned
    by name: they are the mandatory head of the NEXT round's window.
    One documented exception: `text_bpe_tokenizer` is rows-only (no
    SQL oracle can exist for the learned merge table), so its driver
    row is never hash-green — outside the window it is pytest-gated
    (tests/test_tokenizer.py determinism + local==distributed
    equivalence) instead of oracle-stale (judge r6 task 5)."""
    import json
    import os

    import __spark_entry__ as entry

    here = os.path.dirname(__file__)

    def load(name):
        with open(os.path.join(here, "..", name)) as f:
            return json.load(f)

    r5, r6 = load("CORRECTNESS_r05.json"), load("CORRECTNESS_r06.json")
    window = list(entry.queries())[:50]

    # the twelve r4-green TPC-H shapes deferred in r6 hit the two-round
    # staleness limit at r7 — the r6 verdict pins them as the mandatory
    # window head
    deferred_tpch = {
        "q3_shipping_priority",
        "q4_order_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q7_nation_volume",
        "q9_profit_by_nation_year",
        "q10_returned_customers",
        "q12_latency_priority",
        "q13_order_count_distribution",
        "q14_promo_share",
        "q15_top_supplier",
        "q17_small_qty_revenue",
    }
    must_rotate_in = (
        deferred_tpch
        # new in round 7: the five staged self-oracles promoted
        | {
            "dedup_simhash_wide_pairs",
            "domain_mixture_sample",
            "encoding_quality_stats",
            "source_token_divergence",
            "hard_negative_mining",
        }
        # code changed in round 7: wide-default flips + non-trivial
        # anti-join slice — a stale green row doesn't cover changed code
        | {
            "dedup_simhash_pairs",
            "multimodal_dhash_near_pairs",
            "customers_without_orders",
        }
    )
    missing = must_rotate_in - set(window)
    assert not missing, f"driver window lost: {sorted(missing)}"

    # everything rotated out must be green in its most recent check,
    # and that check may be at most two rounds old (r5 at round 7)
    deferred_at_limit = set()
    for qname in entry.queries():
        if qname in window:
            continue
        if qname == "text_bpe_tokenizer":
            continue  # rows-only: pytest-gated, never hash-green
        row = r6.get(qname) or r5.get(qname)
        assert row is not None and row["hash_match"] is True, (
            f"{qname} is outside the driver window without a green prior row"
        )
        if qname not in r6:
            deferred_at_limit.add(qname)

    # the r5-latest entries deferred past this window sit AT the
    # two-round staleness limit: round 8's window must lead with them
    assert deferred_at_limit == {
        "text_token_stats",
        "text_fingerprints",
        "text_stratified_sample",
        "events_sliding_windows",
        "vec_knn_euclidean",
        "vec_knn_filtered",
        "vec_radius",
        "vec_knn_batched",
        "vec_label_centroids",
        "vec_lsh_knn",
        "vec_knn_manhattan",
        "vec_knn_join_blocked",
        "q8_market_share",
        "q16_supplier_variety",
        "percentile_stats",
        "math_stats",
        "string_part_stats",
        "json_event_stats",
    }, f"unexpected deferral set: {sorted(deferred_at_limit)}"

    # every query must have an oracle twin (column-name-matched
    # contract) — except the documented non-SQL-expressible set, which
    # the driver records as a weaker rows-only check
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(qs) - set(osql) == {"text_bpe_tokenizer"}
    assert set(osql) <= set(qs)
