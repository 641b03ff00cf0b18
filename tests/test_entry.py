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
    round-8 rotation contract: every NEW entry and every entry whose
    underlying code changed this round must be inside the window; every
    entry pushed OUTSIDE must already hold a green hash-matched row from
    the MOST RECENT round that checked it, and that row may be at most
    two rounds old (r06 at r8) — so no query ever goes three rounds
    unchecked. The entries deferred at the two-round limit are pinned
    by name: they are the mandatory head of the NEXT round's window.
    One documented exception: `text_bpe_tokenizer` is rows-only (no
    SQL oracle can exist for the learned merge table), so its driver
    row is never hash-green — outside the window it is pytest-gated
    (tests/test_tokenizer.py determinism + local==distributed
    equivalence) instead of oracle-stale (judge r6 task 5).
    Retired this round (judge r7 task 4): `dedup_simhash_pairs` — the
    quadratic narrow-banded twin leaves the driver contract entirely;
    the narrow path stays pytest-only over dedup.simhash_near_pairs."""
    import json
    import os

    import __spark_entry__ as entry

    here = os.path.dirname(__file__)

    def load(name):
        with open(os.path.join(here, "..", name)) as f:
            return json.load(f)

    r6, r7 = load("CORRECTNESS_r06.json"), load("CORRECTNESS_r07.json")
    window = list(entry.queries())[:50]

    # the eighteen r5-green leftovers deferred in r7 hit the two-round
    # staleness limit at r8 — the r7 verdict pins them as the mandatory
    # window head
    deferred_r5 = {
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
    }
    must_rotate_in = (
        deferred_r5
        # new in round 8: the eight staged self-oracles promoted
        # (the judge's r7 task-1 candidate list, verbatim)
        | {
            "line_dedup_stats",
            "dsir_importance_sample",
            "chunk_documents",
            "chunk_retrieval_topk",
            "component_size_histogram",
            "event_funnel",
            "quality_percentile_filter",
            "cross_source_duplication_stats",
        }
    )
    missing = must_rotate_in - set(window)
    assert not missing, f"driver window lost: {sorted(missing)}"

    # the quadratic narrow-simhash entry is retired from the contract
    assert "dedup_simhash_pairs" not in entry.queries()

    # everything rotated out must be green in its most recent check,
    # and that check may be at most two rounds old (r6 at round 8)
    deferred_at_limit = set()
    for qname in entry.queries():
        if qname in window:
            continue
        if qname == "text_bpe_tokenizer":
            continue  # rows-only: pytest-gated, never hash-green
        row = r7.get(qname) or r6.get(qname)
        assert row is not None and row["hash_match"] is True, (
            f"{qname} is outside the driver window without a green prior row"
        )
        if qname not in r7:
            deferred_at_limit.add(qname)

    # the r6-latest entries deferred past this window sit AT the
    # two-round staleness limit: round 9's window must lead with them
    assert deferred_at_limit == {
        "sessionize_events",
        "interval_overlap_join",
        "events_tumbling_hourly",
        "vec_knn_cosine",
        "parts_above_avg_price",
        "orders_by_month",
        "rollup_lineitem",
        "unpivot_lineitem",
        "top_orders_per_customer",
        "running_revenue",
        "cube_orders",
        "setop_intersect",
        "ship_latency",
        "parts_like_patterns",
        "q1_pricing_summary",
        "q2_min_cost_supplier",
        "q11_important_parts",
        "q18_large_volume_customers",
        "q19_disjunctive_revenue",
        "q20_excess_shippers",
        "q21_waiting_supplier",
        "q22_idle_customers",
    }, f"unexpected deferral set: {sorted(deferred_at_limit)}"

    # every query must have an oracle twin (column-name-matched
    # contract) — except the documented non-SQL-expressible set, which
    # the driver records as a weaker rows-only check
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(qs) - set(osql) == {"text_bpe_tokenizer"}
    assert set(osql) <= set(qs)
