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
    round-9 rotation contract: every NEW entry and every entry whose
    underlying code changed this round must be inside the window; every
    entry pushed OUTSIDE must already hold a green hash-matched row from
    the MOST RECENT round that checked it, and that row may be at most
    two rounds old (r07 at r9) — so no query ever goes three rounds
    unchecked. The entries deferred at the two-round limit are pinned
    by name: they are the mandatory head of the NEXT round's window
    (the r10 ledger, judge r8 task 4).
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

    r7, r8 = load("CORRECTNESS_r07.json"), load("CORRECTNESS_r08.json")
    window = list(entry.queries())[:50]

    # the 22 r6-green leftovers deferred in r8 hit the two-round
    # staleness limit at r9 — the r8 verdict (task 1) pins them as the
    # mandatory window head
    deferred_r6 = {
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
    }
    must_rotate_in = (
        deferred_r6
        # new in round 9: the twelve staged self-oracles promoted
        # (the judge's r8 task-1 new-family list plus the closed-corner
        # random_projection and four more staged families).
        # customer_fuzzy_matches and random_projection also had CODE
        # changes this round (d<=2 banding / the GEMM twin), so window
        # membership is doubly mandatory for them.
        | {
            "event_rate_anomalies",
            "tfidf_top_terms",
            "events_active_users",
            "minhash_jaccard_calibration",
            "customer_fuzzy_matches",
            "hybrid_search_rrf",
            "label_centroid_similarity",
            "random_projection",
            "leakage_safe_split",
            "zipf_slope",
            "sq_reconstruction_stats",
            "dedup_saturation_curve",
        }
        # code+oracle changed this round (the third-scale sweep's
        # rounding-boundary fixes): re-entry is mandatory even though
        # each holds a green r8 row — it covers the OLD code
        | {
            "dsir_importance_sample",
            "quality_percentile_filter",
            "multimodal_features",
        }
    )
    missing = must_rotate_in - set(window)
    assert not missing, f"driver window lost: {sorted(missing)}"

    # the quadratic narrow-simhash entry stays retired (judge r7 task 4)
    assert "dedup_simhash_pairs" not in entry.queries()

    # everything rotated out must be green in its most recent check,
    # and that check may be at most two rounds old (r7 at round 9)
    deferred_at_limit = set()
    for qname in entry.queries():
        if qname in window:
            continue
        if qname == "text_bpe_tokenizer":
            continue  # rows-only: pytest-gated, never hash-green
        row = r8.get(qname) or r7.get(qname)
        assert row is not None and row["hash_match"] is True, (
            f"{qname} is outside the driver window without a green prior row"
        )
        if qname not in r8:
            deferred_at_limit.add(qname)

    # the r7-latest entries deferred past this window sit AT the
    # two-round staleness limit: round 10's window MUST lead with these
    # 36 (the ledger discipline — 14 slots remain free at r10; q3/q4/q5
    # ceded their r9 refresh slots to the changed-entry re-entries)
    assert deferred_at_limit == {
        "q3_shipping_priority",
        "q4_order_priority",
        "q5_local_supplier_volume",
        "domain_mixture_sample",
        "encoding_quality_stats",
        "source_token_divergence",
        "hard_negative_mining",
        "customers_without_orders",
        "text_boilerplate_scrub",
        "text_gopher_quality",
        "events_funnel",
        "text_repetition_stats",
        "text_vocabulary",
        "text_span_dedup",
        "embedding_balanced_sample",
        "text_heavy_hitters",
        "orders_trailing_spend",
        "events_retention_cohorts",
        "text_unigram_surprisal",
        "multimodal_audio_fingerprints",
        "dedup_representative_pick",
        "window_functions_suite",
        "grouping_sets_orders",
        "pivot_lineitem",
        "filter_dsl_embeddings",
        "skew_salted_user_join",
        "bucketed_revenue_by_priority",
        "setop_customers",
        "range_join_price_bands",
        "vec_golden_distance",
        "vec_lsh_knn_indexed",
        "text_pack_sequences",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "text_language_id",
        "text_quality",
    }, f"unexpected deferral set: {sorted(deferred_at_limit)}"

    # every query must have an oracle twin (column-name-matched
    # contract) — except the documented non-SQL-expressible set, which
    # the driver records as a weaker rows-only check
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(qs) - set(osql) == {"text_bpe_tokenizer"}
    assert set(osql) <= set(qs)
