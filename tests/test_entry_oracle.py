"""Mirror of the driver's t2 gate: every queries() entry must hash-match its
oracle_sql() on the same parquet tables (run here at sf0.001 for speed; the
driver uses sf0.01)."""

import importlib
import sys

import pytest

sys.path.insert(0, "/root/repo")
entry_mod = importlib.import_module("__spark_entry__")

from conftest import assert_matches_oracle

QUERY_NAMES = sorted(entry_mod.queries().keys())


def test_all_queries_have_callables():
    qs = entry_mod.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    if name not in oracles:
        assert sdf.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    assert_matches_oracle(sdf, duck, oracles[name])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 10


# Queries whose hard driver-correctness signal is the priority this round
# (r11): the three new seats (Correlated_Columns cascade, OPQ query path,
# 3-state FS-EM), everything the r11 code/oracle changes touch (linkage EM
# guards, screen_anomalies(tables=) + the 34th rule + dimension rows
# through the scorecard family, the profiler slice_col refactor which
# touches every profile/merged seat, the drilldown registry), and the
# r8-green block earmarked by the r10 registry tail comment — the
# longest-unchecked seats.
_MUST_BE_IN_DRIVER_WINDOW = {
    "correlation_screen_lineitem",
    "spearman_lineitem",
    "group_dependence_lineitem",
    "opq_query_embeddings",
    "fs_em3_part",
    "fs_em_part",
    "record_linkage_part",
    "correlation_lineitem",
    "anomaly_screen_orders",
    "anomaly_screen_customer_orders",
    "incremental_screen_orders",
    "score_card_issues_co_li",
    "score_breakdown_impact_co_li",
    "score_breakdown_column_co_li",
    "score_breakdown_dimension_co_li",
    "merged_profile_orders",
    "merged_profile_percentiles",
    "merged_topfreq_orders",
    "profile_lineitem_numeric",
    "profile_customer_strings",
    "profile_sampled_lineitem",
    "combo_match_customer_orders",
    "verified_near_dups_documents",
    "hybrid_search_documents",
    "bpe_merges_documents",
    "cat_tests_lineitem",
    "cat_tests_extended",
    "cat_tests_remaining",
    "aggregate_balance_orders",
    "aggregate_balance_pct_orders",
    "aggregate_balance_range_orders",
    "aggregate_minimum_orders",
    "timeframe_combo_events",
    "timeframe_gain_events",
    "gen_constant_history",
    "drilldown_unique_orders",
    "drilldown_min_val_lineitem",
    "drilldown_outlier_lineitem",
    "drilldown_missing_days_events",
    "drilldown_aggregate_balance",
    "ann_index_probe_embeddings",
    "bm25_index_probe_documents",
    "minhash_index_probe_documents",
    "semantic_dedup_embeddings",
    "asof_join_events",
    "asof_nearest_events",
    "mixture_plan_documents",
    "mixture_tokens_documents",
    "top_freq_orders",
    "top_patterns_part",
}


def test_driver_window_rotation():
    """The grading driver oracle-checks only the first 50 queries() entries
    (dict declaration order). Pin the r11 rotation: every query whose code
    changed this round, plus the longest-unchecked seats, must sit inside
    the window — and the must-list itself must fit the 50 seats (the r7
    list held 51 names, which kept this test red for two rounds)."""
    assert len(_MUST_BE_IN_DRIVER_WINDOW) <= 50
    head = list(entry_mod.queries())[:50]
    missing = _MUST_BE_IN_DRIVER_WINDOW - set(head)
    assert not missing, f"outside the driver's first-50 window: {missing}"


def test_retired_queries_stay_out_of_registry():
    """ngram_jaccard_documents was retired from the timed registry in r9
    (r8 verdict #7): the brute-force baseline stays available as a
    function + unit oracle, but must not burn bench time or a window
    seat."""
    qs = entry_mod.queries()
    assert "ngram_jaccard_documents" not in qs
    assert "ngram_jaccard_documents" not in entry_mod.oracle_sql()
