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
# (r9): everything r9's code touches, the 16-query r6 block that went two
# rounds without a driver re-check (r8 verdict "do this" #2), and the
# longest-unchecked pre-r5 seats that fill the rest of the window.
_MUST_BE_IN_DRIVER_WINDOW = {
    # NEW in r9
    "ngram_lm_documents",
    "kmeans_embeddings",
    "lr_quality_documents",
    "embedding_covariance_embeddings",
    "benford_orders",
    "fuzzy_pairs_part",
    # r9 touched these code paths (parse_event_props DDL fix, FLAC utf8
    # frame numbers + JPEG 4:2:0, cache_model on the LM scorers,
    # streaming retention)
    "json_props_events",
    "multimodal_features_documents",
    "trigram_lm_documents",
    "bigram_lm_documents",
    "retention_events",
    # the r6 block — longest without a driver hash row
    "nb_classify_documents", "curation_gate_documents",
    "session_stats_events", "rolling_features_events", "funnel_events",
    "gzip_corpus_documents", "shuffle_shards_documents",
    "hard_negatives_embeddings", "embedding_profile_embeddings",
    "bm25_topk_documents", "ivfadc_topk_embeddings",
    "rerank_ivfadc_embeddings", "resize_documents",
    "frame_sample_documents", "dsir_select_documents",
    # longest-unchecked pre-r5 seats (driver-green r1-r4 only)
    "minhash_lsh_documents", "boilerplate_dedup_documents",
    "merged_profile_orders", "pack_spans_documents",
    "centroid_outliers_embeddings", "tfidf_keywords_documents",
    "corpus_report_documents", "merged_profile_percentiles",
    "merged_topfreq_orders", "dup_substrings_documents",
    "anomaly_screen_customer_orders", "anomaly_screen_orders",
    "combo_match_customer_orders", "contingency_rules_lineitem",
    "distribution_shift_events", "dedup_clusters_documents",
    "dedup_keep_one_documents", "simhash_documents",
    "ann_lsh_topk", "profile_sampled_lineitem",
    "freshness_threshold_events", "validation_prepass",
    "incremental_screen_orders", "decontaminate_documents",
}


def test_driver_window_rotation():
    """The grading driver oracle-checks only the first 50 queries() entries
    (dict declaration order). Pin the r9 rotation: every query whose code
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
