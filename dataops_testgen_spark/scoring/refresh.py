"""Store-backed score recomputation — the reference's scoring-refresh verbs
re-expressed over the parquet RunStore:

- ``rollup_profile_scores`` / ``rollup_test_scores`` mirror
  ``run_rollup_scores.py:run_profile_rollup_scoring_queries`` /
  ``run_test_rollup_scoring_queries`` (rollup one stored run's scores
  without re-running it);
- ``recalculate_project_scores`` mirrors
  ``run_recalculate_project_scores.py:run_recalculate_project_scores``
  (latest complete profile run per table group + latest test run per
  suite, re-rolled — used when weighting config changes);
- ``refresh_score_cards`` mirrors
  ``run_refresh_score_cards_results.py:run_refresh_score_cards_results``
  (recompute each score-card's category scores from the stored latest
  runs and append a timestamped snapshot, the history the score-drop
  notifications diff against).

Everything here reads METADATA-plane store tables (one row per column /
finding / test result), so every join is broadcast-sized; no source-data
rescan happens — that is the whole point of these verbs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataops_testgen_spark.scoring.rollup import (attach_test_prevalence,
                                                  rollup_scores)

SCORE_HISTORY_SCHEMA = ("refresh_time string, kind string, run_id string, "
                        "group_key string, dq_affected_data_points double, "
                        "dq_total_data_points double, dq_score double")
SCORE_CARD_SCHEMA = ("refresh_time string, card string, category string, "
                     "label string, score double")


def latest_profile_run(store, table_group_id: str | None = None) -> str | None:
    """Most recent Complete profiling run (optionally per table group) —
    ``table_groups.last_complete_profile_run_id`` in the reference."""
    runs = store.read("profiling_runs")
    if runs is None:
        return None
    if table_group_id:
        runs = runs.filter(F.col("table_groups_id") == table_group_id)
    row = (runs.filter(F.col("status") == "Complete")
           .orderBy(F.col("start_time").desc()).take(1))
    return row[0]["profile_run_id"] if row else None


def latest_test_run(store, test_suite_key: str | None = None) -> str | None:
    runs = store.read("test_runs")
    if runs is None:
        return None
    if test_suite_key:
        runs = runs.filter(F.col("test_suite_key") == test_suite_key)
    row = (runs.filter(F.col("status") == "Complete")
           .orderBy(F.col("test_starttime").desc()).take(1))
    return row[0]["test_run_id"] if row else None


def _profile_tables_for_run(store, profile_run_id: str):
    profile = store.read("profile_results")
    anomalies = store.read("profile_anomaly_results")
    if profile is None:
        return None, None
    profile = profile.filter(F.col("profile_run_id") == profile_run_id)
    if anomalies is not None:
        anomalies = anomalies.filter(
            F.col("profile_run_id") == profile_run_id)
    return profile, anomalies


def rollup_profile_scores(store, profile_run_id: str | None = None,
                          table_group_id: str | None = None,
                          record: bool = True) -> DataFrame:
    """Re-roll one stored profiling run's DQ score from its persisted
    anomalies (prevalences were stored with the run; record counts come
    from the run's own profile rows). Appends a ``score_history`` row
    unless ``record=False``."""
    run_id = profile_run_id or latest_profile_run(store, table_group_id)
    if run_id is None:
        raise ValueError("no Complete profiling run in the store")
    profile, anomalies = _profile_tables_for_run(store, run_id)
    if profile is None or anomalies is None:
        raise ValueError(f"profile run {run_id} has no stored results")
    detail = (anomalies.join(
        profile.select("table_name", "column_name", "record_ct"),
        ["table_name", "column_name"], "left")
        .filter(F.col("record_ct").isNotNull()))
    scores = rollup_scores(detail)
    hdr = store.read("profiling_runs").filter(
        F.col("profile_run_id") == run_id).take(1)
    group = hdr[0]["table_groups_id"] if hdr else ""
    out = scores.select(
        F.lit(dt.datetime.now().isoformat()).alias("refresh_time"),
        F.lit("profile").alias("kind"), F.lit(run_id).alias("run_id"),
        F.lit(group).alias("group_key"),
        F.col("dq_affected_data_points").cast("double"),
        F.col("dq_total_data_points").cast("double"), "dq_score")
    if record:
        store.append("score_history", out)
    return out


def rollup_test_scores(store, test_run_id: str | None = None,
                       test_suite_key: str | None = None,
                       profile_run_id: str | None = None,
                       record: bool = True) -> DataFrame:
    """Re-roll one stored test run's DQ score. Prevalence formulas need the
    profiling tokens ({PRO_RECORD_CT}, {VALUE_CT}, ...), so the latest
    stored profile run (or ``profile_run_id``) supplies the lookup —
    exactly the app-DB join the reference's
    ``calc_prevalence_test_results.sql`` performs."""
    run_id = test_run_id or latest_test_run(store, test_suite_key)
    if run_id is None:
        raise ValueError("no Complete test run in the store")
    results = store.read("test_results")
    if results is None:
        raise ValueError("no stored test results")
    results = results.filter(F.col("test_run_id") == run_id)
    prof_run = profile_run_id or latest_profile_run(store)
    prof_rows: dict = {}
    if prof_run is not None:
        profile, _ = _profile_tables_for_run(store, prof_run)
        prof_rows = {(r["table_name"], r["column_name"]): r.asDict()
                     for r in profile.collect()}
    record_cts = {t: r["record_ct"] for (t, _c), r in prof_rows.items()}
    scored = attach_test_prevalence(
        [r.asDict() for r in results.collect()],
        profile_lookup=prof_rows, record_cts=record_cts)
    spark = results.sparkSession
    detail = spark.createDataFrame(
        [(r.get("table_name"), r.get("column_name"),
          int(r.get("dq_record_ct") or 0),
          float(r.get("dq_prevalence") or 0.0)) for r in scored],
        "table_name string, column_name string, record_ct long, "
        "dq_prevalence double")
    scores = rollup_scores(detail)
    hdr = store.read("test_runs").filter(
        F.col("test_run_id") == run_id).take(1)
    suite = hdr[0]["test_suite_key"] if hdr else ""
    out = scores.select(
        F.lit(dt.datetime.now().isoformat()).alias("refresh_time"),
        F.lit("test").alias("kind"), F.lit(run_id).alias("run_id"),
        F.lit(suite).alias("group_key"),
        F.col("dq_affected_data_points").cast("double"),
        F.col("dq_total_data_points").cast("double"), "dq_score")
    if record:
        store.append("score_history", out)
    return out


def recalculate_project_scores(store) -> DataFrame:
    """Reference ``run_recalculate_project_scores``: for every table group
    with a Complete profile run, re-roll its latest run; for every test
    suite with a Complete test run, re-roll its latest run; then refresh
    the score cards. Returns the appended score_history rows."""
    outs = []
    runs = store.read("profiling_runs")
    if runs is not None:
        groups = [r["table_groups_id"] for r in
                  runs.select("table_groups_id").distinct().collect()]
        for g in sorted(groups):
            rid = latest_profile_run(store, g)
            if rid is not None:
                outs.append(rollup_profile_scores(store, rid))
    truns = store.read("test_runs")
    if truns is not None:
        suites = [r["test_suite_key"] for r in
                  truns.select("test_suite_key").distinct().collect()]
        for s in sorted(suites):
            rid = latest_test_run(store, s)
            if rid is not None:
                outs.append(rollup_test_scores(store, rid))
    if not outs:
        raise ValueError("store has no Complete runs to recalculate")
    refresh_score_cards(store)
    acc = outs[0]
    for o in outs[1:]:
        acc = acc.unionByName(o)
    return acc


def refresh_score_cards(store, profile_run_id: str | None = None,
                        test_run_id: str | None = None,
                        record: bool = True) -> DataFrame:
    """Reference ``run_refresh_score_cards_results``: recompute each score
    card's per-category scores from the stored latest runs and append a
    timestamped snapshot to ``score_cards`` — the history entries that
    score-drop notifications diff (notifications.py). Categories mirror
    the reference's SCORE_CATEGORIES: dq_dimension and table_name over
    the column scoring views."""
    from dataops_testgen_spark.scoring.score_cards import (
        category_scores, profile_scoring_by_column,
        profile_scoring_by_dimension, test_scoring_by_column,
        test_scoring_by_dimension)

    prof_run = profile_run_id or latest_profile_run(store)
    test_run = test_run_id or latest_test_run(store)
    prof_col = prof_dim = None
    if prof_run is not None:
        profile, anomalies = _profile_tables_for_run(store, prof_run)
        if profile is not None and anomalies is not None:
            prof_col = profile_scoring_by_column(profile, anomalies)
            prof_dim = profile_scoring_by_dimension(profile, anomalies)
    test_col = test_dim = None
    if test_run is not None:
        # prevalence re-derives from the stored measures + profile tokens
        results = store.read("test_results").filter(
            F.col("test_run_id") == test_run)
        prof_rows: dict = {}
        if prof_run is not None:
            profile, _ = _profile_tables_for_run(store, prof_run)
            prof_rows = {(r["table_name"], r["column_name"]): r.asDict()
                         for r in profile.collect()}
        record_cts = {t: r["record_ct"]
                      for (t, _c), r in prof_rows.items()}
        scored = attach_test_prevalence(
            [r.asDict() for r in results.collect()],
            profile_lookup=prof_rows, record_cts=record_cts)
        spark = results.sparkSession
        enriched = spark.createDataFrame(
            [(r.get("test_type"), r.get("table_name"), r.get("column_name"),
              int(r.get("result_code") or 0),
              int(r.get("dq_record_ct") or 0),
              float(r.get("dq_prevalence") or 0.0)) for r in scored],
            "test_type string, table_name string, column_name string, "
            "result_code int, dq_record_ct long, dq_prevalence double")
        test_col = test_scoring_by_column(enriched)
        test_dim = test_scoring_by_dimension(enriched)
    if prof_col is None and test_col is None:
        raise ValueError("store has no runs to build score cards from")

    stamp = dt.datetime.now().isoformat()
    snaps = []
    by_dim = category_scores(prof_dim, test_dim, "dq_dimension")
    snaps.append(by_dim.select(
        F.lit(stamp).alias("refresh_time"), F.lit("project").alias("card"),
        F.lit("dq_dimension").alias("category"), "label",
        F.col("score").cast("double")))
    by_table = category_scores(prof_col, test_col, "table_name")
    snaps.append(by_table.select(
        F.lit(stamp).alias("refresh_time"), F.lit("project").alias("card"),
        F.lit("table_name").alias("category"), "label",
        F.col("score").cast("double")))
    out = snaps[0].unionByName(snaps[1])
    if record:
        store.append("score_cards", out)
    return out
