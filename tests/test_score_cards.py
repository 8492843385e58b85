"""Scorecard view/breakdown/issue golden-value tests on crafted fixtures.

Formula fixtures mirror `get_score_card_breakdown_by_column.sql:40-47`:
impact = 100·(prof_dp·(1−prof_score)/prof_total + test_dp·(1−test_score)/
test_total); score = prof_score·test_score; issue_ct summed across sides.
"""

import math

import pytest
from pyspark.sql import functions as F

from dataops_testgen_spark.scoring import score_cards as SC


@pytest.fixture(scope="module")
def profile(spark):
    # 3 columns over 2 tables
    rows = [("t1", "a", 100), ("t1", "b", 100), ("t2", "c", 300)]
    return spark.createDataFrame(
        rows, "table_name string, column_name string, record_ct long")


@pytest.fixture(scope="module")
def anomalies(spark):
    rows = [
        ("t1", "a", "Leading_Spaces", "Likely", None, 0.2),
        ("t1", "a", "No_Values", "Definite", None, 0.5),
        ("t2", "c", "Recency_Six_Months", "Possible", "Latest: x", None),
    ]
    return spark.createDataFrame(
        rows, "table_name string, column_name string, anomaly_type string,"
              " likelihood string, detail string, dq_prevalence double")


@pytest.fixture(scope="module")
def results(spark):
    # lineitem-style test results with prevalence attached
    rows = [
        ("r1", "Unique", "t3", "x", 1, "Passed", None, 500, 0.0),
        ("r2", "Min_Val", "t3", "x", 0, "Failed", "bad", 500, 0.1),
        ("r3", "Required", "t3", "y", 0, "Warning", "nulls", 500, 0.25),
    ]
    return spark.createDataFrame(
        rows, "test_id string, test_type string, table_name string,"
              " column_name string, result_code int, result_status string,"
              " result_message string, dq_record_ct long, dq_prevalence double")


def test_profile_scoring_by_column(profile, anomalies):
    out = {(r["table_name"], r["column_name"]): r
           for r in SC.profile_scoring_by_column(profile, anomalies).collect()}
    assert out[("t1", "a")]["issue_ct"] == 2
    # good = (1-0.2)(1-0.5) = 0.4
    assert abs(out[("t1", "a")]["good_data_pct"] - 0.4) < 1e-9
    assert out[("t1", "b")]["issue_ct"] == 0
    assert out[("t1", "b")]["good_data_pct"] == 1.0
    # NULL-prevalence anomaly counts as issue but not into sum_ln
    assert out[("t2", "c")]["issue_ct"] == 1
    assert out[("t2", "c")]["good_data_pct"] == 1.0


def test_profile_scoring_by_dimension(profile, anomalies):
    out = {(r["table_name"], r["column_name"], r["dq_dimension"]): r
           for r in SC.profile_scoring_by_dimension(profile, anomalies).collect()}
    # Leading_Spaces -> Validity, No_Values -> Completeness
    assert out[("t1", "a", "Validity")]["issue_ct"] == 1
    assert abs(out[("t1", "a", "Validity")]["good_data_pct"] - 0.8) < 1e-9
    assert out[("t1", "a", "Completeness")]["issue_ct"] == 1
    assert out[("t1", "b", None)]["issue_ct"] == 0
    assert out[("t2", "c", "Timeliness")]["issue_ct"] == 1


def test_test_scoring_by_column(results):
    out = {(r["table_name"], r["column_name"]): r
           for r in SC.test_scoring_by_column(results).collect()}
    x = out[("t3", "x")]
    assert (x["test_ct"], x["passed_ct"], x["issue_ct"]) == (2, 1, 1)
    assert abs(x["good_data_pct"] - 0.9) < 1e-9
    assert x["weighted_dq_record_ct"] == 500


def test_breakdown_profile_only(profile, anomalies):
    prof = SC.profile_scoring_by_column(profile, anomalies)
    out = {(r["table_name"], r["column_name"]): r
           for r in SC.score_card_breakdown(prof, None).collect()}
    # parent profiling_data_points = 100+100+300 = 500
    # t1.a: dp=100, score=0.4 -> impact = 100*100*0.6/500 = 12
    assert abs(out[("t1", "a")]["impact"] - 12.0) < 1e-9
    assert abs(out[("t1", "a")]["score"] - 0.4) < 1e-9
    assert out[("t1", "a")]["issue_ct"] == 2
    assert out[("t1", "b")]["impact"] == 0.0
    assert out[("t1", "b")]["score"] == 1.0


def test_breakdown_two_sided(profile, anomalies, results):
    prof = SC.profile_scoring_by_column(profile, anomalies)
    test = SC.test_scoring_by_column(results)
    out = {(r["table_name"], r["column_name"]): r
           for r in SC.score_card_breakdown(prof, test).collect()}
    # test totals: x 500 + y 500 = 1000; x: score 0.9 -> 100*500*0.1/1000 = 5
    assert abs(out[("t3", "x")]["impact"] - 5.0) < 1e-9
    assert abs(out[("t3", "x")]["score"] - 0.9) < 1e-9
    assert out[("t3", "x")]["issue_ct"] == 1
    # profile side unchanged by the disjoint test side
    assert abs(out[("t1", "a")]["impact"] - 12.0) < 1e-9


def test_breakdown_by_dimension(profile, anomalies):
    prof_dim = SC.profile_scoring_by_dimension(profile, anomalies)
    prof_col = SC.profile_scoring_by_column(profile, anomalies)
    out = {r["dq_dimension"]: r
           for r in SC.score_card_breakdown(
               prof_dim, None, group_cols=("dq_dimension",),
               profile_parent=prof_col).collect()}
    # Validity: only t1.a (dp 100, good 0.8); parent totals come from the
    # BY-COLUMN view (100+100+300=500), not the double-counting dim view
    assert abs(out["Validity"]["impact"] - 100 * 100 * 0.2 / 500.0) < 1e-9
    assert out[None]["issue_ct"] == 0


def test_issues_ordering(anomalies, results):
    rows = SC.score_card_issues(anomalies, results).collect()
    statuses = [r["status"] for r in rows]
    assert statuses == ["Definite", "Failed", "Likely", "Possible", "Warning"]
    assert rows[0]["issue_type"] == "hygiene"
    assert rows[1]["issue_type"] == "test"


def test_table_group_test_score(spark):
    rows = [
        ("g1", "s1", "2026-01-01", "Complete", 10.0, 100.0),
        ("g1", "s1", "2026-01-02", "Complete", 20.0, 100.0),  # latest wins
        ("g1", "s2", "2026-01-01", "Complete", 0.0, 100.0),
        ("g1", "s3", "2026-01-05", "Error", 99.0, 100.0),     # not Complete
    ]
    df = spark.createDataFrame(
        rows, "table_group string, test_suite string, run_time string,"
              " status string, dq_affected_data_points double,"
              " dq_total_data_points double")
    out = SC.table_group_test_score(df).collect()
    assert len(out) == 1
    assert abs(out[0]["dq_score_testing"] - (1 - 20.0 / 200.0)) < 1e-9


def test_category_scores(spark):
    prof = spark.createDataFrame(
        [("sales", 0.9, 100.0), ("sales", 0.5, 100.0), ("ops", 1.0, 200.0),
         (None, 0.1, 50.0)],
        "business_domain string, good_data_pct double, weighted_record_ct double")
    test = spark.createDataFrame(
        [("sales", 0.8, 100.0)],
        "business_domain string, good_data_pct double, weighted_dq_record_ct double")
    out = {r["label"]: r["score"] for r in
           SC.category_scores(prof, test, "business_domain").collect()}
    # sales: prof (0.9*100+0.5*100)/200 = 0.7; test 0.8 -> 0.56
    assert abs(out["sales"] - 0.7 * 0.8) < 1e-9
    # ops: prof 1.0, no test side -> 1.0
    assert abs(out["ops"] - 1.0) < 1e-9
    assert None not in out  # NULL categories excluded


def test_overall_scores_by_run(spark):
    prof = spark.createDataFrame(
        [("r1", 0.9, 100.0, True), ("r1", 0.5, 100.0, False),
         ("r2", 1.0, 100.0, True)],
        "run_time string, good_data_pct double, weighted_record_ct double,"
        " critical_data_element boolean")
    test = spark.createDataFrame(
        [("r1", 0.8, 200.0, True)],
        "run_time string, good_data_pct double, weighted_dq_record_ct double,"
        " critical_data_element boolean")
    out = {r["run_time"]: r for r in
           SC.overall_scores_by_run(prof, test).collect()}
    # r1: prof score 0.7, cde 0.9; test 0.8/0.8 -> 0.56, 0.72
    assert abs(out["r1"]["score"] - 0.7 * 0.8) < 1e-9
    assert abs(out["r1"]["cde_score"] - 0.9 * 0.8) < 1e-9
    # r2: only profiling -> product with 1
    assert abs(out["r2"]["score"] - 1.0) < 1e-9
