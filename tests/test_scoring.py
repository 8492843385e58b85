"""Tests for prevalence formulas + sum_ln score rollups."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataops_testgen_spark.scoring import (
    eval_prevalence,
    fn_normal_cdf,
    rollup_scores,
    sum_ln,
)
from dataops_testgen_spark.scoring.rollup import attach_test_prevalence


def test_ratio_formula():
    # Required: (measure - threshold) / record_ct × risk 1.0
    p = eval_prevalence("Required", {"RESULT_MEASURE": 25, "THRESHOLD_VALUE": 0,
                                     "RECORD_CT": 1000})
    assert p == pytest.approx(0.025)


def test_capped_at_one():
    p = eval_prevalence("Required", {"RESULT_MEASURE": 5000, "THRESHOLD_VALUE": 0,
                                     "RECORD_CT": 1000})
    assert p == 1.0


def test_arcsine_formula_uses_normal_cdf():
    p = eval_prevalence("Missing_Pct", {"RESULT_MEASURE": 2.5})
    expected = min(1.0, 0.75 * 2.0 * (1.0 - fn_normal_cdf(2.5 / 2.0)))
    assert p == pytest.approx(expected)


def test_nullif_zero_divisor_gives_none():
    assert eval_prevalence("Row_Ct", {"RESULT_MEASURE": 10,
                                      "THRESHOLD_VALUE": 0}) is None


def test_recency_datediff():
    p = eval_prevalence("Recency", {
        "RESULT_MEASURE": 10, "THRESHOLD_VALUE": 7, "PRO_RECORD_CT": 1000,
        "RECORD_CT": 1000, "MIN_DATE": "2026-01-01", "MAX_DATE": "2026-01-11"})
    # |10-7| × 1000 / (1+10) / 1000 × 0.75
    assert p == pytest.approx(0.75 * 3 * 1000 / 11.0 / 1000)


def test_greatest_formula():
    p = eval_prevalence("Outlier_Pct_Above",
                        {"RESULT_MEASURE": 0.08, "THRESHOLD_VALUE": 0.05})
    assert p == pytest.approx(0.75 * 0.03)
    p0 = eval_prevalence("Outlier_Pct_Above",
                         {"RESULT_MEASURE": 0.01, "THRESHOLD_VALUE": 0.05})
    assert p0 == 0.0


def test_sum_ln_product(spark):
    df = spark.createDataFrame([(0.1,), (0.2,), (None,), (0.0,)], "p double")
    out = df.agg(sum_ln(F.col("p")).alias("s")).collect()[0]["s"]
    assert out == pytest.approx(0.9 * 0.8)
    empty = spark.createDataFrame([(None,)], "p double")
    assert empty.agg(sum_ln(F.col("p")).alias("s")).collect()[0]["s"] == 1.0


def test_rollup_scores(spark):
    rows = [
        ("t1", "a", 1000, 0.1),
        ("t1", "a", 1000, 0.2),   # combines: 1-(0.9*0.8) = 0.28
        ("t1", "b", 1000, 0.0),   # clean column
    ]
    df = spark.createDataFrame(
        rows, "table_name string, column_name string, record_ct long, dq_prevalence double")
    out = rollup_scores(df).collect()[0]
    # affected = 0.28*1000 + 0*1000; total = 2000
    assert out["dq_total_data_points"] == pytest.approx(2000)
    assert out["dq_affected_data_points"] == pytest.approx(280, rel=1e-6)
    assert out["dq_score"] == pytest.approx(1 - 280 / 2000, rel=1e-6)


def test_attach_test_prevalence():
    results = [
        {"test_type": "Required", "table_name": "t", "column_name": "c",
         "result_code": 0, "result_measure": 25.0, "threshold_value": 0},
        {"test_type": "Required", "table_name": "t", "column_name": "c2",
         "result_code": 1, "result_measure": 0.0, "threshold_value": 0},
    ]
    out = attach_test_prevalence(results, record_cts={"t": 1000})
    assert out[0]["dq_prevalence"] == pytest.approx(0.025)
    assert out[1]["dq_prevalence"] == 0.0  # passing test
