"""Tests for pairwise contingency rule mining (SURVEY §2.3)."""

from __future__ import annotations

import pytest

from dataops_testgen_spark.anomalies.contingency import (
    contingency_columns,
    mine_contingency_rules,
)
from dataops_testgen_spark.inference import apply_inference
from dataops_testgen_spark.profiling.profiler import profile_table


def test_perfect_rule_detected(spark):
    # region determines currency (perfect 1:1); currency → region also holds
    rows = [(["EU", "US"][i % 2], ["EUR", "USD"][i % 2], f"x{i % 7}")
            for i in range(700)]
    df = spark.createDataFrame(rows, "region string, currency string, noise string")
    rules = mine_contingency_rules(df, "t", ["region", "currency", "noise"], 0.95)
    got = {(r["cause_column_name"], r["cause_column_value"],
            r["effect_column_name"], r["effect_column_value"]): r
           for r in rules.collect()}
    assert ("region", "EU", "currency", "EUR") in got
    assert ("currency", "USD", "region", "US") in got
    row = got[("region", "EU", "currency", "EUR")]
    assert row["rule_ratio"] == pytest.approx(1.0)
    assert row["pair_count"] == 350
    # noise column produces no 95% rules against region
    assert not any(k for k in got if "noise" in (k[0], k[2]))


def test_support_threshold(spark):
    # rare pair (< max(30, 5%)) must be excluded even with perfect ratio
    rows = [("A", "X")] * 500 + [("B", "Y")] * 10
    df = spark.createDataFrame(rows, "c1 string, c2 string")
    rules = mine_contingency_rules(df, "t", ["c1", "c2"], 0.95)
    causes = {(r["cause_column_value"], r["effect_column_value"])
              for r in rules.collect()}
    assert ("A", "X") in causes
    assert ("B", "Y") not in causes  # support 10 < 30


def test_contingency_columns_from_profile(spark):
    rows = [(["A1", "B2", "C3"][i % 3],
             ["Automobile Parts", "Building Materials"][i % 2], i)
            for i in range(300)]
    df = spark.createDataFrame(rows, "code3 string, segment string, v long")
    inferred = apply_inference(profile_table(df, "tc", run_date="2026-08-01"))
    cols = contingency_columns(inferred)
    assert cols == {"tc": ["code3", "segment"]}
