"""Tests for profile-driven test generation (SURVEY §2.4) and the
profile → infer → generate → execute loop."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dataops_testgen_spark.execution.cat import run_cat_tests
from dataops_testgen_spark.generation import (
    delete_stale_tests,
    generate_constant_tests,
    generate_selection_tests,
    generate_table_tests,
)
from dataops_testgen_spark.generation.selection import merge_test_defs, to_test_defs
from dataops_testgen_spark.inference import apply_inference
from dataops_testgen_spark.profiling.profiler import profile_table

RUN_DATE = "2026-08-01"


@pytest.fixture(scope="module")
def lineitem_generated(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    prof = profile_table(df, "lineitem", run_date=RUN_DATE)
    inferred = apply_inference(prof)
    gen = generate_selection_tests(inferred)
    return df, {(r["test_type"], r["column_name"]): r for r in gen.collect()}


def test_selection_types_fire(lineitem_generated):
    _, gen = lineitem_generated
    types = {t for t, _col in gen}
    # lineitem: numeric measures → Avg_Shift/Missing_Pct/Unique_Pct at least
    assert "Missing_Pct" in types or "Required" in types
    assert "Unique_Pct" in types
    assert "Valid_Characters" in types  # every A column
    assert "Recency" in types or "Min_Date" in types or "Future_Date" in types


def test_params_carry_profile_values(lineitem_generated):
    _, gen = lineitem_generated
    row = next(r for (t, _c), r in gen.items() if t == "Unique_Pct")
    params = dict(row["params"])
    assert int(params["baseline_value_ct"]) > 0
    assert float(params["threshold_value"]) == 0.5


def test_generated_tests_execute_green(spark, lineitem_generated):
    """E2E: auto-generated tests pass against the data they were built from."""
    df, gen = lineitem_generated
    keep_types = {"Required", "Missing_Pct", "Min_Val", "Future_Date",
                  "Valid_Characters", "LOV_Match", "Unique_Pct"}
    rows = [r for (t, _c), r in gen.items() if t in keep_types]
    from dataops_testgen_spark.session import get_spark
    gen_df = get_spark("tests").createDataFrame(rows)
    defs = to_test_defs(gen_df)
    assert defs
    res = run_cat_tests({"lineitem": df}, defs, run_date=RUN_DATE)
    out = res.collect()
    assert out
    # tests generated from the same data's profile must all pass
    bad = [r for r in out if r["result_code"] != 1]
    assert not bad, f"generated tests failed: {[(r['test_id'], r['result_measure']) for r in bad]}"


def test_constant_generation_across_runs(spark):
    rows1 = [("FIXED", i) for i in range(100)]
    rows2 = [("FIXED", i) for i in range(120)]
    p1 = profile_table(spark.createDataFrame(rows1, "k string, v long"), "t",
                       run_date="2026-07-01")
    p2 = profile_table(spark.createDataFrame(rows2, "k string, v long"), "t",
                       run_date=RUN_DATE)
    gen = generate_constant_tests(p1.unionByName(p2))
    out = {r["column_name"]: dict(r["params"]) for r in gen.collect()}
    assert "k" in out and out["k"]["baseline_value"] == "FIXED"
    assert "v" not in out  # varying column is not constant


def test_table_tests_generated(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    inferred = apply_inference(profile_table(df, "orders", run_date=RUN_DATE))
    gen = generate_table_tests(inferred)
    rows = {r["test_type"]: r for r in gen.collect()}
    assert "Volume_Trend" in rows and "Table_Freshness" in rows
    assert "COUNT(CASE WHEN" in dict(rows["Volume_Trend"]["params"])["custom_query"]


def test_merge_and_stale_cleanup(spark):
    cols = "test_type string, table_name string, column_name string, params map<string,string>"
    existing = spark.createDataFrame(
        [("Required", "t", "a", {"threshold_value": "0"}),
         ("Required", "t", "gone", {"threshold_value": "0"}),
         ("Required", "t", "locked_col", {"threshold_value": "99"})], cols)
    generated = spark.createDataFrame(
        [("Required", "t", "a", {"threshold_value": "1"}),
         ("Required", "t", "b", {"threshold_value": "0"}),
         ("Required", "t", "locked_col", {"threshold_value": "0"})], cols)
    locked = spark.createDataFrame([("Required", "t", "locked_col")],
                                   "test_type string, table_name string, column_name string")
    merged = merge_test_defs(existing, generated, locked=locked)
    vals = {r["column_name"]: dict(r["params"]) for r in merged.collect()}
    assert vals["a"]["threshold_value"] == "1"      # refreshed
    assert vals["locked_col"]["threshold_value"] == "99"  # lock_refresh kept
    assert "b" in vals
    cleaned = delete_stale_tests(merged, generated.filter("column_name <> 'gone'"))
    assert "gone" not in {r["column_name"] for r in cleaned.collect()}
