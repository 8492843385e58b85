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


def test_dupe_rows_and_schema_drift_generated(spark, sf_dir):
    from dataops_testgen_spark.generation import (
        generate_dupe_rows_tests, generate_schema_drift_tests)

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    inferred = apply_inference(profile_table(df, "orders", run_date=RUN_DATE))
    dupe = generate_dupe_rows_tests(inferred).collect()
    assert len(dupe) == 1
    params = dict(dupe[0]["params"])
    # groupby_names = every column in ordinal order
    assert params["groupby_names"].startswith("o_orderkey,o_custkey")
    assert len(params["groupby_names"].split(",")) == len(df.columns)
    drift = generate_schema_drift_tests(inferred, schema_name="main").collect()
    assert len(drift) == 1 and drift[0]["test_type"] == "Schema_Drift"


def test_freshness_trend_generated_and_executable(spark, sf_dir):
    from dataops_testgen_spark.generation import (
        fingerprint_exprs_for, generate_freshness_trend_tests)
    from dataops_testgen_spark.execution.query_tests import table_fingerprint

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    inferred = apply_inference(profile_table(df, "lineitem", run_date=RUN_DATE))
    gen = generate_freshness_trend_tests(inferred).collect()
    assert len(gen) == 1
    params = dict(gen[0]["params"])
    assert params["history_calculation"] == "PREDICT"
    spec = params["fingerprint_spec"]
    # ID elements sort first, each element is col:gtype
    assert all(":" in part for part in spec.split(","))
    assert params["groupby_names"] == ",".join(
        p.rsplit(":", 1)[0] for p in spec.split(","))
    # the spec round-trips into executable aggregate exprs -> stable MD5
    fp1 = table_fingerprint(df, fingerprint_exprs_for(spec))
    fp2 = table_fingerprint(df, fingerprint_exprs_for(spec))
    assert fp1 == fp2 and len(fp1) == 32
    # changing the data changes the fingerprint
    fp3 = table_fingerprint(df.limit(100), fingerprint_exprs_for(spec))
    assert fp3 != fp1


def test_weekly_rec_ct_criteria(spark):
    """Weekly_Rec_Ct fires iff every calendar week in range has a date
    (test_types_Weekly_Rec_Ct.yaml selection_criteria)."""
    import datetime as _dt

    from dataops_testgen_spark.generation import generate_selection_tests

    # 10 consecutive weeks of Mondays -> all weeks present
    dates = [(_dt.date(2025, 1, 6) + _dt.timedelta(weeks=i)) for i in range(10)]
    rows = [(d, i) for i, d in enumerate(dates) for _ in range(3)]
    df = spark.createDataFrame(rows, "tx_date: date, seq: long")
    prof = profile_table(df.withColumn("tx_date", F.col("tx_date").cast("timestamp")),
                         "weekly_t", run_date=RUN_DATE)
    inferred = apply_inference(prof)
    fdt = {r["column_name"]: (r["functional_data_type"], r["functional_table_type"])
           for r in inferred.collect()}
    gen = {(r["test_type"], r["column_name"])
           for r in generate_selection_tests(inferred).collect()}
    if ("Weekly_Rec_Ct", "tx_date") not in gen:
        # only assert firing when the cascade classified the fixture as
        # transactional-date-on-cumulative (precondition of the criteria)
        ftype, ttype = fdt["tx_date"]
        assert not (ftype.lower().startswith("transactional date")
                    and "cumulative" in ttype.lower())


def test_generation_set_filtering(spark, sf_dir):
    """test_types / table_names subsets restrict generation (ref
    commands/test_generation.py:133-135,146-147)."""
    from dataops_testgen_spark.generation.selection import generate_selection_tests

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    prof = profile_table(df, "lineitem", run_date=RUN_DATE)
    inferred = apply_inference(prof)
    subset = generate_selection_tests(
        inferred, test_types={"Unique_Pct", "Valid_Characters"})
    types = {r["test_type"] for r in subset.collect()}
    assert types == {"Unique_Pct", "Valid_Characters"}
    none_for_other_table = generate_selection_tests(
        inferred, table_names={"not_a_table"})
    assert none_for_other_table.count() == 0
    same = generate_selection_tests(inferred, table_names={"lineitem"})
    assert same.count() == generate_selection_tests(inferred).count()


def test_param_coercion_round_trips_numbers(spark):
    """'1e9' must become a number (the old '.'-sniffing int() path silently
    left it a string); whole floats downcast to int, dates stay strings."""
    gen = spark.createDataFrame(
        [("Row_Ct", "t", "c", "Y", "2026-08-01",
          {"threshold_value": "1e9", "baseline_ct": "2.5",
           "baseline_value": "2026-01-01", "lower_tolerance": "4.0"})],
        "test_type string, table_name string, column_name string, "
        "test_active string, last_auto_gen_date string, "
        "params map<string,string>")
    td = to_test_defs(gen)[0]
    assert td.p("threshold_value") == 1_000_000_000
    assert isinstance(td.p("threshold_value"), int)
    assert td.p("baseline_ct") == 2.5
    assert td.p("lower_tolerance") == 4 and isinstance(td.p("lower_tolerance"), int)
    assert td.p("baseline_value") == "2026-01-01"
