"""Quick-start demo walkthrough: the full profile → screen → generate →
execute → score loop over the seeded-flaw retail fixture
(`dataops_testgen_spark/fixtures/quickstart.py`), with pinned headline
numbers — parity with the reference's quick-start experience
(`template/quick_start/*.sql`), where a demo schema with deliberate flaws
is profiled and the hygiene/test results are the demo's output."""

from __future__ import annotations

import pytest

from dataops_testgen_spark.anomalies import screen_anomalies
from dataops_testgen_spark.execution.cat import run_cat_tests
from dataops_testgen_spark.fixtures import build_quickstart_tables
from dataops_testgen_spark.generation import generate_selection_tests
from dataops_testgen_spark.generation.selection import to_test_defs
from dataops_testgen_spark.inference import apply_inference
from dataops_testgen_spark.profiling.profiler import profile_tables
from dataops_testgen_spark.scoring import rollup_scores

RUN_DATE = "2026-01-01"


@pytest.fixture(scope="module")
def quickstart(spark):
    tables = build_quickstart_tables(spark)
    inferred = apply_inference(profile_tables(tables, run_date=RUN_DATE))
    return tables, inferred


def test_quickstart_profile_shape(quickstart):
    tables, inferred = quickstart
    assert {n: t.count() for n, t in tables.items()} \
        == {"products": 20, "customers": 40, "sales": 122}
    assert inferred.count() == 31          # one row per column


def test_quickstart_hygiene_screen_finds_seeded_flaws(quickstart):
    _tables, inferred = quickstart
    anoms = screen_anomalies(inferred)
    by_type = {r["anomaly_type"]: r["count"] for r in
               anoms.groupBy("anomaly_type").count().collect()}
    # every seeded flaw class is caught (counts pinned — deterministic data)
    assert by_type["Quoted_Values"] == 1           # 'Quoted' product names
    assert by_type["Leading_Spaces"] == 1          # ' Finn' first names
    assert by_type["Non_Standard_Blanks"] == 2     # 'N/A'/'Missing' frames
    assert by_type["Invalid_Zip_USA"] == 1         # 'ABC12' postal codes
    assert by_type["Standardized_Value_Matches"] == 2  # M/Male genders
    assert by_type["Potential_PII"] >= 1           # email columns flagged
    assert anoms.count() == 16


def test_quickstart_generate_and_execute(quickstart):
    tables, inferred = quickstart
    gen = generate_selection_tests(inferred)
    assert gen.count() == 105
    results = run_cat_tests(tables, to_test_defs(gen), run_date=RUN_DATE)
    by_code = {r["result_code"]: r["count"] for r in
               results.groupBy("result_code").count().collect()}
    assert by_code == {1: 100, 0: 5}       # 5 seeded failures surface


def test_quickstart_score(quickstart):
    _tables, inferred = quickstart
    anoms = screen_anomalies(inferred)
    detail = anoms.join(
        inferred.select("table_name", "column_name", "record_ct"),
        ["table_name", "column_name"], "left")
    row = rollup_scores(detail.filter("record_ct IS NOT NULL")).collect()[0]
    assert 0.90 < row["dq_score"] < 0.99
    assert row["dq_total_data_points"] == 522.0
