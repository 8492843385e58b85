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
    tables, inferred = quickstart
    # tables= runs the Correlation class too; at quickstart size nothing
    # clears the n>=500 evidence floor, so the pinned counts hold —
    # which is itself the min_n contract (no flag without evidence)
    anoms = screen_anomalies(inferred, tables=tables)
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


def test_quickstart_mutation_iteration_trips_tests(quickstart, spark):
    """The reference demo's iteration loop (`update_target_data_iter3.sql`
    + `run_monitor_iteration.sql`): mutate the target data, re-run the SAME
    generated tests, and watch previously-passing tests trip. Seeded
    mutations: 30 duplicated sale rows (uniqueness drift), a negative
    unit_price (below baseline min), a year-2031 sale_date (future date),
    and a leading-space status (invalid characters)."""
    from pyspark.sql import functions as F

    tables, inferred = quickstart
    defs = to_test_defs(generate_selection_tests(inferred))

    def result_map(tbls):
        res = run_cat_tests(tbls, defs, run_date=RUN_DATE)
        return {(r["table_name"], r["column_name"], r["test_type"]):
                r["result_code"] for r in res.collect()}

    before = result_map(tables)

    sales = tables["sales"]
    mutated_sales = (
        sales
        .withColumn("unit_price", F.when(F.col("sale_id") == 11,
                                         F.lit(-5.0))
                    .otherwise(F.col("unit_price")))
        .withColumn("sale_date", F.when(F.col("sale_id") == 7,
                                        F.lit("2031-01-01").cast("date"))
                    .otherwise(F.col("sale_date")))
        .withColumn("status", F.when(F.col("sale_id") == 3,
                                     F.lit(" refunded"))
                    .otherwise(F.col("status")))
        .unionByName(sales.filter(F.col("sale_id") < 30)))
    mutated = dict(tables, sales=mutated_sales)
    after = result_map(mutated)

    flipped = {k for k in before
               if before[k] == 1 and after.get(k) == 0}
    flipped_types = {(k[0], k[2]) for k in flipped}
    for want in (("sales", "Min_Val"), ("sales", "Future_Date"),
                 ("sales", "Valid_Characters"), ("sales", "Unique_Pct")):
        assert want in flipped_types, (want, sorted(flipped_types))
    # nothing outside the mutated table spuriously trips
    assert all(k[0] == "sales" for k in flipped), sorted(flipped)
