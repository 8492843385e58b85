"""Drill-down lookup + PII masking tests (ref source_data_service.py,
pii_masking.py)."""

import pytest
from pyspark.sql import functions as F

from dataops_testgen_spark.execution import drilldown as DR

RUN_DATE = "2026-01-01"


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        (1, "ann@example.com", "x", 10.0),
        (2, "bad-email", "x", -5.0),
        (3, None, "y", 3.0),
        (4, "dan@example.com", "y", -1.0),
        (5, "dan@example.com", "", 2.0),
    ]
    return spark.createDataFrame(
        rows, "id: long, email: string, grp: string, bal: double")


def test_unique_lookup(people):
    res = DR.source_data_lookup(people, "Unique", "email")
    assert res.status == "OK"
    rows = {(r["email"], r["count"]) for r in res.df.collect()}
    assert rows == {("dan@example.com", 2)}


def test_min_val_lookup(people):
    res = DR.source_data_lookup(people, "Min_Val", "bal",
                                {"baseline_value": 0.0})
    rows = {(r["bal"], r["difference_from_baseline"]) for r in res.df.collect()}
    assert rows == {(-5.0, 5.0), (-1.0, 1.0)}


def test_missing_lookup(people):
    res = DR.source_data_lookup(people, "Required", "email")
    assert {r["id"] for r in res.df.collect()} == {3}


def test_email_format_lookup(people):
    res = DR.source_data_lookup(people, "Email_Format", "email")
    vals = {r["email"] for r in res.df.collect()}
    assert vals == {"bad-email"}


def test_dupe_rows_lookup(people):
    res = DR.source_data_lookup(people, "Dupe_Rows", None,
                                {"groupby_names": "email,grp"})
    rows = res.df.collect()
    assert rows == [] or all(r["record_ct"] > 1 for r in rows)


def test_unknown_type_is_na(people):
    res = DR.source_data_lookup(people, "No_Such_Type", "email")
    assert res.status == "NA" and res.df is None


def test_error_is_isolated(people):
    res = DR.source_data_lookup(people, "Min_Val", "no_such_column",
                                {"baseline_value": 0.0})
    assert res.status == "ERR" and res.df is None


def test_mask_source_data(people):
    res = DR.source_data_lookup(people, "Unique", "email",
                                mask_pii=True, pii_columns={"EMAIL"})
    assert res.pii_redacted
    assert all(r["email"] == DR.PII_REDACTED for r in res.df.collect())


def test_mask_profiling_pii(spark):
    prof = spark.createDataFrame(
        [("t", "email", "a@b.c | d@e.f", 9.0), ("t", "qty", "1 | 2", 5.0)],
        "table_name string, column_name string, top_freq_values string,"
        " max_value double")
    out = {r["column_name"]: r for r in
           DR.mask_profiling_pii(prof, {"Email"}).collect()}
    assert out["email"]["top_freq_values"] == DR.PII_REDACTED
    assert out["email"]["max_value"] == DR.PII_REDACTED  # stringified
    assert out["qty"]["top_freq_values"] == "1 | 2"


def test_mask_hygiene_detail(spark):
    anoms = spark.createDataFrame(
        [("t", "email", "Unexpected_Emails", "found a@b.c"),
         ("t", "email", "Leading_Spaces", "Cases Found: 3"),
         ("t", "qty", "Unlikely_Date_Values", "1899-01-01")],
        "table_name string, column_name string, anomaly_type string,"
        " detail string")
    out = {(r["column_name"], r["anomaly_type"]): r["detail"]
           for r in DR.mask_hygiene_detail(anoms, {"email"}).collect()}
    # redactable type + PII column -> masked
    assert out[("email", "Unexpected_Emails")] == DR.PII_REDACTED
    # non-redactable type stays
    assert out[("email", "Leading_Spaces")] == "Cases Found: 3"
    # redactable type on non-PII column stays
    assert out[("qty", "Unlikely_Date_Values")] == "1899-01-01"


def test_get_pii_columns(spark):
    inf = spark.createDataFrame(
        [("t", "email", "B/CONTACT/Email"), ("t", "qty", None)],
        "table_name string, column_name string, pii_flag string")
    assert DR.get_pii_columns(inf) == {"email"}


def test_registry_covers_major_types():
    """r3: registry parity push — ≥25 test types must have a lookup."""
    assert len(DR.TEST_LOOKUPS) >= 25
    for t in ("Avg_Shift", "Outlier_Pct_Above", "Outlier_Pct_Below",
              "Daily_Record_Ct", "Weekly_Rec_Ct", "Monthly_Rec_Ct",
              "Valid_US_Zip", "Street_Addr_Pattern", "Alpha_Trunc",
              "Recency", "Row_Ct", "LOV_All"):
        assert t in DR.TEST_LOOKUPS, t


def test_outlier_lookup(people):
    # avg 2, sd 1 → above bound 4: only 10.0 qualifies
    res = DR.source_data_lookup(people, "Outlier_Pct_Above", "bal",
                                {"baseline_avg": 2.0, "baseline_sd": 1.0})
    rows = [(r["outlier_threshold"], r["bal"], r["count"])
            for r in res.df.collect()]
    assert rows == [(4.0, 10.0, 1)]


def test_missing_days_lookup(spark):
    # days 1,2,3,6,7 of Jan → missing 4 and 5; neighbours 3 (2 rows) / 6 (1)
    rows = [("2026-01-01",), ("2026-01-02",), ("2026-01-03",),
            ("2026-01-03",), ("2026-01-06",), ("2026-01-07",)]
    df = spark.createDataFrame(rows, "d: string").withColumn("d", F.to_date("d"))
    res = DR.source_data_lookup(df, "Daily_Record_Ct", "d")
    got = [(str(r["missing_period"]), str(r["prior_available_date"]),
            r["prior_available_date_count"], str(r["next_available_date"]),
            r["next_available_date_count"]) for r in res.df.collect()]
    assert got == [
        ("2026-01-04", "2026-01-03", 2, "2026-01-06", 1),
        ("2026-01-05", "2026-01-03", 2, "2026-01-06", 1),
    ]


def test_monthly_rec_lookup(spark):
    # Jan, Feb, Apr → March missing
    rows = [("2026-01-15",), ("2026-02-10",), ("2026-04-01",)]
    df = spark.createDataFrame(rows, "d: string").withColumn("d", F.to_date("d"))
    res = DR.source_data_lookup(df, "Monthly_Rec_Ct", "d")
    got = [str(r["missing_period"]) for r in res.df.collect()]
    assert got == ["2026-03-01"]


def test_alpha_trunc_lookup(people):
    # max email length is 15 ("dan@example.com"/"ann@example.com"),
    # threshold 20 → truncation suspected, those values surface
    res = DR.source_data_lookup(people, "Alpha_Trunc", "email",
                                {"threshold_value": 20})
    vals = {(r["email"], r["current_max_length"]) for r in res.df.collect()}
    assert vals == {("ann@example.com", 15), ("dan@example.com", 15)}


def test_recency_row_ct_scalar_lookups(people):
    res = DR.source_data_lookup(people, "Row_Ct", None,
                                {"threshold_value": 10})
    row = res.df.collect()[0]
    assert row["current_count"] == 5
    assert row["row_count_pct_decrease"] == 50.0
    res2 = DR.source_data_lookup(people, "Row_Ct_Pct", None,
                                 {"baseline_ct": 4})
    row2 = res2.df.collect()[0]
    assert row2["current_count"] == 5 and row2["row_count_pct_difference"] == 25.0


def test_lov_all_and_zip_lookups(people, spark):
    res = DR.source_data_lookup(people, "LOV_All", "grp",
                                {"threshold_value": "x|y"})
    # actual lov is '|x|y' (empty string sorts first) ≠ 'x|y' → surfaced
    assert res.df.count() == 1
    zips = spark.createDataFrame(
        [("02134",), ("9021x",), ("12345-6789",)], "z: string")
    res2 = DR.source_data_lookup(zips, "Valid_US_Zip", "z")
    assert {r["z"] for r in res2.df.collect()} == {"9021x"}


# --- cross-table / query-test lookups (r4: 14 new registry types) ---------

def test_registry_covers_cross_table_types():
    """All 46 reference test types bearing target_data_lookups + the 4
    query types whose detail is the test's own comparison output."""
    for t in ("Aggregate_Balance", "Aggregate_Balance_Percent",
              "Aggregate_Balance_Range", "Aggregate_Minimum", "Combo_Match",
              "Timeframe_Combo_Match", "Timeframe_Combo_Gain",
              "Distribution_Shift", "Volume_Trend", "Metric_Trend",
              "Table_Freshness", "Freshness_Trend", "Schema_Drift", "CUSTOM"):
        assert t in DR.TEST_LOOKUPS, t
    assert len(DR.TEST_LOOKUPS) >= 50


def test_aggregate_balance_lookup(spark):
    left = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 7)], "grp: string, amt: long")
    right = spark.createDataFrame(
        [("a", 15), ("b", 9)], "grp: string, amt: long")
    res = DR.source_data_lookup(
        left, "Aggregate_Balance", "SUM(amt)",
        {"groupby_names": "grp", "match_df": right})
    assert res.status == "OK"
    rows = {(r["grp"], r["total"], r["match_total"]) for r in res.df.collect()}
    assert rows == {("b", 7, 9)}
    # range mode: tolerance ±3 admits the b mismatch
    res2 = DR.source_data_lookup(
        left, "Aggregate_Balance_Range", "SUM(amt)",
        {"groupby_names": "grp", "match_df": right,
         "lower_tolerance": 3, "upper_tolerance": 3})
    assert res2.df.count() == 0


def test_combo_match_lookup(spark):
    left = spark.createDataFrame([("a",), ("b",), ("c",)], "k: string")
    right = spark.createDataFrame([("a",), ("b",)], "k: string")
    res = DR.source_data_lookup(left, "Combo_Match", None,
                                {"groupby_names": "k", "match_df": right})
    assert {r["k"] for r in res.df.collect()} == {"c"}


def test_timeframe_combo_lookup(spark):
    rows = [("k1", "2026-01-10"), ("k2", "2026-01-10"),
            ("k1", "2026-01-01"), ("k3", "2026-01-01")]
    df = spark.createDataFrame(rows, "k: string, d: string") \
        .withColumn("d", F.col("d").cast("date"))
    res = DR.source_data_lookup(
        df, "Timeframe_Combo_Gain", None,
        {"groupby_names": "k", "window_date_column": "d", "window_days": 5})
    assert {r["k"] for r in res.df.collect()} == {"k3"}
    res2 = DR.source_data_lookup(
        df, "Timeframe_Combo_Match", None,
        {"groupby_names": "k", "window_date_column": "d", "window_days": 5})
    got = {(r["missing_from"], r["k"]) for r in res2.df.collect()}
    assert got == {("Prior Timeframe", "k2"), ("Latest Timeframe", "k3")}


def test_distribution_shift_lookup(spark):
    new = spark.createDataFrame([("x",)] * 3 + [("y",)], "c: string")
    old = spark.createDataFrame([("x",)] * 2 + [("z",)] * 2, "c: string")
    res = DR.source_data_lookup(new, "Distribution_Shift", None,
                                {"groupby_names": "c", "match_df": old})
    rows = {(r["category"], r["latest_pct_of_total"], r["older_pct_of_total"])
            for r in res.df.collect()}
    assert rows == {("x", 0.75, 0.5), ("y", 0.25, None), ("z", None, 0.5)}


def test_metric_trend_and_freshness_lookups(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v: long")
    res = DR.source_data_lookup(
        df, "Volume_Trend", None,
        {"custom_query": "COUNT(*)", "lower_tolerance": 5,
         "upper_tolerance": 20})
    row = res.df.collect()[0]
    assert (row["current_count"], row["lower_bound"], row["upper_bound"]) \
        == (10, 5.0, 20.0)
    res2 = DR.source_data_lookup(
        df, "Table_Freshness", None,
        {"custom_query": "COUNT(*)", "baseline_value": "nope"})
    row2 = res2.df.collect()[0]
    assert row2["changed"] is True and row2["baseline_fingerprint"] == "nope"


def test_custom_lookup(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id: long, s: string")
    res = DR.source_data_lookup(df, "CUSTOM", None, {"custom_query": "id > 1"})
    assert {r["id"] for r in res.df.collect()} == {2}
    res2 = DR.source_data_lookup(
        df, "CUSTOM", None,
        {"custom_query": "SELECT s FROM target WHERE id = 1"})
    assert [r["s"] for r in res2.df.collect()] == ["a"]


def test_benford_lookup(spark):
    """Drill-down for the Benford_Nonconformity screening rule: the
    per-digit observed/expected census, one row per digit 1-9."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    res = DR.source_data_lookup(orders, "Benford_Nonconformity",
                                "o_totalprice")
    assert res.status == "OK"
    rows = res.df.collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert sum(r["n"] for r in rows) == orders.count()
    assert sum(r["chi2_term"] for r in rows) > 20.09  # why it fired
