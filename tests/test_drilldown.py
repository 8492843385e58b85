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
