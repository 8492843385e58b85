"""Tests for the schema-diff log, Schema_Drift signal, and validation
pre-pass."""

from __future__ import annotations

from dataops_testgen_spark.execution.defs import TestDef
from dataops_testgen_spark.execution.schema_drift import (
    diff_snapshots,
    schema_drift_test,
    schema_snapshot,
)
from dataops_testgen_spark.execution.validation import validate_tests


def test_snapshot_and_diff(spark):
    t1 = spark.createDataFrame([(1, "a")], "id long, name string")
    t2 = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, amt double")
    t2b = spark.createDataFrame([(1, 2)], "id long, name int")  # name retyped

    prev = schema_snapshot({"t": t1})
    cur = schema_snapshot({"t": t2, "new_table": t1})
    log = diff_snapshots(spark, prev, cur, "2026-08-01")
    changes = {(r["table_name"], r["column_name"], r["change_type"])
               for r in log.collect()}
    assert ("t", "amt", "column_added") in changes
    assert ("new_table", "id", "table_added") in changes

    log2 = diff_snapshots(spark, schema_snapshot({"t": t1}),
                          schema_snapshot({"t": t2b}), "2026-08-02")
    mods = {(r["change_type"], r["old_type"], r["new_type"]) for r in log2.collect()}
    assert ("column_modified", "string", "int") in mods


def test_schema_drift_signal(spark):
    t1 = spark.createDataFrame([(1, "a")], "id long, name string")
    t2 = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, amt double")
    log = diff_snapshots(spark, schema_snapshot({"t": t1}),
                         schema_snapshot({"t": t2}), "2026-08-02")
    out = schema_drift_test(log, since="2026-08-01").collect()
    assert len(out) == 1
    row = out[0]
    assert row["adds"] == 1 and row["drops"] == 0 and row["mods"] == 0
    assert row["result_code"] == 0
    assert row["result_signal"] == "A|1|0|0|2026-08-01"
    # nothing since a later watermark → no rows
    assert schema_drift_test(log, since="2026-08-03").count() == 0


def test_validation_pre_pass(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    defs = [
        TestDef("ok", "Required", "t", "id", params={"threshold_value": 0}),
        TestDef("bad_col", "Required", "t", "nope", params={"threshold_value": 0}),
        TestDef("bad_table", "Row_Ct", "missing", None,
                params={"threshold_value": 0}),
    ]
    outcome = validate_tests({"t": df}, defs)
    assert [d.test_id for d in outcome.valid] == ["ok"]
    errs = {e["test_id"]: e for e in outcome.errors}
    assert errs["bad_col"]["result_status"] == "Error"
    assert "not present" in errs["bad_table"]["result_message"]
    assert all(e["test_active"] == "N" for e in errs.values())
