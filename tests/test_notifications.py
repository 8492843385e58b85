"""Notification decision logic — ports the reference's parametrized spec
(`tests/unit/common/notifications/test_test_run_notifications.py:96-116`
trigger + highlight-allocation table, `test_score_drop_notifications.py`
threshold rule)."""

import pytest

from dataops_testgen_spark.notifications import (
    NotificationSetting, RunSummary, allocate_highlights,
    build_profiling_run_event, build_test_run_events, changed_test_ids,
    run_triggers, score_drop_diff, score_drop_events_df, summarize_test_run)

RESULT_SCHEMA = ("test_id string, test_type string, table_name string, "
                 "column_name string, result_status string, "
                 "result_message string")


def _results(spark, statuses):
    rows = [(f"t{i}", "Unique", "tbl", f"c{i}", s, f"msg-{i}")
            for i, s in enumerate(statuses)]
    return spark.createDataFrame(rows, RESULT_SCHEMA)


# (status, failed, warning, error, changed, exp_failed, exp_warning,
#  exp_error, expected_triggers) — the reference's table verbatim; `changed`
# stands in for TestResult.diff returning newly-degraded tests.
REFERENCE_CASES = [
    ("Complete", 0, 0, 0, 0, 0, 0, 0, {"always"}),
    ("Complete", 0, 5, 0, 0, 0, 5, 0, {"always", "on_warnings"}),
    ("Complete", 1, 1, 1, 0, 1, 1, 1,
     {"always", "on_failures", "on_warnings"}),
    ("Complete", 50, 50, 50, 5, 10, 5, 5,
     {"always", "on_failures", "on_warnings", "on_changes"}),
    ("Complete", 0, 0, 50, 50, 0, 0, 20,
     {"always", "on_failures", "on_warnings", "on_changes"}),
    ("Complete", 50, 0, 0, 0, 20, 0, 0,
     {"always", "on_failures", "on_warnings"}),
    ("Complete", 50, 0, 10, 5, 15, 0, 5,
     {"always", "on_failures", "on_warnings", "on_changes"}),
    ("Error", 0, 0, 0, 0, 0, 0, 0,
     {"always", "on_failures", "on_warnings", "on_changes"}),
    ("Error", 20, 10, 0, 0, 15, 5, 0,
     {"always", "on_failures", "on_warnings", "on_changes"}),
    ("Cancelled", 0, 0, 0, 0, 0, 0, 0,
     {"always", "on_failures", "on_warnings", "on_changes"}),
    ("Cancelled", 30, 20, 0, 0, 15, 5, 0,
     {"always", "on_failures", "on_warnings", "on_changes"}),
]


@pytest.mark.parametrize(
    "status,failed,warning,error,changed,ef,ew,ee,expected", REFERENCE_CASES)
def test_triggers_and_allocation(status, failed, warning, error, changed,
                                 ef, ew, ee, expected):
    s = RunSummary(status=status, failed_ct=failed, warning_ct=warning,
                   error_ct=error,
                   test_ct=failed + warning + error)
    assert run_triggers(s, ["x"] * changed) == expected
    alloc = allocate_highlights(s)
    assert (alloc["Failed"], alloc["Warning"], alloc["Error"]) == (ef, ew, ee)


def test_summarize_and_events(spark):
    cur = _results(spark, ["Passed"] * 3 + ["Failed", "Warning"])
    s = summarize_test_run(cur)
    assert (s.test_ct, s.passed_ct, s.failed_ct, s.warning_ct) == (5, 3, 1, 1)

    settings = [NotificationSetting(["a@x"], "always"),
                NotificationSetting(["f@x"], "on_failures"),
                NotificationSetting(["c@x"], "on_changes")]
    events = build_test_run_events(cur, settings)
    # no previous run -> no changes -> on_changes silent
    assert {e["trigger"] for e in events} == {"always", "on_failures"}
    e = events[0]
    assert e["failed_ct"] == 1 and e["test_ct"] == 5
    assert [r["message"] for r in e["highlights"]["Failed"]] == ["msg-3"]


def test_changed_first_highlights(spark):
    prev = _results(spark, ["Passed"] * 5)
    cur = _results(spark, ["Failed", "Passed", "Failed", "Passed", "Passed"])
    changed = changed_test_ids(prev, cur)
    assert sorted(changed) == ["t0", "t2"]
    events = build_test_run_events(
        cur, [NotificationSetting(["x@x"], "on_changes")], previous=prev)
    assert len(events) == 1
    rows = events[0]["highlights"]["Failed"]
    assert all(r["is_new"] for r in rows)      # changed sort first


def test_no_settings_no_events(spark):
    cur = _results(spark, ["Failed"])
    assert build_test_run_events(cur, []) == []
    # trigger not fired -> no event
    ok = _results(spark, ["Passed"])
    assert build_test_run_events(
        ok, [NotificationSetting(["x@x"], "on_failures")]) == []


def test_profiling_run_event(spark):
    anomalies = spark.createDataFrame(
        [("t", "c1", "Suggested_Type", "Likely"),
         ("t", "c2", "No_Values", "Definite"),
         ("t", "c3", "Pattern_Inconsistency", "Likely")],
        "table_name string, column_name string, anomaly_type string, "
        "likelihood string")
    e = build_profiling_run_event(anomalies)
    assert e["issue_count"] == 3
    assert e["issues_by_likelihood"] == {"Likely": 2, "Definite": 1}


# score-drop threshold rule (score_drop.py:150-174): notify iff decreased
# AND curr*100 < threshold
@pytest.mark.parametrize("prev,curr,thr,notify", [
    (0.95, 0.80, 90.0, True),       # dropped under threshold
    (0.95, 0.92, 90.0, False),      # dropped but still >= threshold
    (0.80, 0.95, 90.0, False),      # improved
    (0.95, 0.80, None, False),      # no threshold configured
    (0.80, 0.80, 90.0, False),      # unchanged (not a decrease)
])
def test_score_drop_rule(prev, curr, thr, notify):
    diff = score_drop_diff({"score": prev}, {"score": curr}, {"score": thr})
    assert len(diff) == 1
    d = diff[0]
    assert d["notify"] is notify
    assert d["decrease"] == pytest.approx(max(prev - curr, 0))
    assert d["increase"] == pytest.approx(max(curr - prev, 0))


def test_score_drop_missing_category():
    diff = score_drop_diff({"score": 0.9}, {"score": 0.8, "cde_score": 0.7},
                           {"score": 95.0})
    assert [d["category"] for d in diff] == ["score"]  # cde prev missing


def test_score_drop_events_df(spark):
    rows = [
        ("d1", "score", 0.95, 0.80, 90.0),      # fires
        ("d1", "cde_score", 0.90, 0.92, 90.0),  # improved, rides along
        ("d2", "score", 0.95, 0.93, 90.0),      # no fire for d2
    ]
    df = spark.createDataFrame(
        rows, "definition_id string, category string, prev_score double, "
              "curr_score double, threshold double")
    out = score_drop_events_df(df).collect()
    assert {r["definition_id"] for r in out} == {"d1"}
    fired = {r["category"]: r["notify"] for r in out}
    assert fired == {"score": True, "cde_score": False}
