"""Run-completion + score-drop notification events.

Re-expresses the reference's notification subsystem
(`/root/reference/testgen/common/notifications/{test_run,profiling_run,
score_drop}.py`) as event builders over DataFrames with a pluggable sink
(callable per event body) — the SMTP/email-template layer is a serving
concern (SURVEY §4); the *decision logic* (trigger selection, highlight
allocation, score-drop thresholds) is the engine behavior mirrored here:

- trigger selection per run outcome (test_run.py:262-273): ``always`` fires
  on every run; Error/Cancelled runs fire everything; failures or errors →
  ``on_failures`` + ``on_warnings``; warnings alone → ``on_warnings``;
  newly-degraded tests vs the previous run → ``on_changes``.
- highlight allocation (test_run.py:278-301): each of
  failures/warnings/errors gets ``min(result_status_min, ct)`` rows, then
  the remaining budget up to ``result_list_ct`` fills in that order,
  changed-first within a status.
- score drop (score_drop.py:150-174): per category, notify when the score
  decreased AND the new score (×100) is under the per-category threshold.

All inputs are metadata-plane DataFrames (test results / score rows), so
the collects here are bounded by test counts, never data rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

TRIGGERS = ("always", "on_changes", "on_warnings", "on_failures")

# statuses that make a test "degraded" for on_changes (test_run.py:259-261)
_DEGRADED = ("Failed", "Warning", "Error")


@dataclass
class NotificationSetting:
    recipients: list[str]
    trigger: str = "always"          # one of TRIGGERS

    def __post_init__(self):
        if self.trigger not in TRIGGERS:
            raise ValueError(f"unknown trigger {self.trigger!r}")


@dataclass
class RunSummary:
    status: str = "Complete"
    test_ct: int = 0
    passed_ct: int = 0
    warning_ct: int = 0
    failed_ct: int = 0
    error_ct: int = 0
    log_ct: int = 0
    extra: dict = field(default_factory=dict)


def summarize_test_run(results: DataFrame,
                       status: str = "Complete") -> RunSummary:
    """Status counts for one run's results (TestRun.ct_by_status)."""
    row = results.agg(
        F.count(F.lit(1)).alias("test_ct"),
        *[F.sum(F.when(F.col("result_status") == s, 1).otherwise(0))
          .cast("long").alias(f"{s.lower()}_ct")
          for s in ("Passed", "Warning", "Failed", "Error", "Log")],
    ).first()
    return RunSummary(status=status, test_ct=row["test_ct"] or 0,
                      passed_ct=row["passed_ct"] or 0,
                      warning_ct=row["warning_ct"] or 0,
                      failed_ct=row["failed_ct"] or 0,
                      error_ct=row["error_ct"] or 0,
                      log_ct=row["log_ct"] or 0)


def changed_test_ids(previous: DataFrame | None,
                     current: DataFrame) -> list[str]:
    """Tests whose status newly degraded vs the previous run
    (TestResult.diff semantics: status changed AND new status is
    Failed/Warning/Error)."""
    if previous is None:
        return []
    prev = previous.select(F.col("test_id"),
                           F.col("result_status").alias("__prev_status__"))
    joined = current.select("test_id", "result_status").join(
        prev, "test_id", "inner")
    rows = (joined.filter(
        (F.col("result_status") != F.col("__prev_status__"))
        & F.col("result_status").isin(*_DEGRADED))
        .select("test_id").collect())
    return [r["test_id"] for r in rows]


def run_triggers(summary: RunSummary, changed: list[str]) -> set[str]:
    """Which notification triggers fire for this run
    (test_run.py:262-273)."""
    triggers = {"always"}
    if summary.status in ("Error", "Cancelled"):
        return set(TRIGGERS)
    if summary.error_ct + summary.failed_ct:
        triggers.update({"on_failures", "on_warnings"})
    elif summary.warning_ct:
        triggers.add("on_warnings")
    if changed:
        triggers.add("on_changes")
    return triggers


def allocate_highlights(summary: RunSummary, result_list_ct: int = 20,
                        result_status_min: int = 5) -> dict[str, int]:
    """How many result rows to show per status (test_run.py:286-301):
    min(result_status_min, ct) each, then fill remaining budget in
    Failed → Warning → Error order."""
    cts = {"Failed": summary.failed_ct, "Warning": summary.warning_ct,
           "Error": summary.error_ct}
    alloc = {s: min(result_status_min, c) for s, c in cts.items()}
    for s in ("Failed", "Warning", "Error"):
        alloc[s] += min(result_list_ct - sum(alloc.values()),
                        cts[s] - alloc[s])
    return alloc


def highlight_rows(results: DataFrame, changed: list[str],
                   alloc: dict[str, int]) -> dict[str, list[dict]]:
    """Per-status result rows for the event body, changed-first
    (test_run.py:303-323). Collects only the allocated handful."""
    out: dict[str, list[dict]] = {}
    for status, n in alloc.items():
        if not n:
            continue
        is_new = (F.col("test_id").isin(changed) if changed
                  else F.lit(False))
        rows = (results.filter(F.col("result_status") == status)
                .select("table_name", "column_name",
                        F.col("result_message").alias("message"),
                        is_new.alias("is_new"), "test_type")
                .orderBy(F.col("is_new").desc(), "table_name",
                         "column_name", "test_type")
                .limit(n).collect())
        out[status] = [r.asDict() for r in rows]
    return out


def build_test_run_events(results: DataFrame,
                          settings: list[NotificationSetting],
                          previous: DataFrame | None = None,
                          status: str = "Complete",
                          result_list_ct: int = 20,
                          result_status_min: int = 5,
                          suite_key: str = "default_suite") -> list[dict]:
    """One event per notification setting whose trigger fires
    (send_test_run_notifications)."""
    if not settings:
        return []
    summary = summarize_test_run(results, status=status)
    changed = changed_test_ids(previous, results)
    fired = run_triggers(summary, changed)
    active = [ns for ns in settings if ns.trigger in fired]
    if not active:
        return []
    alloc = allocate_highlights(summary, result_list_ct, result_status_min)
    highlights = highlight_rows(results, changed, alloc)
    body = {
        "event_type": "test_run",
        "test_suite_key": suite_key,
        "status": summary.status,
        "test_ct": summary.test_ct,
        "passed_ct": summary.passed_ct,
        "warning_ct": summary.warning_ct,
        "failed_ct": summary.failed_ct,
        "error_ct": summary.error_ct,
        "changed_ct": len(changed),
        "highlights": highlights,
    }
    return [{**body, "recipients": ns.recipients, "trigger": ns.trigger}
            for ns in active]


def build_profiling_run_event(anomalies: DataFrame,
                              status: str = "Complete",
                              table_group: str = "default") -> dict:
    """Profiling-run completion event (profiling_run.py): hygiene issue
    count overall + by likelihood."""
    counts = (anomalies.groupBy("likelihood")
              .agg(F.count(F.lit(1)).alias("ct")).collect())
    by_likelihood = {r["likelihood"]: r["ct"] for r in counts}
    return {
        "event_type": "profiling_run",
        "table_group": table_group,
        "status": status,
        "issue_count": sum(by_likelihood.values()),
        "issues_by_likelihood": by_likelihood,
    }


def score_drop_diff(prev_scores: dict[str, float | None],
                    curr_scores: dict[str, float | None],
                    thresholds: dict[str, float | None]) -> list[dict]:
    """Per-category score diff with the reference's notify rule
    (score_drop.py:150-174): notify iff the score decreased AND the new
    score ×100 is under the category threshold. Categories: ``score``
    (total) and ``cde_score``."""
    labels = {"score": "Total", "cde_score": "CDE"}
    out = []
    for cat in ("score", "cde_score"):
        prev, curr = prev_scores.get(cat), curr_scores.get(cat)
        if prev is None or curr is None:
            continue
        thr = thresholds.get(cat)
        out.append({
            "category": cat,
            "label": labels[cat],
            "prev": prev,
            "current": curr,
            "threshold": thr,
            "decrease": max(prev - curr, 0),
            "increase": max(curr - prev, 0),
            "notify": (prev > curr and thr is not None
                       and curr * 100 < thr),
        })
    return out


def score_drop_events_df(diffs: DataFrame) -> DataFrame:
    """Vectorized score-drop screen for MANY score definitions at once:
    input (definition_id, category, prev_score, curr_score, threshold) →
    adds decrease/increase/notify. The per-definition event fires when any
    of its categories notifies (same rule as ``score_drop_diff``)."""
    scored = diffs.select(
        "*",
        F.greatest(F.col("prev_score") - F.col("curr_score"),
                   F.lit(0.0)).alias("decrease"),
        F.greatest(F.col("curr_score") - F.col("prev_score"),
                   F.lit(0.0)).alias("increase"),
        ((F.col("prev_score") > F.col("curr_score"))
         & F.col("threshold").isNotNull()
         & (F.col("curr_score") * 100 < F.col("threshold")))
        .alias("notify"))
    fired = (scored.groupBy("definition_id")
             .agg(F.max(F.col("notify").cast("int")).alias("__any__"))
             .filter(F.col("__any__") == 1).drop("__any__"))
    return scored.join(F.broadcast(fired), "definition_id", "inner")


def post_events(events: list[dict], sink) -> int:
    """Deliver each event body to the sink callable; returns count."""
    for e in events:
        sink(e)
    return len(events)
