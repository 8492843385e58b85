"""Test definitions and the test-type registry.

Mirrors the reference's ``test_definitions`` rows and the per-type metadata in
`/root/reference/testgen/template/dbsetup_test_types/*.yaml` (measure SQL,
test_operator, test_condition, default_parm_columns, severity).  Here each
test type carries a Spark measure *builder* instead of per-flavor SQL text.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

# Operators come from cat_test_conditions.test_operator in the YAMLs.
OPS = {">", ">=", "<", "<=", "=", "<>", "NOT BETWEEN"}


@dataclass
class TestDef:
    """One parameterized test instance (test_definitions row)."""

    __test__ = False  # not a pytest class

    test_id: str
    test_type: str
    table_name: str
    column_name: str | None = None
    # thresholds / baselines, lowercase keys mirroring default_parm_columns:
    # threshold_value, baseline_value, baseline_ct, baseline_value_ct,
    # baseline_avg, baseline_sd, baseline_sum, baseline_unique_ct,
    # lower_tolerance, upper_tolerance, custom_query, subset_condition,
    # groupby_names, having_condition, match_* ...
    params: dict[str, Any] = field(default_factory=dict)
    severity: str = "Fail"       # Fail | Warning | Log
    lock_refresh: bool = False   # manual edits survive regeneration

    def p(self, key: str, default=None):
        return self.params.get(key, default)


def evaluate_condition(measure, operator: str, threshold, lower=None, upper=None) -> bool | None:
    """True → test FAILS (the reference's condition describes the failure,
    e.g. Unique fails when ``measure > 0``). None when not evaluable."""
    if operator == "NOT BETWEEN":
        if measure is None or lower is None or upper is None:
            return None
        return not (lower <= measure <= upper)
    if measure is None or threshold is None:
        return None
    if operator == ">":
        return measure > threshold
    if operator == ">=":
        return measure >= threshold
    if operator == "<":
        return measure < threshold
    if operator == "<=":
        return measure <= threshold
    if operator == "=":
        return measure == threshold
    if operator == "<>":
        return measure != threshold
    raise ValueError(f"unknown operator {operator!r}")


def result_status(failed: bool | None, severity: str) -> str:
    """result_code + severity → status (update_test_results.sql:31-41):
    Error → Error; severity Log → Log; code -1 (training) → Log;
    pass → Passed; fail → Warning/Failed by severity (default Warning)."""
    if failed is None:
        return "Error"
    if severity == "Log":
        return "Log"
    if not failed:
        return "Passed"
    return "Failed" if severity == "Fail" else "Warning"


def run_stats(results: list[dict]) -> dict:
    """Per-run counters (update_test_run_stats.sql:1-25)."""
    by_status = [r.get("result_status") for r in results]
    return {
        "test_ct": len(results),
        "passed_ct": sum(1 for r in results if r.get("result_code") == 1),
        "failed_ct": sum(1 for s in by_status if s == "Failed"),
        "warning_ct": sum(1 for s in by_status if s == "Warning"),
        "log_ct": sum(1 for s in by_status if s == "Log"),
        "error_ct": sum(1 for s in by_status if s == "Error"),
    }
