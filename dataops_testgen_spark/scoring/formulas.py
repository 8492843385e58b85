"""Per-test-type prevalence formulas and the fn_eval-style evaluator.

The reference interpolates ``{TOKEN}`` placeholders into each type's
``dq_score_prevalence_formula`` and evaluates the resulting SQL arithmetic
with a dynamic-SQL function (`calc_prevalence_test_results.sql:22-68`,
``fn_eval`` `020_create_standard_functions_sprocs.sql:212`). Here the same
formula strings are translated to Python arithmetic and evaluated with a
restricted namespace — no dynamic SQL.

dq_prevalence = LEAST(1.0, risk_factor × fn_eval(formula)).
"""

from __future__ import annotations

import datetime as dt
import math
import re

# test_type -> (formula, risk_factor); formulas verbatim from the YAMLs.
_RATIO = "({RESULT_MEASURE}-{THRESHOLD_VALUE})::FLOAT/NULLIF({RECORD_CT}::FLOAT, 0)"
_ARCSINE = "2.0 * (1.0 - fn_normal_cdf(ABS({RESULT_MEASURE}::FLOAT) / 2.0))"

PREVALENCE_FORMULAS: dict[str, str] = {
    "Aggregate_Balance": "1", "Aggregate_Balance_Percent": "1",
    "Aggregate_Balance_Range": "1", "Aggregate_Minimum": "1",
    "Alpha_Trunc": (
        "{VALUE_CT}::FLOAT * (FN_NORMAL_CDF(({MAX_LENGTH}::FLOAT - {AVG_LENGTH}::FLOAT)"
        " / (NULLIF({MAX_LENGTH}::FLOAT, 0) / 3)) - FN_NORMAL_CDF(({RESULT_MEASURE}::FLOAT"
        " - {AVG_LENGTH}::FLOAT) / (NULLIF({MAX_LENGTH}::FLOAT, 0) / 3)) )"
        "/NULLIF({RECORD_CT}::FLOAT, 0)"),
    "Avg_Shift": _ARCSINE,
    "CUSTOM": _RATIO, "Combo_Match": _RATIO, "Condition_Flag": _RATIO,
    "Constant": _RATIO,
    "Daily_Record_Ct": (
        "({RESULT_MEASURE}-{THRESHOLD_VALUE})::FLOAT*{PRO_RECORD_CT}::FLOAT"
        "/NULLIF({DATE_DAYS_PRESENT}::FLOAT, 0)/NULLIF({RECORD_CT}::FLOAT, 0)"),
    "Dec_Trunc": "1",
    "Distinct_Date_Ct": (
        "(({RECORD_CT}-{PRO_RECORD_CT})::FLOAT*{DISTINCT_VALUE_CT}::FLOAT"
        "/NULLIF({PRO_RECORD_CT}::FLOAT, 0))/NULLIF({PRO_RECORD_CT}::FLOAT, 0)"),
    "Distinct_Value_Ct": (
        "ABS({RESULT_MEASURE}-{THRESHOLD_VALUE})::FLOAT*{PRO_RECORD_CT}::FLOAT"
        "/NULLIF({DISTINCT_VALUE_CT}::FLOAT, 0)/NULLIF({RECORD_CT}::FLOAT, 0)"),
    "Distribution_Shift": "1",
    "Dupe_Rows": "(({RESULT_MEASURE}-{THRESHOLD_VALUE}))::FLOAT/NULLIF({RECORD_CT}::FLOAT, 0)",
    "Email_Format": _RATIO, "Future_Date": _RATIO, "Future_Date_1Y": _RATIO,
    "Incr_Avg_Shift": (
        "{RECORD_CT}::FLOAT*(1-FN_NORMAL_CDF({RESULT_MEASURE}::FLOAT))"
        "/NULLIF({RECORD_CT}::FLOAT, 0)"),
    "LOV_All": "1", "LOV_Match": _RATIO, "Min_Date": _RATIO, "Min_Val": _RATIO,
    "Missing_Pct": _ARCSINE,
    "Monthly_Rec_Ct": (
        "({RESULT_MEASURE}-{THRESHOLD_VALUE})::FLOAT*{PRO_RECORD_CT}::FLOAT"
        "/NULLIF({DATE_MONTHS_PRESENT}::FLOAT, 0)/NULLIF({RECORD_CT}::FLOAT, 0)"),
    "Outlier_Pct_Above": "GREATEST(0, {RESULT_MEASURE}::FLOAT-{THRESHOLD_VALUE}::FLOAT)",
    "Outlier_Pct_Below": "GREATEST(0, {RESULT_MEASURE}::FLOAT-{THRESHOLD_VALUE}::FLOAT)",
    "Pattern_Match": _RATIO,
    "Recency": (
        "(ABS({RESULT_MEASURE}-{THRESHOLD_VALUE})::FLOAT*{PRO_RECORD_CT}::FLOAT"
        "/(1.0+DATEDIFF('DAY', '{MIN_DATE}', '{MAX_DATE}'))::FLOAT)"
        "/NULLIF({RECORD_CT}::FLOAT, 0)"),
    "Required": _RATIO,
    "Row_Ct": "({RESULT_MEASURE}-{THRESHOLD_VALUE})::FLOAT/NULLIF({THRESHOLD_VALUE}::FLOAT, 0)",
    "Row_Ct_Pct": "(100.0 - {RESULT_MEASURE}::FLOAT)/100.0",
    "Street_Addr_Pattern": (
        "({VALUE_CT}::FLOAT * ({RESULT_MEASURE}::FLOAT - {THRESHOLD_VALUE}::FLOAT)/100.0)"
        "/NULLIF({RECORD_CT}::FLOAT, 0)"),
    "Timeframe_Combo_Gain": _RATIO, "Timeframe_Combo_Match": _RATIO,
    "US_State": _RATIO, "Unique": _RATIO, "Unique_Pct": _ARCSINE,
    "Valid_Characters": _RATIO, "Valid_Month": _RATIO,
    "Valid_US_Zip": _RATIO, "Valid_US_Zip3": _RATIO,
    "Variability_Decrease": "1", "Variability_Increase": "1",
    "Weekly_Rec_Ct": (
        "({RESULT_MEASURE}-{THRESHOLD_VALUE})::FLOAT*{PRO_RECORD_CT}::FLOAT"
        "/NULLIF({DATE_WEEKS_PRESENT}::FLOAT, 0)/NULLIF({RECORD_CT}::FLOAT, 0)"),
}

RISK_FACTORS: dict[str, float] = {
    "Avg_Shift": 0.75, "Daily_Record_Ct": 0.75, "Distribution_Shift": 0.75,
    "Incr_Avg_Shift": 0.75, "Missing_Pct": 0.75, "Outlier_Pct_Above": 0.75,
    "Outlier_Pct_Below": 0.75, "Recency": 0.75, "Unique_Pct": 0.75,
    "Valid_Characters": 0.75, "Valid_US_Zip": 0.75, "Valid_US_Zip3": 0.75,
    "Variability_Decrease": 0.75, "Variability_Increase": 0.75,
}  # all others 1.0


def fn_normal_cdf(x: float) -> float:
    """Standard normal CDF (replaces fn_normal_cdf's Zelen–Severo
    approximation, `020_...sql:157-210`, with the exact erf form)."""
    return 0.5 * (1 + math.erf(x / math.sqrt(2)))


def _nullif(a, b):
    return None if a == b else a


def _datediff_day(a: str, b: str) -> int:
    da = dt.datetime.fromisoformat(str(a).strip()).date()
    db = dt.datetime.fromisoformat(str(b).strip()).date()
    return (db - da).days


_ALLOWED = {
    "ABS": abs, "GREATEST": max, "LEAST": min, "NULLIF": _nullif,
    "FN_NORMAL_CDF": fn_normal_cdf,
}


def eval_prevalence(test_type: str, subs: dict[str, object]) -> float | None:
    """fn_eval of the type's formula with {TOKEN} substitution →
    LEAST(1.0, risk × value); None when the formula can't evaluate
    (e.g. NULL divisor), matching SQL NULL propagation."""
    formula = PREVALENCE_FORMULAS.get(test_type)
    if formula is None:
        return None
    expr = formula
    for token, value in subs.items():
        expr = expr.replace("{%s}" % token, "None" if value is None else str(value))

    # DATEDIFF('DAY', '<date>', '<date>') — now holds literal dates
    def _dd(m: re.Match) -> str:
        try:
            return str(_datediff_day(m.group(1), m.group(2)))
        except ValueError:
            return "None"

    expr = re.sub(r"DATEDIFF\(\s*'DAY'\s*,\s*'([^']*)'\s*,\s*'([^']*)'\s*\)", _dd, expr)
    if re.search(r"\{\w+\}", expr):
        return None  # unresolved token (e.g. no profile row)
    expr = expr.replace("::FLOAT", "")
    expr = re.sub(r"(?i)fn_normal_cdf", "FN_NORMAL_CDF", expr)
    try:
        value = eval(expr, {"__builtins__": {}}, _ALLOWED)  # noqa: S307 — vetted arithmetic only
    except (TypeError, ZeroDivisionError):  # NULL propagation / NULLIF-zero
        return None
    if value is None:
        return None
    risk = RISK_FACTORS.get(test_type, 1.0)
    return min(1.0, risk * float(value))
