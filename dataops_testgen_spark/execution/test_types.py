"""Test-type metadata registry — the engine-side view of the reference's
``test_types`` table (seeded from
`/root/reference/testgen/template/dbsetup_test_types/*.yaml`, 51 types).

Spec constants (dq_dimension, measure_uom, default_severity, test_scope,
run_type) match the reference catalog; descriptions are our own one-liners.
Backs the ``list-test-types`` CLI command and the ``test_info`` entity query
(ref `__main__.py:846`, `template/get_entities/list_test_types.sql`).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TestTypeMeta:
    __test__ = False  # not a pytest class

    test_type: str
    dq_dimension: str
    measure_uom: str
    default_severity: str
    test_scope: str   # column | table | referential | custom | tablegroup
    run_type: str     # CAT | QUERY | METADATA
    description: str


def _t(*args) -> TestTypeMeta:
    return TestTypeMeta(*args)


TEST_TYPES: dict[str, TestTypeMeta] = {m.test_type: m for m in [
    _t("Aggregate_Balance", "Consistency", "Mismatched measures", "Fail",
       "referential", "QUERY",
       "Grouped aggregate in one table must exactly equal the matching "
       "grouped aggregate in another."),
    _t("Aggregate_Balance_Percent", "Consistency", "Mismatched measures",
       "Fail", "referential", "QUERY",
       "Grouped aggregate must stay within a percent band of the matching "
       "aggregate elsewhere."),
    _t("Aggregate_Balance_Range", "Consistency", "Mismatched measures",
       "Fail", "referential", "QUERY",
       "Grouped aggregate must stay within an absolute range of the "
       "matching aggregate elsewhere."),
    _t("Aggregate_Minimum", "Accuracy", "Mismatched measures", "Fail",
       "referential", "QUERY",
       "Grouped aggregate must be at least the matching aggregate "
       "elsewhere."),
    _t("Alpha_Trunc", "Validity", "Values over max", "Fail", "column", "CAT",
       "Maximum string length must not have shrunk versus the profiled "
       "baseline (possible truncation)."),
    _t("Avg_Shift", "Consistency", "Difference Measure", "Warning", "column",
       "CAT",
       "Column mean must not shift significantly from the baseline "
       "(t-statistic style difference measure)."),
    _t("CUSTOM", "Accuracy", "Errors found", "Fail", "custom", "QUERY",
       "User-supplied SQL returning offending rows; any row is a failure."),
    _t("Combo_Match", "Validity", "Missing values", "Fail", "referential",
       "QUERY",
       "Each combination of column values must exist in a reference "
       "table/expression."),
    _t("Condition_Flag", "Validity", "Values Failing", "Fail", "custom",
       "CAT",
       "Count of rows matching a user-supplied failure condition must not "
       "exceed the threshold."),
    _t("Constant", "Validity", "Mismatched values", "Fail", "column", "CAT",
       "Every value must equal the expected constant baseline value."),
    _t("Daily_Record_Ct", "Completeness", "Missing dates", "Warning",
       "column", "CAT",
       "No calendar days may be missing inside the column's date span."),
    _t("Dec_Trunc", "Validity", "Fractional sum", "Fail", "column", "CAT",
       "Sum of fractional parts must not drop versus baseline (decimal "
       "truncation detector)."),
    _t("Distinct_Date_Ct", "Timeliness", "Unique dates", "Fail", "column",
       "CAT",
       "Count of distinct dates must not fall below the baseline."),
    _t("Distinct_Value_Ct", "Validity", "Unique Values", "Fail", "column",
       "CAT",
       "Count of distinct values must match the baseline count."),
    _t("Distribution_Shift", "Consistency", "Divergence level (0-1)",
       "Warning", "referential", "QUERY",
       "Jensen-Shannon divergence between current and baseline category "
       "distributions must stay under threshold."),
    _t("Dupe_Rows", "Uniqueness", "Duplicate records", "Fail", "table",
       "QUERY",
       "No fully-duplicated rows across the named columns."),
    _t("Email_Format", "Validity", "Invalid emails", "Fail", "column", "CAT",
       "All non-null values must match the email pattern."),
    _t("Freshness_Trend", "Recency", "Interval since last update", "Fail",
       "table", "QUERY",
       "Table content must keep changing within its learned update "
       "cadence (fingerprint-based)."),
    _t("Future_Date", "Timeliness", "Future dates", "Fail", "column", "CAT",
       "No dates beyond the test run date."),
    _t("Future_Date_1Y", "Timeliness", "Future dates post 1 year", "Fail",
       "column", "CAT",
       "No dates more than one year beyond the test run date."),
    _t("Incr_Avg_Shift", "Accuracy", "Z-score of mean shift", "Warning",
       "column", "CAT",
       "Mean of newly-added rows must not shift from the baseline mean "
       "beyond a z-score threshold."),
    _t("LOV_All", "Validity", "Values found", "Fail", "column", "CAT",
       "The set of distinct values must exactly equal the baseline list "
       "of values."),
    _t("LOV_Match", "Validity", "Non-matching records", "Fail", "column",
       "CAT",
       "Every value must belong to the baseline list of values."),
    _t("Metric_Trend", "Validity", "Aggregate metric", "Fail", "table",
       "CAT",
       "A custom aggregate metric must stay inside its forecast tolerance "
       "band."),
    _t("Min_Date", "Validity", "Dates prior to limit", "Fail", "column",
       "CAT",
       "No dates earlier than the baseline minimum date."),
    _t("Min_Val", "Validity", "Values under limit", "Fail", "column", "CAT",
       "No values below the baseline minimum value."),
    _t("Missing_Pct", "Completeness", "Difference measure", "Warning",
       "column", "CAT",
       "Share of missing values must not grow significantly versus "
       "baseline."),
    _t("Monthly_Rec_Ct", "Completeness", "Missing months", "Fail", "column",
       "CAT",
       "No calendar months may be missing inside the column's date span."),
    _t("Outlier_Pct_Above", "Accuracy", "Pct records over limit", "Warning",
       "column", "CAT",
       "Share of values above 2 SD over the baseline mean must stay under "
       "threshold."),
    _t("Outlier_Pct_Below", "Accuracy", "Pct records under limit", "Warning",
       "column", "CAT",
       "Share of values below 2 SD under the baseline mean must stay "
       "under threshold."),
    _t("Pattern_Match", "Validity", "Pattern Mismatches", "Fail", "column",
       "CAT",
       "All non-null values must match the learned regex pattern."),
    _t("Recency", "Timeliness", "Days before test", "Warning", "column",
       "CAT",
       "Most recent date must fall within the allowed staleness window."),
    _t("Required", "Completeness", "Missing values", "Fail", "column", "CAT",
       "No null values allowed."),
    _t("Row_Ct", "Completeness", "Row count", "Fail", "table", "CAT",
       "Table row count must not fall below the baseline count."),
    _t("Row_Ct_Pct", "Completeness", "Percent of baseline", "Fail", "table",
       "CAT",
       "Table row count must stay within a percent band of baseline."),
    _t("Schema_Drift", "None", "Schema changes", "Fail", "tablegroup",
       "METADATA",
       "Table-group schema (tables, columns, types) must match the last "
       "recorded structure."),
    _t("Street_Addr_Pattern", "Validity", "Percent matches", "Fail",
       "column", "CAT",
       "Share of values shaped like street addresses must stay above "
       "threshold."),
    _t("Table_Freshness", "Recency", "Was Change Detected", "Log", "table",
       "QUERY",
       "Log whether the table fingerprint changed since the last run."),
    _t("Timeframe_Combo_Gain", "Consistency", "Mismatched values", "Fail",
       "referential", "QUERY",
       "Value combinations present in the prior timeframe must persist "
       "into the latest timeframe."),
    _t("Timeframe_Combo_Match", "Consistency", "Mismatched values", "Fail",
       "referential", "QUERY",
       "Value combinations must match exactly across the two latest "
       "timeframes (both directions)."),
    _t("US_State", "Validity", "Not US States", "Fail", "column", "CAT",
       "All values must be valid US state abbreviations."),
    _t("Unique", "Uniqueness", "Duplicate values", "Fail", "column", "CAT",
       "No value may occur more than once."),
    _t("Unique_Pct", "Uniqueness", "Difference measure", "Warning", "column",
       "CAT",
       "Share of distinct values must not drop significantly versus "
       "baseline."),
    _t("Valid_Characters", "Validity", "Invalid records", "Warning",
       "column", "CAT",
       "No non-printing characters, leading quotes, or dummy placeholder "
       "values."),
    _t("Valid_Month", "Validity", "Invalid months", "Fail", "column", "CAT",
       "All values must be valid calendar month representations."),
    _t("Valid_US_Zip", "Validity", "Invalid Zip Codes", "Warning", "column",
       "CAT",
       "All values must be valid 5- or 9-digit US ZIP codes."),
    _t("Valid_US_Zip3", "Validity", "Invalid Zip-3 Prefix", "Warning",
       "column", "CAT",
       "All values must be valid 3-digit US ZIP prefixes."),
    _t("Variability_Decrease", "Accuracy", "Pct SD shift", "Warning",
       "column", "CAT",
       "Standard deviation must not shrink beyond the allowed percent of "
       "baseline SD."),
    _t("Variability_Increase", "Accuracy", "Pct SD shift", "Warning",
       "column", "CAT",
       "Standard deviation must not grow beyond the allowed percent of "
       "baseline SD."),
    _t("Volume_Trend", "Completeness", "Row count", "Fail", "table", "CAT",
       "Row count must stay inside its forecast tolerance band."),
    _t("Weekly_Rec_Ct", "Completeness", "Missing weeks", "Fail", "column",
       "CAT",
       "No calendar weeks may be missing inside the column's date span."),
]}


def list_test_types() -> list[tuple[str, str, str]]:
    """(test_type, test_description, dq_dimension) rows ordered by type —
    ref `template/get_entities/list_test_types.sql`."""
    return [(m.test_type, m.description, m.dq_dimension)
            for m in sorted(TEST_TYPES.values(), key=lambda m: m.test_type)]


def measure_uom(test_type: str) -> str | None:
    m = TEST_TYPES.get(test_type)
    return m.measure_uom if m else None
