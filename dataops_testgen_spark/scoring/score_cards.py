"""Scorecard queries (SURVEY §2.9): latest-run scoring views, breakdown by
column / dq_dimension / impact_dimension, issue drill lists, and table-group
rollups.

Reference shape:

- ``v_dq_profile_scoring_latest_by_column`` / ``..._by_dimension`` /
  ``v_dq_test_scoring_latest_by_column`` / ``..._by_dimension``
  (`/root/reference/testgen/template/dbsetup/060_create_standard_views.sql:
  107-360`): per-column (and per-dimension) issue counts, weighted record
  counts, and good_data_pct = SUM_LN over confirmed prevalences.
- ``get_score_card_breakdown_by_column.sql:1-58`` (and the `_by_dimension` /
  `_by_impact_dimension` twins): group the scoring views, full-outer-join the
  profiling and testing sides, normalize each side by its own total data
  points, and emit ``impact`` / ``score`` / ``issue_ct`` ordered by impact.
- ``get_score_card_issues_by_column.sql:1-100``: union hygiene anomalies with
  Failed/Warning test results, ordered by severity class.
- ``rollup_scores_test_table_group.sql:1-23``: table-group testing score =
  1 − Σaffected/Σtotal over the latest complete run per test suite.

All inputs are metadata-plane DataFrames (one row per column/finding/test
result — thousands of rows at most, never data-plane), so every join here is
broadcast-sized; the expensive work happened upstream in the profiler and
test execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataops_testgen_spark.scoring.rollup import sum_ln

# anomaly_type -> (dq_dimension, impact_dimension); from each
# `dbsetup_anomaly_types/profile_anomaly_types_<key>.yaml` (dq_dimension /
# impact_dimension fields). Suggested_Type has dq_dimension null.
ANOMALY_DIMENSIONS: dict[str, tuple[str | None, str]] = {
    # the three extension rules beyond the reference's 32 YAMLs carry
    # dimensions in the same taxonomy: Benford nonconformity is an
    # accuracy signal (suspect magnitudes), correlated/dependent columns
    # consistency ones (derived/duplicated data)
    "Benford_Nonconformity": ("Accuracy", "Regularity"),
    "Correlated_Columns": ("Consistency", "Usability"),
    "Dependent_Column": ("Consistency", "Usability"),
    "Boolean_Value_Mismatch": ("Validity", "Usability"),
    "Char_Column_Date_Values": ("Validity", "Usability"),
    "Char_Column_Number_Units": ("Consistency", "Usability"),
    "Char_Column_Number_Values": ("Validity", "Usability"),
    "Column_Pattern_Mismatch": ("Validity", "Usability"),
    "Delimited_Data_Embedded": ("Validity", "Usability"),
    "Inconsistent_Casing": ("Validity", "Usability"),
    "Invalid_Zip3_USA": ("Validity", "Conformance"),
    "Invalid_Zip_USA": ("Validity", "Conformance"),
    "Leading_Spaces": ("Validity", "Usability"),
    "Multiple_Types_Major": ("Consistency", "Usability"),
    "Multiple_Types_Minor": ("Consistency", "Usability"),
    "No_Values": ("Completeness", "Conformance"),
    "Non_Alpha_Name_Address": ("Validity", "Conformance"),
    "Non_Alpha_Prefixed_Name": ("Validity", "Conformance"),
    "Non_Printing_Chars": ("Validity", "Usability"),
    "Non_Standard_Blanks": ("Completeness", "Usability"),
    "Potential_Duplicates": ("Uniqueness", "Regularity"),
    "Potential_PII": ("Validity", "Conformance"),
    "Quoted_Values": ("Validity", "Usability"),
    "Recency_One_Year": ("Timeliness", "Regularity"),
    "Recency_Six_Months": ("Timeliness", "Regularity"),
    "Small_Divergent_Value_Ct": ("Validity", "Regularity"),
    "Small_Missing_Value_Ct": ("Completeness", "Regularity"),
    "Small_Numeric_Value_Ct": ("Validity", "Regularity"),
    "Standardized_Value_Matches": ("Uniqueness", "Usability"),
    "Suggested_Type": (None, "Usability"),
    "Table_Pattern_Mismatch": ("Validity", "Usability"),
    "Unexpected_Emails": ("Consistency", "Conformance"),
    "Unexpected_US_States": ("Consistency", "Conformance"),
    "Unlikely_Date_Values": ("Accuracy", "Regularity"),
    "Variant_Coded_Values": ("Consistency", "Usability"),
}

# test_type -> (dq_dimension, impact_dimension); from each
# `dbsetup_test_types/test_types_<type>.yaml`. Schema_Drift has
# dq_dimension null.
TEST_DIMENSIONS: dict[str, tuple[str | None, str]] = {
    "Aggregate_Balance": ("Consistency", "Reliability"),
    "Aggregate_Balance_Percent": ("Consistency", "Reliability"),
    "Aggregate_Balance_Range": ("Consistency", "Reliability"),
    "Aggregate_Minimum": ("Accuracy", "Conformance"),
    "Alpha_Trunc": ("Validity", "Conformance"),
    "Avg_Shift": ("Consistency", "Regularity"),
    "CUSTOM": ("Accuracy", "Conformance"),
    "Combo_Match": ("Validity", "Conformance"),
    "Condition_Flag": ("Validity", "Conformance"),
    "Constant": ("Validity", "Conformance"),
    "Daily_Record_Ct": ("Completeness", "Reliability"),
    "Dec_Trunc": ("Validity", "Conformance"),
    "Distinct_Date_Ct": ("Timeliness", "Reliability"),
    "Distinct_Value_Ct": ("Validity", "Regularity"),
    "Distribution_Shift": ("Consistency", "Regularity"),
    "Dupe_Rows": ("Uniqueness", "Conformance"),
    "Email_Format": ("Validity", "Conformance"),
    "Freshness_Trend": ("Recency", "Reliability"),
    "Future_Date": ("Timeliness", "Conformance"),
    "Future_Date_1Y": ("Timeliness", "Conformance"),
    "Incr_Avg_Shift": ("Accuracy", "Regularity"),
    "LOV_All": ("Validity", "Conformance"),
    "LOV_Match": ("Validity", "Conformance"),
    "Metric_Trend": ("Validity", "Regularity"),
    "Min_Date": ("Validity", "Conformance"),
    "Min_Val": ("Validity", "Conformance"),
    "Missing_Pct": ("Completeness", "Regularity"),
    "Monthly_Rec_Ct": ("Completeness", "Reliability"),
    "Outlier_Pct_Above": ("Accuracy", "Regularity"),
    "Outlier_Pct_Below": ("Accuracy", "Regularity"),
    "Pattern_Match": ("Validity", "Conformance"),
    "Recency": ("Timeliness", "Reliability"),
    "Required": ("Completeness", "Conformance"),
    "Row_Ct": ("Completeness", "Reliability"),
    "Row_Ct_Pct": ("Completeness", "Reliability"),
    "Schema_Drift": (None, "Reliability"),
    "Street_Addr_Pattern": ("Validity", "Conformance"),
    "Table_Freshness": ("Recency", "Reliability"),
    "Timeframe_Combo_Gain": ("Consistency", "Reliability"),
    "Timeframe_Combo_Match": ("Consistency", "Reliability"),
    "US_State": ("Validity", "Conformance"),
    "Unique": ("Uniqueness", "Conformance"),
    "Unique_Pct": ("Uniqueness", "Conformance"),
    "Valid_Characters": ("Validity", "Usability"),
    "Valid_Month": ("Validity", "Conformance"),
    "Valid_US_Zip": ("Validity", "Conformance"),
    "Valid_US_Zip3": ("Validity", "Conformance"),
    "Variability_Decrease": ("Accuracy", "Regularity"),
    "Variability_Increase": ("Accuracy", "Regularity"),
    "Volume_Trend": ("Completeness", "Reliability"),
    "Weekly_Rec_Ct": ("Completeness", "Reliability"),
}

# Severity ordering for the issues list
# (`get_score_card_issues_by_column.sql:88-97`).
_SEVERITY_ORDER = {"Definite": 1, "Failed": 2, "Likely": 3,
                   "Possible": 4, "Warning": 5}


def _dim_lookup(spark: SparkSession, mapping: dict[str, tuple[str | None, str]],
                key_col: str) -> DataFrame:
    rows = [(k, v[0], v[1]) for k, v in mapping.items()]
    return spark.createDataFrame(
        rows, f"{key_col} string, dq_dimension string, impact_dimension string")


def _weight(df: DataFrame, use_weights: bool):
    if use_weights and "weight" in df.columns:
        return F.coalesce(F.col("weight"), F.lit(1.0))
    return F.lit(1.0)


def profile_scoring_by_column(profile: DataFrame, anomalies: DataFrame,
                              use_weights: bool = False) -> DataFrame:
    """v_dq_profile_scoring_latest_by_column (060_...sql:109-146): one row
    per profiled column with issue_ct / record_ct / weighted_record_ct /
    good_data_pct = SUM_LN over its confirmed anomaly prevalences
    (`rollup_scores_profile_table_group.sql` per-column pass)."""
    cols = (profile.groupBy("table_name", "column_name")
            .agg(F.max("record_ct").alias("record_ct"),
                 F.max(F.col("record_ct") * _weight(profile, use_weights))
                 .alias("weighted_record_ct")))
    anoms = anomalies.select("table_name", "column_name",
                             "anomaly_type", "dq_prevalence")
    return (
        cols.join(anoms, ["table_name", "column_name"], "left")
        .groupBy("table_name", "column_name")
        .agg(
            F.max("record_ct").alias("record_ct"),
            F.max("weighted_record_ct").alias("weighted_record_ct"),
            F.count("anomaly_type").alias("issue_ct"),
            sum_ln(F.coalesce(F.col("dq_prevalence"), F.lit(0.0)))
            .alias("good_data_pct"),
        )
    )


def profile_scoring_by_dimension(profile: DataFrame, anomalies: DataFrame,
                                 use_weights: bool = False,
                                 dimension_col: str = "dq_dimension") -> DataFrame:
    """v_dq_profile_scoring_latest_by_dimension (060_...sql:149-215): one row
    per (column, dimension); columns with no anomalies keep a NULL-dimension
    row so their data points still weigh into the parent totals."""
    spark = profile.sparkSession
    dims = _dim_lookup(spark, ANOMALY_DIMENSIONS, "anomaly_type")
    anoms = (anomalies.select("table_name", "column_name", "anomaly_type",
                              "dq_prevalence")
             .join(F.broadcast(dims), "anomaly_type", "left"))
    cols = (profile.groupBy("table_name", "column_name")
            .agg(F.max("record_ct").alias("record_ct"),
                 F.max(F.col("record_ct") * _weight(profile, use_weights))
                 .alias("weighted_record_ct")))
    return (
        cols.join(anoms, ["table_name", "column_name"], "left")
        .groupBy("table_name", "column_name", dimension_col)
        .agg(
            F.max("record_ct").alias("record_ct"),
            F.max("weighted_record_ct").alias("weighted_record_ct"),
            F.count("anomaly_type").alias("issue_ct"),
            sum_ln(F.coalesce(F.col("dq_prevalence"), F.lit(0.0)))
            .alias("good_data_pct"),
        )
    )


def test_scoring_by_column(results: DataFrame,
                           use_weights: bool = False) -> DataFrame:
    """v_dq_test_scoring_latest_by_column (060_...sql:222-276): per
    (table, column) over latest test results carrying dq_prevalence /
    dq_record_ct."""
    return (
        results.groupBy("table_name", "column_name")
        .agg(
            F.count(F.lit(1)).alias("test_ct"),
            F.sum(F.when(F.col("result_code") == 1, 1).otherwise(0))
            .alias("passed_ct"),
            F.sum(F.when(F.col("result_code") == 0, 1).otherwise(0))
            .alias("issue_ct"),
            F.max("dq_record_ct").alias("dq_record_ct"),
            F.max(F.col("dq_record_ct") * _weight(results, use_weights))
            .alias("weighted_dq_record_ct"),
            sum_ln(F.coalesce(F.col("dq_prevalence"), F.lit(0.0)))
            .alias("good_data_pct"),
        )
    )


def test_scoring_by_dimension(results: DataFrame,
                              use_weights: bool = False,
                              dimension_col: str = "dq_dimension") -> DataFrame:
    """v_dq_test_scoring_latest_by_dimension (060_...sql:278-360)."""
    spark = results.sparkSession
    dims = _dim_lookup(spark, TEST_DIMENSIONS, "test_type")
    with_dim = results.join(F.broadcast(dims), "test_type", "left")
    return (
        with_dim.groupBy("table_name", "column_name", dimension_col)
        .agg(
            F.count(F.lit(1)).alias("test_ct"),
            F.sum(F.when(F.col("result_code") == 1, 1).otherwise(0))
            .alias("passed_ct"),
            F.sum(F.when(F.col("result_code") == 0, 1).otherwise(0))
            .alias("issue_ct"),
            F.max("dq_record_ct").alias("dq_record_ct"),
            F.max(F.col("dq_record_ct") * _weight(results, use_weights))
            .alias("weighted_dq_record_ct"),
            sum_ln(F.coalesce(F.col("dq_prevalence"), F.lit(0.0)))
            .alias("good_data_pct"),
        )
    )


def score_card_breakdown(profile_scoring: DataFrame | None,
                         test_scoring: DataFrame | None,
                         group_cols: tuple[str, ...] = ("table_name",
                                                        "column_name"),
                         limit: int | None = 100,
                         profile_parent: DataFrame | None = None,
                         test_parent: DataFrame | None = None) -> DataFrame:
    """get_score_card_breakdown_by_column.sql:1-58 (same template backs the
    `_by_dimension` / `_by_impact_dimension` variants — pass the scoring
    views grouped on the matching ``group_cols``):

    - each side is grouped to (issue_ct, data_point_ct, score);
    - ``impact`` normalizes each side's bad data points by that side's OWN
      total (parent CTE), so profiling and testing each contribute a
      0–100 share;
    - ``score`` is the product of the two sides' scores (absent side → 1).

    The reference's parent CTE always totals the BY-COLUMN views — even in
    the by-dimension variants (`get_score_card_breakdown_by_dimension.sql:
    24-38`), because a column with anomalies in two dimensions appears twice
    in the by-dimension view and would double-count the normalizer. Pass
    ``profile_parent``/``test_parent`` (the by-column views) when grouping a
    by-dimension view; they default to the scoring views themselves.
    """
    assert profile_scoring is not None or test_scoring is not None
    gc = list(group_cols)

    def _side(df: DataFrame, weight_col: str) -> DataFrame:
        return df.groupBy(*gc).agg(
            F.sum("issue_ct").alias("issue_ct"),
            F.sum(weight_col).alias("data_point_ct"),
            (F.sum(F.col(weight_col) * F.col("good_data_pct"))
             / F.nullif(F.sum(weight_col), F.lit(0.0))).alias("score"),
        )

    spark = (profile_scoring or test_scoring).sparkSession
    if profile_scoring is not None:
        prof = _side(profile_scoring, "weighted_record_ct")
        prof_total = (profile_parent or profile_scoring).agg(
            F.sum("weighted_record_ct").alias("profiling_data_points"))
    else:
        prof = None
        prof_total = spark.range(1).select(
            F.lit(None).cast("double").alias("profiling_data_points"))
    if test_scoring is not None:
        test = _side(test_scoring, "weighted_dq_record_ct")
        test_total = (test_parent or test_scoring).agg(
            F.sum("weighted_dq_record_ct").alias("test_data_points"))
    else:
        test = None
        test_total = spark.range(1).select(
            F.lit(None).cast("double").alias("test_data_points"))

    if prof is not None and test is not None:
        # Null-safe key equality: a NULL dimension group must merge across
        # sides (the SQL template joins with plain = on non-null column keys,
        # but dimension keys can be NULL for unmapped/no-issue rows).
        cond = None
        for c in gc:
            eq = F.col(f"p.{c}").eqNullSafe(F.col(f"t.{c}"))
            cond = eq if cond is None else cond & eq
        both = (prof.alias("p").join(test.alias("t"), cond, "full_outer")
                .select(*[F.coalesce(F.col(f"p.{c}"), F.col(f"t.{c}")).alias(c)
                          for c in gc],
                        F.col("p.issue_ct").alias("p_issue_ct"),
                        F.col("p.data_point_ct").alias("p_dp"),
                        F.col("p.score").alias("p_score"),
                        F.col("t.issue_ct").alias("t_issue_ct"),
                        F.col("t.data_point_ct").alias("t_dp"),
                        F.col("t.score").alias("t_score")))
    elif prof is not None:
        both = prof.select(*gc,
                           F.col("issue_ct").alias("p_issue_ct"),
                           F.col("data_point_ct").alias("p_dp"),
                           F.col("score").alias("p_score"),
                           F.lit(None).cast("long").alias("t_issue_ct"),
                           F.lit(None).cast("double").alias("t_dp"),
                           F.lit(None).cast("double").alias("t_score"))
    else:
        both = test.select(*gc,
                           F.lit(None).cast("long").alias("p_issue_ct"),
                           F.lit(None).cast("double").alias("p_dp"),
                           F.lit(None).cast("double").alias("p_score"),
                           F.col("issue_ct").alias("t_issue_ct"),
                           F.col("data_point_ct").alias("t_dp"),
                           F.col("score").alias("t_score"))

    parent = F.broadcast(prof_total.crossJoin(test_total))
    out = both.crossJoin(parent).select(
        *gc,
        (100 * (
            F.coalesce(F.col("p_dp") * (1 - F.col("p_score"))
                       / F.nullif(F.col("profiling_data_points"), F.lit(0.0)),
                       F.lit(0.0))
            + F.coalesce(F.col("t_dp") * (1 - F.col("t_score"))
                         / F.nullif(F.col("test_data_points"), F.lit(0.0)),
                         F.lit(0.0))
        )).alias("impact"),
        (F.coalesce(F.col("p_score"), F.lit(1.0))
         * F.coalesce(F.col("t_score"), F.lit(1.0))).alias("score"),
        (F.coalesce(F.col("p_issue_ct"), F.lit(0))
         + F.coalesce(F.col("t_issue_ct"), F.lit(0))).alias("issue_ct"),
    ).orderBy(F.col("impact").desc(), *gc)
    return out.limit(limit) if limit else out


def score_card_issues(anomalies: DataFrame | None = None,
                      results: DataFrame | None = None) -> DataFrame:
    """get_score_card_issues_by_column.sql:1-100: hygiene anomalies UNION
    Failed/Warning test results, ordered by severity class then table then
    column. ``issue_type`` distinguishes the sides ('hygiene' / 'test')."""
    parts = []
    if anomalies is not None:
        parts.append(anomalies.select(
            "table_name",
            "column_name",
            F.col("anomaly_type").alias("type"),
            F.col("likelihood").alias("status"),
            F.col("detail").alias("detail"),
            F.lit("hygiene").alias("issue_type"),
        ))
    if results is not None:
        parts.append(results.filter(
            F.col("result_status").isin("Failed", "Warning")
        ).select(
            "table_name",
            F.col("column_name"),
            F.col("test_type").alias("type"),
            F.col("result_status").alias("status"),
            F.col("result_message").alias("detail"),
            F.lit("test").alias("issue_type"),
        ))
    assert parts, "need anomalies and/or results"
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    sev = F.coalesce(
        *[F.when(F.col("status") == k, F.lit(v))
          for k, v in _SEVERITY_ORDER.items()],
        F.lit(6),
    )
    return (out.withColumn("severity_order", sev)
            .orderBy("severity_order", F.lower("table_name"),
                     F.lower("column_name")))


def table_group_test_score(run_stats: DataFrame) -> DataFrame:
    """rollup_scores_test_table_group.sql:1-23: latest complete run per test
    suite → table-group score 1 − Σaffected/Σtotal. ``run_stats`` rows:
    (table_group, test_suite, run_time, status, dq_affected_data_points,
    dq_total_data_points)."""
    latest = (run_stats.filter(F.col("status") == "Complete")
              .groupBy("table_group", "test_suite")
              .agg(F.max("run_time").alias("run_time")))
    rows = run_stats.join(latest, ["table_group", "test_suite", "run_time"])
    return (rows.groupBy("table_group")
            .agg(F.sum("dq_affected_data_points").alias("affected"),
                 F.sum("dq_total_data_points").alias("total"))
            .select("table_group",
                    (1.0 - F.col("affected")
                     / F.nullif(F.col("total").cast("double"), F.lit(0.0)))
                    .alias("dq_score_testing")))


def category_scores(profile_scoring: DataFrame | None,
                    test_scoring: DataFrame | None,
                    category_col: str) -> DataFrame:
    """get_category_scores_by_column.sql:1-22 (the `_by_dimension` twin just
    feeds the dimension views): per non-null category, the weighted average
    good_data_pct of each side, combined multiplicatively. Returns
    (label, score)."""
    def _side(df: DataFrame, weight_col: str) -> DataFrame:
        return (df.filter(F.nullif(F.col(category_col), F.lit("")).isNotNull())
                .groupBy(F.col(category_col).alias("label"))
                .agg((F.sum(F.coalesce(F.col("good_data_pct")
                                       * F.col(weight_col), F.lit(0.0)))
                      / F.nullif(F.sum(F.coalesce(F.col(weight_col),
                                                  F.lit(0.0))), F.lit(0.0)))
                     .alias("score")))

    prof = (_side(profile_scoring, "weighted_record_ct")
            if profile_scoring is not None else None)
    test = (_side(test_scoring, "weighted_dq_record_ct")
            if test_scoring is not None else None)
    if prof is not None and test is not None:
        return (prof.alias("p").join(test.alias("t"),
                                     F.col("p.label") == F.col("t.label"),
                                     "full_outer")
                .select(F.coalesce(F.col("p.label"), F.col("t.label")).alias("label"),
                        (F.coalesce(F.col("p.score"), F.lit(1.0))
                         * F.coalesce(F.col("t.score"), F.lit(1.0))).alias("score")))
    return prof if prof is not None else test


def overall_scores_by_run(profile_history: DataFrame | None,
                          test_history: DataFrame | None) -> DataFrame:
    """get_historical_overall_scores_by_column.sql:1-52: per run_time, the
    weighted overall score and the CDE-restricted score, profiling × testing.
    History rows carry (run_time, good_data_pct, weighted_record_ct /
    weighted_dq_record_ct, critical_data_element)."""
    def _side(df: DataFrame, weight_col: str) -> DataFrame:
        w = F.col(weight_col)
        cde = F.col("critical_data_element") == True  # noqa: E712
        return df.groupBy("run_time").agg(
            (F.sum(F.col("good_data_pct") * w)
             / F.nullif(F.sum(w), F.lit(0.0))).alias("score"),
            (F.sum(F.when(cde, F.col("good_data_pct") * w).otherwise(0.0))
             / F.nullif(F.sum(F.when(cde, w).otherwise(0.0)), F.lit(0.0)))
            .alias("cde_score"),
        )

    prof = (_side(profile_history, "weighted_record_ct")
            if profile_history is not None else None)
    test = (_side(test_history, "weighted_dq_record_ct")
            if test_history is not None else None)
    if prof is not None and test is not None:
        both = prof.alias("p").join(
            test.alias("t"), F.col("p.run_time") == F.col("t.run_time"),
            "full_outer")
        return both.select(
            F.coalesce(F.col("p.run_time"), F.col("t.run_time")).alias("run_time"),
            (F.coalesce(F.col("p.score"), F.lit(1.0))
             * F.coalesce(F.col("t.score"), F.lit(1.0))).alias("score"),
            (F.coalesce(F.col("p.cde_score"), F.lit(1.0))
             * F.coalesce(F.col("t.cde_score"), F.lit(1.0))).alias("cde_score"),
        )
    side = prof if prof is not None else test
    return side.select("run_time", "score",
                       F.coalesce(F.col("cde_score"), F.lit(1.0)).alias("cde_score"))
