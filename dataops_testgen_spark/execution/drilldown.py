"""Source-data drill-down lookups + PII masking.

Reference shape:

- ``common/source_data_service.py:1-379``: per-test-type "offending rows"
  lookup queries (the ``target_data_lookups`` entries in each
  ``dbsetup_test_types/test_types_<type>.yaml`` /
  ``dbsetup_anomaly_types/profile_anomaly_types_<key>.yaml``), LIMIT 500,
  optional PII redaction before display.
- ``common/pii_masking.py:1-104``: ``[PII Redacted]`` substitution for
  PII-flagged columns in source rows, profiling fields, and redactable
  hygiene detail.

Spark-first shape: each lookup is a declarative DataFrame pipeline (filter →
groupBy → limit) so predicate pushdown and partial aggregation reach the
parquet scan; LIMIT keeps the driver-side result bounded no matter the table
size. The spark-SQL lookup bodies mirror the reference's ``databricks``
flavor (closest dialect).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataops_testgen_spark.profiling.regexes import EMAIL_RE

PII_REDACTED = "[PII Redacted]"
DEFAULT_LIMIT = 500

# profiling fields redacted for PII columns (pii_masking.py:9-14)
PROFILING_PII_FIELDS = (
    "top_freq_values", "min_text", "max_text",
    "min_value", "min_value_over_0", "max_value",
    "min_date", "max_date",
)

# anomaly types whose detail embeds sample values (detail_redactable: true
# in their dbsetup_anomaly_types YAMLs)
DETAIL_REDACTABLE_TYPES = frozenset({
    "Boolean_Value_Mismatch", "Delimited_Data_Embedded",
    "Non_Alpha_Prefixed_Name", "Recency_One_Year", "Recency_Six_Months",
    "Unexpected_Emails", "Unexpected_US_States", "Unlikely_Date_Values",
})


@dataclass
class LookupResult:
    """source_data_service.SourceDataResult: OK / NA (no lookup for type) /
    ND (no rows) / ERR."""
    status: str                  # OK | NA | ND | ERR
    message: str | None
    df: DataFrame | None
    pii_redacted: bool = False


# ---------------------------------------------------------------------------
# PII masking (pii_masking.py:1-104)
# ---------------------------------------------------------------------------

def get_pii_columns(inferred_profile: DataFrame,
                    table_name: str | None = None) -> set[str]:
    """Column names with a non-null pii_flag (get_pii_columns, :17-36)."""
    df = inferred_profile.filter(F.col("pii_flag").isNotNull())
    if table_name:
        df = df.filter(F.col("table_name") == table_name)
    return {r["column_name"] for r in df.select("column_name").distinct().collect()}


def mask_source_data_pii(df: DataFrame, pii_columns: set[str]) -> tuple[DataFrame, bool]:
    """Replace every PII column's values with the redaction marker
    (mask_source_data_pii, :38-52); matching is case-insensitive."""
    lower = {c.lower() for c in pii_columns}
    masked = False
    out = df
    for c in df.columns:
        if c.lower() in lower:
            out = out.withColumn(c, F.lit(PII_REDACTED))
            masked = True
    return out, masked


def mask_profiling_pii(profile: DataFrame, pii_columns: set[str]) -> DataFrame:
    """Mask PROFILING_PII_FIELDS on PII columns' profile rows
    (mask_profiling_pii, :85-104). Masked fields become strings (the
    reference coerces to object dtype for the same reason)."""
    if not pii_columns:
        return profile
    lower = sorted({c.lower() for c in pii_columns})
    is_pii = F.lower(F.col("column_name")).isin(lower)
    out = profile
    for field in PROFILING_PII_FIELDS:
        if field in profile.columns:
            out = out.withColumn(
                field,
                F.when(is_pii, F.lit(PII_REDACTED))
                .otherwise(F.col(field).cast("string")))
    return out


def mask_hygiene_detail(anomalies: DataFrame,
                        pii_columns: set[str]) -> DataFrame:
    """Redact anomaly ``detail`` where the type is detail-redactable AND the
    column is PII-flagged (mask_hygiene_detail, :55-82)."""
    lower = sorted({c.lower() for c in pii_columns})
    redact = (F.col("anomaly_type").isin(sorted(DETAIL_REDACTABLE_TYPES))
              & F.lower(F.col("column_name")).isin(lower))
    return anomalies.withColumn(
        "detail", F.when(redact, F.lit(PII_REDACTED)).otherwise(F.col("detail")))


# ---------------------------------------------------------------------------
# Per-test-type lookups (target_data_lookups, databricks flavor)
# ---------------------------------------------------------------------------

def _col(column: str) -> Column:
    return F.col(column)


def _value_counts(df: DataFrame, cond: Column, column: str,
                  limit: int) -> DataFrame:
    """SELECT DISTINCT col, COUNT(*) FROM t WHERE cond GROUP BY col —
    the dominant lookup shape."""
    return (df.filter(cond)
            .groupBy(F.col(column))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.col(column))
            .limit(limit))


def _lk_unique(df, column, params, limit, run_date):
    # SELECT DISTINCT col, COUNT(*) ... GROUP BY col HAVING count > 1
    return (df.groupBy(F.col(column))
            .agg(F.count(F.lit(1)).alias("count"))
            .filter(F.col("count") > 1)
            .orderBy(F.col("count").desc(), F.col(column))
            .limit(limit))


def _lk_min_val(df, column, params, limit, run_date):
    baseline = float(params["baseline_value"])
    return (df.filter(_col(column) < baseline)
            .select(_col(column),
                    (F.abs(_col(column)) - abs(baseline))
                    .alias("difference_from_baseline"))
            .distinct().orderBy(_col(column)).limit(limit))


def _lk_constant(df, column, params, limit, run_date):
    return _value_counts(df, _col(column) != F.lit(params["baseline_value"]),
                         column, limit)


def _lk_lov_match(df, column, params, limit, run_date):
    baseline = params["baseline_value"]
    values = baseline if isinstance(baseline, (list, tuple)) else [
        v.strip().strip("'") for v in str(baseline).strip("()").split(",")]
    nn = F.nullif(_col(column), F.lit(""))
    return (df.withColumn(column, nn)
            .filter(~nn.isin(list(values)))
            .groupBy(F.col(column))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.col(column)).limit(limit))


def _lk_future_date(df, column, params, limit, run_date):
    return _value_counts(
        df, _col(column).cast("date") > F.lit(run_date).cast("date"),
        column, limit)


def _lk_email_format(df, column, params, limit, run_date):
    return _value_counts(
        df, ~_col(column).cast("string").rlike(EMAIL_RE), column, limit)


def _lk_pattern_match(df, column, params, limit, run_date):
    pat = params["baseline_value"]
    return _value_counts(
        df, ~F.nullif(_col(column).cast("string"), F.lit("")).rlike(pat),
        column, limit)


def _lk_missing(df, column, params, limit, run_date):
    # SELECT * WHERE col IS NULL OR '' LIMIT
    return df.filter(_col(column).isNull()
                     | (_col(column).cast("string") == "")).limit(limit)


def _lk_dupe_rows(df, column, params, limit, run_date):
    names = [c.strip() for c in params["groupby_names"].split(",")]
    return (df.groupBy(*[F.col(c) for c in names])
            .agg(F.count(F.lit(1)).alias("record_ct"))
            .filter(F.col("record_ct") > 1)
            .orderBy(F.col("record_ct").desc(), *names)
            .limit(limit))


def _lk_leading_spaces(df, column, params, limit, run_date):
    # profile_anomaly_types_Leading_Spaces.yaml databricks lookup:
    # WHERE col BETWEEN ' !' AND '!'
    return _value_counts(df, _col(column).between(" !", "!"), column, limit)


def _lk_quoted_values(df, column, params, limit, run_date):
    c = F.lower(_col(column).cast("string"))
    return _value_counts(df, c.like('"%"') | c.like("'%'"), column, limit)


def _lk_avg_shift(df, column, params, limit, run_date):
    # test_types_Avg_Shift.yaml: SELECT AVG(col::FLOAT) AS current_average
    return df.agg(F.avg(_col(column).cast("double")).alias("current_average"))


def _lk_incr_avg_shift(df, column, params, limit, run_date):
    # test_types_Incr_Avg_Shift.yaml: current average / sum / value count
    d = _col(column).cast("double")
    return df.agg(
        F.avg(d).alias("current_average"),
        F.sum(d).alias("current_sum"),
        F.nullif(F.count(d).cast("double"), F.lit(0.0))
        .alias("current_value_count"))


def _lk_outlier(df, column, params, limit, run_date, above: bool):
    # test_types_Outlier_Pct_Above/Below.yaml: rows beyond avg ± 2·sd with
    # the computed bound echoed as outlier_threshold
    b_avg = float(params["baseline_avg"])
    b_sd = float(params["baseline_sd"])
    bound = b_avg + 2.0 * b_sd if above else b_avg - 2.0 * b_sd
    d = _col(column).cast("double")
    cond = d > bound if above else d < bound
    return (df.filter(cond)
            .groupBy(F.col(column))
            .agg(F.count(F.lit(1)).alias("count"))
            .select(F.lit(bound).alias("outlier_threshold"),
                    F.col(column), F.col("count"))
            .orderBy(F.col(column).desc())
            .limit(limit))


def _lk_outlier_above(df, column, params, limit, run_date):
    return _lk_outlier(df, column, params, limit, run_date, above=True)


def _lk_outlier_below(df, column, params, limit, run_date):
    return _lk_outlier(df, column, params, limit, run_date, above=False)


def _lk_missing_periods(df, column, limit, unit: str):
    """Missing calendar periods with the nearest populated neighbours
    (test_types_Daily/Weekly/Monthly_Rec_Ct.yaml lookups).

    The reference triple-joins existing periods on range predicates; here the
    missing periods are interleaved with the populated ones and the
    neighbours come from two running-last/first window passes — period
    cardinality is calendar-bounded (days/weeks/months in the data's range),
    so the single-partition ordered window is a few thousand rows at most,
    regardless of table size: the heavy groupBy underneath is distributed.
    """
    from pyspark.sql import Window

    dt = F.to_date(_col(column))
    period = dt if unit == "day" else F.to_date(F.date_trunc(unit, dt))
    step = {"day": "interval 1 day", "week": "interval 1 week",
            "month": "interval 1 month"}[unit]
    name = {"day": "date", "week": "week", "month": "month"}[unit]
    existing = (df.groupBy(period.alias("period"))
                .agg(F.count(F.lit(1)).alias("period_count"))
                .filter(F.col("period").isNotNull()))
    bounds = existing.agg(F.min("period").alias("lo"), F.max("period").alias("hi"))
    all_periods = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.expr(step)))
        .alias("period"))
    merged = (all_periods.join(existing, "period", "left")
              .withColumn("is_missing", F.col("period_count").isNull()))
    w_prior = Window.orderBy("period").rowsBetween(Window.unboundedPreceding, -1)
    w_next = Window.orderBy("period").rowsBetween(1, Window.unboundedFollowing)
    present = F.when(~F.col("is_missing"), F.col("period"))
    present_ct = F.when(~F.col("is_missing"), F.col("period_count"))
    return (merged
            .withColumn(f"prior_available_{name}",
                        F.last(present, ignorenulls=True).over(w_prior))
            .withColumn(f"prior_available_{name}_count",
                        F.last(present_ct, ignorenulls=True).over(w_prior))
            .withColumn(f"next_available_{name}",
                        F.first(present, ignorenulls=True).over(w_next))
            .withColumn(f"next_available_{name}_count",
                        F.first(present_ct, ignorenulls=True).over(w_next))
            .filter(F.col("is_missing"))
            .select(F.col("period").alias("missing_period"),
                    f"prior_available_{name}", f"prior_available_{name}_count",
                    f"next_available_{name}", f"next_available_{name}_count")
            .orderBy("missing_period")
            .limit(limit))


def _lk_daily_rec(df, column, params, limit, run_date):
    return _lk_missing_periods(df, column, limit, "day")


def _lk_weekly_rec(df, column, params, limit, run_date):
    return _lk_missing_periods(df, column, limit, "week")


def _lk_monthly_rec(df, column, params, limit, run_date):
    return _lk_missing_periods(df, column, limit, "month")


def _lk_valid_us_zip(df, column, params, limit, run_date):
    # test_types_Valid_US_Zip.yaml: TRANSLATE digits→9 then shape check
    z = F.translate(_col(column).cast("string"), "012345678", "999999999")
    return (df.filter(~z.isin(["99999", "999999999", "99999-9999"]))
            .groupBy(F.col(column))
            .agg(F.count(F.lit(1)).alias("record_ct"))
            .orderBy(F.col("record_ct").desc(), F.col(column))
            .limit(limit))


def _lk_valid_us_zip3(df, column, params, limit, run_date):
    z = F.translate(_col(column).cast("string"), "012345678", "999999999")
    return (df.filter(z != "999")
            .groupBy(F.col(column))
            .agg(F.count(F.lit(1)).alias("record_ct"))
            .orderBy(F.col("record_ct").desc(), F.col(column))
            .limit(limit))


_STREET_ADDR_RE = (r"^[0-9]{1,5}[a-zA-Z]?\s\w{1,5}\.?\s?\w*\s?\w*\s"
                   r"[a-zA-Z]{1,6}\.?\s?[0-9]{0,5}[A-Z]{0,1}$")


def _lk_street_addr(df, column, params, limit, run_date):
    # test_types_Street_Addr_Pattern.yaml: rows NOT matching the street shape
    return (df.filter(~_col(column).cast("string").rlike(_STREET_ADDR_RE))
            .groupBy(F.col(column))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.col("count").desc(), F.col(column))
            .limit(limit))


def _lk_alpha_trunc(df, column, params, limit, run_date):
    # test_types_Alpha_Trunc.yaml: values at the current max length when that
    # max has shrunk below the baseline threshold
    threshold = float(params["threshold_value"])
    ln = F.length(_col(column))
    mx = df.agg(F.max(ln).alias("max_length"))
    return (df.join(F.broadcast(mx))
            .filter((ln == F.col("max_length"))
                    & (F.col("max_length") < threshold))
            .select(F.col(column),
                    ln.alias("current_max_length"),
                    F.lit(threshold).alias("previous_max_length"))
            .distinct()
            .limit(limit))


def _lk_us_state(df, column, params, limit, run_date):
    from dataops_testgen_spark.execution.cat import US_STATES

    nn = F.nullif(_col(column), F.lit(""))
    return (df.filter(~nn.isin(US_STATES))
            .groupBy(F.col(column))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.col(column)).limit(limit))


def _lk_valid_characters(df, column, params, limit, run_date):
    # test_types_Valid_Characters.yaml: control chars / leading space /
    # fully-quoted values
    c = _col(column).cast("string")
    return (df.filter(c.rlike(r"[\x00-\x1f]") | c.startswith(" ")
                      | c.rlike("^'.*'$") | c.rlike('^".*"$'))
            .groupBy(F.col(column))
            .agg(F.count(F.lit(1)).alias("record_ct"))
            .orderBy(F.col("record_ct").desc(), F.col(column))
            .limit(limit))


def _lk_min_date(df, column, params, limit, run_date):
    baseline = str(params["baseline_value"])[:10]
    return _value_counts(
        df, _col(column).cast("date") < F.lit(baseline).cast("date"),
        column, limit)


def _lk_distinct_values(df, column, params, limit, run_date):
    # Distinct_Value_Ct / Distinct_Date_Ct / Unique_Pct share the
    # distinct-value frequency shape
    return (df.filter(_col(column).isNotNull())
            .groupBy(F.col(column))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.col(column).desc())
            .limit(limit))


def _lk_unique_pct(df, column, params, limit, run_date):
    return (df.groupBy(F.col(column))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.col("count").desc(), F.col(column))
            .limit(limit))


def _lk_recency(df, column, params, limit, run_date):
    # test_types_Recency.yaml: the max date, surfaced when out of tolerance
    threshold = float(params["threshold_value"])
    rd = F.lit(run_date).cast("date")
    return (df.agg(F.max(_col(column)).alias("latest_date_available"))
            .select(F.col("latest_date_available"), rd.alias("test_run_date"))
            .filter(F.abs(F.datediff(F.col("latest_date_available").cast("date"),
                                     rd)) > threshold)
            .limit(limit))


def _lk_row_ct(df, column, params, limit, run_date):
    threshold = float(params["threshold_value"])
    return (df.agg(F.count(F.lit(1)).alias("current_count"))
            .filter(F.col("current_count") < threshold)
            .select(F.col("current_count"),
                    F.abs(F.round(100.0 * (F.col("current_count") - threshold)
                                  / threshold, 2))
                    .alias("row_count_pct_decrease")))


def _lk_row_ct_pct(df, column, params, limit, run_date):
    baseline = float(params["baseline_ct"])
    return (df.agg(F.count(F.lit(1)).alias("current_count"))
            .select(F.col("current_count"),
                    F.lit(baseline).alias("baseline_count"),
                    F.abs(F.round(100.0 * (F.col("current_count") - baseline)
                                  / baseline, 2))
                    .alias("row_count_pct_difference")))


def _lk_lov_all(df, column, params, limit, run_date):
    threshold = str(params["threshold_value"])
    lov = F.array_join(F.array_sort(F.collect_set(_col(column))), "|")
    return (df.agg(lov.alias("lov"))
            .filter(F.col("lov") != threshold)
            .limit(limit))


def _lk_dec_trunc(df, column, params, limit, run_date):
    # test_types_Dec_Trunc.yaml: frequency of decimal scales present
    scale = F.length(F.split_part(_col(column).cast("string"), F.lit("."),
                                  F.lit(2)))
    return (df.groupBy(scale.alias("decimal_scale"))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy("decimal_scale")
            .limit(limit))


def _lk_variability(df, column, params, limit, run_date):
    return df.agg(F.stddev_samp(_col(column).cast("double"))
                  .alias("current_standard_deviation"))


def _lk_future_date_1y(df, column, params, limit, run_date):
    rd = F.lit(run_date).cast("date")
    return _value_counts(
        df, _col(column).cast("date") > F.date_add(rd, 365), column, limit)


def _lk_condition_flag(df, column, params, limit, run_date):
    return df.filter(F.expr(params["custom_query"])).limit(limit)


def _lk_valid_month(df, column, params, limit, run_date):
    return _lk_lov_match(df, column, params, limit, run_date)


# ---------------------------------------------------------------------------
# Cross-table / query-test lookups.  These route the uniform drill-down
# interface to the query-test detail pipelines (execution/query_tests.py):
# the reference's target_data_lookups for these types re-run the comparison
# and return the offending groups/rows (e.g.
# test_types_Aggregate_Balance.yaml `target_data_lookups`: union-all +
# regroup + total<>match_total filter).  The second table arrives via
# ``params["match_df"]`` — the Spark-first stand-in for
# {MATCH_SCHEMA_NAME}.{MATCH_TABLE_NAME}.
# ---------------------------------------------------------------------------

def _csv(params, key, default=None):
    v = params.get(key, default)
    if v is None:
        return None
    return [c.strip() for c in v.split(",")] if isinstance(v, str) else list(v)


def _lk_aggregate_balance(mode):
    def build(df, column, params, limit, run_date):
        from dataops_testgen_spark.execution.query_tests import aggregate_balance

        groupby = _csv(params, "groupby_names")
        out = aggregate_balance(
            df, groupby, F.expr(column or params["column_name"]),
            params["match_df"],
            _csv(params, "match_groupby_names") or groupby,
            F.expr(params.get("match_column_names")
                   or column or params["column_name"]),
            mode=mode,
            lower_tolerance=params.get("lower_tolerance"),
            upper_tolerance=params.get("upper_tolerance"),
            subset_condition=params.get("subset_condition"),
            match_subset_condition=params.get("match_subset_condition"),
            having_condition=params.get("having_condition"),
            match_having_condition=params.get("match_having_condition"),
        )
        return out.orderBy(*groupby).limit(limit)
    return build


def _lk_combo_match(df, column, params, limit, run_date):
    from dataops_testgen_spark.execution.query_tests import combo_match

    keys = _csv(params, "groupby_names")
    out = combo_match(
        df, keys, params["match_df"],
        match_keys=_csv(params, "match_groupby_names") or keys,
        subset_condition=params.get("subset_condition"),
        match_subset_condition=params.get("match_subset_condition"))
    return out.orderBy(*keys).limit(limit)


def _lk_timeframe_combo(gain):
    def build(df, column, params, limit, run_date):
        from dataops_testgen_spark.execution import query_tests as QT

        keys = _csv(params, "groupby_names")
        fn = QT.timeframe_combo_gain if gain else QT.timeframe_combo_match
        out = fn(df, keys, params["window_date_column"],
                 int(params["window_days"]),
                 subset_condition=params.get("subset_condition"))
        return out.orderBy(*keys).limit(limit)
    return build


def _lk_distribution_shift(df, column, params, limit, run_date):
    """Per-category share comparison — the reference lookup's latest_ver /
    older_ver CTE full-join (test_types_Distribution_Shift.yaml), not the
    JS-divergence scalar (which is the test's own output)."""
    from pyspark.sql import Window

    from dataops_testgen_spark.execution.query_tests import _subset

    cols = _csv(params, "groupby_names") or [column]
    match_cols = _csv(params, "match_groupby_names") or cols

    def shares(d, cc, sub):
        cat = F.concat_ws("|", *[F.col(c).cast("string") for c in cc])
        g = _subset(d, sub).groupBy(cat.alias("category")).agg(
            F.count(F.lit(1)).alias("ct"))
        total = F.sum("ct").over(Window.partitionBy())
        return g.select("category",
                        F.round(F.col("ct") / total, 6).alias("pct"))

    new = shares(df, cols, params.get("subset_condition"))
    old = shares(params["match_df"], match_cols,
                 params.get("match_subset_condition"))
    return (new.alias("n")
            .join(old.alias("o"), F.col("n.category") == F.col("o.category"),
                  "full_outer")
            .select(F.coalesce(F.col("n.category"),
                               F.col("o.category")).alias("category"),
                    F.col("n.pct").alias("latest_pct_of_total"),
                    F.col("o.pct").alias("older_pct_of_total"))
            .orderBy("category").limit(limit))


def _lk_metric_trend(df, column, params, limit, run_date):
    """Volume_Trend / Metric_Trend: current metric value against the
    predicted [lower, upper] tolerance band (the reference lookup's
    `{CUSTOM_QUERY} AS current_count, {LOWER,UPPER}_TOLERANCE` row)."""
    from dataops_testgen_spark.execution.query_tests import _subset

    base = _subset(df, params.get("subset_condition"))
    out = base.agg(F.expr(params["custom_query"]).alias("current_count"))
    lo, hi = params.get("lower_tolerance"), params.get("upper_tolerance")
    return out.select(
        "current_count",
        F.lit(float(lo) if lo is not None else None).alias("lower_bound"),
        F.lit(float(hi) if hi is not None else None).alias("upper_bound"))


def _lk_table_freshness(df, column, params, limit, run_date):
    """Table_Freshness / Freshness_Trend detail: the current fingerprint
    beside the baseline (no reference lookup exists — detail IS the
    fingerprint comparison the test runs)."""
    from dataops_testgen_spark.execution.query_tests import _subset

    base = _subset(df, params.get("subset_condition"))
    fp = F.md5(F.concat_ws("|", *[
        F.expr(e).cast("string")
        for e in (params.get("fingerprint_exprs") or [params["custom_query"]])
    ]))
    baseline = params.get("baseline_value")
    return base.agg(fp.alias("current_fingerprint")).select(
        "current_fingerprint",
        F.lit(baseline).alias("baseline_fingerprint"),
        (F.col("current_fingerprint") != F.lit(baseline)).alias("changed")
        if baseline is not None else F.lit(None).cast("boolean").alias("changed"))


def _lk_schema_drift(df, column, params, limit, run_date):
    """Schema_Drift detail: the structure-log rows since the last run
    (params["structure_log_df"] + params["since"]) — the changes themselves
    are the offending 'rows'."""
    log = params["structure_log_df"]
    since = params.get("since")
    if since:
        log = log.filter(F.col("change_date") >= F.lit(since))
    return log.orderBy("table_name", "column_name").limit(limit)


def _lk_custom(df, column, params, limit, run_date):
    """CUSTOM test drill-down: the custom query itself is the lookup.
    Accepts a full SQL string (run against a temp view of ``df`` named
    ``target``) or a bare boolean condition."""
    sql = params.get("custom_query", "")
    if sql.strip().lower().startswith("select"):
        df.createOrReplaceTempView("target")
        return df.sparkSession.sql(sql).limit(limit)
    return df.filter(F.expr(sql)).limit(limit)


def _lk_benford(df, column, params, limit, run_date):
    # drill-down for the Benford_Nonconformity screening rule: the
    # per-digit observed vs expected census behind the chi-square (the
    # standalone anomalies/benford.py screen on the flagged column)
    from dataops_testgen_spark.anomalies.benford import benford_screen

    return benford_screen(df, column).orderBy("digit").limit(limit)


def _lk_correlated(df, column, params, limit, run_date):
    """Correlated_Columns drill-down (41st lookup type): the flagged
    column's rows that DEVIATE most from the fitted linear relation with
    its partner (params["col_a"]) — for a truly derived column those are
    the exceptions worth eyeballing (manual overrides, unit mix-ups).
    Two passes: one fused agg for the OLS moments (covar/var/avg —
    algebraic, map-side combined), then a residual ranking bounded by
    ``limit`` with a deterministic tie-break."""
    a = params["col_a"]
    ad, bd = F.col(a).cast("double"), F.col(column).cast("double")
    both = df.filter(F.col(a).isNotNull() & F.col(column).isNotNull())
    mom = both.agg(F.covar_samp(ad, bd).alias("cov"),
                   F.var_samp(ad).alias("var"),
                   F.avg(ad).alias("ma"), F.avg(bd).alias("mb")).first()
    if mom is None or mom["mb"] is None:
        return both.select(F.col(a), F.col(column),
                           F.lit(None).cast("double").alias("residual"))
    slope = (mom["cov"] / mom["var"]) if mom["var"] else 0.0
    intercept = mom["mb"] - slope * mom["ma"]
    resid = bd - (F.lit(float(slope)) * ad + F.lit(float(intercept)))
    return (both.select(F.col(a), F.col(column), resid.alias("residual"))
            .orderBy(F.abs("residual").desc(), F.col(a), F.col(column))
            .limit(limit))


def _lk_dependent(df, column, params, limit, run_date):
    """Dependent_Column drill-down (42nd lookup type): the rows whose
    ``column`` value deviates most from its group's mean under the
    determining category (params["cat_col"]) — for a rate-table-encoded
    measure those are the overrides/misjoins worth eyeballing. One
    groupBy to the (distinct-bounded) group means, one broadcast join
    back, ranking bounded by ``limit`` with a deterministic tie-break."""
    cat = params["cat_col"]
    x = F.col(column).cast("double")
    both = df.filter(F.col(cat).isNotNull() & F.col(column).isNotNull())
    means = both.groupBy(cat).agg(F.avg(x).alias("__grp_mean"))
    resid = x - F.col("__grp_mean")
    return (both.join(F.broadcast(means), cat)
            .select(F.col(cat), F.col(column), resid.alias("residual"))
            .orderBy(F.abs("residual").desc(), F.col(cat), F.col(column))
            .limit(limit))


TEST_LOOKUPS = {
    "Unique": _lk_unique,
    "Dupe_Rows": _lk_dupe_rows,
    "Min_Val": _lk_min_val,
    "Constant": _lk_constant,
    "LOV_Match": _lk_lov_match,
    "Future_Date": _lk_future_date,
    "Email_Format": _lk_email_format,
    "Pattern_Match": _lk_pattern_match,
    "Missing_Pct": _lk_missing,
    "Required": _lk_missing,
    "Avg_Shift": _lk_avg_shift,
    "Incr_Avg_Shift": _lk_incr_avg_shift,
    "Outlier_Pct_Above": _lk_outlier_above,
    "Outlier_Pct_Below": _lk_outlier_below,
    "Daily_Record_Ct": _lk_daily_rec,
    "Weekly_Rec_Ct": _lk_weekly_rec,
    "Monthly_Rec_Ct": _lk_monthly_rec,
    "Valid_US_Zip": _lk_valid_us_zip,
    "Valid_US_Zip3": _lk_valid_us_zip3,
    "Street_Addr_Pattern": _lk_street_addr,
    "Alpha_Trunc": _lk_alpha_trunc,
    "US_State": _lk_us_state,
    "Valid_Characters": _lk_valid_characters,
    "Valid_Month": _lk_valid_month,
    "Min_Date": _lk_min_date,
    "Distinct_Value_Ct": _lk_distinct_values,
    "Distinct_Date_Ct": _lk_distinct_values,
    "Unique_Pct": _lk_unique_pct,
    "Recency": _lk_recency,
    "Row_Ct": _lk_row_ct,
    "Row_Ct_Pct": _lk_row_ct_pct,
    "LOV_All": _lk_lov_all,
    "Dec_Trunc": _lk_dec_trunc,
    "Variability_Increase": _lk_variability,
    "Variability_Decrease": _lk_variability,
    "Future_Date_1Y": _lk_future_date_1y,
    "Condition_Flag": _lk_condition_flag,
    # cross-table / query-test types (reference target_data_lookups in the
    # corresponding test_types_*.yaml; routed to query_tests detail pipelines)
    "Aggregate_Balance": _lk_aggregate_balance("exact"),
    "Aggregate_Balance_Percent": _lk_aggregate_balance("percent"),
    "Aggregate_Balance_Range": _lk_aggregate_balance("range"),
    "Aggregate_Minimum": _lk_aggregate_balance("minimum"),
    "Combo_Match": _lk_combo_match,
    "Timeframe_Combo_Match": _lk_timeframe_combo(gain=False),
    "Timeframe_Combo_Gain": _lk_timeframe_combo(gain=True),
    "Distribution_Shift": _lk_distribution_shift,
    "Volume_Trend": _lk_metric_trend,
    "Metric_Trend": _lk_metric_trend,
    # no reference lookup exists for these four — detail routes to the
    # test's own comparison output instead of returning NA
    "Table_Freshness": _lk_table_freshness,
    "Freshness_Trend": _lk_table_freshness,
    "Schema_Drift": _lk_schema_drift,
    "CUSTOM": _lk_custom,
    # profile-anomaly lookups share the registry (error_type Profile Anomaly)
    "Leading_Spaces": _lk_leading_spaces,
    "Quoted_Values": _lk_quoted_values,
    "Benford_Nonconformity": _lk_benford,
    "Correlated_Columns": _lk_correlated,
    "Dependent_Column": _lk_dependent,
}


def source_data_lookup(df: DataFrame, test_type: str,
                       column_name: str | None,
                       params: dict | None = None,
                       limit: int = DEFAULT_LIMIT,
                       run_date: str | None = None,
                       mask_pii: bool = False,
                       pii_columns: set[str] | None = None) -> LookupResult:
    """fetch_test_result_source_data / fetch_hygiene_issue_source_data
    (source_data_service.py:57-120): build the type's lookup, bound it by
    ``limit``, optionally redact PII columns."""
    builder = TEST_LOOKUPS.get(test_type)
    if builder is None:
        return LookupResult("NA",
                            "Source data lookup is not available for this test.",
                            None)
    try:
        out = builder(df, column_name, params or {}, limit, run_date)
    except Exception as exc:  # noqa: BLE001 — mirror ERR status, not raise
        return LookupResult("ERR", f"{type(exc).__name__}: {exc}"[:500], None)
    redacted = False
    if mask_pii and pii_columns:
        out, redacted = mask_source_data_pii(out, pii_columns)
    return LookupResult("OK", None, out, redacted)
