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
    # profile-anomaly lookups share the registry (error_type Profile Anomaly)
    "Leading_Spaces": _lk_leading_spaces,
    "Quoted_Values": _lk_quoted_values,
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
