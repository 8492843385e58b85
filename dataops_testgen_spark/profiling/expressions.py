"""Per-metric aggregate expression builders for column profiling.

Every metric of the reference's per-column profiling query
(`/root/reference/testgen/template/flavors/postgresql/profiling/
project_profiling_query.sql`, result schema
`template/dbsetup/030_initialize_new_schema_structure.sql:261-339`) is
re-expressed as a PySpark ``Column`` aggregate.  The profiler assembles the
applicable subset per column (gated on general type, like the reference's
``TG-IF is_type_*`` template conditionals — `commands/queries/
profiling_query.py:228-243`) into ONE ``df.agg`` for the whole table.

All expressions are built-in JVM functions — no Python UDFs — so the whole
profile pass stays inside whole-stage codegen and needs exactly one scan.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

from dataops_testgen_spark.profiling import regexes as RX


def _cnt(cond: Column) -> Column:
    """COUNT of rows where cond — null-safe (nulls don't count)."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def shared_metrics(c: Column) -> dict[str, Column]:
    """Metrics computed for every column (profiling query :20-27)."""
    return {
        "value_ct": F.count(c).cast("long"),
        "null_value_ct": _cnt(c.isNull()),
    }


def distinct_metric(c: Column, distinct: str) -> Column:
    """COUNT(DISTINCT col) (:22) under one of three physical strategies:

    - ``"exact"``  — ``countDistinct``: Catalyst rewrites multi-distinct aggs
      through an Expand (one projection per distinct group), so the caller
      should isolate these in their own agg job on wide/large tables.
    - ``"set"``    — ``size(collect_set(col))``: exact, plain hash aggregate,
      NO Expand — the whole profile stays one fused codegen'd job.  Memory is
      O(column cardinality) per aggregate buffer, so callers gate this on
      table size (narrow/small tables only).
    - ``"approx"`` — HLL sketch for 100 TB-scale runs (one pass, bounded
      memory, no Expand).
    """
    if distinct == "approx":
        return F.approx_count_distinct(c).cast("long")
    if distinct == "set":
        return F.size(F.collect_set(c)).cast("long")
    return F.countDistinct(c).cast("long")


def alpha_metrics(c: Column, distinct: str) -> dict[str, Column]:
    """A-type (string) metrics (profiling query :25-106, :236-241)."""
    trimmed = F.trim(c)
    has_alpha = c.rlike("[A-Za-z]")
    has_lower = c.rlike("[a-z]")
    has_upper = c.rlike("[A-Z]")
    internal_spaces = F.length(trimmed) - F.length(F.regexp_replace(trimmed, " ", ""))
    lower_trim = F.lower(trimmed)
    out = {
        "min_length": F.min(F.length(c)).cast("int"),
        "max_length": F.max(F.length(c)).cast("int"),
        "avg_length": F.avg(F.length(c)),
        "zero_value_ct": _cnt(trimmed.rlike(RX.ZERO_TEXT_RE)),
        "zero_length_ct": _cnt(c == ""),
        "lead_space_ct": _cnt(c.startswith(" ")),
        "quoted_value_ct": _cnt(c.rlike(RX.QUOTED_RE)),
        "includes_digit_ct": _cnt(c.rlike("[0-9]")),
        "filled_value_ct": _cnt(
            lower_trim.rlike(RX.FILLED_RUN_RE) | lower_trim.rlike(RX.FILLED_WRAPPED_RE)
        ),
        "distinct_std_value_ct": distinct_metric(
            F.upper(F.translate(c, " ',.-", "")), distinct),
        "min_text": F.substring(F.min(F.nullif(c, F.lit(""))), 1, 100),
        "max_text": F.substring(F.max(F.nullif(c, F.lit(""))), 1, 100),
        "upper_case_ct": _cnt(has_alpha & has_upper & ~has_lower),
        "lower_case_ct": _cnt(has_alpha & has_lower & ~has_upper),
        "non_alpha_ct": _cnt(~has_alpha),
        "non_printing_ct": _cnt(c.rlike(RX.NON_PRINTING_RE)),
        "numeric_ct": _cnt(F.substring(c, 1, 31).rlike(RX.IS_NUM_RE)),
        "date_ct": _cnt(_is_date(F.substring(c, 1, 26))),
        "embedded_space_ct": _cnt(internal_spaces > 0),
        "avg_embedded_spaces": F.avg(internal_spaces),
    }
    # Std-pattern ratios (:85-106): one match-count per catalog pattern; the
    # classification into a single label happens in the profiler post-step.
    for label, pattern, _thr in RX.STD_PATTERNS:
        out[f"stdpat_{label}"] = _cnt(trimmed.rlike(pattern))
    return out


def _is_date(c: Column) -> Column:
    """IS_DATE (templated_functions.yaml:16-108): value parses as a date in
    any accepted format.  Spark's try_to_timestamp subsumes the reference's
    90 lines of month-length regex."""
    attempts = [F.try_to_timestamp(F.trim(c), F.lit(fmt)) for fmt in RX.DATE_FORMATS]
    # Cheap digit gate: every accepted format contains a digit, and the
    # 8-way parse attempt is ~10× the cost of the rest of the metric block —
    # predication skips it for clearly-non-date values.
    return F.when(c.rlike("[0-9]"), F.coalesce(*attempts)).isNotNull()


def numeric_metrics(c: Column, is_decimal: bool, exact_percentiles: bool) -> dict[str, Column]:
    """N-type metrics (profiling query :38-40, :145-167)."""
    d = c.cast("double")
    out = {
        "min_value": F.min(d),
        "max_value": F.max(d),
        "min_value_over_0": F.min(F.when(d > 0, d)),
        "avg_value": F.avg(d),
        "stdev_value": F.stddev_samp(d),
        "zero_value_ct": _cnt(d == 0),
        "min_length": F.min(F.length(c.cast("string"))).cast("int"),
        "max_length": F.max(F.length(c.cast("string"))).cast("int"),
        "avg_length": F.avg(F.length(c.cast("string"))),
    }
    # Benford first-significant-digit census (anomalies/benford.py is the
    # standalone screen; this fuses the same 9 counts into the single
    # profile pass so the hygiene-screen catalog can fire a Benford rule
    # off profile metrics alone, reference cascade style). Digit via
    # arithmetic, not string formatting (engine-portable); zero/NULL and
    # NaN/Inf rows carry no first digit.
    x = F.abs(d)
    bf_valid = d.isNotNull() & (x > 0) & ~F.isnan(d) & (x != float("inf"))
    bf_digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x))))
    out["benford_counts"] = F.array(
        *[_cnt(bf_valid & (bf_digit == i)).cast("long")
          for i in range(1, 10)])
    if exact_percentiles:
        # percentile() = exact PERCENTILE_CONT interpolation (:150-152)
        pct = F.percentile(d, F.lit([0.25, 0.5, 0.75]))
    else:
        pct = F.percentile_approx(d, F.lit([0.25, 0.5, 0.75]))
    out["percentile_25"] = pct[0]
    out["percentile_50"] = pct[1]
    out["percentile_75"] = pct[2]
    if is_decimal:
        # fractional_sum = SUM(ROUND(ABS(MOD(col,1)),5)) (:163-167) — decimal
        # truncation detector.
        out["fractional_sum"] = F.sum(F.round(F.abs(d % 1), 5))
    return out


def date_metrics(c: Column, run_date: _dt.date,
                 distinct: str = "exact") -> dict[str, Column]:
    """D-type metrics (profiling query :168-207), relative to ``run_date``."""
    rd = F.lit(run_date.isoformat()).cast("date")
    dt = F.to_date(c)
    # DATEDIFF_MONTH counts month *boundaries* (templated_functions.yaml:1-9),
    # not fractional months — matches DuckDB/SQLServer datediff('month').
    months_ago = (F.year(rd) - F.year(dt)) * 12 + (F.month(rd) - F.month(dt))
    days_ago = F.datediff(rd, dt)
    return {
        "min_date": F.min(c).cast("timestamp"),
        "max_date": F.max(c).cast("timestamp"),
        "before_1yr_date_ct": _cnt(months_ago > 12),
        "before_5yr_date_ct": _cnt(months_ago > 60),
        "before_20yr_date_ct": _cnt(months_ago > 240),
        "before_100yr_date_ct": _cnt(months_ago > 1200),
        "within_1yr_date_ct": _cnt((days_ago >= 0) & (days_ago <= 365)),
        "within_1mo_date_ct": _cnt((days_ago >= 0) & (days_ago <= 30)),
        "future_date_ct": _cnt(dt > rd),
        "distant_future_date_ct": _cnt(-months_ago > 240),
        "date_days_present": distinct_metric(dt, distinct),
        "date_weeks_present": distinct_metric(F.date_trunc("week", dt), distinct),
        "date_months_present": distinct_metric(F.date_trunc("month", dt), distinct),
    }


def boolean_metrics(c: Column) -> dict[str, Column]:
    """B-type (:223-227)."""
    return {"boolean_true_ct": F.sum(c.cast("int")).cast("long")}
