"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` provides the DuckDB
equivalent for the correctness gate. Column names and float rounding are kept
identical on both sides (driver sorts columns by name and rounds floats to
1e-6 before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataops_testgen_spark.profiling.profiler import profile_table

RUN_DATE = "2026-08-01"  # pinned so date metrics are deterministic


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# Q: profile_lineitem_numeric — SURVEY §2.2 numeric metric block
# --------------------------------------------------------------------------

_LINEITEM_NUM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
]


def q_profile_lineitem_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _load(spark, sf_dir, "lineitem")
    p = profile_table(df, "lineitem", run_date=RUN_DATE, secondary=False)
    return p.filter(F.col("general_type") == "N").select(
        "column_name",
        "record_ct", "value_ct", "distinct_value_ct", "null_value_ct",
        "zero_value_ct",
        F.round("min_value", 5).alias("min_value"),
        F.round("max_value", 5).alias("max_value"),
        F.round("min_value_over_0", 5).alias("min_value_over_0"),
        F.round("avg_value", 5).alias("avg_value"),
        F.round("stdev_value", 5).alias("stdev_value"),
        F.round("percentile_25", 5).alias("percentile_25"),
        F.round("percentile_50", 5).alias("percentile_50"),
        F.round("percentile_75", 5).alias("percentile_75"),
    )


def _sql_profile_numeric(table: str, cols: list[str]) -> str:
    parts = []
    for c in cols:
        parts.append(f"""
SELECT '{c}' AS column_name,
       COUNT(*)::BIGINT AS record_ct,
       COUNT({c})::BIGINT AS value_ct,
       COUNT(DISTINCT {c})::BIGINT AS distinct_value_ct,
       SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_value_ct,
       SUM(CASE WHEN {c} = 0 THEN 1 ELSE 0 END)::BIGINT AS zero_value_ct,
       ROUND(MIN({c})::DOUBLE, 5) AS min_value,
       ROUND(MAX({c})::DOUBLE, 5) AS max_value,
       ROUND(MIN(CASE WHEN {c} > 0 THEN {c} END)::DOUBLE, 5) AS min_value_over_0,
       ROUND(AVG({c}::DOUBLE), 5) AS avg_value,
       ROUND(STDDEV_SAMP({c}::DOUBLE), 5) AS stdev_value,
       ROUND(QUANTILE_CONT({c}::DOUBLE, 0.25), 5) AS percentile_25,
       ROUND(QUANTILE_CONT({c}::DOUBLE, 0.50), 5) AS percentile_50,
       ROUND(QUANTILE_CONT({c}::DOUBLE, 0.75), 5) AS percentile_75
FROM {table}""")
    return "\nUNION ALL\n".join(parts)


# --------------------------------------------------------------------------
# Q: profile_customer_strings — SURVEY §2.2 alpha metric block
# --------------------------------------------------------------------------

_CUSTOMER_STR_COLS = ["c_name", "c_mktsegment"]


def q_profile_customer_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _load(spark, sf_dir, "customer")
    p = profile_table(df, "customer", run_date=RUN_DATE, secondary=False,
                      columns=_CUSTOMER_STR_COLS)
    return p.select(
        "column_name",
        "record_ct", "value_ct", "distinct_value_ct", "null_value_ct",
        "min_length", "max_length",
        F.round("avg_length", 5).alias("avg_length"),
        "zero_length_ct", "includes_digit_ct",
        "upper_case_ct", "lower_case_ct", "non_alpha_ct", "mixed_case_ct",
        "embedded_space_ct", "min_text", "max_text",
    )


def _sql_profile_strings(table: str, cols: list[str]) -> str:
    parts = []
    for c in cols:
        parts.append(f"""
SELECT '{c}' AS column_name,
       COUNT(*)::BIGINT AS record_ct,
       COUNT({c})::BIGINT AS value_ct,
       COUNT(DISTINCT {c})::BIGINT AS distinct_value_ct,
       SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_value_ct,
       MIN(LENGTH({c}))::INT AS min_length,
       MAX(LENGTH({c}))::INT AS max_length,
       ROUND(AVG(LENGTH({c})::DOUBLE), 5) AS avg_length,
       SUM(CASE WHEN {c} = '' THEN 1 ELSE 0 END)::BIGINT AS zero_length_ct,
       SUM(CASE WHEN regexp_matches({c}, '[0-9]') THEN 1 ELSE 0 END)::BIGINT AS includes_digit_ct,
       SUM(CASE WHEN regexp_matches({c}, '[A-Za-z]') AND regexp_matches({c}, '[A-Z]')
                 AND NOT regexp_matches({c}, '[a-z]') THEN 1 ELSE 0 END)::BIGINT AS upper_case_ct,
       SUM(CASE WHEN regexp_matches({c}, '[A-Za-z]') AND regexp_matches({c}, '[a-z]')
                 AND NOT regexp_matches({c}, '[A-Z]') THEN 1 ELSE 0 END)::BIGINT AS lower_case_ct,
       SUM(CASE WHEN NOT regexp_matches({c}, '[A-Za-z]') THEN 1 ELSE 0 END)::BIGINT AS non_alpha_ct,
       (COUNT({c})
        - SUM(CASE WHEN regexp_matches({c}, '[A-Za-z]') AND regexp_matches({c}, '[A-Z]')
                    AND NOT regexp_matches({c}, '[a-z]') THEN 1 ELSE 0 END)
        - SUM(CASE WHEN regexp_matches({c}, '[A-Za-z]') AND regexp_matches({c}, '[a-z]')
                    AND NOT regexp_matches({c}, '[A-Z]') THEN 1 ELSE 0 END)
        - SUM(CASE WHEN NOT regexp_matches({c}, '[A-Za-z]') THEN 1 ELSE 0 END))::BIGINT AS mixed_case_ct,
       SUM(CASE WHEN LENGTH(TRIM({c})) - LENGTH(REPLACE(TRIM({c}), ' ', '')) > 0
                THEN 1 ELSE 0 END)::BIGINT AS embedded_space_ct,
       LEFT(MIN(NULLIF({c}, '')), 100) AS min_text,
       LEFT(MAX(NULLIF({c}, '')), 100) AS max_text
FROM {table}""")
    return "\nUNION ALL\n".join(parts)


# --------------------------------------------------------------------------
# Q: profile_orders_dates — SURVEY §2.2 date metric block
# --------------------------------------------------------------------------

def q_profile_orders_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _load(spark, sf_dir, "orders")
    p = profile_table(df, "orders", run_date=RUN_DATE, secondary=False,
                      columns=["o_orderdate"])
    return p.select(
        "column_name",
        "record_ct", "value_ct", "distinct_value_ct", "null_value_ct",
        F.date_format("min_date", "yyyy-MM-dd").alias("min_date"),
        F.date_format("max_date", "yyyy-MM-dd").alias("max_date"),
        "before_1yr_date_ct", "before_5yr_date_ct", "before_20yr_date_ct",
        "within_1yr_date_ct", "within_1mo_date_ct",
        "future_date_ct", "distant_future_date_ct",
        "date_days_present", "date_weeks_present", "date_months_present",
    )


def _sql_profile_dates(table: str, c: str, run_date: str) -> str:
    months = f"(date_diff('month', {c}, DATE '{run_date}'))"
    days = f"(date_diff('day', CAST({c} AS DATE), DATE '{run_date}'))"
    return f"""
SELECT '{c}' AS column_name,
       COUNT(*)::BIGINT AS record_ct,
       COUNT({c})::BIGINT AS value_ct,
       COUNT(DISTINCT {c})::BIGINT AS distinct_value_ct,
       SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_value_ct,
       strftime(MIN({c}), '%Y-%m-%d') AS min_date,
       strftime(MAX({c}), '%Y-%m-%d') AS max_date,
       SUM(CASE WHEN {months} > 12 THEN 1 ELSE 0 END)::BIGINT AS before_1yr_date_ct,
       SUM(CASE WHEN {months} > 60 THEN 1 ELSE 0 END)::BIGINT AS before_5yr_date_ct,
       SUM(CASE WHEN {months} > 240 THEN 1 ELSE 0 END)::BIGINT AS before_20yr_date_ct,
       SUM(CASE WHEN {days} BETWEEN 0 AND 365 THEN 1 ELSE 0 END)::BIGINT AS within_1yr_date_ct,
       SUM(CASE WHEN {days} BETWEEN 0 AND 30 THEN 1 ELSE 0 END)::BIGINT AS within_1mo_date_ct,
       SUM(CASE WHEN CAST({c} AS DATE) > DATE '{run_date}' THEN 1 ELSE 0 END)::BIGINT AS future_date_ct,
       SUM(CASE WHEN -{months} > 240 THEN 1 ELSE 0 END)::BIGINT AS distant_future_date_ct,
       COUNT(DISTINCT CAST({c} AS DATE))::BIGINT AS date_days_present,
       COUNT(DISTINCT date_trunc('week', {c}))::BIGINT AS date_weeks_present,
       COUNT(DISTINCT date_trunc('month', {c}))::BIGINT AS date_months_present
FROM {table}"""


# --------------------------------------------------------------------------
# Q: top_freq_values + distinct_value_hash — secondary profiling (SURVEY §2.2)
# --------------------------------------------------------------------------

def q_top_freq_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _load(spark, sf_dir, "orders")
    p = profile_table(df, "orders", run_date=RUN_DATE,
                      columns=["o_orderstatus", "o_orderpriority"])
    return p.select("column_name", "top_freq_values", "distinct_value_hash")


def _sql_top_freq(table: str, cols: list[str], k: int = 10) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, {c} AS value FROM {table}" for c in cols
    )
    return f"""
WITH unpivoted AS ({unions}),
counts AS (
  SELECT column_name, value, COUNT(*)::BIGINT AS ct
  FROM unpivoted WHERE value IS NOT NULL
  GROUP BY column_name, value
),
ranked AS (
  SELECT column_name, value, ct,
         ROW_NUMBER() OVER (PARTITION BY column_name ORDER BY ct DESC, value) AS rn
  FROM counts
),
freq AS (
  SELECT column_name,
         string_agg(value || ':' || ct, ' | ' ORDER BY rn) AS top_freq_values
  FROM ranked WHERE rn <= {k} GROUP BY column_name
),
hashes AS (
  SELECT column_name,
         md5(string_agg(value, '|' ORDER BY value)) AS distinct_value_hash
  FROM (SELECT DISTINCT column_name, value FROM counts)
  GROUP BY column_name
)
SELECT f.column_name, f.top_freq_values, h.distinct_value_hash
FROM freq f JOIN hashes h USING (column_name)"""


# --------------------------------------------------------------------------
# Q: top_patterns — pattern frequency (SURVEY §2.2, profiling query :125-140)
# --------------------------------------------------------------------------

def q_top_patterns_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _load(spark, sf_dir, "part")
    p = profile_table(df, "part", run_date=RUN_DATE,
                      columns=["p_brand", "p_type", "p_name"])
    return p.select("column_name", "top_patterns", "distinct_pattern_ct")


def _sql_top_patterns(table: str, cols: list[str], k: int = 5) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, {c} AS value FROM {table}" for c in cols
    )
    return f"""
WITH unpivoted AS ({unions}),
pats AS (
  SELECT column_name,
         regexp_replace(regexp_replace(regexp_replace(value,
             '[a-z]', 'a', 'g'), '[A-Z]', 'A', 'g'), '[0-9]', 'N', 'g') AS pattern
  FROM unpivoted WHERE value IS NOT NULL
),
counts AS (
  SELECT column_name, pattern, COUNT(*)::BIGINT AS ct
  FROM pats GROUP BY column_name, pattern
),
ranked AS (
  SELECT column_name, pattern, ct,
         ROW_NUMBER() OVER (PARTITION BY column_name ORDER BY ct DESC, pattern) AS rn,
         COUNT(*) OVER (PARTITION BY column_name) AS n_pat
  FROM counts
)
SELECT column_name,
       string_agg(pattern || ':' || ct, ' | ' ORDER BY rn) AS top_patterns,
       MAX(n_pat)::BIGINT AS distinct_pattern_ct
FROM ranked WHERE rn <= {k}
GROUP BY column_name"""


# --------------------------------------------------------------------------
# Driver contract
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full profile of lineitem at sf0.001 (one agg + one top-k job)."""
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    return profile_table(df, "lineitem", run_date=RUN_DATE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "profile_lineitem_numeric": q_profile_lineitem_numeric,
        "profile_customer_strings": q_profile_customer_strings,
        "profile_orders_dates": q_profile_orders_dates,
        "top_freq_orders": q_top_freq_orders,
        "top_patterns_part": q_top_patterns_part,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "profile_lineitem_numeric": _sql_profile_numeric("lineitem", _LINEITEM_NUM_COLS),
        "profile_customer_strings": _sql_profile_strings("customer", _CUSTOMER_STR_COLS),
        "profile_orders_dates": _sql_profile_dates("orders", "o_orderdate", RUN_DATE),
        "top_freq_orders": _sql_top_freq("orders", ["o_orderstatus", "o_orderpriority"]),
        "top_patterns_part": _sql_top_patterns("part", ["p_brand", "p_type", "p_name"]),
    }
