"""DuckDB oracle SQL generators for the driver's correctness gate.

These mirror the Spark-side semantics (profiling metrics → datatype
suggestion → functional-datatype cascade → table type → PII → CDE) as plain
ANSI-ish SQL so the driver can hash-compare both sides at sf0.01.

Scope note: the generated cascade covers every same-row rule plus the
ID-refinement, Measurement-Pct, table-type, PII and CDE passes. The
cross-row City rules (:293-309, :511-528) and ID-FK (:559-571) are omitted —
use these oracles only for single-table queries on tables with no State
column (they cannot fire there), which the driver queries respect.
"""

from __future__ import annotations

from dataops_testgen_spark.profiling import regexes as RX

# DuckDB strptime equivalents of profiling.regexes.DATE_FORMATS.
# Each format is shape-guarded by a regex enforcing the digit widths the
# Java pattern enforces, and parsed with the SINGLE-format try_strptime:
# the LIST variant takes a different (timestamptz) code path that ROLLS
# INVALID DATES OVER (Feb 30 -> Mar 1) and accepts 1-digit fields where
# %m/%d would not — both divergences from Spark's strict try_to_timestamp
# were caught by tests/test_regex_parity.py::test_is_date_parity.
_DUCK_DATE_SHAPES = [
    (r"^\d{4}-\d{2}-\d{2}$", "%Y-%m-%d"),
    (r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$", "%Y-%m-%d %H:%M:%S"),
    (r"^\d{2}/\d{2}/\d{4}$", "%m/%d/%Y"),
    (r"^\d{1,2}/\d{1,2}/\d{4}$", "%-m/%-d/%Y"),
    (r"^\d{2}-[A-Za-z]{3}-\d{4}$", "%d-%b-%Y"),
    (r"^[A-Za-z]{3} \d{2} \d{4}$", "%b %d %Y"),
    (r"^[A-Za-z]{3} \d{2}, \d{4}$", "%b %d, %Y"),
    (r"^\d{8}$", "%Y%m%d"),
]


def duck_is_date(expr: str) -> str:
    """IS_DATE in DuckDB SQL with Spark-strict semantics over ``expr``."""
    attempts = " OR ".join(
        f"(regexp_matches({expr}, '{shape}')"
        f" AND try_strptime({expr}, '{fmt}') IS NOT NULL)"
        for shape, fmt in _DUCK_DATE_SHAPES)
    return f"({attempts})"

_FULL_NAME_RE = (
    "(approver|full|contact|emp|employee|hcp|manager|mgr|owner|party|person|"
    "preferred|rep|reviewer|salesperson|spouse)(_| |)(name|nm)$"
)
_ENTITY_NAME_RE = (
    "(acct|account|affiliation|branch|business|co|comp|company|corp|corporate|"
    "cust|customer|distributor|employer|entity|firm|franchise|hco|org|"
    "organization|site|supplier|vendor|hospital|practice|clinic)(_| |)(name|nm)$"
)
_PROCESS_TS_RE1 = (
    "^(last_?|system_?|)(add|create|insert|inrt|update|updt|mod|modif|modf|del|"
    "delete|refresh)(.{0,3}d?_?(time|tm|date|day|dt|stamp|timestamp|datestamp))$"
)
_PROCESS_TS_RE2 = "^(last_?|)(change|chg|update|updt|mod|modify|modf|modified|refresh|refreshed)$"
_PROCESS_USER_RE = "^(last_?|)(create|update|modif|delete|refresh)(.*?(by|id|name|nm|user|usr))$"
_SYSTEM_USER_RE = "(user|usr)_?(name|nm)?$"
_MON_NN_RE = r"(?i)^(jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)[\s-]?\d{1,2}$"


def _alpha_metrics_sql(t: str, c: str) -> dict[str, str]:
    trimmed = f"TRIM({c})"
    spaces = f"(LENGTH({trimmed}) - LENGTH(REPLACE({trimmed}, ' ', '')))"
    has_alpha = f"regexp_matches({c}, '[A-Za-z]')"
    has_upper = f"regexp_matches({c}, '[A-Z]')"
    has_lower = f"regexp_matches({c}, '[a-z]')"
    m = {
        "value_ct": f"COUNT({c})::BIGINT",
        "null_value_ct": f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT",
        "distinct_value_ct": f"COUNT(DISTINCT {c})::BIGINT",
        "zero_length_ct": f"SUM(CASE WHEN {c} = '' THEN 1 ELSE 0 END)::BIGINT",
        "lead_space_ct": f"SUM(CASE WHEN {c} LIKE ' %' THEN 1 ELSE 0 END)::BIGINT",
        "quoted_value_ct": (
            f"SUM(CASE WHEN regexp_matches({c}, '{RX.QUOTED_RE.replace(chr(39), chr(39) * 2)}')"
            " THEN 1 ELSE 0 END)::BIGINT"),
        "non_printing_ct": (
            f"SUM(CASE WHEN regexp_matches({c}, '{RX.NON_PRINTING_RE}')"
            " THEN 1 ELSE 0 END)::BIGINT"),
        "upper_case_ct": (
            f"SUM(CASE WHEN {has_alpha} AND {has_upper} AND NOT {has_lower}"
            " THEN 1 ELSE 0 END)::BIGINT"),
        "lower_case_ct": (
            f"SUM(CASE WHEN {has_alpha} AND {has_lower} AND NOT {has_upper}"
            " THEN 1 ELSE 0 END)::BIGINT"),
        "non_alpha_ct": (
            f"SUM(CASE WHEN NOT {has_alpha} THEN 1 ELSE 0 END)::BIGINT"),
        "distinct_std_value_ct": (
            f"COUNT(DISTINCT UPPER(translate({c}, ' '',.-', '')))::BIGINT"),
        "filled_value_ct": (
            f"SUM(CASE WHEN regexp_matches(lower({trimmed}), '{RX.FILLED_RUN_RE}')"
            f" OR regexp_matches(lower({trimmed}), '{RX.FILLED_WRAPPED_RE}')"
            " THEN 1 ELSE 0 END)::BIGINT"
        ),
        "min_length": f"MIN(LENGTH({c}))::INT",
        "max_length": f"MAX(LENGTH({c}))::INT",
        "avg_length": f"AVG(LENGTH({c})::DOUBLE)",
        "avg_embedded_spaces": f"AVG({spaces}::DOUBLE)",
        "includes_digit_ct": f"SUM(CASE WHEN regexp_matches({c}, '[0-9]') THEN 1 ELSE 0 END)::BIGINT",
        "numeric_ct": (
            f"SUM(CASE WHEN regexp_matches(substr({c}, 1, 31), '{RX.IS_NUM_RE}')"
            " THEN 1 ELSE 0 END)::BIGINT"
        ),
        "date_ct": (
            f"SUM(CASE WHEN {c} IS NOT NULL AND "
            f"{duck_is_date(f'TRIM(substr({c}, 1, 26))')}"
            " THEN 1 ELSE 0 END)::BIGINT"
        ),
        "min_text": f"LEFT(MIN(NULLIF({c}, '')), 100)",
        "max_text": f"LEFT(MAX(NULLIF({c}, '')), 100)",
    }
    for label, pattern, _thr in RX.STD_PATTERNS:
        m[f"stdpat_{label}"] = (
            f"SUM(CASE WHEN regexp_matches({trimmed}, '{pattern}') THEN 1 ELSE 0 END)::BIGINT"
        )
    # top patterns / frequencies as correlated scalar subqueries (one scan
    # each — the oracle optimizes for fidelity, not speed)
    pat = (
        "regexp_replace(regexp_replace(regexp_replace(value, '[a-z]', 'a', 'g'),"
        " '[A-Z]', 'A', 'g'), '[0-9]', 'N', 'g')"
    )
    pat_counts = (
        f"(SELECT {pat} AS pattern, COUNT(*) AS ct FROM "
        f"(SELECT {c} AS value FROM {t} WHERE {c} IS NOT NULL) GROUP BY 1)"
    )
    m["distinct_pattern_ct"] = f"(SELECT COUNT(*)::BIGINT FROM {pat_counts})"
    for i in (1, 2, 3, 4, 5):
        m[f"p{i}"] = (
            f"(SELECT pattern FROM {pat_counts} ORDER BY ct DESC, pattern "
            f"LIMIT 1 OFFSET {i - 1})"
        )
        m[f"pc{i}"] = (
            f"(SELECT ct::BIGINT FROM {pat_counts} ORDER BY ct DESC, pattern "
            f"LIMIT 1 OFFSET {i - 1})"
        )
    m["top_freq_values"] = f"""
      CASE WHEN COUNT(DISTINCT {c}) BETWEEN 2 AND 70 AND MAX(LENGTH({c})) <= 70
           THEN (SELECT string_agg(value || ':' || ct, ' | ' ORDER BY ct DESC, value)
                 FROM (SELECT {c} AS value, COUNT(*)::BIGINT AS ct FROM {t}
                       WHERE {c} IS NOT NULL GROUP BY 1
                       ORDER BY ct DESC, value LIMIT 10)) END"""
    return m


def _benford_counts_sql(c: str) -> str:
    """First-significant-digit census, digits 1-9, as a BIGINT list —
    mirror of profiling/expressions.py's fused benford_counts metric
    (digit via arithmetic, zero/NULL/NaN/Inf rows carry no digit)."""
    x = f"ABS({c}::DOUBLE)"
    valid = (f"({c} IS NOT NULL AND {x} > 0 AND isfinite({c}::DOUBLE))")
    digit = f"FLOOR({x} / POWER(10, FLOOR(LOG10({x}))))"
    elems = ", ".join(
        f"SUM(CASE WHEN {valid} AND {digit} = {d} THEN 1 ELSE 0 END)::BIGINT"
        for d in range(1, 10))
    return f"[{elems}]"


def _numeric_metrics_sql(t: str, c: str, is_decimal: bool) -> dict[str, str]:
    return {
        "value_ct": f"COUNT({c})::BIGINT",
        "null_value_ct": f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT",
        "distinct_value_ct": f"COUNT(DISTINCT {c})::BIGINT",
        "min_length": f"MIN(LENGTH(CAST({c} AS VARCHAR)))::INT",
        "max_length": f"MAX(LENGTH(CAST({c} AS VARCHAR)))::INT",
        "avg_length": f"AVG(LENGTH(CAST({c} AS VARCHAR))::DOUBLE)",
        "min_value": f"MIN({c})::DOUBLE",
        "max_value": f"MAX({c})::DOUBLE",
        "avg_value": f"AVG({c}::DOUBLE)",
        "stdev_value": f"STDDEV_SAMP({c}::DOUBLE)",
        "percentile_25": f"QUANTILE_CONT({c}::DOUBLE, 0.25)",
        "percentile_50": f"QUANTILE_CONT({c}::DOUBLE, 0.50)",
        "percentile_75": f"QUANTILE_CONT({c}::DOUBLE, 0.75)",
        "fractional_sum": (
            f"SUM(ROUND(ABS(fmod({c}::DOUBLE, 1)), 5))" if is_decimal else "NULL::DOUBLE"
        ),
        "min_value_over_0": f"MIN(CASE WHEN {c}::DOUBLE > 0 THEN {c}::DOUBLE END)",
        "benford_counts": _benford_counts_sql(c),
    }


def _date_metrics_sql(c: str, run_date: str) -> dict[str, str]:
    months = f"(date_diff('month', CAST({c} AS DATE), DATE '{run_date}'))"
    return {
        "value_ct": f"COUNT({c})::BIGINT",
        "null_value_ct": f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT",
        "distinct_value_ct": f"COUNT(DISTINCT {c})::BIGINT",
        "min_length": f"MIN(LENGTH(CAST({c} AS VARCHAR)))::INT",
        "max_length": f"MAX(LENGTH(CAST({c} AS VARCHAR)))::INT",
        "avg_length": f"AVG(LENGTH(CAST({c} AS VARCHAR))::DOUBLE)",
        "min_date": f"MIN(CAST({c} AS TIMESTAMP))",
        "max_date": f"MAX(CAST({c} AS TIMESTAMP))",
        "before_5yr_date_ct": f"SUM(CASE WHEN {months} > 60 THEN 1 ELSE 0 END)::BIGINT",
        "before_20yr_date_ct": f"SUM(CASE WHEN {months} > 240 THEN 1 ELSE 0 END)::BIGINT",
        "before_100yr_date_ct": f"SUM(CASE WHEN {months} > 1200 THEN 1 ELSE 0 END)::BIGINT",
        "distant_future_date_ct": f"SUM(CASE WHEN -{months} > 240 THEN 1 ELSE 0 END)::BIGINT",
        "future_date_ct": (
            f"SUM(CASE WHEN CAST({c} AS DATE) > DATE '{run_date}' THEN 1 ELSE 0 END)::BIGINT"
        ),
        "date_days_present": f"COUNT(DISTINCT CAST({c} AS DATE))::BIGINT",
        "date_weeks_present": f"COUNT(DISTINCT date_trunc('week', {c}))::BIGINT",
        "date_months_present": f"COUNT(DISTINCT date_trunc('month', {c}))::BIGINT",
    }


_ALL_METRICS = [
    "value_ct", "null_value_ct", "distinct_value_ct", "zero_length_ct",
    "filled_value_ct", "lead_space_ct", "quoted_value_ct", "non_printing_ct",
    "upper_case_ct", "lower_case_ct", "non_alpha_ct", "distinct_std_value_ct",
    "min_length", "max_length", "avg_length", "avg_embedded_spaces",
    "includes_digit_ct", "numeric_ct", "date_ct", "min_text", "max_text",
    "min_value", "max_value", "avg_value", "stdev_value",
    "percentile_25", "percentile_50", "percentile_75", "fractional_sum",
    "min_date", "max_date", "before_5yr_date_ct", "before_20yr_date_ct",
    "before_100yr_date_ct", "distant_future_date_ct",
    "future_date_ct", "date_days_present", "date_weeks_present",
    "date_months_present", "distinct_pattern_ct", "p1", "p2", "p3", "p4", "p5",
    "pc1", "pc2", "pc3", "pc4", "pc5",
    "top_freq_values", "min_value_over_0", "benford_counts",
] + [f"stdpat_{label}" for label, _re, _thr in RX.STD_PATTERNS]

_NULL_TYPES = {
    "value_ct": "BIGINT", "null_value_ct": "BIGINT", "distinct_value_ct": "BIGINT",
    "zero_length_ct": "BIGINT", "filled_value_ct": "BIGINT",
    "lead_space_ct": "BIGINT", "quoted_value_ct": "BIGINT",
    "non_printing_ct": "BIGINT", "upper_case_ct": "BIGINT",
    "lower_case_ct": "BIGINT", "non_alpha_ct": "BIGINT",
    "distinct_std_value_ct": "BIGINT", "before_100yr_date_ct": "BIGINT",
    "distant_future_date_ct": "BIGINT",
    "min_length": "INT", "max_length": "INT", "avg_length": "DOUBLE",
    "avg_embedded_spaces": "DOUBLE", "includes_digit_ct": "BIGINT",
    "numeric_ct": "BIGINT", "date_ct": "BIGINT",
    "min_text": "VARCHAR", "max_text": "VARCHAR",
    "min_value": "DOUBLE", "max_value": "DOUBLE", "avg_value": "DOUBLE",
    "stdev_value": "DOUBLE", "percentile_25": "DOUBLE",
    "percentile_50": "DOUBLE", "percentile_75": "DOUBLE",
    "fractional_sum": "DOUBLE", "min_date": "TIMESTAMP", "max_date": "TIMESTAMP",
    "before_5yr_date_ct": "BIGINT", "before_20yr_date_ct": "BIGINT",
    "future_date_ct": "BIGINT", "date_days_present": "BIGINT",
    "date_weeks_present": "BIGINT", "date_months_present": "BIGINT",
    "distinct_pattern_ct": "BIGINT", "p1": "VARCHAR", "p2": "VARCHAR",
    "p3": "VARCHAR", "p4": "VARCHAR", "p5": "VARCHAR",
    "pc1": "BIGINT", "pc2": "BIGINT", "pc3": "BIGINT", "pc4": "BIGINT",
    "pc5": "BIGINT",
    "top_freq_values": "VARCHAR",
    "min_value_over_0": "DOUBLE",
    "benford_counts": "BIGINT[]",
}
for _label, _re_, _thr_ in RX.STD_PATTERNS:
    _NULL_TYPES[f"stdpat_{_label}"] = "BIGINT"


def _profile_select(table: str, name: str, ordinal: int, general_type: str,
                    column_type: str, is_decimal: bool, run_date: str) -> str:
    if general_type == "A":
        m = _alpha_metrics_sql(table, name)
    elif general_type == "N":
        m = _numeric_metrics_sql(table, name, is_decimal)
    elif general_type == "D":
        m = _date_metrics_sql(name, run_date)
    else:
        m = {}
    exprs = []
    for metric in _ALL_METRICS:
        expr = m.get(metric, f"NULL::{_NULL_TYPES[metric]}")
        exprs.append(f"{expr} AS {metric}")
    cols = ",\n       ".join(exprs)
    return f"""
SELECT '{table}' AS table_name, '{name}' AS column_name,
       {ordinal} AS ordinal_position,
       '{general_type}' AS general_type, '{column_type}' AS column_type,
       COUNT(*)::BIGINT AS record_ct,
       {cols}
FROM {table}"""


def _std_pattern_case() -> str:
    branches = "\n        ".join(
        f"WHEN stdpat_{label}::DOUBLE / value_ct >= {thr} THEN '{label}'"
        for label, _re, thr in RX.STD_PATTERNS
    )
    return f"CASE WHEN value_ct > 0 THEN CASE {branches} END END"


def _suggestion_case() -> str:
    """datatype_suggestions.sql:1-153 (functional_data_type is NULL pre-run,
    so the State/Boolean/Measurement-Pct branches cannot fire)."""
    tf = "COALESCE(top_freq_values, '')"
    all_num = f"numeric_ct > 0 AND value_ct = numeric_ct + COALESCE(zero_length_ct, 0)"
    all_date = f"date_ct > 0 AND value_ct = date_ct + COALESCE(zero_length_ct, 0)"
    bucket = ("CASE WHEN max_length <= 50 THEN CAST(CEIL((max_length + 5)/10.0)*10 AS INT) "
              "ELSE CAST((1 + TRUNC((max_length + 10)/20.0))*20 AS INT) END")
    fb_bucket = ("CASE WHEN max_length <= 50 THEN CAST(CEIL(max_length/10.0)*10 AS INT) "
                 "ELSE CAST((1 + TRUNC((max_length + 10)/20.0))*20 AS INT) END")
    cur = "TRY_CAST(regexp_extract(column_type, '\\((\\d+)\\)', 1) AS INT)"
    scale_pos = "TRY_CAST(regexp_extract(column_type, ',\\s*(\\d+)\\s*\\)', 1) AS INT) > 0"
    return f"""
  CASE WHEN record_ct > 500 AND NOT lower(column_name) LIKE '%id' THEN
    CASE general_type
      WHEN 'A' THEN CASE
        WHEN lower(column_name) LIKE '%zip%' AND max_length <= 10
          THEN 'VARCHAR(' || COALESCE(LEAST(10, {cur}), 10)::VARCHAR || ')'
        WHEN {all_num} AND POSITION('.' IN {tf}) > 0 THEN 'DECIMAL(18,4)'
        WHEN {all_num} AND max_length <= 6 AND POSITION('.' IN {tf}) = 0 THEN 'INTEGER'
        WHEN {all_num} AND max_length  > 6 AND POSITION('.' IN {tf}) = 0 THEN 'BIGINT'
        WHEN {all_date} AND POSITION('+' IN {tf}) > 0 THEN 'TIMESTAMP'
        WHEN {all_date} AND POSITION(':' IN {tf}) > 0 THEN 'TIMESTAMP_NTZ'
        WHEN {all_date} THEN 'DATE'
        WHEN max_length <= 5
          THEN 'VARCHAR(' || COALESCE(LEAST(10, {cur}), 10)::VARCHAR || ')'
        WHEN max_length IS NOT NULL
          THEN 'VARCHAR(' || COALESCE(LEAST({bucket}, {cur}), {fb_bucket})::VARCHAR || ')'
        ELSE lower(column_type) END
      WHEN 'N' THEN CASE
        WHEN {scale_pos} AND fractional_sum = 0 AND min_value >= -100 AND max_value <= 100
          THEN 'SMALLINT'
        WHEN {scale_pos} AND fractional_sum = 0
             AND min_value >= -100000000 AND max_value <= 100000000 THEN 'INTEGER'
        WHEN {scale_pos} AND fractional_sum = 0
             AND (min_value < -100000000 OR max_value > 100000000) THEN 'BIGINT'
        ELSE lower(column_type) END
      ELSE lower(column_type) END
  ELSE lower(column_type) END"""


def _date_case_sql(run_date: str) -> str:
    rd = f"DATE '{run_date}'"
    vf = "NULLIF(value_ct::DOUBLE, 0)"
    wk = "date_diff('week', min_date, max_date)"
    mo = "date_diff('month', min_date, max_date)"
    qtr = "date_diff('quarter', min_date, max_date)"
    yr = "date_diff('year', min_date, max_date)"
    recent = f"(1 - before_5yr_date_ct / {vf})"
    return f"""CASE
    WHEN before_20yr_date_ct / {vf} * 100 >= 75 THEN 'Historical Date'
    WHEN future_date_ct / {vf} * 100 >= 95 THEN 'Future Date'
    WHEN future_date_ct / {vf} * 100 >= 50 THEN 'Schedule Date'
    WHEN before_5yr_date_ct / {vf} * 100 BETWEEN 0 AND 20
         AND future_date_ct / {vf} * 100 BETWEEN 0 AND 10 THEN CASE
      WHEN value_ct > 100 AND distinct_value_ct > 20
           AND date_days_present >= 2 * ({wk} + 1) THEN 'Transactional Date'
      WHEN value_ct > 20 AND distinct_value_ct > 8
           AND (date_weeks_present = NULLIF({wk}, 0)::DOUBLE + 1
                OR date_weeks_present >= 2 * ({mo} + 1)
                OR ROUND(distinct_value_ct * {recent})
                   >= 2 * (date_diff('month', {rd} - INTERVAL 365 DAY, max_date) + 1))
        THEN 'Transactional Date (Wk)'
      WHEN value_ct > 20 AND distinct_value_ct > 3
           AND (date_months_present = NULLIF({mo}, 0)::DOUBLE + 1
                OR date_months_present >= 5 * ({yr} + 1)
                OR ROUND(distinct_value_ct * {recent})
                   >= 5 * (date_diff('year', {rd} - INTERVAL 1825 DAY, max_date) + 1))
        THEN 'Transactional Date (Mo)'
      WHEN value_ct > 10 AND distinct_value_ct > 1
           AND distinct_value_ct = {qtr} + 1 THEN 'Transactional Date (Qtr)'
      ELSE 'Date (TBD)' END
    WHEN column_type = 'date' THEN 'Date Stamp'
    WHEN column_type IN ('timestamp', 'timestamp_ntz') THEN 'DateTime Stamp'
    END"""


def _inference_ctes(
    tables: list[tuple[str, list[tuple[str, str, str, bool]]]],
    run_date: str,
    id_mask: str = "%id",
    sk_mask: str = "%_sk",
    pre_ctes: list[tuple[str, str]] | None = None,
) -> str:
    """The full profile→inference CTE chain (ending at CTE ``pii``) —
    shared by the functional-types, test-generation, and anomaly oracles.

    ``tables``: [(table, columns)] where columns is
    (name, general_type, column_type, is_decimal) in ordinal order — must
    match Spark's schema scan of the same parquet. Table-level stages
    (functional-table-type census, PII second pass) partition by table_name,
    and the ID-FK layer looks across tables, so several tables can share one
    chain (mirrors multi-table profiling runs in the reference).

    ``pre_ctes``: [(name, sql)] CTEs spliced in BEFORE ``prof`` — lets a
    caller profile a derived relation (e.g. a table with a computed
    column) that the profile selects then read by name.
    """
    selects = "\nUNION ALL\n".join(
        _profile_select(table, name, i + 1, gt, ct, dec, run_date)
        for table, columns in tables
        for i, (name, gt, ct, dec) in enumerate(columns)
    )
    vf = "NULLIF(value_ct::DOUBLE, 0)"
    rf = "NULLIF(record_ct::DOUBLE, 0)"
    scale = "TRY_CAST(regexp_extract(column_type, ',\\s*(\\d+)\\s*\\)', 1) AS INT)"
    charcount_a = "(LENGTH(COALESCE(top_patterns,'')) - LENGTH(REPLACE(COALESCE(top_patterns,''), 'A', '')))"
    charcount_n = "(LENGTH(COALESCE(top_patterns,'')) - LENGTH(REPLACE(COALESCE(top_patterns,''), 'N', '')))"
    max_text_spaces = "(LENGTH(max_text) - LENGTH(REPLACE(max_text, ' ', '')))"
    pct_pat = r"^N{1,3}(\.N+)?%$"

    pre = "".join(f"{name} AS MATERIALIZED ({sql}),\n"
                  for name, sql in (pre_ctes or []))
    return f"""
WITH {pre}prof AS ({selects}),
s AS (
  SELECT *,
         {_std_pattern_case()} AS std_pattern_match,
         CASE WHEN p1 IS NOT NULL THEN
           concat_ws(' | ', p1 || ':' || pc1, p2 || ':' || pc2,
                     p3 || ':' || pc3, p4 || ':' || pc4, p5 || ':' || pc5)
         END AS top_patterns
  FROM prof),
sugg AS (
  SELECT *, {_suggestion_case()} AS datatype_suggestion FROM s),
l1 AS (
  SELECT *, COALESCE(
    CASE WHEN record_ct = 0 OR (record_ct > 0 AND (value_ct < 5
              OR zero_length_ct / {vf} = 1)) THEN 'TBD (Not enough data)' END,
    CASE WHEN distinct_value_ct = 1
              AND 100.0 * (value_ct - COALESCE(filled_value_ct, 0)
                           - COALESCE(zero_length_ct, 0)) / record_ct > 75
         THEN 'Constant' END,
    CASE WHEN lower(column_name) LIKE '{sk_mask}' THEN 'ID-SK' END,
    CASE WHEN lower(column_name) LIKE '{id_mask}' THEN 'ID' END,
    CASE WHEN general_type = 'D' OR (value_ct = date_ct + COALESCE(zero_length_ct, 0)
              AND value_ct > 0) THEN {_date_case_sql(run_date)} END,
    CASE WHEN distinct_pattern_ct = 1 AND min_text >= '1900' AND max_text <= '2200'
              AND TRIM(p1) = 'NNNN-NN-NN' THEN 'Date Stamp' END,
    CASE WHEN distinct_pattern_ct = 1
              AND TRIM(p1) IN ('NNNN-NN-NN NN:NN:NN', 'NNNN-NN-NNANN:NN:NN+NN:NN')
         THEN 'DateTime Stamp' END
  ) AS fdt FROM sugg),
l2 AS (
  SELECT * REPLACE (
    CASE WHEN general_type IN ('A','D')
              AND (regexp_matches(column_name, '{_PROCESS_TS_RE1}')
                   OR regexp_matches(column_name, '{_PROCESS_TS_RE2}'))
              AND fdt IS NOT NULL
         THEN 'Process ' || fdt ELSE fdt END AS fdt) FROM l1),
l3 AS (
  SELECT * REPLACE (COALESCE(fdt,
    CASE WHEN (lower(column_name) LIKE '%year%' OR lower(column_name) LIKE '%yr%')
              AND ((min_value >= 1900 AND max_value <= YEAR(DATE '{run_date}') + 20
                    AND COALESCE(fractional_sum, 0) = 0)
                   OR (min_text >= '1900'
                       AND max_text <= (YEAR(DATE '{run_date}') + 20)::VARCHAR
                       AND avg_length = 4 AND avg_embedded_spaces = 0))
         THEN 'Period Year' END,
    CASE WHEN (lower(column_name) LIKE '%qtr%' OR lower(column_name) LIKE '%quarter%')
              AND ((min_value = 1 AND max_value = 4 AND COALESCE(fractional_sum, 0) = 0)
                   OR (min_text >= '1900' AND max_text <= '2200'
                       AND avg_length BETWEEN 6 AND 7
                       AND regexp_matches(p1, '^\\s*NNNN[-_]AN\\s*$')))
         THEN 'Period Quarter' END,
    CASE WHEN lower(column_name) LIKE '%mo%'
              AND min_text >= '1900' AND max_text <= '2200'
              AND ((avg_length BETWEEN 6.8 AND 7.2
                    AND regexp_matches(p1, '^\\s*NNNN[-_]NN\\s*$'))
                   OR (avg_length BETWEEN 7.8 AND 8.2
                       AND regexp_matches(UPPER(p1), '^\\s*NNNN[-_]AAA\\s*$')))
         THEN 'Period Year-Mon' END,
    CASE WHEN lower(column_name) LIKE '%mo%'
              AND ((max_length = 2 AND min_text IN ('01','1') AND max_text = '12')
                   OR (min_value = 1 AND max_value = 12
                       AND COALESCE(SIGN(fractional_sum), 0) = 0)
                   OR (max_length = 9 AND lower(min_text) = 'april'
                       AND lower(max_text) = 'september')
                   OR (max_length = 3 AND lower(min_text) = 'apr'
                       AND lower(max_text) = 'sep'))
         THEN 'Period Month' END,
    CASE WHEN regexp_matches(min_text, '{_MON_NN_RE}')
              AND regexp_matches(max_text, '{_MON_NN_RE}')
              AND avg_length BETWEEN 5.8 AND 6.2
              AND regexp_matches(TRIM(p1), '(?i)AAA[\\s-]NN')
         THEN 'Period Mon-NN' END,
    CASE WHEN (lower(column_name) LIKE '%wk%' OR lower(column_name) LIKE '%week%')
              AND distinct_value_ct BETWEEN 10 AND 53
              AND ((min_text IN ('1','01') AND max_text IN ('52','53'))
                   OR (min_value = 1 AND max_value IN (52, 53)
                       AND COALESCE(SIGN(fractional_sum), 0) = 0))
         THEN 'Period Week' END,
    CASE WHEN (lower(column_name) LIKE '%day%' OR lower(column_name) LIKE '%dow%')
              AND distinct_value_ct = 7
              AND ((min_text = '1' AND max_text = '7')
                   OR (min_value = 1 AND max_value = 7
                       AND COALESCE(SIGN(fractional_sum), 0) = 0)
                   OR (lower(min_text) = 'friday' AND lower(max_text) = 'wednesday'
                       AND max_length = 9)
                   OR (lower(min_text) = 'fri' AND lower(max_text) = 'wed'
                       AND max_length = 3))
         THEN 'Period DOW' END
  ) AS fdt) FROM l2),
l4 AS (
  SELECT * REPLACE (CASE
    WHEN ((DAY(min_date) = 1 AND DAY(max_date) = 1)
          OR (CAST(min_date AS DATE) = last_day(CAST(min_date AS DATE))
              AND CAST(max_date AS DATE) = last_day(CAST(max_date AS DATE))))
         AND date_months_present = date_days_present
         AND date_months_present >= 12 THEN 'Period Month'
    WHEN dayofweek(min_date) IN (0, 1, 5, 6)
         AND dayofweek(min_date) = dayofweek(max_date)
         AND date_months_present < date_days_present
         AND date_weeks_present = date_days_present
         AND date_weeks_present > 25 THEN 'Period Week'
    WHEN lower(column_name) = 'month' THEN 'Period Month'
    WHEN lower(column_name) = 'week' THEN 'Period Week'
    WHEN lower(column_name) = 'period' AND fdt IS NOT NULL
         AND NOT lower(fdt) LIKE 'period%' THEN 'Period'
    ELSE fdt END AS fdt) FROM l3),
l5 AS (
  SELECT * REPLACE (COALESCE(fdt, CASE
    WHEN (std_pattern_match = 'ZIP_USA'
          AND (lower(column_name) LIKE '%zip%' OR lower(column_name) LIKE '%postal%'))
         OR lower(column_name) IN ('zip_code', 'zip') THEN 'Zip'
    WHEN std_pattern_match = 'EMAIL' THEN 'Email'
    WHEN (lower(column_name) LIKE '%phone%' AND max_length BETWEEN 7 AND 11)
         OR std_pattern_match = 'PHONE_USA' THEN 'Phone'
    WHEN (lower(column_name) LIKE '%address' AND NOT lower(column_name) LIKE '%email%')
         OR std_pattern_match = 'STREET_ADDR' THEN 'Address'
    WHEN std_pattern_match = 'STATE_USA' THEN 'State'
    END) AS fdt) FROM l4),
l6 AS (
  SELECT * REPLACE (
    CASE
      WHEN regexp_matches(column_name, '{_PROCESS_USER_RE}') THEN 'Process User'
      WHEN regexp_matches(column_name, '{_SYSTEM_USER_RE}') THEN 'System User'
      ELSE COALESCE(
        CASE
          WHEN avg_length <= 8 AND avg_embedded_spaces < 0.2
               AND (regexp_matches(lower(column_name), 'f(i)?rst(_| |)n(a)?m')
                    OR regexp_matches(lower(column_name), '(middle|mdl)(_| |)n(a)?m')
                    OR regexp_matches(lower(column_name), 'nick(_| |)n(a)?m'))
            THEN 'Person Given Name'
          WHEN avg_length BETWEEN 5 AND 8 AND avg_embedded_spaces < 0.2
               AND (regexp_matches(lower(column_name), 'l(a)?st(_| |)n(a)?m')
                    OR regexp_matches(lower(column_name), 'maiden(_| |)n(a)?m')
                    OR regexp_matches(lower(column_name), 'sur(_| |)n(a)?m'))
            THEN 'Person Last Name'
          ELSE COALESCE(fdt,
            CASE WHEN avg_length <= 20 AND avg_embedded_spaces BETWEEN 0.9 AND 2.0
                      AND (regexp_matches(column_name, '{_FULL_NAME_RE}')
                           OR column_name IN ('name', 'nm'))
                 THEN 'Person Full Name' END)
        END,
        CASE WHEN general_type = 'A'
                  AND regexp_matches(column_name, '{_ENTITY_NAME_RE}')
             THEN 'Entity Name' END)
    END AS fdt) FROM l5),
l7 AS (
  SELECT * REPLACE (COALESCE(fdt,
    CASE WHEN general_type = 'B'
              OR (distinct_value_ct = 2
                  AND ((lower(min_text) = 'no' AND lower(max_text) = 'yes')
                       OR (lower(min_text) = 'n' AND lower(max_text) = 'y')
                       OR (lower(min_text) = 'false' AND lower(max_text) = 'true')
                       OR (lower(min_text) = '0' AND lower(max_text) = '1')
                       OR (min_value = 0 AND max_value = 1
                           AND NOT lower(column_type) LIKE '%numeric%'
                           AND NOT lower(column_type) LIKE '%decimal%')))
              OR (distinct_value_ct = 1
                  AND ((lower(min_text) IN ('no','yes') AND lower(max_text) IN ('no','yes'))
                       OR (lower(min_text) IN ('n','y') AND lower(max_text) IN ('n','y'))
                       OR (lower(min_text) IN ('false','true') AND lower(max_text) IN ('f','t'))
                       OR (lower(min_text) IN ('0','1') AND lower(max_text) IN ('0','1'))
                       OR (min_value = 0 AND max_value = 1
                           AND NOT lower(column_type) LIKE '%numeric%'
                           AND NOT lower(column_type) LIKE '%decimal%')))
         THEN 'Boolean' END,
    CASE WHEN general_type = 'A'
              AND (lower(datatype_suggestion) LIKE '%varchar%'
                   OR datatype_suggestion = 'string') THEN
      CASE
        WHEN (regexp_matches(lower(column_name), '_(average|avg|count|ct|sum|total|tot)$')
              OR regexp_matches(lower(column_name), '^(average|avg|count|ct|sum|total|tot)_'))
             AND numeric_ct = value_ct AND value_ct > 1 THEN 'Measurement Text'
        WHEN includes_digit_ct > 0
             AND ((max_length <= 20 AND avg_embedded_spaces < 0.1
                   AND value_ct / {rf} > 0.8
                   AND distinct_value_ct / {vf} > 0.95)
                  OR (avg_embedded_spaces < 0.1
                      AND (ROUND(max_length - avg_length) <= 1
                           OR ROUND(avg_length - min_length) <= 1)))
          THEN CASE WHEN distinct_value_ct > 200 THEN 'ID'
                    WHEN distinct_value_ct <= 200 AND avg_embedded_spaces < 1 THEN 'Code'
               END
        WHEN distinct_value_ct > 200
          THEN CASE WHEN max_length - ROUND(avg_length) > 1
                         AND ROUND(avg_length) - min_length > 1
                    THEN CASE WHEN avg_embedded_spaces BETWEEN 0 AND 3
                                   AND max_length <= 30 AND {max_text_spaces} < 5
                              THEN 'Attribute' ELSE 'Description' END
               END
        WHEN distinct_value_ct BETWEEN 2 AND 200
          THEN CASE WHEN (avg_embedded_spaces < 1 AND max_length < 15)
                         OR ({charcount_a} > 0 AND {charcount_n} > 0)
                    THEN 'Code' ELSE 'Category' END
      END END,
    CASE WHEN general_type = 'A' AND distinct_value_ct BETWEEN 3 AND 5
              AND (NOT lower(column_type) LIKE '%numeric%'
                   OR NOT lower(datatype_suggestion) LIKE '%numeric%')
              AND min_length > 1 AND max_length <= 7
              AND {charcount_a} > 0 THEN 'Flag' END,
    CASE
      WHEN (max_value - min_value + 1 = distinct_value_ct)
           AND (fractional_sum IS NULL OR fractional_sum > 0) THEN 'Sequence'
      WHEN general_type = 'N'
           AND regexp_matches(lower(column_name), '(no|num|number|nbr)$')
           AND (lower(column_type) LIKE '%int%'
                OR ({scale} > 0 AND fractional_sum = 0))
        THEN CASE WHEN ROUND(100.0 * value_ct / {rf}) > 70
                  THEN 'ID' ELSE 'Attribute-Numeric' END
      WHEN general_type = 'N'
           AND ((percentile_25 = 0 AND percentile_50 = 0 AND percentile_75 = 0)
                OR (value_ct > 0 AND record_ct > 0
                    AND value_ct::DOUBLE / record_ct < 0.05))
           AND ((percentile_75 - percentile_25) > 2 * ABS(avg_value)
                OR ABS(avg_value) > 5 * ABS(percentile_50)) THEN 'Measurement Spike'
      WHEN general_type = 'N'
           AND (lower(column_type) LIKE '%int%' OR {scale} = 0
                OR ({scale} > 0 AND fractional_sum = 0)) THEN 'Measurement Discrete'
      WHEN general_type = 'N' AND distinct_value_ct > 1 AND min_value < 0
        THEN 'Measurement'
      WHEN general_type = 'N' AND distinct_value_ct > 1 AND min_value >= 0
           AND stdev_value / NULLIF(avg_value, 0) >= 0.10 THEN 'Measurement'
      ELSE 'UNKNOWN' END
  ) AS fdt) FROM l6),
l8 AS (
  SELECT * REPLACE (
    CASE WHEN fdt = 'ID' THEN
      CASE WHEN ROUND(100.0 * value_ct / {rf}) > 70
                AND ROUND(100.0 * distinct_value_ct / {vf}) >= 75 THEN 'ID-Secondary'
           WHEN ROUND(100.0 * value_ct / {rf}) > 70
                AND ROUND(100.0 * distinct_value_ct / {vf}) < 75 THEN 'ID-Group'
           ELSE 'ID' END
    ELSE fdt END AS fdt) FROM l7),
l9 AS MATERIALIZED (
  SELECT * REPLACE (
    CASE WHEN fdt IN ('ID', 'ID-Secondary') AND record_ct = distinct_value_ct
              AND record_ct > 50 THEN 'ID-Unique'
         WHEN fdt = 'ID-SK' AND record_ct = distinct_value_ct
              AND record_ct > 50 THEN 'ID-Unique-SK'
         ELSE fdt END AS fdt) FROM l8),
-- ID-FK: same column name is ID-Unique[-SK] in a DIFFERENT table
l9f AS (
  SELECT l9.* REPLACE (
    CASE WHEN uf.ut IS NOT NULL
              AND len(list_filter(uf.ut, t -> t <> l9.table_name)) > 0
              AND l9.fdt NOT IN ('ID-Unique', 'ID-Unique-SK')
         THEN 'ID-FK' ELSE l9.fdt END AS fdt)
  FROM l9 LEFT JOIN (
    SELECT column_name, list(DISTINCT table_name) AS ut
    FROM l9 WHERE fdt IN ('ID-Unique', 'ID-Unique-SK') GROUP BY 1) uf
  USING (column_name)),
l10 AS (
  SELECT * REPLACE (
    CASE WHEN fdt IN ('Measurement', 'Measurement Discrete', 'UNKNOWN')
              AND general_type = 'N' AND min_value >= -200 AND max_value <= 200
              AND (lower(column_name) LIKE '%pct%'
                   OR lower(column_name) LIKE '%percent%') THEN 'Measurement Pct'
         WHEN fdt = 'Code' AND distinct_pattern_ct BETWEEN 1 AND 3
              AND value_ct = includes_digit_ct
              AND min_text >= '0' AND max_text <= '99'
              AND regexp_matches(TRIM(p1), '{pct_pat}')
              AND (regexp_matches(TRIM(COALESCE(p2, '')), '{pct_pat}')
                   OR distinct_pattern_ct < 2)
              AND (regexp_matches(TRIM(COALESCE(p3, '')), '{pct_pat}')
                   OR distinct_pattern_ct < 3) THEN 'Measurement Pct'
         ELSE fdt END AS fdt) FROM l9f),
census AS (
  -- functional_tabletype_stage.sql:1-19 SELECTs DISTINCT over
  -- (..., record_ct, functional_data_type): same-typed columns collapse, so
  -- the census counts distinct TYPE VALUES per table, not columns.
  SELECT table_name,
    COUNT(CASE WHEN lower(fdt) LIKE 'id%' OR fdt = 'Category' THEN 1 END) AS n_id_cat,
    COUNT(CASE WHEN lower(fdt) LIKE 'period%' THEN 1 END) AS n_period,
    COUNT(CASE WHEN lower(fdt) LIKE 'measure%' THEN 1 END) AS n_measure,
    COUNT(CASE WHEN fdt <> 'Constant' THEN 1 END) AS n_nonconst,
    COUNT(CASE WHEN lower(fdt) LIKE '%transactional date%' THEN 1 END) AS n_txn_date,
    COUNT(CASE WHEN fdt IN ('Entity Name', 'Person Last Name', 'Person Given Name',
                            'Person Full Name') THEN 1 END) AS n_names,
    COUNT(CASE WHEN fdt IN ('Address', 'City', 'State') THEN 1 END) AS n_addr,
    COUNT(CASE WHEN fdt IN ('ID-Unique', 'ID-Unique-SK', 'ID-Secondary') THEN 1 END) AS n_uids,
    COUNT(CASE WHEN fdt IN ('Attribute', 'Description') THEN 1 END) AS n_attr
  FROM (SELECT DISTINCT table_name, fdt FROM l10) GROUP BY table_name),
typed AS (
  SELECT l10.*, 'cumulative-' || CASE
    WHEN n_id_cat > 0 AND ((n_period > 0 AND n_measure > 0)
         OR n_measure::DOUBLE / NULLIF(n_nonconst::DOUBLE, 0) > 0.4) THEN 'summary'
    WHEN n_measure > 0 AND n_txn_date > 0 THEN 'transaction'
    WHEN n_names > 0 AND n_addr > 1 THEN 'entity'
    WHEN n_uids > 1 AND n_attr <= 1 AND n_measure <= 1 THEN 'bridge'
    ELSE 'domain' END AS functional_table_type
  FROM l10 JOIN census USING (table_name)),
pii1 AS (
  SELECT *, CASE WHEN general_type = 'A' THEN CASE
    WHEN fdt IN ('Person Full Name', 'Person Given Name', 'Person Last Name')
      THEN 'B/NAME/Individual'
    WHEN regexp_matches(lower(column_name), '(maiden|surname)') THEN 'B/NAME/Individual'
    WHEN fdt = 'Historical Date'
         AND regexp_matches(lower(column_name), '(dob|birth)') THEN 'B/DEMO/Birthdate'
    WHEN regexp_matches(lower(column_name),
                        '(nationality|race|ethnicity|gender|sex|marital)')
      THEN 'B/DEMO/Demographic'
    WHEN lower(column_name) LIKE '%med%record%' THEN 'A/DEMO/Medical'
    WHEN regexp_matches(lower(column_name), '(password|pwd|auth)') THEN 'A/ID/Security'
    WHEN max_length < 10 AND avg_embedded_spaces < 0.1
         AND (lower(column_name) LIKE 'pin%' OR lower(column_name) LIKE '%pin')
      THEN 'A/ID/Security'
    WHEN std_pattern_match = 'SSN'
         AND regexp_matches(lower(column_name), '(ss|soc|sec)') THEN 'A/ID/SSN'
    WHEN TRIM(p1) IN ('NNNNNNNNN', 'NNN-NN-NNNN', 'NNN NN NNNN')
         AND LEFT(min_text, 1) = '9' AND avg_length BETWEEN 8.8 AND 11.2
         AND regexp_matches(lower(column_name), '(tax|tin|fed)') THEN 'A/ID/Tax'
    WHEN TRIM(p1) IN ('NNNNNNNNN', 'ANNNNNNNN') AND avg_length BETWEEN 8.8 AND 9.2
         AND regexp_matches(lower(column_name), '(passp|pp)') THEN 'A/ID/Passport'
    WHEN std_pattern_match = 'CREDIT_CARD'
         AND regexp_matches(lower(column_name), '(credit|card|cc|acct|account)')
      THEN 'A/ID/Credit'
    WHEN regexp_matches(TRIM(COALESCE(p1,'')), '(?i)^[A-Za-z]{{6}}[A-Za-z0-9]{{2}}N{{0,3}}$')
         AND regexp_matches(TRIM(COALESCE(p2,'')), '(?i)^[A-Za-z]{{6}}[A-Za-z0-9]{{2}}N{{0,3}}$')
         AND avg_length BETWEEN 7.8 AND 11.2
         AND regexp_matches(lower(column_name), '(swift|bic)') THEN 'A/ID/Bank'
    WHEN max_length <= 34 AND UPPER(LEFT(TRIM(p1), 2)) = 'AA'
         AND (lower(column_name) LIKE 'iban%' OR lower(column_name) LIKE '%iban')
      THEN 'A/ID/Bank'
    WHEN avg_length BETWEEN 5 AND 20
         AND regexp_matches(lower(column_name), '(bank|checking|saving|debit)')
      THEN 'A/ID/Bank'
    WHEN avg_embedded_spaces < 0.5 AND avg_length < 20
         AND (regexp_matches(lower(column_name), '(dr|op).*lic')
              OR regexp_matches(lower(column_name), '(driver|license|operator)'))
      THEN 'A/ID/License'
    WHEN lower(column_name) IN ('patient_id', 'pat_id') THEN 'A/ID/Medical'
    WHEN lower(column_name) = 'member_id' THEN 'B/ID/Commercial'
    END END AS pii_a
  FROM typed),
pii AS MATERIALIZED (
  SELECT *,
    COALESCE(pii_a,
      CASE WHEN general_type = 'A'
                AND COUNT(pii_a) OVER (PARTITION BY table_name) > 1 THEN CASE
        WHEN fdt = 'Email' THEN 'B/CONTACT/Email'
        WHEN fdt IN ('Address', 'City', 'State', 'Zip') THEN 'B/CONTACT/Address'
        WHEN fdt = 'Phone' THEN 'B/CONTACT/Phone'
        WHEN regexp_matches(lower(column_name), '(insur|health|med|patient)')
          THEN 'A/DEMO/Medical'
        WHEN regexp_matches(lower(column_name), '(vehicle|vin|auto|car)')
             AND avg_length BETWEEN 16 AND 18 AND max_length < 20
             AND TRIM(p1) = 'AAANAAAAANNNNNNNN' THEN 'B/ID/Auto'
        WHEN regexp_matches(lower(column_name),
                            '(voice|fingerprint|retina|auth|biometric|iris|face_recog)')
          THEN 'A/ID/Security'
        WHEN lower(column_name) = 'dna' OR lower(column_name) LIKE '%\\_dna' ESCAPE '\\'
             OR lower(column_name) LIKE 'dna\\_%' ESCAPE '\\' THEN 'A/DEMO/Demographic'
        WHEN lower(column_name) LIKE '%rout%' AND avg_length BETWEEN 8.8 AND 11.2
             AND TRIM(p1) IN ('NNNNNNNNN', 'NNNN-NNNN-N') THEN 'C/ID/Bank'
        WHEN regexp_matches(lower(column_name), '(salary|income|wage)')
          THEN 'B/DEMO/Financial'
        WHEN regexp_matches(lower(column_name), '(user_id|userid)') THEN 'C/ID/Security'
        END END) AS pii_flag
  FROM pii1)"""


def fk_discovery_sql(
    tables: list[tuple[str, list[tuple[str, str, str, bool]]]],
    cand: list[tuple[str, str]],
    run_date: str,
    min_containment: float = 0.99,
) -> str:
    """Inclusion-dependency discovery oracle — the SQL mirror of
    inference/fk_discovery.py:fk_discovery. Candidate (child, parent)
    pairs are generated statically over ``cand``; the runtime pruning the
    Spark side reads from the inferred profile (parent unique non-null,
    matching general_type, distinct and [min,max] containment — NULL
    bounds conservative-keep) is the EXISTS probe into ``pii``, so both
    engines qualify identical pairs. Verification per pair: the child's
    distinct dictionary marked by EXISTS against the parent — exact
    integer counts, ratio rounded 5dp. Valid while the Spark side's
    max_candidates cap is not hit (the seat keeps the static pair count
    far below it)."""
    ctes = _inference_ctes(tables, run_date)
    bounds_n = ("(p.min_value IS NULL OR q.min_value IS NULL"
                " OR p.max_value IS NULL OR q.max_value IS NULL"
                " OR (p.min_value >= q.min_value"
                " AND p.max_value <= q.max_value))")
    bounds_a = ("(p.min_text IS NULL OR q.min_text IS NULL"
                " OR p.max_text IS NULL OR q.max_text IS NULL"
                " OR (p.min_text >= q.min_text"
                " AND p.max_text <= q.max_text))")
    selects = []
    for ct, cc in cand:
        for pt, pc in cand:
            if (ct, cc) == (pt, pc):
                continue
            exists = f"""EXISTS (SELECT 1 FROM pii p, pii q
  WHERE p.table_name = '{ct}' AND p.column_name = '{cc}'
    AND q.table_name = '{pt}' AND q.column_name = '{pc}'
    AND q.record_ct > 0 AND q.value_ct = q.record_ct
    AND q.distinct_value_ct = q.value_ct
    AND q.general_type IN ('N', 'A')
    AND p.general_type = q.general_type
    AND p.distinct_value_ct >= 1
    AND p.distinct_value_ct <= q.distinct_value_ct
    AND ((p.general_type = 'N' AND {bounds_n})
      OR (p.general_type = 'A' AND {bounds_a})))"""
            selects.append(f"""
SELECT '{ct}' AS child_table, '{cc}' AS child_column,
       '{pt}' AS parent_table, '{pc}' AS parent_column,
       child_distinct, matched,
       ROUND(matched::DOUBLE / NULLIF(child_distinct::DOUBLE, 0), 5)
         + 0.0::DOUBLE AS containment,
       COALESCE(matched::DOUBLE / NULLIF(child_distinct::DOUBLE, 0)
                >= {min_containment!r}::DOUBLE, FALSE) AS flagged
FROM (SELECT COUNT(*)::BIGINT AS child_distinct,
             COUNT(CASE WHEN EXISTS (SELECT 1 FROM {pt}
                                     WHERE {pc} = c.v) THEN 1 END)::BIGINT
               AS matched
      FROM (SELECT DISTINCT {cc} AS v FROM {ct}
            WHERE {cc} IS NOT NULL) c)
WHERE {exists}""")
    return ctes + "\nUNION ALL\n".join(selects)


def functional_types_sql(
    table: str,
    columns: list[tuple[str, str, str, bool]],
    run_date: str,
    id_mask: str = "%id",
    sk_mask: str = "%_sk",
) -> str:
    """Full inference oracle for one table (see _inference_ctes)."""
    rf = "NULLIF(record_ct::DOUBLE, 0)"
    ctes = _inference_ctes([(table, columns)], run_date, id_mask, sk_mask)
    return f"""{ctes}
SELECT column_name, general_type, datatype_suggestion,
       fdt AS functional_data_type, functional_table_type, pii_flag,
       COALESCE(
         ROUND(100.0 * (value_ct - COALESCE(zero_length_ct, 0)
                        - COALESCE(filled_value_ct, 0)) / {rf}, 0) > 75
         AND ((lower(functional_table_type) LIKE '%entity'
               AND fdt IN ('Entity Name','City','State','Zip','Code','Category'))
              OR (lower(functional_table_type) LIKE '%domain'
                  AND fdt IN ('Category','Code'))
              OR (lower(functional_table_type) LIKE '%summary'
                  AND (fdt = 'Category' OR lower(fdt) LIKE 'period%'
                       OR lower(fdt) LIKE 'measurement%'))
              OR (lower(functional_table_type) LIKE '%transaction'
                  AND (fdt = 'Category' OR lower(fdt) LIKE 'transactional date%'
                       OR lower(fdt) LIKE 'measurement%'))),
         FALSE) AS critical_data_element
FROM pii"""


def _selection_criteria_sql(run_date: str) -> dict[str, str]:
    """The SQL mirror of generation/selection.py's selection criteria —
    shared by the test-keys and test-params oracles."""
    rf = "NULLIF(record_ct::DOUBLE, 0)"
    vf = "NULLIF(value_ct::DOUBLE, 0)"
    rd = f"DATE '{run_date}'"
    day_span = "date_diff('day', CAST(min_date AS DATE), CAST(max_date AS DATE))"
    mo_span = "date_diff('month', min_date, max_date)"
    wk_span = "date_diff('week', min_date, max_date)"
    measure_numeric = (
        "general_type = 'N' AND distinct_value_ct > 10"
        " AND lower(fdt) LIKE 'measure%' AND fdt <> 'Measurement Spike'"
        " AND NOT lower(column_name) LIKE '%latitude%'"
        " AND NOT lower(column_name) LIKE '%longitude%'"
    )
    one_pattern = "(p2 IS NULL AND REPLACE(p1, 'N', '') > '')"
    no_overlap_alpha = (
        "(distinct_value_ct NOT BETWEEN 2 AND 10"
        " AND fdt NOT IN ('Constant','Boolean')"
        f" AND NOT {one_pattern})"
    )
    txn_cumulative = (
        "lower(fdt) LIKE 'transactional date%' AND date_days_present > 1"
        " AND lower(functional_table_type) LIKE '%cumulative%'"
    )
    future_ok = f"future_date_ct::DOUBLE / {vf} <= 0.75"
    variability = (
        f"{measure_numeric} AND value_ct <> distinct_value_ct"
        " AND distinct_value_ct > 10 AND stdev_value > 0"
        " AND avg_value IS NOT NULL"
        " AND NOT (distinct_value_ct = max_value - min_value + 1"
        " AND distinct_value_ct > 2)"
    )
    outlier = (
        "fdt = 'Measurement' AND distinct_value_ct > 30"
        " AND NOT distinct_value_ct = max_value - min_value + 1"
        f" AND distinct_value_ct::DOUBLE/{vf} > 0.1"
        " AND stdev_value / avg_value > 0.01"
        " AND NOT lower(column_name) LIKE '%latitude%'"
        " AND NOT lower(column_name) LIKE '%longitude%'"
    )
    criteria: dict[str, str] = {
        "Alpha_Trunc": (
            "general_type = 'A' AND max_length > 0"
            " AND ((min_length = avg_length AND max_length = avg_length)"
            " OR numeric_ct <> value_ct)"
            " AND NOT lower(functional_table_type) LIKE '%window%'"
            f" AND {no_overlap_alpha}"),
        "Avg_Shift": measure_numeric,
        "Daily_Record_Ct": (
            "general_type = 'D' AND date_days_present > 21"
            f" AND date_days_present - ({day_span} + 1) = 0 AND {future_ok}"),
        "Dec_Trunc": ("fractional_sum > 0"
                      " AND lower(functional_table_type) LIKE '%cumulative%'"),
        "Distinct_Date_Ct": txn_cumulative,
        "Distinct_Value_Ct": (
            "distinct_value_ct BETWEEN 2 AND 10 AND value_ct > 50"
            " AND fdt IN ('Code','Category','Attribute','Description')"
            " AND NOT COALESCE(top_freq_values, '') > ''"),
        "Email_Format": "std_pattern_match = 'EMAIL'",
        "Future_Date": "general_type = 'D' AND future_date_ct = 0",
        "Future_Date_1Y": (
            "general_type = 'D' AND future_date_ct > 0"
            f" AND CAST(max_date AS DATE) <= {rd} + INTERVAL 365 DAY"),
        "Incr_Avg_Shift": measure_numeric,
        "LOV_Match": (
            "fdt IN ('Boolean','Code','Category') AND top_freq_values > ''"
            " AND distinct_value_ct BETWEEN 2 AND 10 AND value_ct > 5"),
        "Min_Date": ("general_type = 'D' AND min_date IS NOT NULL"
                     " AND distinct_value_ct > 1"),
        "Min_Val": (
            "general_type = 'N' AND lower(fdt) LIKE 'measure%'"
            " AND min_value IS NOT NULL"
            " AND (distinct_value_ct >= 2 OR (distinct_value_ct = 2"
            " AND min_value <> 0 AND max_value <> 1))"),
        "Missing_Pct": "record_ct <> value_ct",
        "Monthly_Rec_Ct": (
            f"{txn_cumulative} AND date_months_present > 2"
            f" AND date_months_present - ({mo_span} + 1) = 0 AND {future_ok}"),
        "Outlier_Pct_Above": outlier,
        "Outlier_Pct_Below": outlier,
        "Pattern_Match": (
            "(fdt IN ('Attribute','DateTime Stamp','Phone')"
            " OR lower(fdt) LIKE 'id%' OR lower(fdt) LIKE 'period%')"
            f" AND {one_pattern} AND distinct_value_ct > 10"),
        "Recency": (
            f"general_type = 'D' AND CAST(max_date AS DATE) <= {rd}"
            " AND NOT column_name IN ('filedate','file_date')"
            " AND NOT fdt IN ('Future Date','Schedule Date')"
            f" AND date_diff('day', CAST(max_date AS DATE), {rd}) <= 62"),
        "Required": "record_ct = value_ct AND record_ct > 10",
        "Street_Addr_Pattern": (
            "std_pattern_match = 'STREET_ADDR'"
            " AND avg_length <> ROUND(avg_length)"
            " AND avg_embedded_spaces BETWEEN 2 AND 6 AND avg_length < 35"),
        "US_State": (
            "general_type = 'A' AND lower(column_name) LIKE '%state%'"
            " AND distinct_value_ct < 70 AND max_length = 2"),
        "Unique": ("record_ct > 500 AND record_ct = distinct_value_ct"
                   " AND value_ct > 0"),
        "Unique_Pct": ("distinct_value_ct > 10"
                       " AND NOT lower(fdt) LIKE 'measurement%'"),
        "Valid_Characters": "general_type = 'A'",
        "Valid_Month": "fdt = 'Period Month'",
        "Valid_US_Zip": "fdt = 'Zip'",
        "Valid_US_Zip3": "fdt = 'Zip3'",
        "Variability_Increase": variability,
        "Variability_Decrease": variability,
        "Weekly_Rec_Ct": (
            f"{txn_cumulative} AND date_weeks_present > 3"
            f" AND date_weeks_present - ({wk_span} + 1) = 0 AND {future_ok}"),
    }
    return criteria


def generated_test_keys_sql(
    table: str,
    columns: list[tuple[str, str, str, bool]],
    run_date: str,
) -> str:
    """Selection-criteria test generation oracle: one row per
    (test_type, table_name, column_name) whose criteria fire — the SQL
    mirror of generation/selection.py's catalog (params excluded: numeric
    literal formatting differs across engines; param values are pinned by
    tests/test_generation.py instead)."""
    criteria = _selection_criteria_sql(run_date)
    selects = "\nUNION ALL\n".join(
        f"SELECT '{tt}' AS test_type, '{table}' AS table_name, column_name\n"
        f"FROM pii WHERE {cond}"
        for tt, cond in criteria.items()
    )
    ctes = _inference_ctes([(table, columns)], run_date)
    return f"{ctes}\n{selects}"


_FREQ_VALS = ("list_transform(str_split(top_freq_values, ' | '),"
              " x -> lower(regexp_extract(x, '^(.*):[0-9]+$', 1)))")

# anomaly_type -> likelihood (dbsetup_anomaly_types/*.yaml issue_likelihood)
_ANOMALY_LIKELIHOOD = {
    "Benford_Nonconformity": "Possible",
    "Boolean_Value_Mismatch": "Likely",
    "Char_Column_Date_Values": "Likely",
    "Char_Column_Number_Units": "Possible",
    "Char_Column_Number_Values": "Likely",
    "Column_Pattern_Mismatch": "Likely",
    "Delimited_Data_Embedded": "Likely",
    "Inconsistent_Casing": "Definite",
    "Invalid_Zip3_USA": "Definite",
    "Invalid_Zip_USA": "Definite",
    "Leading_Spaces": "Likely",
    "No_Values": "Possible",
    "Non_Alpha_Name_Address": "Definite",
    "Non_Alpha_Prefixed_Name": "Definite",
    "Non_Printing_Chars": "Definite",
    "Non_Standard_Blanks": "Definite",
    "Potential_Duplicates": "Possible",
    "Potential_PII": "Potential PII",
    "Quoted_Values": "Likely",
    "Small Divergent Value Ct": "Possible",
    "Small Missing Value Ct": "Possible",
    "Small_Numeric_Value_Ct": "Likely",
    "Standardized_Value_Matches": "Likely",
    "Suggested_Type": "Likely",
    "Unexpected Emails": "Possible",
    "Unexpected US States": "Possible",
    "Unlikely_Date_Values": "Likely",
}


def _benford_exprs() -> tuple[str, str, str]:
    """(n, chi2, tvd) SQL over the pii CTE's benford_counts list —
    term-by-term mirror of catalog.py's _benford_chi2/_benford_tvd
    (same literals via repr, same left-assoc addition order, so the
    float paths agree to the last ulp)."""
    from dataops_testgen_spark.anomalies.catalog import BENFORD_SHARES

    n = "(" + " + ".join(f"benford_counts[{d}]" for d in range(1, 10)) + ")"
    nd = f"{n}::DOUBLE"
    chi2 = "0.0"
    tvd = "0.0"
    for d, p in enumerate(BENFORD_SHARES, start=1):
        exp = f"({nd} * {p!r})"
        chi2 += (f" + POWER(benford_counts[{d}] - {exp}, 2) / {exp}")
        tvd += f" + ABS(benford_counts[{d}] / {nd} - {p!r})"
    return n, f"({chi2})", f"(({tvd}) * 0.5)"


def _anomaly_prevalence() -> dict[str, str]:
    """dq_prevalence SQL per Column-class rule (prevalence formula × risk,
    mirroring anomalies/catalog.py); rules absent here score NULL."""
    rc = "NULLIF(record_ct::DOUBLE, 0)"
    fc1 = ("TRY_CAST(regexp_extract(str_split(top_freq_values, ' | ')[1],"
           " ':([0-9]+)$', 1) AS BIGINT)")
    mixed_case = "(value_ct - upper_case_ct - lower_case_ct - non_alpha_ct)"
    _bn, _bchi2, _btvd = _benford_exprs()
    return {
        "Benford_Nonconformity": f"{_btvd} * 0.33",
        "Char_Column_Date_Values": f"date_ct / {rc} * 0.66",
        "Char_Column_Number_Values": f"numeric_ct / {rc} * 0.66",
        "Column_Pattern_Mismatch": f"(record_ct - pc1) / {rc} * 0.66",
        "Inconsistent_Casing": f"LEAST({mixed_case}, upper_case_ct) / {rc} * 1.0",
        "Invalid_Zip3_USA": f"(record_ct - pc1) / {rc} * 1.0",
        "Leading_Spaces": f"lead_space_ct / {rc} * 0.66",
        "No_Values": "1.0 * 0.33",
        "Non_Alpha_Name_Address": f"(non_alpha_ct - zero_length_ct) / {rc} * 1.0",
        "Non_Alpha_Prefixed_Name": "0.25 * 1.0",
        "Non_Printing_Chars": f"non_printing_ct / {rc} * 1.0",
        "Non_Standard_Blanks": f"filled_value_ct / {rc} * 1.0",
        "Potential_Duplicates": f"(value_ct - distinct_value_ct) / {rc} * 0.33",
        "Quoted_Values": f"quoted_value_ct / {rc} * 0.66",
        "Small Divergent Value Ct": f"(record_ct - {fc1}) / {rc} * 0.33",
        "Small Missing Value Ct": (
            "(COALESCE(null_value_ct, 0) + COALESCE(filled_value_ct, 0)"
            f" + COALESCE(zero_length_ct, 0)) / {rc} * 0.33"),
        "Small_Numeric_Value_Ct": f"numeric_ct / {rc} * 0.66",
        "Standardized_Value_Matches": (
            "(distinct_value_ct - distinct_std_value_ct)"
            " / NULLIF(value_ct::DOUBLE, 0) * 0.66"),
        "Unlikely_Date_Values": (
            "(COALESCE(before_100yr_date_ct, 0)"
            f" + COALESCE(distant_future_date_ct, 0)) / {rc} * 0.66"),
    }


def _anomaly_criteria(run_date: str) -> dict[str, str]:
    """Column-class anomaly criteria SQL over the ``pii`` CTE (the SQL
    mirror of anomalies/catalog.py's COLUMN_RULES)."""
    vf = "NULLIF(value_ct::DOUBLE, 0)"
    # format accessors over 'value:ct | value:ct' / 'pattern:ct | ...'
    fv1 = "regexp_extract(str_split(top_freq_values, ' | ')[1], '^(.*):[0-9]+$', 1)"
    fc1 = ("TRY_CAST(regexp_extract(str_split(top_freq_values, ' | ')[1],"
           " ':([0-9]+)$', 1) AS BIGINT)")
    pc1 = "pc1"
    pc2 = "pc2"
    freq_vals = _FREQ_VALS
    pat_vals = ("list_transform(str_split(top_patterns, ' | '),"
                " x -> regexp_extract(x, '^(.*):[0-9]+$', 1))")
    mixed_case = "(value_ct - upper_case_ct - lower_case_ct - non_alpha_ct)"
    name_types = ("('Address','City','Entity Name','Person Given Name',"
                  "'Person Last Name','Person Full Name')")
    bool_pair = (
        f"(list_contains({freq_vals}, '{{a}}') AND list_contains({freq_vals}, '{{b}}'))"
    )
    dummy_blanks = ("(filled_value_ct > 0 AND (numeric_ct <> value_ct"
                    " OR fdt IN ('Phone','Zip')))")
    eff_value = (f"(value_ct - COALESCE(zero_length_ct, 0) - CASE WHEN {dummy_blanks}"
                 " THEN COALESCE(filled_value_ct, 0) ELSE 0 END)")

    _bn, _bchi2, _btvd = _benford_exprs()
    criteria: dict[str, str] = {
        "Benford_Nonconformity": (
            "general_type = 'N' AND NOT lower(fdt) LIKE 'id%'"
            " AND NOT lower(fdt) LIKE 'period%'"
            " AND fdt NOT IN ('Sequence','Category','Code')"
            " AND benford_counts IS NOT NULL"
            f" AND {_bn} >= 500"
            " AND max_value / NULLIF(min_value_over_0, 0.0) >= 100.0"
            f" AND {_bchi2} > 20.09"),
        "Boolean_Value_Mismatch": (
            "distinct_value_ct > 1 AND ("
            f"(lower({fv1}) IN ('true','false')"
            f" AND NOT {bool_pair.format(a='true', b='false')})"
            f" OR (lower({fv1}) IN ('yes','no')"
            f" AND NOT {bool_pair.format(a='yes', b='no')}))"),
        "Char_Column_Date_Values": (
            "general_type = 'A' AND value_ct > date_ct"
            " AND date_ct > 0.95 * value_ct"),
        "Char_Column_Number_Units": (
            f"includes_digit_ct::DOUBLE / {vf} > 0.5"
            f" AND regexp_matches(TRIM({fv1}),"
            " '(?i)^[0-9]+(\\.[0-9]+)? ?(%|lb|oz|kg|g|mg|km|m|cm|mm|mi|ft|in)$')"),
        "Char_Column_Number_Values": (
            "general_type = 'A' AND NOT lower(column_name) LIKE '%zip%'"
            " AND NOT lower(fdt) LIKE 'id%' AND NOT lower(fdt) LIKE 'period%'"
            " AND value_ct > numeric_ct AND numeric_ct > 0.95 * value_ct"),
        "Column_Pattern_Mismatch": (
            "general_type = 'A' AND NOT lower(fdt) LIKE 'measurement%'"
            " AND fdt NOT IN ('Category','Code') AND max_length > 3"
            " AND value_ct > (numeric_ct + filled_value_ct + zero_length_ct)"
            " AND distinct_pattern_ct BETWEEN 2 AND 4"
            " AND POSITION('N' IN top_patterns) > 0"
            " AND (((POSITION('A' IN top_patterns) > 0"
            "        OR POSITION('a' IN top_patterns) > 0)"
            f"       AND {pc2}::DOUBLE / {pc1} < 0.05)"
            f"      OR {pc2}::DOUBLE / {pc1} < 0.1)"),
        "Delimited_Data_Embedded": "std_pattern_match = 'DELIMITED_DATA'",
        "Inconsistent_Casing": (
            f"{mixed_case} > 0 AND upper_case_ct > 0 AND fdt IN {name_types}"),
        "Invalid_Zip3_USA": (
            "distinct_pattern_ct > 1 AND (lower(column_name) LIKE '%zip%'"
            " OR lower(column_name) LIKE '%postal%')"
            f" AND TRIM(p1) = 'NNN' AND {pc1}::DOUBLE / {vf} > 0.50"),
        "Invalid_Zip_USA": (
            "fdt = 'Zip' AND (general_type <> 'A' OR filled_value_ct > 0"
            f" OR len(list_filter({pat_vals},"
            " x -> x NOT IN ('NNNNN','NNNNN-NNNN','NNNNNNNNN'))) > 0)"),
        "Leading_Spaces": "lead_space_ct > 0",
        "No_Values": (
            "(COALESCE(null_value_ct, 0) + COALESCE(filled_value_ct, 0)"
            " + COALESCE(zero_length_ct, 0)) = record_ct"),
        "Non_Alpha_Name_Address": (
            f"non_alpha_ct - zero_length_ct > 0 AND fdt IN {name_types}"),
        "Non_Alpha_Prefixed_Name": (
            "min_text < 'A' AND LEFT(min_text, 1) NOT IN ('\"', ' ')"
            " AND RIGHT(min_text, 1) <> ''''"
            " AND fdt IN ('City','Person Given Name','Person Last Name',"
            "'Person Full Name')"),
        "Non_Printing_Chars": "non_printing_ct > 0",
        "Non_Standard_Blanks": (
            f"zero_length_ct > 0 OR {dummy_blanks}"),
        "Potential_Duplicates": (
            f"distinct_value_ct > 1000 AND {fc1} BETWEEN 2 AND 4"),
        "Potential_PII": "pii_flag > ''",
        "Quoted_Values": "quoted_value_ct > 0",
        "Small Divergent Value Ct": (
            "fdt <> 'Boolean'"
            f" AND 100.0 * {fc1}::DOUBLE / {vf} > 97.0"
            f" AND 100.0 * {fc1}::DOUBLE / {vf} < 100.0"),
        "Small Missing Value Ct": (
            f"{eff_value}::DOUBLE / record_ct > 0.97"
            f" AND {eff_value} < record_ct"),
        "Small_Numeric_Value_Ct": (
            "general_type = 'A'"
            f" AND numeric_ct::DOUBLE / {vf} < 0.03 AND numeric_ct > 0"),
        "Standardized_Value_Matches": (
            "general_type = 'A' AND distinct_std_value_ct <> distinct_value_ct"
            " AND NOT fdt LIKE 'Person%Name'"),
        "Suggested_Type": (
            "fdt NOT IN ('Boolean','Flag')"
            " AND (lower(column_type) LIKE '%char%' OR lower(column_type) LIKE 'text'"
            "      OR column_type = 'string')"
            " AND NOT (lower(datatype_suggestion) LIKE '%char%'"
            "          OR lower(datatype_suggestion) LIKE 'text'"
            "          OR datatype_suggestion = 'string')"),
        "Unexpected Emails": (
            "std_pattern_match = 'EMAIL'"
            " AND NOT (lower(column_name) LIKE '%email%'"
            " OR lower(column_name) LIKE '%addr%')"),
        "Unexpected US States": (
            "std_pattern_match = 'STATE_USA' AND distinct_value_ct > 5"
            " AND NOT (lower(column_name) = 'st'"
            " OR lower(column_name) LIKE '%state%'"
            " OR lower(column_name) LIKE '%\\_st' ESCAPE '\\'"
            " OR lower(column_name) LIKE 'st\\_%' ESCAPE '\\')"),
        "Unlikely_Date_Values": (
            "general_type = 'D'"
            " AND (CAST(min_date AS DATE) BETWEEN DATE '0001-01-02'"
            " AND DATE '1900-01-01'"
            f" OR CAST(max_date AS DATE) > DATE '{run_date}' + INTERVAL 360 MONTH)"),
    }
    return criteria


def _variant_codings_values() -> str:
    from dataops_testgen_spark.anomalies.catalog import VARIANT_CODINGS

    return ",\n    ".join(
        "('%s')" % check.replace("'", "''") for _vt, check in VARIANT_CODINGS
    )


def anomaly_screen_sql(
    table: str,
    columns: list[tuple[str, str, str, bool]],
    run_date: str,
) -> str:
    """Single-table anomaly-screening oracle: Column + Dates + Variant
    classes (Multi-Col rules need >1 table with shared column names and
    cannot fire on a single table, on either side). One row per
    (table_name, column_name, anomaly_type); prevalence excluded (validated
    by tests/test_anomalies.py — formula float formatting is pinned there).
    """
    col_selects = "\nUNION ALL\n".join(
        f"SELECT '{table}' AS table_name, column_name,"
        f" '{atype}' AS anomaly_type\nFROM pii WHERE {cond}"
        for atype, cond in _anomaly_criteria(run_date).items()
    )
    dates_recency = f"""
SELECT '{table}' AS table_name,
       CASE WHEN COUNT(column_name) > 2 THEN '(multi-column)'
            ELSE string_agg(column_name, ', ' ORDER BY column_name) END AS column_name,
       CASE WHEN MAX(max_date) < DATE '{run_date}' - INTERVAL 12 MONTH
            THEN 'Recency_One_Year'
            WHEN MAX(max_date) < DATE '{run_date}' - INTERVAL 6 MONTH
            THEN 'Recency_Six_Months' END AS anomaly_type
FROM pii WHERE general_type = 'D'
GROUP BY table_name
HAVING anomaly_type IS NOT NULL"""
    variants = f"""
SELECT '{table}' AS table_name, column_name,
       'Variant_Coded_Values' AS anomaly_type
FROM pii, (VALUES
    {_variant_codings_values()}) AS v(check_values)
WHERE distinct_value_ct <= 20 AND top_freq_values > ''
  AND len(list_intersect({_FREQ_VALS}, str_split(v.check_values, '|'))) > 1
GROUP BY 1, 2"""
    ctes = _inference_ctes([(table, columns)], run_date)
    return f"{ctes}\n{col_selects}\nUNION ALL{dates_recency}\nUNION ALL{variants}"


# SQL mirror of anomalies/correlation.py:correlation_eligible over the
# ``pii`` CTE (the Benford rule's eligibility family)
_CORR_ELIGIBLE_SQL = (
    "general_type = 'N' AND NOT lower(fdt) LIKE 'id%'"
    " AND NOT lower(fdt) LIKE 'period%'"
    " AND fdt NOT IN ('Sequence','Category','Code')")


def _correlation_union_sql(
    corr_tables: list[tuple[str, list[tuple[str, str, str, bool]]]],
) -> list[str]:
    """Correlation-class union selects (one per numeric pair per table) —
    the SQL mirror of anomalies/correlation.py:correlation_anomalies.
    Pairs are generated statically over each table's numeric columns in
    ordinal order; runtime eligibility (which the Spark side reads from
    the inferred profile) is the EXISTS probes into the ``pii`` CTE, so
    both engines qualify exactly the same pairs."""
    from dataops_testgen_spark.anomalies.correlation import (
        CORRELATED_COLUMNS_TYPE, CORRELATION_LIKELIHOOD, CORRELATION_MIN_ABS,
        CORRELATION_MIN_N, CORRELATION_RISK)

    selects = []
    for table, columns in corr_tables:
        ncols = [name for name, gt, _ct, _d in columns if gt == "N"]
        for i, a in enumerate(ncols):
            for b in ncols[i + 1:]:
                elig_a = (f"EXISTS (SELECT 1 FROM pii WHERE table_name ="
                          f" '{table}' AND column_name = '{a}'"
                          f" AND {_CORR_ELIGIBLE_SQL})")
                elig_b = elig_a.replace(f"column_name = '{a}'",
                                        f"column_name = '{b}'")
                selects.append(f"""
SELECT '{table}' AS table_name, '{b}' AS column_name,
       '{CORRELATED_COLUMNS_TYPE}' AS anomaly_type,
       'Correlation' AS data_object,
       '{CORRELATION_LIKELIHOOD}' AS likelihood,
       ROUND(c*c*{CORRELATION_RISK!r}::DOUBLE, 5) AS dq_prevalence
FROM (SELECT CORR({a}::DOUBLE, {b}::DOUBLE) AS c,
             COUNT(CASE WHEN {a} IS NOT NULL AND {b} IS NOT NULL
                        THEN 1 END) AS n
      FROM {table})
WHERE COALESCE(ABS(c) >= {CORRELATION_MIN_ABS!r}::DOUBLE
               AND n >= {CORRELATION_MIN_N}, FALSE)
  AND {elig_a}
  AND {elig_b}""")
    return selects


def _spearman_union_sql(
    corr_tables: list[tuple[str, list[tuple[str, str, str, bool]]]],
) -> list[str]:
    """Spearman-pass union selects — the SQL mirror of
    anomalies/correlation.py:correlation_anomalies(spearman=True)'s
    second pass: per numeric pair, Pearson CORR over each column's exact
    average ranks (rank(v) = #smaller + (ties+1)/2 from the distinct-value
    dictionary — integer arithmetic, engine-identical to the Spark rank
    transform), emitted ONLY when the rank flag fires and the raw Pearson
    flag does NOT (the Spark side's anti-join)."""
    from dataops_testgen_spark.anomalies.correlation import (
        CORRELATED_COLUMNS_TYPE, CORRELATION_LIKELIHOOD, CORRELATION_MIN_ABS,
        CORRELATION_MIN_N, CORRELATION_RISK)

    def rank_sub(table: str, col: str) -> str:
        return (f"(SELECT v, COALESCE(SUM(n) OVER (ORDER BY v ROWS BETWEEN"
                f" UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::DOUBLE"
                f" + (n::DOUBLE + 1.0::DOUBLE) / 2.0::DOUBLE AS r"
                f" FROM (SELECT {col} AS v, COUNT(*)::BIGINT AS n"
                f" FROM {table} WHERE {col} IS NOT NULL GROUP BY 1))")

    selects = []
    for table, columns in corr_tables:
        ncols = [name for name, gt, _ct, _d in columns if gt == "N"]
        for i, a in enumerate(ncols):
            for b in ncols[i + 1:]:
                elig_a = (f"EXISTS (SELECT 1 FROM pii WHERE table_name ="
                          f" '{table}' AND column_name = '{a}'"
                          f" AND {_CORR_ELIGIBLE_SQL})")
                elig_b = elig_a.replace(f"column_name = '{a}'",
                                        f"column_name = '{b}'")
                selects.append(f"""
SELECT '{table}' AS table_name, '{b}' AS column_name,
       '{CORRELATED_COLUMNS_TYPE}' AS anomaly_type,
       'Correlation' AS data_object,
       '{CORRELATION_LIKELIHOOD}' AS likelihood,
       ROUND(rho*rho*{CORRELATION_RISK!r}::DOUBLE, 5) AS dq_prevalence
FROM (SELECT CORR(ra.r, rb.r) AS rho,
             COUNT(CASE WHEN ra.r IS NOT NULL AND rb.r IS NOT NULL
                        THEN 1 END) AS n
      FROM {table} tt
      LEFT JOIN {rank_sub(table, a)} ra ON tt.{a} = ra.v
      LEFT JOIN {rank_sub(table, b)} rb ON tt.{b} = rb.v),
     (SELECT CORR({a}::DOUBLE, {b}::DOUBLE) AS c,
             COUNT(CASE WHEN {a} IS NOT NULL AND {b} IS NOT NULL
                        THEN 1 END) AS pn
      FROM {table})
WHERE COALESCE(ABS(rho) >= {CORRELATION_MIN_ABS!r}::DOUBLE
               AND n >= {CORRELATION_MIN_N}, FALSE)
  AND NOT COALESCE(ABS(c) >= {CORRELATION_MIN_ABS!r}::DOUBLE
                   AND pn >= {CORRELATION_MIN_N}, FALSE)
  AND {elig_a}
  AND {elig_b}""")
    return selects


def _dependence_union_sql(
    corr_tables: list[tuple[str, list[tuple[str, str, str, bool]]]],
) -> list[str]:
    """Dependence-class union selects (one per (column, numeric) pair per
    table) — the SQL mirror of anomalies/dependence.py:
    dependence_anomalies. Candidate categoricals are generated statically
    over ALL columns (runtime eligibility — functional type Code/Category
    with 2..20 distinct values — is the EXISTS probe into ``pii``, so
    both engines qualify identical pairs); numerics over the ordinal
    numeric columns with the correlation eligibility + non-constant
    probe. eta² mirrors the central-moment two-level fold: per-group
    VAR_POP/AVG, SSW = Σ n·vp, SSB = Σ n·(m − mm)²."""
    from dataops_testgen_spark.anomalies.dependence import (
        DEPENDENCE_LIKELIHOOD, DEPENDENCE_MAX_GROUPS, DEPENDENCE_MIN_ETA2,
        DEPENDENCE_MIN_N, DEPENDENCE_RISK, DEPENDENT_COLUMN_TYPE)

    cat_elig = (f"fdt IN ('Code','Category') AND distinct_value_ct"
                f" BETWEEN 2 AND {DEPENDENCE_MAX_GROUPS}")
    num_elig = f"{_CORR_ELIGIBLE_SQL} AND distinct_value_ct > 1"
    selects = []
    for table, columns in corr_tables:
        ncols = [name for name, gt, _ct, _d in columns if gt == "N"]
        for cat, _gt, _ct2, _d2 in columns:
            for num in ncols:
                if num == cat:
                    continue
                exists_cat = (f"EXISTS (SELECT 1 FROM pii WHERE table_name"
                              f" = '{table}' AND column_name = '{cat}'"
                              f" AND {cat_elig})")
                exists_num = (f"EXISTS (SELECT 1 FROM pii WHERE table_name"
                              f" = '{table}' AND column_name = '{num}'"
                              f" AND {num_elig})")
                selects.append(f"""
SELECT '{table}' AS table_name, '{num}' AS column_name,
       '{DEPENDENT_COLUMN_TYPE}' AS anomaly_type,
       'Dependence' AS data_object,
       '{DEPENDENCE_LIKELIHOOD}' AS likelihood,
       ROUND(eta2 * {DEPENDENCE_RISK!r}::DOUBLE, 5) AS dq_prevalence
FROM (
  SELECT MAX(tn) AS tn, MAX(g_ct) AS g_ct,
         SUM(nd * (m - mm) * (m - mm))
           / NULLIF(SUM(nd * (m - mm) * (m - mm)) + MAX(ssw), 0) AS eta2
  FROM (
    SELECT n::DOUBLE AS nd, m,
           SUM(n) OVER () AS tn,
           COUNT(CASE WHEN n > 0 THEN 1 END) OVER () AS g_ct,
           SUM(vp * n::DOUBLE) OVER () AS ssw,
           SUM(m * n::DOUBLE) OVER ()
             / NULLIF(SUM(n::DOUBLE) OVER (), 0) AS mm
    FROM (SELECT COUNT({num}) AS n, AVG({num}::DOUBLE) AS m,
                 VAR_POP({num}::DOUBLE) AS vp
          FROM {table} WHERE {cat} IS NOT NULL GROUP BY {cat})))
WHERE COALESCE(eta2 >= {DEPENDENCE_MIN_ETA2!r}::DOUBLE
               AND tn >= {DEPENDENCE_MIN_N} AND g_ct >= 2, FALSE)
  AND {exists_cat}
  AND {exists_num}""")
    return selects


def _screen_union_sql(run_date: str, corr_tables=None,
                      spearman: bool = False) -> str:
    """The multi-table screen body (Column + Multi-Col + Dates + Variant
    unions, plus the Correlation + Dependence classes when
    ``corr_tables`` carries the [(table, columns)] metadata) over the
    ``pii`` + ``mults`` CTEs — shared by the anomaly-screen and
    score-card oracles."""
    prevalence = _anomaly_prevalence()
    col_selects = "\nUNION ALL\n".join(
        "SELECT table_name, column_name,"
        f" '{atype}' AS anomaly_type, 'Column' AS data_object,"
        f" '{_ANOMALY_LIKELIHOOD[atype]}' AS likelihood,"
        + (f" ROUND({prevalence[atype]}, 5)" if atype in prevalence
           else " NULL::DOUBLE")
        + f" AS dq_prevalence\nFROM pii WHERE {cond}"
        for atype, cond in _anomaly_criteria(run_date).items()
    )
    multi_col = f"""
SELECT '(multi-table)' AS table_name, column_name,
       CASE WHEN general_type_ct > 1 THEN 'Multiple_Types_Major'
            WHEN type_ct > 1 THEN 'Multiple_Types_Minor' END AS anomaly_type,
       'Multi-Col' AS data_object,
       CASE WHEN general_type_ct > 1 THEN 'Likely' ELSE 'Possible' END AS likelihood,
       NULL::DOUBLE AS dq_prevalence
FROM mults
WHERE general_type_ct > 1 OR type_ct > 1
UNION ALL
SELECT p.table_name, p.column_name,
       'Table_Pattern_Mismatch' AS anomaly_type,
       'Multi-Col' AS data_object, 'Likely' AS likelihood,
       NULL::DOUBLE AS dq_prevalence
FROM pii p JOIN mults USING (column_name)
WHERE p.general_type = 'A'
  AND NOT lower(p.fdt) LIKE 'measurement%'
  AND p.fdt NOT IN ('Category', 'Code') AND p.max_length > 3
  AND p.value_ct > (p.numeric_ct + p.filled_value_ct + p.zero_length_ct)
  AND mults.max_pattern_ct = 1 AND mults.column_ct > 1
  AND p.p1 <> regexp_extract(mults.very_top_pattern, '\\|(.*)$', 1)
  AND p.pc1::DOUBLE / TRY_CAST(regexp_extract(mults.very_top_pattern,
        '^0*([0-9]+)\\|', 1) AS BIGINT) < 0.1"""
    dates_recency = f"""
SELECT table_name,
       CASE WHEN COUNT(column_name) > 2 THEN '(multi-column)'
            ELSE string_agg(column_name, ', ' ORDER BY column_name) END AS column_name,
       CASE WHEN MAX(max_date) < DATE '{run_date}' - INTERVAL 12 MONTH
            THEN 'Recency_One_Year'
            WHEN MAX(max_date) < DATE '{run_date}' - INTERVAL 6 MONTH
            THEN 'Recency_Six_Months' END AS anomaly_type,
       'Dates' AS data_object, 'Possible' AS likelihood,
       NULL::DOUBLE AS dq_prevalence
FROM pii WHERE general_type = 'D'
GROUP BY table_name
HAVING anomaly_type IS NOT NULL"""
    variants = f"""
SELECT table_name, column_name,
       'Variant_Coded_Values' AS anomaly_type,
       'Variant' AS data_object, 'Definite' AS likelihood,
       NULL::DOUBLE AS dq_prevalence
FROM pii, (VALUES
    {_variant_codings_values()}) AS v(check_values)
WHERE distinct_value_ct <= 20 AND top_freq_values > ''
  AND len(list_intersect({_FREQ_VALS}, str_split(v.check_values, '|'))) > 1
GROUP BY 1, 2"""
    corr = ("".join("\nUNION ALL" + s
                    for s in _correlation_union_sql(corr_tables)
                    + (_spearman_union_sql(corr_tables) if spearman else [])
                    + _dependence_union_sql(corr_tables))
            if corr_tables else "")
    return (f"{col_selects}\nUNION ALL{multi_col}"
            f"\nUNION ALL{dates_recency}\nUNION ALL{variants}{corr}")


_MULTS_CTE = """,
mults AS MATERIALIZED (
  SELECT column_name, COUNT(*) AS column_ct,
         COUNT(DISTINCT column_type) AS type_ct,
         COUNT(DISTINCT general_type) AS general_type_ct,
         MIN(column_type) AS min_type, MAX(column_type) AS max_type,
         MAX(distinct_pattern_ct) AS max_pattern_ct,
         MAX(CASE WHEN p1 IS NOT NULL AND p1 <> ''
                  THEN lpad(pc1::VARCHAR, 20, '0') || '|' || p1 END)
           AS very_top_pattern
  FROM pii GROUP BY column_name HAVING COUNT(*) > 1)"""


def anomaly_screen_multi_sql(
    tables: list[tuple[str, list[tuple[str, str, str, bool]]]],
    run_date: str,
    corr_tables: list | None = None,
    pre_ctes: list[tuple[str, str]] | None = None,
    spearman: bool = False,
) -> str:
    """Multi-table anomaly-screening oracle over one shared inference chain:
    Column rules per table + Multi-Col (Multiple_Types_Major/Minor,
    Table_Pattern_Mismatch over same-named columns across tables,
    `profile_anomalies_screen_multi_column.sql:1-59`) + Dates + Variant,
    plus the Correlation class over ``corr_tables`` (pass the same
    [(table, columns)] metadata to mirror ``screen_anomalies(...,
    tables=...)``; ``pre_ctes`` lets a derived relation be defined first).
    Output includes data_object / likelihood / dq_prevalence (rounded 5dp,
    prevalence formula × risk; NULL where the type defines no formula).
    """
    ctes = _inference_ctes(tables, run_date, pre_ctes=pre_ctes)
    return (f"{ctes}{_MULTS_CTE}\n"
            f"{_screen_union_sql(run_date, corr_tables, spearman=spearman)}")


# ---------------------------------------------------------------------------
# Score-card oracles (SURVEY §2.9)
# ---------------------------------------------------------------------------

# DuckDB spelling of the reference's SUM_LN aggregate
# (`020_create_standard_functions_sprocs.sql:254-303`): ∏(1−p) over valid p.
_SUM_LN = ("COALESCE(EXP(SUM(LN(1 - {p})) FILTER (WHERE {p} > 0"
           " AND {p} <= 0.999999)), 1.0)")

_SEVERITY_CASE = """CASE {s}
    WHEN 'Definite' THEN 1 WHEN 'Failed' THEN 2 WHEN 'Likely' THEN 3
    WHEN 'Possible' THEN 4 WHEN 'Warning' THEN 5 ELSE 6 END"""


def _dim_values(mapping: dict[str, tuple[str | None, str]],
                key_col: str, which: int) -> str:
    rows = ",\n    ".join(
        f"('{k}', " + ("NULL" if v[which] is None else f"'{v[which]}'") + ")"
        for k, v in sorted(mapping.items()))
    return (f"(SELECT * FROM (VALUES\n    {rows})"
            f" AS m({key_col}, dim))")


def _test_results_sql(test_selects: list[dict]) -> str:
    """tres CTE body: one aggregate SELECT per test over its table, emitting
    result_code / fail_status / dq_record_ct / dq_prevalence (rounded 5dp;
    0 for passes — `calc_prevalence_test_results.sql:10-68`)."""
    parts = []
    for t in test_selects:
        cond = t["fail_cond"].format(m=t["m_sql"])
        prev = t["prev_expr"].format(m=t["m_sql"])
        col = ("NULL::VARCHAR" if t["column"] is None
               else f"'{t['column']}'")
        parts.append(f"""
SELECT '{t["table"]}' AS table_name, {col} AS column_name,
       '{t["test_type"]}' AS test_type,
       CASE WHEN {cond} THEN 0 ELSE 1 END AS result_code,
       '{t["status"]}' AS fail_status,
       COUNT(*)::BIGINT AS dq_record_ct,
       CASE WHEN {cond} THEN ROUND(LEAST(1.0, {prev}), 5)
            ELSE 0.0 END AS dq_prevalence
FROM {t["table"]}""")
    return "\nUNION ALL\n".join(parts)


def _score_card_base(tables, run_date: str, test_selects: list[dict],
                     corr_tables=None) -> str:
    """Shared CTE prefix: inference chain + screen (scr) + per-column
    profile scoring (pcol) + test results (tres) + per-column test scoring
    (tcol) + parent totals — mirrors v_dq_profile_scoring_latest_by_column /
    v_dq_test_scoring_latest_by_column (060_create_standard_views.sql:
    107-276) with weights = 1."""
    ctes = _inference_ctes(tables, run_date)
    good_p = _SUM_LN.format(p="s.dq_prevalence")
    good_t = _SUM_LN.format(p="dq_prevalence")
    return f"""{ctes}{_MULTS_CTE},
scr AS MATERIALIZED ({_screen_union_sql(run_date, corr_tables)}),
cols AS MATERIALIZED (
  SELECT table_name, column_name, MAX(record_ct)::DOUBLE AS wrc
  FROM pii GROUP BY 1, 2),
pcol AS (
  SELECT c.table_name, c.column_name, MAX(c.wrc) AS wrc,
         COUNT(s.anomaly_type)::BIGINT AS issue_ct,
         {good_p} AS good
  FROM cols c LEFT JOIN scr s
    ON (s.table_name = c.table_name AND s.column_name = c.column_name)
  GROUP BY 1, 2),
tres AS MATERIALIZED ({_test_results_sql(test_selects)}),
tcol AS (
  SELECT table_name, column_name, MAX(dq_record_ct)::DOUBLE AS wrc,
         SUM(CASE WHEN result_code = 0 THEN 1 ELSE 0 END)::BIGINT AS issue_ct,
         {good_t} AS good
  FROM tres GROUP BY 1, 2),
ptot AS (SELECT SUM(wrc) AS pdp FROM pcol),
ttot AS (SELECT SUM(wrc) AS tdp FROM tcol)"""


_BREAKDOWN_SELECT = """
SELECT {keys},
       ROUND(100*(COALESCE(p_dp*(1-p_score)/NULLIF(pdp, 0), 0)
                + COALESCE(t_dp*(1-t_score)/NULLIF(tdp, 0), 0)), 5) AS impact,
       ROUND(COALESCE(p_score, 1)*COALESCE(t_score, 1), 5) AS score,
       (COALESCE(p_issue, 0) + COALESCE(t_issue, 0))::BIGINT AS issue_ct
FROM b, ptot, ttot"""


def score_card_breakdown_cols_sql(tables, run_date: str,
                                  test_selects: list[dict],
                                  corr_tables=None) -> str:
    """get_score_card_breakdown_by_column.sql:1-58, profiling side from the
    anomaly screen over ``tables``, testing side from ``test_selects``."""
    base = _score_card_base(tables, run_date, test_selects, corr_tables)
    return f"""{base},
b AS (
  SELECT COALESCE(p.table_name, t.table_name) AS table_name,
         COALESCE(p.column_name, t.column_name) AS column_name,
         p.wrc AS p_dp, p.good AS p_score, p.issue_ct AS p_issue,
         t.wrc AS t_dp, t.good AS t_score, t.issue_ct AS t_issue
  FROM pcol p FULL OUTER JOIN tcol t
    ON (p.table_name = t.table_name AND p.column_name = t.column_name))
{_BREAKDOWN_SELECT.format(keys="table_name, column_name")}"""


def score_card_breakdown_dim_sql(tables, run_date: str,
                                 test_selects: list[dict],
                                 which: str = "dq_dimension",
                                 corr_tables=None) -> str:
    """get_score_card_breakdown_by_dimension.sql:1-58 (or the
    `_by_impact_dimension` twin): per-(column, dimension) scoring rows are
    grouped by dimension; the parent normalizer stays the BY-COLUMN totals
    (reference parent CTE reads the by_column views, :24-38)."""
    from dataops_testgen_spark.scoring.score_cards import (
        ANOMALY_DIMENSIONS, TEST_DIMENSIONS)

    idx = 0 if which == "dq_dimension" else 1
    adim = _dim_values(ANOMALY_DIMENSIONS, "anomaly_type", idx)
    tdim = _dim_values(TEST_DIMENSIONS, "test_type", idx)
    base = _score_card_base(tables, run_date, test_selects, corr_tables)
    good_p = _SUM_LN.format(p="s.dq_prevalence")
    good_t = _SUM_LN.format(p="dq_prevalence")
    return f"""{base},
pdim AS (
  SELECT c.table_name, c.column_name, s.dim, MAX(c.wrc) AS wrc,
         COUNT(s.anomaly_type)::BIGINT AS issue_ct,
         {good_p} AS good
  FROM cols c LEFT JOIN (
    SELECT scr.*, m.dim FROM scr LEFT JOIN {adim} m USING (anomaly_type)) s
    ON (s.table_name = c.table_name AND s.column_name = c.column_name)
  GROUP BY 1, 2, 3),
pgrp AS (
  SELECT dim, SUM(wrc) AS p_dp, SUM(issue_ct) AS p_issue,
         SUM(wrc*good)/NULLIF(SUM(wrc), 0) AS p_score
  FROM pdim GROUP BY dim),
tdimv AS (
  SELECT r.table_name, r.column_name, m.dim,
         MAX(r.dq_record_ct)::DOUBLE AS wrc,
         SUM(CASE WHEN r.result_code = 0 THEN 1 ELSE 0 END)::BIGINT AS issue_ct,
         {good_t} AS good
  FROM tres r LEFT JOIN {tdim} m USING (test_type)
  GROUP BY 1, 2, 3),
tgrp AS (
  SELECT dim, SUM(wrc) AS t_dp, SUM(issue_ct) AS t_issue,
         SUM(wrc*good)/NULLIF(SUM(wrc), 0) AS t_score
  FROM tdimv GROUP BY dim),
b AS (
  SELECT COALESCE(p.dim, t.dim) AS {which},
         p.p_dp, p.p_score, p.p_issue, t.t_dp, t.t_score, t.t_issue
  FROM pgrp p FULL OUTER JOIN tgrp t ON (p.dim IS NOT DISTINCT FROM t.dim))
{_BREAKDOWN_SELECT.format(keys=which)}"""


def score_card_issues_sql(tables, run_date: str,
                          test_selects: list[dict],
                          corr_tables=None) -> str:
    """get_score_card_issues_by_column.sql:1-100: hygiene anomalies UNION
    Failed/Warning test results with the severity ordering class."""
    ctes = _inference_ctes(tables, run_date)
    sev_a = _SEVERITY_CASE.format(s="likelihood")
    sev_t = _SEVERITY_CASE.format(s="fail_status")
    return f"""{ctes}{_MULTS_CTE},
scr AS MATERIALIZED ({_screen_union_sql(run_date, corr_tables)}),
tres AS MATERIALIZED ({_test_results_sql(test_selects)})
SELECT table_name, column_name, anomaly_type AS type,
       likelihood AS status, 'hygiene' AS issue_type,
       {sev_a} AS severity_order
FROM scr
UNION ALL
SELECT table_name, column_name, test_type AS type,
       fail_status AS status, 'test' AS issue_type,
       {sev_t} AS severity_order
FROM tres WHERE result_code = 0"""


# ---------------------------------------------------------------------------
# Selection-criteria PARAM payload oracle (generation/selection.py params)
# ---------------------------------------------------------------------------

_NUM_RE = r"^-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?$"


def _selection_params_sql(run_date: str) -> dict[str, list[tuple[str, str, bool]]]:
    """test_type -> [(param_key, sql_expr over pii, is_numeric)] — the SQL
    mirror of each catalog entry's params dict
    (generation/selection.py:116-300). Numeric params are normalized to
    printf('%%.4f') on BOTH engines, sidestepping double-to-string
    formatting differences."""
    lov = ("'(' || array_to_string(list_transform("
           "str_split(top_freq_values, ' | '),"
           " x -> '''' || replace(regexp_extract(x, '^(.*):[0-9]+$', 1),"
           " '''', '''''') || ''''), ',') || ')'")
    pattern_regex = (
        r"trim(replace(replace(replace(regexp_replace(p1,"
        r" '([*+\-%_])', '[\1]', 'g'),"
        " 'A', '[A-Z]'), 'N', '[0-9]'), 'a', '[a-z]'))")
    recency_thr = (
        "CASE WHEN gap <= 3 THEN gap + 3 WHEN gap <= 7 THEN gap + 7"
        " WHEN gap <= 31 THEN CEIL(gap/7.0)*7"
        " ELSE CEIL(gap/30.0)*30 END").replace(
        "gap", f"date_diff('day', CAST(max_date AS DATE), DATE '{run_date}')")
    from dataops_testgen_spark.generation.selection import _MONTH_LISTS as _RAW_ML
    ML = {k: v.replace("'", "''") for k, v in _RAW_ML.items()}
    valid_month = (
        "CASE"
        f" WHEN max_length > 3 AND (upper(substr(min_text, 1, 1)) || lower(substr(min_text, 2))) = min_text THEN '{ML['full_init']}'"
        f" WHEN max_length > 3 AND upper(min_text) = min_text THEN '{ML['full_upper']}'"
        f" WHEN max_length > 3 AND lower(min_text) = min_text THEN '{ML['full_lower']}'"
        f" WHEN max_length = 3 AND (upper(substr(min_text, 1, 1)) || lower(substr(min_text, 2))) = min_text THEN '{ML['abbr_init']}'"
        f" WHEN max_length = 3 AND upper(min_text) = min_text THEN '{ML['abbr_upper']}'"
        f" WHEN max_length = 3 AND lower(min_text) = min_text THEN '{ML['abbr_lower']}'"
        f" WHEN max_length = 2 AND min_text = '01' THEN '{ML['two_dig']}'"
        f" WHEN max_length = 2 AND min_text = '1' THEN '{ML['one_dig']}'"
        " WHEN min_value = 1 THEN '1,2,3,4,5,6,7,8,9,10,11,12'"
        " ELSE 'NULL' END")
    num = True
    return {
        "Alpha_Trunc": [("threshold_value", "FLOOR(0.95*max_length)", num)],
        "Avg_Shift": [("baseline_value_ct", "value_ct", num),
                      ("baseline_avg", "avg_value", num),
                      ("baseline_sd", "stdev_value", num),
                      ("threshold_value", "0.5", num)],
        "Daily_Record_Ct": [("threshold_value", "0", num)],
        "Dec_Trunc": [("threshold_value", "ROUND(fractional_sum, 0)", num)],
        "Distinct_Date_Ct": [("baseline_value", "date_days_present", num),
                             ("threshold_value", "date_days_present", num)],
        "Distinct_Value_Ct": [("baseline_value_ct", "distinct_value_ct", num),
                              ("threshold_value", "distinct_value_ct", num)],
        "Email_Format": [("threshold_value", "0", num)],
        "Future_Date": [("threshold_value", "0", num)],
        "Future_Date_1Y": [("threshold_value", "0", num)],
        "Incr_Avg_Shift": [("baseline_value_ct", "value_ct", num),
                           ("baseline_sum", "avg_value*value_ct", num),
                           ("baseline_avg", "avg_value", num),
                           ("baseline_sd", "stdev_value", num),
                           ("threshold_value", "2", num)],
        "LOV_Match": [("baseline_value", lov, False),
                      ("threshold_value", "0", num)],
        "Min_Date": [("baseline_value", "min_date::VARCHAR", False),
                     ("threshold_value", "0", num)],
        "Min_Val": [("baseline_value", "min_value", num),
                    ("threshold_value", "0", num)],
        "Missing_Pct": [("baseline_ct", "record_ct", num),
                        ("baseline_value_ct", "value_ct", num),
                        ("threshold_value", "2", num)],
        "Monthly_Rec_Ct": [("threshold_value", "0", num)],
        "Outlier_Pct_Above": [("baseline_avg", "avg_value", num),
                              ("baseline_sd", "stdev_value", num),
                              ("threshold_value", "0.05", num)],
        "Outlier_Pct_Below": [("baseline_avg", "avg_value", num),
                              ("baseline_sd", "stdev_value", num),
                              ("threshold_value", "0.05", num)],
        "Pattern_Match": [("baseline_value", pattern_regex, False),
                          ("threshold_value", "0", num)],
        "Recency": [("threshold_value", recency_thr, num)],
        "Required": [("threshold_value", "0", num)],
        "Street_Addr_Pattern": [("threshold_value", "75", num)],
        "US_State": [("threshold_value", "0", num)],
        "Unique": [("threshold_value", "0", num)],
        "Unique_Pct": [("baseline_value_ct", "value_ct", num),
                       ("baseline_unique_ct", "distinct_value_ct", num),
                       ("threshold_value", "0.5", num)],
        "Valid_Characters": [("threshold_value", "0", num)],
        "Valid_Month": [("threshold_value", "0", num),
                        ("baseline_value", valid_month, False)],
        "Valid_US_Zip": [("threshold_value", "0", num)],
        "Valid_US_Zip3": [("threshold_value", "0", num)],
        "Variability_Increase": [("baseline_sd", "stdev_value", num),
                                 ("threshold_value", "120", num)],
        "Variability_Decrease": [("baseline_sd", "stdev_value", num),
                                 ("threshold_value", "80", num)],
        "Weekly_Rec_Ct": [("threshold_value", "0", num)],
    }


def generated_test_params_sql(
    table: str,
    columns: list[tuple[str, str, str, bool]],
    run_date: str,
) -> str:
    """One row per (test_type, column, param) for every fired selection
    criterion, with numeric values normalized to %.4f — the payload check
    that closes the last rows-only gap (r1 VERDICT: 'pin numeric-literal
    formatting on both sides')."""
    criteria = _selection_criteria_sql(run_date)
    params = _selection_params_sql(run_date)
    selects = []
    for tt, cond in criteria.items():
        for key, expr, is_num in params.get(tt, []):
            if is_num:
                x = f"({expr})::DOUBLE"
                e = (f"CASE WHEN {x} = 0 THEN 0"
                     f" ELSE FLOOR(LOG10(ABS({x})))::INT END")
                m = (f"CASE WHEN {x} = 0 THEN 0.0"
                     f" ELSE ROUND({x} / POW(10.0, ({e})::DOUBLE), 6) END")
                cols = (f"{m} AS param_mantissa, ({e})::INT AS param_exp,"
                        " NULL::VARCHAR AS param_value")
            else:
                cols = ("NULL::DOUBLE AS param_mantissa,"
                        " NULL::INT AS param_exp,"
                        f" ({expr}) AS param_value")
            selects.append(
                f"SELECT '{tt}' AS test_type, '{table}' AS table_name,"
                f" column_name, '{key}' AS param_key,\n"
                f"       {cols}\n"
                f"FROM pii WHERE {cond}")
    ctes = _inference_ctes([(table, columns)], run_date)
    return f"{ctes}\n" + "\nUNION ALL\n".join(selects)
