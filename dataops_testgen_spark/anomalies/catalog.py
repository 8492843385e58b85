"""Column-class anomaly rule catalog.

Each entry re-expresses one YAML's ``anomaly_criteria`` /
``dq_score_prevalence_formula`` / ``dq_score_risk_factor``
(`/root/reference/testgen/template/dbsetup_anomaly_types/
profile_anomaly_types_<key>.yaml`) as PySpark Column builders over the
inferred profile DataFrame. Multi-Col / Dates / Variant classes live in
``screen.py`` (they need grouping/joins, not per-row predicates).

Format note: the reference packs top_freq_values as newline rows
``| value | count`` and top_patterns as ``count | pattern | ...``; our
profiler stores ``value:count | value:count``. The helpers
``nth_freq_value/nth_freq_count/nth_pattern/nth_pattern_count`` are the
format-independent accessors matching ``fn_parsefreq`` / ``SPLIT_PART``
usage in the criteria.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from dataops_testgen_spark.inference import helpers as H

NAME_TYPES = ("Address", "City", "Entity Name", "Person Given Name",
              "Person Last Name", "Person Full Name")


@dataclass(frozen=True)
class ColumnRule:
    key: str                      # anomaly_type
    name: str
    likelihood: str
    criteria: Callable[[], Column]
    prevalence: Callable[[], Column] | None  # multiplied by risk
    risk: Callable[[], Column] | float | None


def _c(name: str) -> Column:
    return F.col(name)


def _ratio(num: Column, den: Column) -> Column:
    return num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0))


def _freq_val(n: int) -> Column:
    return H.nth_freq_value(_c("top_freq_values"), n)


def _freq_ct(n: int) -> Column:
    return H.nth_freq_count(_c("top_freq_values"), n)


def _pat(n: int) -> Column:
    return H.nth_pattern(_c("top_patterns"), n)


def _pat_ct(n: int) -> Column:
    return H.nth_pattern_count(_c("top_patterns"), n)


def _freq_contains(word: str) -> Column:
    return F.array_contains(
        F.transform(H.freq_values_array(_c("top_freq_values")), F.lower), word
    )


def _boolean_value_mismatch() -> Column:
    first = F.lower(_freq_val(1))
    tf = first.isin("true", "false") & ~(_freq_contains("true") & _freq_contains("false"))
    yn = first.isin("yes", "no") & ~(_freq_contains("yes") & _freq_contains("no"))
    return (_c("distinct_value_ct") > 1) & (tf | yn)


def _small_missing_effective() -> Column:
    dummy_blanks = (_c("filled_value_ct") > 0) & (
        (_c("numeric_ct") != _c("value_ct"))
        | _c("functional_data_type").isin("Phone", "Zip")
    )
    return (
        _c("value_ct") - F.coalesce(_c("zero_length_ct"), F.lit(0))
        - F.when(dummy_blanks, F.coalesce(_c("filled_value_ct"), F.lit(0))).otherwise(F.lit(0))
    )


UNIT_RE = r"(?i)^[0-9]+(\.[0-9]+)? ?(%|lb|oz|kg|g|mg|km|m|cm|mm|mi|ft|in)$"
ZIP_PATTERNS = ("NNNNN", "NNNNN-NNNN", "NNNNNNNNN")

# Benford expected first-digit shares P(d) = log10(1 + 1/d), d = 1..9
import math as _math

BENFORD_SHARES = [_math.log10(1.0 + 1.0 / d) for d in range(1, 10)]
BENFORD_CHI2_CRIT = 20.09     # chi-square df=8 critical value, p = 0.01
BENFORD_MIN_N = 500


def _benford_n() -> Column:
    n = F.lit(0).cast("long")
    for i in range(9):
        n = n + _c("benford_counts")[i]
    return n


def _benford_chi2() -> Column:
    n = _benford_n().cast("double")
    chi2 = F.lit(0.0)
    for i, p in enumerate(BENFORD_SHARES):
        exp = n * F.lit(p)
        chi2 = chi2 + (_c("benford_counts")[i] - exp) ** 2 / exp
    return chi2


def _benford_tvd() -> Column:
    n = _benford_n().cast("double")
    tvd = F.lit(0.0)
    for i, p in enumerate(BENFORD_SHARES):
        tvd = tvd + F.abs(_c("benford_counts")[i] / n - F.lit(p))
    return tvd * 0.5


def _benford_fires() -> Column:
    return (
        (_c("general_type") == "N")
        & ~H.ilike(_c("functional_data_type"), "id%")
        & ~H.ilike(_c("functional_data_type"), "period%")
        & ~_c("functional_data_type").isin("Sequence", "Category", "Code")
        & _c("benford_counts").isNotNull()
        & (_benford_n() >= BENFORD_MIN_N)
        # multi-magnitude precondition: Benford only binds quantities
        # spanning several orders of magnitude
        & (_c("max_value") / F.nullif(_c("min_value_over_0"), F.lit(0.0))
           >= 100.0)
        & (_benford_chi2() > BENFORD_CHI2_CRIT)
    )


COLUMN_RULES: list[ColumnRule] = [
    ColumnRule(
        "Boolean_Value_Mismatch", "Unexpected Boolean Values Found", "Likely",
        _boolean_value_mismatch, None, 0.66,
    ),
    ColumnRule(
        "Char_Column_Date_Values", "Character Column with Mostly Date Values", "Likely",
        lambda: (_c("general_type") == "A") & (_c("value_ct") > _c("date_ct"))
        & (_c("date_ct") > 0.95 * _c("value_ct")),
        lambda: _ratio(_c("date_ct"), _c("record_ct")), 0.66,
    ),
    ColumnRule(
        "Char_Column_Number_Units", "Character Column with Numbers and Units", "Possible",
        lambda: (_ratio(_c("includes_digit_ct"), _c("value_ct")) > 0.5)
        & F.trim(_freq_val(1)).rlike(UNIT_RE),
        None, 0.33,
    ),
    ColumnRule(
        "Char_Column_Number_Values", "Character Column with Mostly Numeric Values", "Likely",
        lambda: (_c("general_type") == "A")
        & ~H.ilike(_c("column_name"), "%zip%")
        & ~H.ilike(_c("functional_data_type"), "id%")
        & ~H.ilike(_c("functional_data_type"), "period%")
        & (_c("value_ct") > _c("numeric_ct"))
        & (_c("numeric_ct") > 0.95 * _c("value_ct")),
        lambda: _ratio(_c("numeric_ct"), _c("record_ct")), 0.66,
    ),
    ColumnRule(
        "Column_Pattern_Mismatch", "Pattern Inconsistency Within Column", "Likely",
        lambda: (_c("general_type") == "A")
        & ~H.ilike(_c("functional_data_type"), "measurement%")
        & ~_c("functional_data_type").isin("Category", "Code")
        & (_c("max_length") > 3)
        & (_c("value_ct") > (_c("numeric_ct") + _c("filled_value_ct") + _c("zero_length_ct")))
        & _c("distinct_pattern_ct").between(2, 4)
        & (F.instr(_c("top_patterns"), "N") > 0)
        & (
            (((F.instr(_c("top_patterns"), "A") > 0) | (F.instr(_c("top_patterns"), "a") > 0))
             & (_pat_ct(2) / _pat_ct(1) < 0.05))
            | (_pat_ct(2) / _pat_ct(1) < 0.1)
        ),
        lambda: _ratio(_c("record_ct") - _pat_ct(1), _c("record_ct")), 0.66,
    ),
    ColumnRule(
        "Delimited_Data_Embedded", "Delimited Data Embedded in Column", "Likely",
        lambda: _c("std_pattern_match") == "DELIMITED_DATA", None, 0.66,
    ),
    ColumnRule(
        "Inconsistent_Casing", "Inconsistent Casing", "Definite",
        lambda: (_c("mixed_case_ct") > 0) & (_c("upper_case_ct") > 0)
        & _c("functional_data_type").isin(*NAME_TYPES),
        lambda: _ratio(F.least(_c("mixed_case_ct"), _c("upper_case_ct")), _c("record_ct")),
        1.0,
    ),
    ColumnRule(
        "Invalid_Zip3_USA", "Invalid USA ZIP-3 Format", "Definite",
        lambda: (_c("distinct_pattern_ct") > 1)
        & (H.ilike(_c("column_name"), "%zip%") | H.ilike(_c("column_name"), "%postal%"))
        & (_pat(1) == "NNN")
        & (_ratio(_pat_ct(1), _c("value_ct")) > 0.50),
        lambda: _ratio(_c("record_ct") - _pat_ct(1), _c("record_ct")), 1.0,
    ),
    ColumnRule(
        "Invalid_Zip_USA", "Invalid USA Zip Code Format", "Definite",
        lambda: (_c("functional_data_type") == "Zip")
        & (
            (_c("general_type") != "A")
            | (_c("filled_value_ct") > 0)
            | F.exists(H.patterns_array(_c("top_patterns")),
                       lambda p: ~p.isin(*ZIP_PATTERNS))
        ),
        None, 1.0,
    ),
    ColumnRule(
        "Leading_Spaces", "Leading Spaces Found in Column Values", "Likely",
        lambda: _c("lead_space_ct") > 0,
        lambda: _ratio(_c("lead_space_ct"), _c("record_ct")), 0.66,
    ),
    ColumnRule(
        "No_Values", "No Column Values Present", "Possible",
        lambda: (F.coalesce(_c("null_value_ct"), F.lit(0))
                 + F.coalesce(_c("filled_value_ct"), F.lit(0))
                 + F.coalesce(_c("zero_length_ct"), F.lit(0))) == _c("record_ct"),
        lambda: F.lit(1.0), 0.33,
    ),
    ColumnRule(
        "Non_Alpha_Name_Address", "Non-Alpha Name or Address", "Definite",
        lambda: (_c("non_alpha_ct") - _c("zero_length_ct") > 0)
        & _c("functional_data_type").isin(*NAME_TYPES),
        lambda: _ratio(_c("non_alpha_ct") - _c("zero_length_ct"), _c("record_ct")), 1.0,
    ),
    ColumnRule(
        "Non_Alpha_Prefixed_Name", "Non-Alpha Prefixed Name", "Definite",
        lambda: (_c("min_text") < "A")
        & ~F.substring(_c("min_text"), 1, 1).isin('"', " ")
        & (F.substring(_c("min_text"), -1, 1) != "'")
        & _c("functional_data_type").isin(
            "City", "Person Given Name", "Person Last Name", "Person Full Name"),
        lambda: F.lit(0.25), 1.0,
    ),
    ColumnRule(
        "Non_Printing_Chars", "Non-Printing Characters Found", "Definite",
        lambda: _c("non_printing_ct") > 0,
        lambda: _ratio(_c("non_printing_ct"), _c("record_ct")), 1.0,
    ),
    ColumnRule(
        "Non_Standard_Blanks", "Non-Standard Blank Values", "Definite",
        lambda: (_c("zero_length_ct") > 0)
        | ((_c("filled_value_ct") > 0)
           & ((_c("numeric_ct") != _c("value_ct"))
              | _c("functional_data_type").isin("Phone", "Zip"))),
        lambda: _ratio(_c("filled_value_ct"), _c("record_ct")), 1.0,
    ),
    ColumnRule(
        "Potential_Duplicates", "Potential Duplicate Values Found", "Possible",
        lambda: (_c("distinct_value_ct") > 1000) & _freq_ct(1).between(2, 4),
        lambda: _ratio(_c("value_ct") - _c("distinct_value_ct"), _c("record_ct")), 0.33,
    ),
    ColumnRule(
        "Potential_PII", "Personally Identifiable Information", "Potential PII",
        lambda: _c("pii_flag") > "",
        None,
        lambda: (
            F.when(F.substring(_c("pii_flag"), 1, 1) == "A", F.lit(1.0))
            .when(F.substring(_c("pii_flag"), 1, 1) == "B", F.lit(0.66))
            .when(F.substring(_c("pii_flag"), 1, 1) == "C", F.lit(0.33))
        ),
    ),
    ColumnRule(
        "Quoted_Values", "Quoted Values Found in Column Values", "Likely",
        lambda: _c("quoted_value_ct") > 0,
        lambda: _ratio(_c("quoted_value_ct"), _c("record_ct")), 0.66,
    ),
    ColumnRule(
        "Small Divergent Value Ct", "Small Percentage of Divergent Values Found",
        "Possible",
        lambda: (_c("functional_data_type") != "Boolean")
        & (100.0 * _ratio(_freq_ct(1), _c("value_ct")) > 97.0)
        & (100.0 * _ratio(_freq_ct(1), _c("value_ct")) < 100.0),
        lambda: _ratio(_c("record_ct") - _freq_ct(1), _c("record_ct")), 0.33,
    ),
    ColumnRule(
        "Small Missing Value Ct", "Small Percentage of Missing Values Found",
        "Possible",
        lambda: (_ratio(_small_missing_effective(), _c("record_ct")) > 0.97)
        & (_small_missing_effective() < _c("record_ct")),
        lambda: _ratio(
            F.coalesce(_c("null_value_ct"), F.lit(0))
            + F.coalesce(_c("filled_value_ct"), F.lit(0))
            + F.coalesce(_c("zero_length_ct"), F.lit(0)),
            _c("record_ct")), 0.33,
    ),
    ColumnRule(
        "Small_Numeric_Value_Ct", "Small Percentage of Numeric Values Found", "Likely",
        lambda: (_c("general_type") == "A")
        & (_ratio(_c("numeric_ct"), _c("value_ct")) < 0.03)
        & (_c("numeric_ct") > 0),
        lambda: _ratio(_c("numeric_ct"), _c("record_ct")), 0.66,
    ),
    ColumnRule(
        "Standardized_Value_Matches", "Similar Values Match When Standardized", "Likely",
        lambda: (_c("general_type") == "A")
        & (_c("distinct_std_value_ct") != _c("distinct_value_ct"))
        & ~_c("functional_data_type").like("Person%Name"),
        lambda: _ratio(_c("distinct_value_ct") - _c("distinct_std_value_ct"),
                       _c("value_ct")), 0.66,
    ),
    ColumnRule(
        "Suggested_Type", "Datatype Suggestion", "Likely",
        # 'char'-typed in the source but suggested tighter; Spark spells its
        # text type 'string' (same mapping note as the step-4 cascade guard)
        lambda: ~_c("functional_data_type").isin("Boolean", "Flag")
        & (H.ilike(_c("column_type"), "%char%") | H.ilike(_c("column_type"), "text")
           | (_c("column_type") == "string"))
        & ~(H.ilike(_c("datatype_suggestion"), "%char%")
            | H.ilike(_c("datatype_suggestion"), "text")
            | (_c("datatype_suggestion") == "string")),
        None, None,
    ),
    ColumnRule(
        "Unexpected Emails", "Unexpected Column Contains Emails", "Possible",
        lambda: (_c("std_pattern_match") == "EMAIL")
        & ~(H.ilike(_c("column_name"), "%email%") | H.ilike(_c("column_name"), "%addr%")),
        None, 0.33,
    ),
    ColumnRule(
        "Unexpected US States", "Unexpected Column Contains US States", "Possible",
        lambda: (_c("std_pattern_match") == "STATE_USA")
        & (_c("distinct_value_ct") > 5)
        & ~((F.lower(_c("column_name")) == "st")
            | H.ilike(_c("column_name"), "%state%")
            | H.ilike(_c("column_name"), "%_st")
            | H.ilike(_c("column_name"), "st_%")),
        None, 0.33,
    ),
    ColumnRule(
        "Unlikely_Date_Values", "Unlikely Date Values Found", "Likely",
        lambda: (_c("general_type") == "D")
        & (
            F.to_date(_c("min_date")).between(F.lit("0001-01-02").cast("date"),
                                              F.lit("1900-01-01").cast("date"))
            | (F.to_date(_c("max_date")) > F.add_months(F.to_date(_c("run_date")), 360))
        ),
        lambda: _ratio(
            F.coalesce(_c("before_100yr_date_ct"), F.lit(0))
            + F.coalesce(_c("distant_future_date_ct"), F.lit(0)),
            _c("record_ct")), 0.66,
    ),
    ColumnRule(
        # 33rd rule, beyond the reference's 32: Benford first-digit
        # nonconformity (Nigrini 2012) from the profiler's fused digit
        # census (benford_counts). Eligibility mirrors the law's actual
        # preconditions: naturally-ranging numerics (multi-magnitude:
        # max/min_over_0 >= 100), not identifiers/periods, and a sample
        # big enough for the chi-square (N >= 500). Fires when chi2
        # exceeds the df=8 critical value at p=0.01 (20.09).
        "Benford_Nonconformity", "First-Digit Distribution Violates Benford's Law",
        "Possible", _benford_fires,
        # prevalence = total-variation distance between observed and
        # expected digit shares: the fraction of rows whose first digit
        # would have to change for exact conformity
        _benford_tvd, 0.33,
    ),
]


# Variant codings seed — dbsetup/050_populate_new_schema_metadata.sql:66-130
VARIANT_CODINGS: list[tuple[str, str]] = [
    ("measure", "meter|m|metre"),
    ("measure", "centimeter|cm|centimetre"),
    ("measure", "millimeter|mm|millimetre"),
    ("measure", "kilometer|km|kilometre"),
    ("measure", 'inches|inch|in|"'),
    ("measure", "foot|ft|feet|'"),
    ("measure", "yard|yd"),
    ("measure", "mile|mi|miles"),
    ("measure", "kilogram|kgs|kg"),
    ("measure", "gram|g"),
    ("measure", "milligram|mgs|mg"),
    ("measure", "pound|lb|lbs|pounds"),
    ("measure", "ounce|oz"),
    ("measure", "liter|l|litre|liters|litres"),
    ("measure", "milliliter|ml|millilitre"),
    ("measure", "cubic meter|m^3|m³|cubic metre"),
    ("measure", "cubic centimeter|cm^3|cm³|cubic centimetre"),
    ("measure", "gallon|gal|gallons"),
    ("measure", "quart|qt"),
    ("measure", "pint|pt"),
    ("measure", "cup|cups"),
    ("measure", "percent|pct|%"),
    ("med_dose", "fluid ounce|fl oz|fluid ounces"),
    ("med_dose", "tablet|tab|tabs"),
    ("med_dose", "capsule|cap|caps"),
    ("med_dose", "once daily|daily|qd"),
    ("med_dose", "twice daily|bid"),
    ("med_dose", "three times daily|tid"),
    ("med_dose", "four times daily|qid"),
    ("med_dose", "as needed|prn"),
    ("med_dose", "before meals|ac"),
    ("med_dose", "after meals|pc"),
    ("med_dose", "at bedtime|hs"),
    ("med_dose", "intravenous|iv"),
    ("med_dose", "subcutaneous|sc|sq"),
    ("med_dose", "intramuscular|im"),
    ("med_dose", "oral|po"),
    ("med_dose", "per rectum|pr"),
    ("med_dose", "drops|gtt|gtts"),
    ("med_tx", "treatment|trx|tx"),
    ("med_tx", "new patients|new patient|new pt|nrx"),
    ("med_tx", "patient|pat|pt|px"),
    ("med_tx", "prescription|rx"),
    ("med_tx", "hcp|md|dr"),
    ("inv_uom", "each|ea"),
    ("inv_uom", "piece|pc|pieces|pcs"),
    ("inv_uom", "set|sets"),
    ("inv_uom", "pack|pk|pks"),
    ("inv_uom", "box|bx|boxes"),
    ("inv_uom", "case|cases"),
    ("inv_uom", "bottle|btl|bottles|btls"),
    ("inv_uom", "dozen|dz"),
]
