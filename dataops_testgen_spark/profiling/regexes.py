"""Shared regex/value-list constants for profiling.

These reproduce the *semantics* of the reference's per-flavor SQL predicates
(`/root/reference/testgen/template/flavors/postgresql/profiling/
project_profiling_query.sql` and `templated_functions.yaml`) as Java-regex
strings usable from ``Column.rlike``.  Kept to the RE2-compatible subset so
the same pattern text also runs in DuckDB oracles.
"""

# IS_NUM — templated_functions.yaml:11-14: optional sign, optional currency,
# thousands groups, optional decimals, optional percent.
IS_NUM_RE = r"^\s*[+-]?\$?\s*[0-9]+(,[0-9]{3})*(\.[0-9]*)?%?\s*$"

# Dummy/filler values — profiling query :56-65: runs of . - ? 0 9 x z, or a
# word list optionally wrapped in () or [].
FILLED_RUN_RE = r"^(\.+|-+|\?+|0+|9+|x+|z+)$"
FILLED_WORDS = [
    "blank", "error", "missing", "tbd", "n/a", "#na", "none", "null", "unknown",
]
FILLED_WRAPPED_RE = (
    r"^[\(\[]?(blank|error|missing|tbd|n/a|#na|none|null|unknown)[\)\]]?$"
)

# Zero-as-text — profiling query :34-37.
ZERO_TEXT_RE = r"^0(\.0*)?$"

# Quoted values — profiling query :54.
QUOTED_RE = "^(\".*\"|'.*')$"

# Non-printing characters — profiling query :82 (NBSP, zero-widths, bidi
# marks, line sep, ideographic space, BOM).
NON_PRINTING_RE = "[ ​‌‍‎‏ 　﻿]"

# Std pattern classification — profiling query :85-106 (ratios >= threshold).
STD_PATTERNS: list[tuple[str, str, float]] = [
    # (label, regex, min_ratio) — evaluated in this order, first hit wins.
    ("EMAIL", r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$", 0.9),
    ("PHONE_USA", r"^(\+?1[ .-]?)?(\([0-9]{3}\)|[0-9]{3})[ .-]?[0-9]{3}[ .-]?[0-9]{4}$", 0.9),
    ("ZIP_USA", r"^[0-9]{5}(-[0-9]{4})?$", 0.9),
    ("STATE_USA", r"^(A[LKZR]|C[AOT]|D[EC]|FL|GA|HI|I[DLNA]|K[SY]|LA|M[EDAINSOT]|N[EVHJMYCD]|O[HKR]|PA|RI|S[CD]|T[NX]|UT|V[TA]|W[AVIY]|AS|GU|MP|PR|VI|UM)$", 0.9),
    ("STREET_ADDR", r"^[0-9]+ .*(St|Street|Ave|Avenue|Rd|Road|Blvd|Boulevard|Dr|Drive|Ln|Lane|Ct|Court|Way|Pl|Place)\.?$", 0.8),
    ("FILE_NAME", r"^[A-Za-z0-9_\-./\\]+\.[A-Za-z0-9]{1,4}$", 0.9),
    ("CREDIT_CARD", r"^[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}$", 0.9),
    ("DELIMITED_DATA", r"^[^,|\t]+([,|\t][^,|\t]*){2,}$", 0.9),
    ("SSN", r"^[0-9]{3}-[0-9]{2}-[0-9]{4}$", 0.9),
]

EMAIL_RE = STD_PATTERNS[0][1]

# Date-as-text formats accepted by IS_DATE (templated_functions.yaml:16-108
# validates many formats with month-length rules; Spark's try_to_timestamp
# replaces the 90-line regex).
DATE_FORMATS = [
    "yyyy-MM-dd",
    "yyyy-MM-dd HH:mm:ss",
    "MM/dd/yyyy",
    "M/d/yyyy",
    "dd-MMM-yyyy",
    "MMM dd yyyy",
    "MMM dd, yyyy",
    "yyyyMMdd",
]

# Pattern alphabet mapping for top_patterns (profiling query :125-140):
# lowercase→a, uppercase→A, digit→N, everything else kept.
PATTERN_MAPS = [("[a-z]", "a"), ("[A-Z]", "A"), ("[0-9]", "N")]
