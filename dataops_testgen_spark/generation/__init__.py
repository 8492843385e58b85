"""Test generation: profile-driven auto-generation of test definitions.

Reference: `template/generation/gen_selection_tests.sql:1-67` (selection-
criteria types), `template/gen_funny_cat_tests/*.sql` +
`template/gen_query_tests/*.sql` (template types),
`template/generation/delete_stale_autogen_tests.sql` (cleanup).
"""

from dataops_testgen_spark.generation.selection import (
    generate_selection_tests,
    to_test_defs,
)
from dataops_testgen_spark.generation.templates import (
    fingerprint_exprs_for,
    generate_constant_tests,
    generate_dupe_rows_tests,
    generate_freshness_trend_tests,
    generate_schema_drift_tests,
    generate_table_tests,
)
from dataops_testgen_spark.generation.cleanup import delete_stale_tests

__all__ = [
    "generate_selection_tests", "to_test_defs",
    "generate_constant_tests", "generate_table_tests", "delete_stale_tests",
    "generate_dupe_rows_tests", "generate_freshness_trend_tests",
    "generate_schema_drift_tests", "fingerprint_exprs_for",
]
