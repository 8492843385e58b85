"""DQ scoring: prevalence formulas + prevalence-weighted rollups.

Reference: `template/rollup_scores/*.sql`, per-test-type
``dq_score_prevalence_formula`` in `template/dbsetup_test_types/*.yaml`,
``fn_eval`` / ``fn_normal_cdf`` / aggregate ``sum_ln`` in
`template/dbsetup/020_create_standard_functions_sprocs.sql:157-303`.
"""

from dataops_testgen_spark.scoring.formulas import (
    PREVALENCE_FORMULAS,
    RISK_FACTORS,
    eval_prevalence,
    fn_normal_cdf,
)
from dataops_testgen_spark.scoring.rollup import (
    attach_test_prevalence,
    rollup_scores,
    sum_ln,
)

__all__ = [
    "PREVALENCE_FORMULAS", "RISK_FACTORS", "eval_prevalence", "fn_normal_cdf",
    "attach_test_prevalence", "rollup_scores", "sum_ln",
]
