"""Hygiene-issue (anomaly) screening over inferred profile results.

Reference: the 32 anomaly-type YAMLs under
`/root/reference/testgen/template/dbsetup_anomaly_types/` evaluated by
data-object class via the screening queries
`template/profiling/profile_anomalies_screen_{column,multi_column,
table_dates,variants}.sql`, with prevalence scoring from
`profile_anomaly_scoring.sql`.

Extensions beyond the reference's 32 types: the Benford first-digit
rule (33rd catalog entry, fed by the profiler's fused digit census —
`benford.py` is the standalone screen / drill-down), the
Correlated_Columns rule (34th — `correlation.py`, derived/duplicate-
column detection, the numeric analogue of the contingency rules) and
the Dependent_Column rule (35th — `dependence.py`, eta² group
dependence: a numeric determined by a categorical). The latter two run
as the screen's Correlation/Dependence classes via
``screen_anomalies(..., tables=...)``.
"""

from dataops_testgen_spark.anomalies.benford import benford_screen
from dataops_testgen_spark.anomalies.correlation import (
    correlation_anomalies, correlation_screen)
from dataops_testgen_spark.anomalies.dependence import (
    dependence_anomalies, group_dependence_screen)
from dataops_testgen_spark.anomalies.screen import screen_anomalies

__all__ = ["benford_screen", "correlation_anomalies",
           "correlation_screen", "dependence_anomalies",
           "group_dependence_screen", "screen_anomalies"]
