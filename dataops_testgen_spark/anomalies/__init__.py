"""Hygiene-issue (anomaly) screening over inferred profile results.

Reference: the 32 anomaly-type YAMLs under
`/root/reference/testgen/template/dbsetup_anomaly_types/` evaluated by
data-object class via the screening queries
`template/profiling/profile_anomalies_screen_{column,multi_column,
table_dates,variants}.sql`, with prevalence scoring from
`profile_anomaly_scoring.sql`.
"""

from dataops_testgen_spark.anomalies.screen import screen_anomalies

__all__ = ["screen_anomalies"]
