"""Structured Streaming monitors (SURVEY §2.7 extension).

The reference has no true streaming — "continuous monitoring" is
cron-scheduled batch (`scheduler/base.py:1-50`). This module is the
Spark-native extension: the same Volume/Freshness/Metric monitor semantics
expressed as incremental Structured Streaming queries over an event stream,
with watermarks for late data.
"""

from dataops_testgen_spark.streaming.monitors import (
    freshness_monitor,
    referential_monitor,
    metric_trend_monitor,
    stateful_freshness_monitor,
    volume_monitor,
)

__all__ = ["volume_monitor", "freshness_monitor", "metric_trend_monitor",
           "stateful_freshness_monitor", "referential_monitor"]
