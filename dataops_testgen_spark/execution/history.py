"""History-based threshold recompute.

Reference shape (`template/execution/update_history_calc_thresholds.sql:1-118`,
run by `commands/run_test_execution.py:82-83` before each execution):

1. For every active definition with a non-PREDICT ``history_calculation``,
   rank its past ``result_signal`` values by test_time, aggregate the
   newest ``history_lookback`` of them (latest value / min / max / sum /
   avg / stddev), and rewrite lower_tolerance / upper_tolerance from the
   chosen statistic — or from an ``EXPR:[...]`` template with
   {VALUE}/{MINIMUM}/{MAXIMUM}/{SUM}/{AVERAGE}/{STANDARD_DEVIATION} tokens
   substituted in.
2. For Freshness_Trend definitions, find the most recent run where the
   fingerprint CHANGED (lag comparison) and store it as the new
   baseline_value with its change time in baseline_sum.

Spark-first: both passes are window + aggregate over the metadata-plane
results table; the "UPDATE" is a left join producing a new definitions
DataFrame (immutable source of truth, like every other metadata update in
this engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC_RE = r"^-?[0-9]*\.?[0-9]+$"


def _stat_case(calc_col: str, s) -> F.Column:
    calc = F.col(calc_col)
    expr_body = F.expr(
        f"substring({calc_col}, 7, length({calc_col}) - 7)")
    substituted = expr_body
    for token, col in [("{VALUE}", s["val"]),
                       ("{MINIMUM}", s["min"]), ("{MAXIMUM}", s["max"]),
                       ("{SUM}", s["sum"]), ("{AVERAGE}", s["avg"]),
                       ("{STANDARD_DEVIATION}", s["stddev"])]:
        substituted = F.replace(
            substituted, F.lit(token),
            F.coalesce(col.cast("string"), F.lit("NULL")))
    return (
        F.when(calc == "Value", s["val"])
        .when(calc == "Minimum", s["min"].cast("string"))
        .when(calc == "Maximum", s["max"].cast("string"))
        .when(calc == "Sum", s["sum"].cast("string"))
        .when(calc == "Average", s["avg"].cast("string"))
        .when(calc.like("EXPR:[%]"), substituted)
    )


def update_history_calc_thresholds(defs: DataFrame,
                                   results: DataFrame) -> DataFrame:
    """Recompute lower/upper tolerances from result history (pass 1 of
    update_history_calc_thresholds.sql). ``defs`` needs test_id /
    test_active / history_calculation / history_calculation_upper /
    history_lookback; ``results`` needs test_id / test_time /
    result_signal."""
    filtered = defs.filter(
        (F.col("test_active") == "Y")
        & F.col("history_calculation").isNotNull()
        & (F.col("history_calculation") != "PREDICT")
        & F.col("history_lookback").isNotNull()
    ).select(
        "test_id", "history_calculation",
        "history_calculation_upper", "history_lookback",
        F.greatest(
            F.when(F.col("history_calculation") == "Value", F.lit(1))
            .otherwise(F.coalesce(F.col("history_lookback"), F.lit(1))),
            F.when(F.col("history_calculation_upper") == "Value", F.lit(1))
            .otherwise(F.coalesce(F.col("history_lookback"), F.lit(1))),
        ).alias("lookback"),
    )
    w = Window.partitionBy("test_id").orderBy(F.col("test_time").desc())
    ranked = (results.join(filtered.select("test_id", "lookback"), "test_id")
              .withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= F.col("lookback"))
              .withColumn(
                  "signal_numeric",
                  F.when(F.col("result_signal").rlike(_NUMERIC_RE),
                         F.col("result_signal").cast("double"))))
    stats = ranked.groupBy("test_id").agg(
        F.max(F.when(F.col("rank") == 1, F.col("result_signal"))).alias("val"),
        F.min("signal_numeric").alias("min"),
        F.max("signal_numeric").alias("max"),
        F.sum("signal_numeric").alias("sum"),
        F.avg("signal_numeric").alias("avg"),
        F.stddev_samp("signal_numeric").alias("stddev"),
    )
    # the stats join carries a constant marker so the update gates on "any
    # ranked history row exists" (the reference UPDATE's join condition) —
    # NOT on the newest result_signal being non-NULL: a test whose latest
    # signal is NULL but with older numeric history must still recompute
    stats = stats.withColumn("_has_stats", F.lit(True))
    joined = (defs.join(stats.alias("s"), "test_id", "left")
              .join(filtered.select("test_id").withColumn("_eligible", F.lit(True)),
                    "test_id", "left"))
    s = {c: F.col(f"s.{c}") for c in ("val", "min", "max", "sum", "avg", "stddev")}
    lower = _stat_case("history_calculation", s)
    upper = _stat_case("history_calculation_upper", s)
    apply_update = F.col("_eligible") & F.col("s._has_stats").isNotNull()
    out = joined.withColumn(
        "lower_tolerance",
        F.when(apply_update, lower).otherwise(F.col("lower_tolerance")),
    ).withColumn(
        "upper_tolerance",
        F.when(apply_update, upper).otherwise(F.col("upper_tolerance")),
    )
    return out.drop("val", "min", "max", "sum", "avg", "stddev",
                    "_eligible", "_has_stats")


def update_freshness_baselines(defs: DataFrame,
                               results: DataFrame) -> DataFrame:
    """Pass 2 (update_history_calc_thresholds.sql:95-118): latest CHANGED
    Freshness_Trend fingerprint becomes the definition's baseline_value,
    with its change time stored in baseline_sum."""
    w_time = Window.partitionBy("test_id").orderBy("test_time")
    changed = (results.filter(F.col("test_type") == "Freshness_Trend")
               .withColumn("_prev", F.lag("result_measure").over(w_time))
               .filter(~F.col("result_measure").eqNullSafe(F.col("_prev"))))
    w_desc = Window.partitionBy("test_id").orderBy(F.col("test_time").desc())
    latest = (changed.withColumn("rn", F.row_number().over(w_desc))
              .filter(F.col("rn") == 1)
              .select("test_id",
                      F.col("result_measure").alias("_new_baseline"),
                      F.col("test_time").cast("string").alias("_change_time")))
    out = defs.join(latest, "test_id", "left")
    return (out.withColumn(
        "baseline_value",
        F.coalesce(F.col("_new_baseline"), F.col("baseline_value")))
        .withColumn(
        "baseline_sum",
        F.when(F.col("_new_baseline").isNotNull(), F.col("_change_time"))
        .otherwise(F.col("baseline_sum")))
        .drop("_new_baseline", "_change_time"))
