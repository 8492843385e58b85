"""Template-based test generators (the "funny"/query test types).

- ``generate_constant_tests`` — `gen_funny_cat_tests/gen_Constant.sql:1-45`:
  a column is Constant when across the last ≤5 profiling runs it always has
  exactly one distinct value, the same value in every run, max_length < 100,
  more than one run observed, and (for run 1) it is not a date column.
- ``generate_table_tests`` — one definition per table:
  `gen_query_tests/gen_Volume_Trend.sql:1-47` (COUNT custom query, PREDICT
  thresholds) and `gen_query_tests/gen_Table_Freshness.sql` (MD5 fingerprint
  of top-2 ID columns + latest process date + measure columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def generate_constant_tests(profile_history: DataFrame) -> DataFrame:
    """profile rows from ≤5 most recent runs → Constant test definitions."""
    c = F.col
    runs = profile_history.select("run_date").distinct()
    ranked = runs.withColumn(
        "run_rank",
        F.dense_rank().over(Window.orderBy(F.col("run_date").desc())),
    ).filter(c("run_rank") <= 5)
    p = profile_history.join(ranked, "run_date")

    observed = F.when(c("general_type") == "A", c("min_text")) \
        .when(c("general_type") == "N", c("min_value").cast("string")) \
        .when(c("general_type").isin("D", "T"), c("min_date").cast("string")) \
        .when((c("general_type") == "B") & (c("boolean_true_ct") == c("value_ct")), F.lit("TRUE")) \
        .when((c("general_type") == "B") & (c("boolean_true_ct") == 0)
              & (c("distinct_value_ct") == 1), F.lit("FALSE"))

    candidates = (
        p.filter(~((c("general_type") == "D") & (c("run_rank") == 1)))
        .groupBy("table_name", "column_name")
        .agg(
            F.sum(F.when(c("distinct_value_ct") == 1, 0).otherwise(1)).alias("not_one_val"),
            F.sum(F.when(c("max_length") < 100, 0).otherwise(1)).alias("too_long"),
            F.countDistinct(observed).alias("agg_distinct_val_ct"),
            F.count(F.lit(1)).alias("n_runs"),
        )
        .filter((c("not_one_val") == 0) & (c("too_long") == 0)
                & (c("agg_distinct_val_ct") == 1) & (c("n_runs") > 1))
        .select("table_name", "column_name")
    )

    latest = p.filter(c("run_rank") == 1)
    baseline = (
        F.when(c("general_type") == "A", c("min_text"))
        .when(c("general_type") == "D", c("min_date").cast("string"))
        .when(c("general_type") == "N", c("min_value").cast("string"))
        .when((c("general_type") == "B") & (c("boolean_true_ct") == 0), F.lit("FALSE"))
        .when((c("general_type") == "B") & (c("boolean_true_ct") > 0), F.lit("TRUE"))
        .otherwise(F.lit(""))
    )
    return (
        latest.join(candidates, ["table_name", "column_name"])
        .select(
            F.lit("Constant").alias("test_type"),
            "table_name", "column_name",
            F.lit("Y").alias("test_active"),
            c("run_date").alias("last_auto_gen_date"),
            F.create_map(
                F.lit("baseline_value"), baseline,
                F.lit("threshold_value"), F.lit("0"),
            ).alias("params"),
        )
    )


def generate_table_tests(inferred_profile: DataFrame) -> DataFrame:
    """Per-table Volume_Trend + Table_Freshness definitions."""
    c = F.col
    id_rank = F.row_number().over(
        Window.partitionBy("table_name").orderBy(
            F.when(F.lower(c("functional_data_type")).like("id%"), 0).otherwise(1),
            "ordinal_position",
        )
    )
    cols = inferred_profile.select(
        "table_name", "column_name", "run_date", "functional_data_type",
        "general_type", id_rank.alias("id_rank"),
    )
    per_table = cols.groupBy("table_name").agg(
        F.max("run_date").alias("run_date"),
        F.concat_ws(",", F.collect_list(
            F.when((c("id_rank") <= 2)
                   & F.lower(c("functional_data_type")).like("id%"), c("column_name"))
        )).alias("id_cols"),
        F.concat_ws(",", F.collect_list(
            F.when(F.lower(c("functional_data_type")).like("process%"), c("column_name"))
        )).alias("process_cols"),
        F.concat_ws(",", F.collect_list(
            F.when(F.lower(c("functional_data_type")).like("measure%"), c("column_name"))
        )).alias("measure_cols"),
    )
    volume = per_table.select(
        F.lit("Volume_Trend").alias("test_type"),
        "table_name",
        F.lit(None).cast("string").alias("column_name"),
        F.lit("Y").alias("test_active"),
        c("run_date").alias("last_auto_gen_date"),
        F.create_map(
            F.lit("history_calculation"), F.lit("PREDICT"),
            F.lit("custom_query"), F.lit("COUNT(CASE WHEN {SUBSET_CONDITION} THEN 1 END)"),
        ).alias("params"),
    )
    fingerprint_cols = F.concat_ws(
        ",", F.nullif(c("id_cols"), F.lit("")),
        F.nullif(c("process_cols"), F.lit("")),
        F.nullif(c("measure_cols"), F.lit("")),
    )
    freshness = per_table.select(
        F.lit("Table_Freshness").alias("test_type"),
        "table_name",
        F.lit(None).cast("string").alias("column_name"),
        F.lit("Y").alias("test_active"),
        c("run_date").alias("last_auto_gen_date"),
        F.create_map(
            F.lit("fingerprint_columns"), fingerprint_cols,
        ).alias("params"),
    )
    return volume.unionByName(freshness)
