"""Template-based test generators (the "funny"/query test types).

- ``generate_constant_tests`` — `gen_funny_cat_tests/gen_Constant.sql:1-45`:
  a column is Constant when across the last ≤5 profiling runs it always has
  exactly one distinct value, the same value in every run, max_length < 100,
  and more than one run observed.  Date columns' rank-1 rows are excluded
  from the candidate aggregation only (constancy judged on earlier runs);
  the latest row still supplies the baseline, mirroring the reference's
  selected_columns/latest_results split.
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


def generate_dupe_rows_tests(inferred_profile: DataFrame) -> DataFrame:
    """`gen_query_tests/gen_Dupe_Rows.sql:1-55`: one table-scope Dupe_Rows
    definition per profiled table, grouping by EVERY column in ordinal
    order (the reference STRING_AGGs all profile columns into
    groupby_names)."""
    c = F.col
    return (
        inferred_profile.groupBy("table_name")
        .agg(
            F.max("run_date").alias("run_date"),
            F.concat_ws(",", F.array_sort(F.collect_list(
                F.struct(c("ordinal_position"), c("column_name"))
            )).getField("column_name")).alias("groupby_names"),
        )
        .select(
            F.lit("Dupe_Rows").alias("test_type"),
            "table_name",
            F.lit(None).cast("string").alias("column_name"),
            F.lit("Y").alias("test_active"),
            c("run_date").alias("last_auto_gen_date"),
            F.create_map(
                F.lit("groupby_names"), c("groupby_names"),
                F.lit("threshold_value"), F.lit("0"),
            ).alias("params"),
        )
    )


def generate_schema_drift_tests(inferred_profile: DataFrame,
                                schema_name: str = "default") -> DataFrame:
    """`gen_query_tests/gen_Schema_Drift.sql:1-33`: one schema-scope
    Schema_Drift definition (no table/column binding)."""
    return (
        inferred_profile.agg(F.max("run_date").alias("run_date"))
        .select(
            F.lit("Schema_Drift").alias("test_type"),
            F.lit(schema_name).alias("table_name"),
            F.lit(None).cast("string").alias("column_name"),
            F.lit("Y").alias("test_active"),
            F.col("run_date").alias("last_auto_gen_date"),
            F.create_map(F.lit("schema_name"), F.lit(schema_name)).alias("params"),
        )
    )


def generate_freshness_trend_tests(inferred_profile: DataFrame) -> DataFrame:
    """`gen_query_tests/gen_Freshness_Trend.sql:1-210`: per table, pick the
    fingerprint element columns —

    - top-2 ID columns (ID-Unique% first, then ID-Secondary, then other IDs,
      by distinct_value_ct DESC);
    - top process-date column (name hints %mod%/%up% before %cr%/%in%);
    - top transactional/period/timestamp date column;
    - top numeric measure by the weighted change-detection score
      (0.25·cardinality + 0.15·range + 0.10·nontriviality +
       0.40·variability + 0.10·null-penalty);

    → one Freshness_Trend definition per table with history_calculation
    PREDICT and a ``fingerprint_spec`` ("col:gtype,…" in element order) that
    ``fingerprint_exprs_for`` turns back into aggregate Columns."""
    c = F.col
    base = inferred_profile.select(
        "table_name", "column_name", "run_date", "general_type",
        "functional_data_type", "distinct_value_ct", "record_ct",
        "null_value_ct", "max_value", "min_value", "avg_value", "stdev_value")
    fdt = F.lower(c("functional_data_type"))

    ids = base.filter(c("general_type").isin("A", "D", "N")
                      & fdt.like("id%")).withColumn(
        "rank", F.row_number().over(
            Window.partitionBy("table_name").orderBy(
                F.when(fdt.like("id-unique%"), 1)
                .when(c("functional_data_type") == "ID-Secondary", 2)
                .otherwise(3),
                c("distinct_value_ct").desc(), "column_name"))
    ).filter(c("rank") <= 2).select(
        "table_name", "column_name", "run_date", "general_type",
        F.lit("ID").alias("element_type"), (c("rank") + 10).alias("fp_order"))

    proc = base.filter(c("general_type").isin("A", "D", "N")
                       & fdt.like("process%")).withColumn(
        "rank", F.row_number().over(
            Window.partitionBy("table_name").orderBy(
                F.when(F.lower(c("column_name")).like("%mod%"), 1)
                .when(F.lower(c("column_name")).like("%up%"), 1)
                .when(F.lower(c("column_name")).like("%cr%"), 2)
                .when(F.lower(c("column_name")).like("%in%"), 2),
                c("distinct_value_ct").desc(), "column_name"))
    ).filter(c("rank") == 1).select(
        "table_name", "column_name", "run_date", "general_type",
        F.lit("DATE_P").alias("element_type"), (c("rank") + 20).alias("fp_order"))

    tran = base.filter(fdt.like("transactional date%") | fdt.like("period%")
                       | (fdt == "timestamp")).withColumn(
        "rank", F.row_number().over(
            Window.partitionBy("table_name").orderBy(
                c("distinct_value_ct").desc(), "column_name"))
    ).filter(c("rank") == 1).select(
        "table_name", "column_name", "run_date", "general_type",
        F.lit("DATE_T").alias("element_type"), (c("rank") + 30).alias("fp_order"))

    dv = c("distinct_value_ct").cast("double")
    rc = c("record_ct").cast("double")
    score = (
        0.25 * (dv / F.nullif(rc, F.lit(0.0)))
        + 0.15 * ((c("max_value") - c("min_value"))
                  / F.nullif(F.abs(F.nullif(c("avg_value"), F.lit(0.0))), F.lit(1.0)))
        + 0.10 * (F.least(F.lit(1.0), F.log(F.greatest(dv, F.lit(2.0))))
                  / F.log(F.greatest(rc, F.lit(2.0))))
        + 0.40 * (c("stdev_value")
                  / F.nullif(F.abs(F.nullif(c("avg_value"), F.lit(0.0))), F.lit(1.0)))
        + 0.10 * (1.0 - (c("null_value_ct").cast("double")
                         / F.nullif(F.nullif(rc, F.lit(0.0)), F.lit(1.0))))
    )
    meas = base.filter((c("general_type") == "N")
                       & (fdt.like("measure%")
                          | c("functional_data_type").isin("Sequence", "Constant"))
                       ).withColumn("score", score) \
        .filter(c("score").isNotNull()).withColumn(
        "rank", F.row_number().over(
            Window.partitionBy("table_name").orderBy(
                c("score").desc(), "column_name"))
    ).filter(c("rank") == 1).select(
        "table_name", "column_name", "run_date", "general_type",
        F.lit("MEAS").alias("element_type"), (c("rank") + 40).alias("fp_order"))

    combined = ids.unionByName(proc).unionByName(tran).unionByName(meas)
    ordered = F.array_sort(F.collect_list(F.struct(
        "element_type", "fp_order", "column_name", "general_type")))
    return (
        combined.groupBy("table_name")
        .agg(F.max("run_date").alias("run_date"), ordered.alias("elems"))
        .select(
            F.lit("Freshness_Trend").alias("test_type"),
            "table_name",
            F.lit(None).cast("string").alias("column_name"),
            F.lit("Y").alias("test_active"),
            c("run_date").alias("last_auto_gen_date"),
            F.create_map(
                F.lit("groupby_names"),
                F.concat_ws(",", c("elems").getField("column_name")),
                F.lit("history_calculation"), F.lit("PREDICT"),
                F.lit("fingerprint_spec"),
                F.concat_ws(",", F.transform(
                    c("elems"),
                    lambda e: F.concat_ws(":", e["column_name"],
                                          e["general_type"]))),
            ).alias("params"),
        )
    )


def fingerprint_exprs_for(spec: str) -> "list[Column]":
    """``fingerprint_spec`` ("col:gtype,…") → aggregate Columns in the
    reference's fingerprint shape (`gen_Freshness_Trend.sql:150-165`):
    COUNT(*) plus, per column — D: min/max/countDistinct; A: those +
    SUM(LENGTH); N: count, countDistinct of a modular projection, min/max
    at 6dp, and two modular checksums (primes 1000000007/1000000009)."""
    from pyspark.sql import Column  # noqa: F401

    exprs: list = [F.count(F.lit(1))]
    if not spec:
        return exprs
    for part in spec.split(","):
        name, gtype = part.rsplit(":", 1)
        col = F.col(name)
        if gtype == "D":
            exprs += [F.min(col), F.max(col.cast("string")),
                      F.countDistinct(col)]
        elif gtype == "A":
            exprs += [F.min(col), F.max(col.cast("string")),
                      F.countDistinct(col), F.sum(F.length(col))]
        else:  # N
            scaled = (F.coalesce(col, F.lit(0)).cast("decimal(38,6)")
                      * 1000000).cast("decimal(38,0)")
            abs_scaled = (F.abs(F.coalesce(col, F.lit(0))).cast("decimal(38,6)")
                          * 1000000).cast("decimal(38,6)")
            exprs += [
                F.count(col),
                F.countDistinct(F.pmod(scaled, F.lit(1000003))),
                F.min(col).cast("decimal(38,6)"),
                F.max(col).cast("decimal(38,6)"),
                F.pmod(F.coalesce(F.sum(F.pmod(abs_scaled, F.lit(1000000007))),
                                  F.lit(0)), F.lit(1000000007)),
                F.pmod(F.coalesce(F.sum(F.pmod(abs_scaled, F.lit(1000000009))),
                                  F.lit(0)), F.lit(1000000009)),
            ]
    return exprs
