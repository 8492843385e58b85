"""Secondary profiling: value/pattern frequency analysis for string columns.

Reference: one query per qualifying column computing top-10 value frequencies
(`ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC)`) and an MD5 content hash of the
sorted distinct values
(`/root/reference/testgen/template/flavors/postgresql/profiling/
project_secondary_profiling_query.sql:1-34`), plus top-5 value *patterns*
([a-z]→a, [A-Z]→A, [0-9]→N) in the primary query (:125-140, :229-235).
Qualifying columns: A-type, 2–70 distinct values, max length ≤ 70
(`template/profiling/secondary_profiling_columns.sql:1-12`).

Spark-first: ALL string columns of a table are handled in ONE job — unpivot
via explode(array(struct...)), groupBy (column, value), then window top-k.
Pattern counts reuse the value counts (a pattern's count = sum of its values'
counts), so the raw table is scanned exactly once.

Tie-breaking is deterministic (count DESC, value ASC) per FIXTURES.md's
oracle protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataops_testgen_spark import schema_scan

TOP_FREQ_K = 10
TOP_PATTERN_K = 5
FREQ_MIN_DISTINCT = 2
FREQ_MAX_DISTINCT = 70
FREQ_MAX_LENGTH = 70


def _unpivot(df: DataFrame, col_names: list[str]) -> DataFrame:
    structs = [
        F.struct(F.lit(name).alias("column_name"),
                 F.col(name).cast("string").alias("value"))
        for name in col_names
    ]
    return df.select(F.explode(F.array(*structs)).alias("kv")).select("kv.*")


def pattern_of(value):
    """Map a string to its character-class pattern (profiling query :125-140)."""
    out = F.regexp_replace(value, "[a-z]", "a")
    out = F.regexp_replace(out, "[A-Z]", "A")
    return F.regexp_replace(out, "[0-9]", "N")


def secondary_profile(
    df: DataFrame,
    alpha_cols: list[schema_scan.ColumnChars],
    table_name: str,
) -> DataFrame | None:
    """→ (table_name, column_name, top_patterns, distinct_pattern_ct,
          top_freq_values, distinct_value_hash) for each string column."""
    if not alpha_cols:
        return None
    names = [c.column_name for c in alpha_cols]
    vals = _unpivot(df, names).filter(F.col("value").isNotNull())

    counts = vals.groupBy("column_name", "value").agg(F.count(F.lit(1)).alias("ct"))

    w = Window.partitionBy("column_name")
    w_rank = w.orderBy(F.col("ct").desc(), F.col("value").asc())
    enriched = counts.select(
        "column_name", "value", "ct",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_distinct"),
        F.max(F.length("value")).over(w).alias("max_len"),
    )

    qualifies = (
        (F.col("n_distinct") >= FREQ_MIN_DISTINCT)
        & (F.col("n_distinct") <= FREQ_MAX_DISTINCT)
        & (F.col("max_len") <= FREQ_MAX_LENGTH)
    )
    freq = (
        enriched.groupBy("column_name")
        .agg(
            F.when(
                F.first(qualifies),
                F.concat_ws(
                    " | ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(F.col("rn") <= TOP_FREQ_K,
                                       F.struct("rn", "value", "ct"))
                            )
                        ),
                        lambda s: F.concat_ws(":", s["value"], s["ct"].cast("string")),
                    ),
                ),
            ).alias("top_freq_values"),
            F.when(
                F.first(qualifies),
                F.md5(F.concat_ws("|", F.array_sort(F.collect_set("value")))),
            ).alias("distinct_value_hash"),
        )
    )

    pat_counts = (
        counts.withColumn("pattern", pattern_of(F.col("value")))
        .groupBy("column_name", "pattern")
        .agg(F.sum("ct").alias("ct"))
    )
    wp = Window.partitionBy("column_name")
    wp_rank = wp.orderBy(F.col("ct").desc(), F.col("pattern").asc())
    patterns = (
        pat_counts.select(
            "column_name", "pattern", "ct",
            F.row_number().over(wp_rank).alias("rn"),
            F.count(F.lit(1)).over(wp).alias("distinct_pattern_ct"),
        )
        .groupBy("column_name")
        .agg(
            F.concat_ws(
                " | ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("rn") <= TOP_PATTERN_K,
                                   F.struct("rn", "pattern", "ct"))
                        )
                    ),
                    lambda s: F.concat_ws(":", s["pattern"], s["ct"].cast("string")),
                ),
            ).alias("top_patterns"),
            F.first("distinct_pattern_ct").cast("long").alias("distinct_pattern_ct"),
        )
    )

    return (
        freq.join(patterns, "column_name", "full")
        .select(
            F.lit(table_name).alias("table_name"),
            "column_name",
            "top_patterns",
            "distinct_pattern_ct",
            "top_freq_values",
            "distinct_value_hash",
        )
    )
