"""Schema-change log + Schema_Drift METADATA test.

Reference: `data_chars_update.sql` appends column add/drop/modify events to
``data_structure_log`` on every schema refresh
(`dbsetup/030_initialize_new_schema_structure.sql:398-412`); the
Schema_Drift test aggregates the log since the previous test run into a
per-table signal ``A|adds|drops|mods|window_start``
(`test_types_Schema_Drift.yaml`).

Spark-first: a schema snapshot is the StructType of each table; the diff of
two snapshots IS the event log.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LOG_SCHEMA = ("log_date string, table_name string, column_name string, "
              "change_type string, old_type string, new_type string")


def schema_snapshot(tables: dict[str, DataFrame]) -> dict[str, dict[str, str]]:
    """{table: {column: simple type string}} — from df.schema, no scan."""
    return {
        name: {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for name, df in tables.items()
    }


def diff_snapshots(
    spark: SparkSession,
    previous: dict[str, dict[str, str]],
    current: dict[str, dict[str, str]],
    log_date: str | dt.date,
) -> DataFrame:
    """Structure-log rows for adds / drops / modifications between snapshots."""
    if isinstance(log_date, dt.date):
        log_date = log_date.isoformat()
    rows = []
    for table in sorted(set(previous) | set(current)):
        prev_cols = previous.get(table, {})
        cur_cols = current.get(table, {})
        if table not in previous:
            for col, typ in cur_cols.items():
                rows.append((log_date, table, col, "table_added", None, typ))
            continue
        if table not in current:
            for col, typ in prev_cols.items():
                rows.append((log_date, table, col, "table_dropped", typ, None))
            continue
        for col in cur_cols.keys() - prev_cols.keys():
            rows.append((log_date, table, col, "column_added", None, cur_cols[col]))
        for col in prev_cols.keys() - cur_cols.keys():
            rows.append((log_date, table, col, "column_dropped", prev_cols[col], None))
        for col in cur_cols.keys() & prev_cols.keys():
            if cur_cols[col] != prev_cols[col]:
                rows.append((log_date, table, col, "column_modified",
                             prev_cols[col], cur_cols[col]))
    return spark.createDataFrame(rows, LOG_SCHEMA)


def schema_drift_test(structure_log: DataFrame, since: str) -> DataFrame:
    """Per-table drift signal over log entries after ``since``:
    (table_name, adds, drops, mods, result_signal, result_code)."""
    windowed = structure_log.filter(F.col("log_date") > since)
    agg = windowed.groupBy("table_name").agg(
        F.sum(F.when(F.col("change_type").isin("column_added", "table_added"), 1)
              .otherwise(0)).cast("long").alias("adds"),
        F.sum(F.when(F.col("change_type").isin("column_dropped", "table_dropped"), 1)
              .otherwise(0)).cast("long").alias("drops"),
        F.sum(F.when(F.col("change_type") == "column_modified", 1)
              .otherwise(0)).cast("long").alias("mods"),
    )
    signal = F.concat_ws("|", F.lit("A"), F.col("adds").cast("string"),
                         F.col("drops").cast("string"), F.col("mods").cast("string"),
                         F.lit(since))
    return agg.select(
        "table_name", "adds", "drops", "mods",
        signal.alias("result_signal"),
        F.when(F.col("adds") + F.col("drops") + F.col("mods") > 0, 0)
        .otherwise(1).alias("result_code"),
    )
