"""Schema scan ("data chars refresh") — ColumnChars from DataFrame schemas.

Reference semantics: testgen reflects ``information_schema`` per run and
classifies every column into a one-letter *general type* that gates which
profiling metric blocks run
(`/root/reference/testgen/template/flavors/postgresql/data_chars/get_schema_ddf.sql:28-46`,
driver `testgen/commands/queries/refresh_data_chars_query.py:12-120`).

Spark-first mapping: the schema is already typed (``df.schema``), so the scan
is metadata-only except for the row count.  Include/exclude table masks are
``fnmatch`` globs like the reference's SQL ``LIKE`` masks
(`refresh_data_chars_query.py:67-101`).  Schema-change detection
(`template/data_chars/data_chars_update.sql` → ``data_structure_log``) becomes
a diff of consecutive ColumnChars snapshots.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# General types, mirroring get_schema_ddf.sql:28-42:
#   A alpha, B boolean, D date/timestamp, T time, N numeric, X other
_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_DATE_TYPES = (T.DateType, T.TimestampType, T.TimestampNTZType)


def general_type(dtype: T.DataType) -> str:
    if isinstance(dtype, (T.StringType, T.CharType, T.VarcharType)):
        return "A"
    if isinstance(dtype, T.BooleanType):
        return "B"
    if isinstance(dtype, _DATE_TYPES):
        return "D"
    if isinstance(dtype, _NUMERIC_TYPES):
        return "N"
    return "X"


def is_decimal_type(dtype: T.DataType) -> bool:
    """Mirrors get_schema_ddf.sql:43-46 — fractional-capable numerics."""
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return True
    if isinstance(dtype, T.DecimalType):
        return dtype.scale > 0
    return False


@dataclass
class ColumnChars:
    """Per-column schema snapshot (refresh_data_chars_query.py:12-25)."""

    table_name: str
    column_name: str
    ordinal_position: int
    column_type: str          # Spark simpleString, e.g. "bigint"
    general_type: str         # A/B/D/N/X
    is_decimal: bool
    record_ct: int | None = None


@dataclass
class TableChars:
    table_name: str
    record_ct: int | None
    column_ct: int
    columns: list[ColumnChars] = field(default_factory=list)


def scan_table(df: DataFrame, table_name: str, with_count: bool = True) -> TableChars:
    """ColumnChars for one DataFrame. One metadata pass + optional count job.

    At scale the count is a parquet-metadata-only job (Spark reads row counts
    from footers when no filter is present), so this stays O(files) not O(rows).
    """
    record_ct = df.count() if with_count else None
    cols = [
        ColumnChars(
            table_name=table_name,
            column_name=f.name,
            ordinal_position=i + 1,
            column_type=f.dataType.simpleString(),
            general_type=general_type(f.dataType),
            is_decimal=is_decimal_type(f.dataType),
            record_ct=record_ct,
        )
        for i, f in enumerate(df.schema.fields)
    ]
    return TableChars(table_name=table_name, record_ct=record_ct, column_ct=len(cols), columns=cols)


def filter_tables(
    names: list[str],
    include_mask: str | None = None,
    exclude_mask: str | None = None,
) -> list[str]:
    """Glob include/exclude masks (reference uses SQL LIKE '%' masks;
    refresh_data_chars_query.py:67-101). ``%`` is accepted as an alias for ``*``."""

    def _glob(m: str) -> str:
        return m.replace("%", "*").replace("_", "?") if ("%" in m) else m

    out = names
    if include_mask:
        masks = [_glob(m.strip()) for m in include_mask.split(",")]
        out = [n for n in out if any(fnmatch.fnmatch(n, m) for m in masks)]
    if exclude_mask:
        masks = [_glob(m.strip()) for m in exclude_mask.split(",")]
        out = [n for n in out if not any(fnmatch.fnmatch(n, m) for m in masks)]
    return out


def scan_tables(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    include_mask: str | None = None,
    exclude_mask: str | None = None,
    with_count: bool = True,
) -> list[TableChars]:
    selected = filter_tables(sorted(tables), include_mask, exclude_mask)
    return [scan_table(tables[name], name, with_count=with_count) for name in selected]


def column_chars_df(spark: SparkSession, scans: list[TableChars]) -> DataFrame:
    """ColumnChars snapshots as a DataFrame (the app-DB ``data_column_chars``)."""
    rows = [
        (c.table_name, c.column_name, c.ordinal_position, c.column_type,
         c.general_type, c.is_decimal, c.record_ct)
        for t in scans for c in t.columns
    ]
    schema = T.StructType([
        T.StructField("table_name", T.StringType()),
        T.StructField("column_name", T.StringType()),
        T.StructField("ordinal_position", T.IntegerType()),
        T.StructField("column_type", T.StringType()),
        T.StructField("general_type", T.StringType()),
        T.StructField("is_decimal", T.BooleanType()),
        T.StructField("record_ct", T.LongType()),
    ])
    return spark.createDataFrame(rows, schema)


def schema_diff(prev: list[TableChars], curr: list[TableChars]) -> list[dict]:
    """Diff two snapshots → data_structure_log events
    (dbsetup/030_initialize_new_schema_structure.sql:398-412):
    table_added / table_dropped / column_added / column_dropped / column_changed.
    """
    events: list[dict] = []
    prev_tables = {t.table_name: t for t in prev}
    curr_tables = {t.table_name: t for t in curr}
    for name in sorted(set(prev_tables) | set(curr_tables)):
        p, c = prev_tables.get(name), curr_tables.get(name)
        if p is None:
            events.append({"change": "table_added", "table_name": name, "column_name": None, "detail": None})
            continue
        if c is None:
            events.append({"change": "table_dropped", "table_name": name, "column_name": None, "detail": None})
            continue
        pcols = {col.column_name: col for col in p.columns}
        ccols = {col.column_name: col for col in c.columns}
        for cname in sorted(set(pcols) | set(ccols)):
            pc, cc = pcols.get(cname), ccols.get(cname)
            if pc is None:
                events.append({"change": "column_added", "table_name": name, "column_name": cname,
                               "detail": ccols[cname].column_type})
            elif cc is None:
                events.append({"change": "column_dropped", "table_name": name, "column_name": cname,
                               "detail": pc.column_type})
            elif pc.column_type != cc.column_type:
                events.append({"change": "column_changed", "table_name": name, "column_name": cname,
                               "detail": f"{pc.column_type}->{cc.column_type}"})
    return events
