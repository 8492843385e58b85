"""Parquet loaders tolerant of nanosecond timestamps.

Spark's vectorized parquet reader rejects INT64 TIMESTAMP(NANOS) columns
(PARQUET_TYPE_ILLEGAL). We read them as raw longs
(``spark.sql.legacy.parquet.nanosAsLong``) and convert to microsecond
timestamps — sub-microsecond precision is not used by any operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = ["region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"]

# Columns stored as TIMESTAMP(NANOS) in the driver-generated parquet.
_NANO_TS_COLUMNS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLUMNS.get(name, []):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros((F.col(col) / 1000).cast("long")))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
