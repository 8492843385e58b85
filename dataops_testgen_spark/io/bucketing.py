"""Bucketed table storage — the shuffle-elimination layer for repeated
joins at 100 TB.

Why this exists: every referential operator here (Combo_Match,
Aggregate_Balance, Timeframe_Combo, dedup anti-joins, drill-down
source joins) shuffles both sides on the join key per run. A monitoring
deployment runs those joins every cycle against the SAME tables, so the
per-run shuffle is pure waste. Writing both sides bucketed by the join
key (Spark's Hive-style bucketing: ``bucketBy(n, key).sortBy(key)``)
stores them pre-partitioned; at read time Catalyst sees compatible
``HashPartitioning(key, n)`` output partitioning on both scans and plans
a SortMergeJoin with ZERO Exchange — each task joins bucket i against
bucket i straight off storage.

The same applies one level down to aggregations: ``groupBy(key)`` over a
table bucketed by ``key`` skips its Exchange too (partial and final agg
fuse into one stage).

No reference counterpart: the reference's app-DB targets row stores with
B-tree indexes; bucketing is the lakehouse-native equivalent of that
physical design decision.

Notes that matter in production:
- bucket counts on both join sides must be equal (or one a multiple of
  the other with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- ``sortBy`` makes the per-bucket files pre-sorted so SMJ skips its Sort
  when ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` — left
  default-off here because sorted writes cost at write time and the
  Exchange (not the Sort) is the scale killer;
- bucketed writes require ``saveAsTable`` (bucket metadata lives in the
  catalog, not the parquet footer), hence the table-name API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed catalog table keyed for co-located
    joins/aggs on ``bucket_cols``."""
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    w = (df.write.mode(mode)
         .bucketBy(num_buckets, bucket_cols[0], *bucket_cols[1:]))
    if sort:
        w = w.sortBy(bucket_cols[0], *bucket_cols[1:])
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog, so
    this is just ``spark.table`` — named for symmetry/discoverability)."""
    return spark.table(table)


def is_exchange_free_join(a: DataFrame, b: DataFrame, on: list[str]) -> bool:
    """True when joining ``a`` and ``b`` on ``on`` plans with no SHUFFLE
    exchange (hash/range repartitioning of either side) — the check the
    tests (and a deployment's plan audit) use to prove the bucketing
    removed the shuffle. A BroadcastExchange doesn't count: at small
    scale Catalyst may still broadcast one side, which is exactly right
    and moves no data through a shuffle."""
    plan = (a.join(b, on)._jdf.queryExecution().executedPlan().toString())
    return ("Exchange hashpartitioning" not in plan
            and "Exchange rangepartitioning" not in plan)
