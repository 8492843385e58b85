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
from pyspark.sql import functions as F

# Materialized null-safe group-key column (see add_null_safe_key): a
# struct over the bucket keys with POSITIONAL field names, so two tables
# with differently-NAMED key columns (o_custkey vs c_custkey) still get
# the identical struct type plain `=` needs.
NULL_SAFE_KEY_COL = "__tg_gk"


def add_null_safe_key(df: DataFrame, key_cols: list[str],
                      col_name: str = NULL_SAFE_KEY_COL) -> DataFrame:
    """Materialize the null-safe group key: ``struct(k0, k1, ...)`` with
    positional field names. Spark struct equality compares fields
    NULL-SAFELY (``struct(NULL) = struct(NULL)`` is true), so a plain
    ``=`` join on this ONE column has exactly ``eqNullSafe``-per-key
    semantics — without the Coalesce/IsNull key rewrite Catalyst applies
    to ``<=>`` joins, which is what defeats bucketed scans'
    HashPartitioning and forces the Exchange this column exists to
    remove (see aggregate_balance's struct_key_col)."""
    return df.withColumn(col_name, F.struct(
        *[F.col(c).alias(f"k{i}") for i, c in enumerate(key_cols)]))


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort: bool = True,
                   mode: str = "overwrite", path: str | None = None,
                   null_safe_key: bool = False) -> None:
    """Persist ``df`` as a bucketed catalog table keyed for co-located
    joins/aggs on ``bucket_cols``. With ``path`` the table is EXTERNAL
    (data at ``path``), which lets a later session re-register it from
    the manifest — the in-memory catalog of a non-Hive session dies with
    the process, the bucketed files don't.

    ``null_safe_key=True`` materializes ``NULL_SAFE_KEY_COL``
    (add_null_safe_key) and buckets by THAT single struct column instead
    of the raw keys: scans then expose ``HashPartitioning(__tg_gk)``,
    which the null-safe referential operators (aggregate_balance with
    ``struct_key_col``) group and plain-``=`` join on directly — zero
    Exchange end-to-end INCLUDING null group keys, which raw-key
    bucketing cannot give (the ``<=>`` key rewrite never matches the
    scan partitioning)."""
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    if null_safe_key:
        df = add_null_safe_key(df, bucket_cols)
        bucket_cols = [NULL_SAFE_KEY_COL]
    w = (df.write.mode(mode)
         .bucketBy(num_buckets, bucket_cols[0], *bucket_cols[1:]))
    if sort:
        w = w.sortBy(bucket_cols[0], *bucket_cols[1:])
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog, so
    this is just ``spark.table`` — named for symmetry/discoverability)."""
    return spark.table(table)


# Referential join/group keys per fixture table: customer-orders co-bucket
# on the customer key (Combo_Match / Aggregate_Balance group on it);
# lineitem on its order key (order-balance pairs); the rest on their PKs.
DEFAULT_BUCKET_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"], "nation": ["n_nationkey"],
    "customer": ["c_custkey"], "supplier": ["s_suppkey"],
    "part": ["p_partkey"], "orders": ["o_custkey"],
    "lineitem": ["l_orderkey"], "events": ["user_id"],
    "documents": ["doc_id"], "embeddings": ["vec_id"],
}

_BUCKET_PREFIX = "tg_bkt"


def bucket_table_name(table: str, bucket_dir: str) -> str:
    """Catalog name scoped by the bucket dir (hash suffix): two bucket
    dirs in one session must not silently alias each other's tables."""
    import hashlib
    import os

    h = hashlib.md5(os.path.abspath(bucket_dir).encode()).hexdigest()[:8]
    return f"{_BUCKET_PREFIX}_{h}_{table}"


def bucketize_data_dir(spark: SparkSession, data_dir: str, bucket_dir: str,
                       num_buckets: int = 32,
                       keys: dict[str, list[str]] | None = None,
                       tables: list[str] | None = None,
                       null_safe_keys: bool = False) -> dict[str, str]:
    """Write every parquet table in ``data_dir`` as an EXTERNAL bucketed
    catalog table under ``bucket_dir`` keyed for its referential joins
    (DEFAULT_BUCKET_KEYS unless overridden) — the one-time
    physical-design step that makes every subsequent
    ``run-tests --bucketed`` cycle's joins and groupBys plan
    Exchange-free. A ``manifest.json`` records each table's bucket spec
    and schema DDL so a LATER session (non-Hive catalogs are
    process-scoped) re-registers the same tables with
    ``register_bucketed``. Returns {table: catalog_name}; tables with no
    key mapping are skipped (they read from parquet as before).

    ``null_safe_keys=True`` materializes the null-safe struct key
    (``add_null_safe_key``) in every table and buckets by IT — the
    layout the referential QUERY engine's Exchange-free-with-NULL-keys
    plans need (query_tests ``struct_key_col``); the manifest records
    the source key columns so run-tests can match tests to the struct."""
    import glob
    import json
    import os

    keys = {**DEFAULT_BUCKET_KEYS, **(keys or {})}
    os.makedirs(bucket_dir, exist_ok=True)
    manifest: dict[str, dict] = {}
    out: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(data_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        if tables is not None and name not in tables:
            continue
        if name not in keys:
            continue
        df = spark.read.parquet(path)
        bucket_cols = [k for k in keys[name] if k in df.columns]
        if not bucket_cols:
            continue
        tbl = bucket_table_name(name, bucket_dir)
        loc = os.path.join(bucket_dir, name)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        if null_safe_keys:
            df = add_null_safe_key(df, bucket_cols)
            write_bucketed(df, tbl, [NULL_SAFE_KEY_COL],
                           num_buckets=num_buckets, path=loc)
        else:
            write_bucketed(df, tbl, bucket_cols, num_buckets=num_buckets,
                           path=loc)
        manifest[name] = {"catalog_name": tbl, "location": loc,
                          "bucket_cols": bucket_cols,
                          "null_safe_key": bool(null_safe_keys),
                          "num_buckets": num_buckets,
                          "schema_ddl": df._jdf.schema().toDDL()}
        out[name] = tbl
    with open(os.path.join(bucket_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return out


def register_bucketed(spark: SparkSession, bucket_dir: str) -> dict[str, str]:
    """Re-register the external bucketed tables described by
    ``bucket_dir``'s manifest into THIS session's catalog (no data is
    read or moved — the DDL points at the bucketed files, whose names
    carry their bucket ids). Idempotent. Returns {table: catalog_name}."""
    import json
    import os

    with open(os.path.join(bucket_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    out: dict[str, str] = {}
    for name, m in manifest.items():
        tbl = m["catalog_name"]
        if not spark.catalog.tableExists(tbl):
            cols = (NULL_SAFE_KEY_COL if m.get("null_safe_key")
                    else ", ".join(m["bucket_cols"]))
            spark.sql(
                f"CREATE TABLE {tbl} ({m['schema_ddl']}) USING parquet "
                f"CLUSTERED BY ({cols}) SORTED BY ({cols}) "
                f"INTO {m['num_buckets']} BUCKETS "
                f"LOCATION '{m['location']}'")
        out[name] = tbl
    return out


def struct_key_map(bucket_dir: str) -> dict[str, list[str]]:
    """{table: source key columns} for the tables a bucket dir stores
    with the null-safe struct-key layout — the map run-tests uses to
    decide when a referential test's keys line up with a table's
    materialized ``__tg_gk`` (empty for raw-key layouts)."""
    import json
    import os

    path = os.path.join(bucket_dir, "manifest.json")
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        manifest = json.load(fh)
    return {name: m["bucket_cols"] for name, m in manifest.items()
            if m.get("null_safe_key")}


def load_bucketed(spark: SparkSession, table: str,
                  bucket_dir: str) -> DataFrame | None:
    """The bucketed catalog variant of a data-dir table, or None if it was
    never bucketized/registered in this session."""
    tbl = bucket_table_name(table, bucket_dir)
    return spark.table(tbl) if spark.catalog.tableExists(tbl) else None


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
