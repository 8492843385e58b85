"""Parquet-backed run store — the reference's Postgres app DB dissolved into
a lakehouse directory.

The reference persists every run into app-DB tables (``profiling_runs``,
``profile_results``, ``profile_anomaly_results``, ``test_suites``,
``test_definitions``, ``test_runs``, ``test_results``) and serves its CLI
list/get commands with SQL over them
(`/root/reference/testgen/commands/run_get_entities.py`,
`/root/reference/testgen/template/get_entities/*.sql`).  Here the same
tables are append-mode parquet under one root directory, and the entity
queries are Spark DataFrame plans over them.

Scale note: these are metadata-plane tables (one row per profiled column /
test / run, not per data row), so they stay tiny relative to the data being
profiled; appends are new parquet files per run (no rewrite), and every
entity query filters on run/suite first so partition pruning applies if the
store is later partitioned by run_id.
"""

from __future__ import annotations

import json
import os
import uuid
import datetime as dt

from pyspark.sql import DataFrame, SparkSession, functions as F

# App-DB tables persisted per run (ref dbsetup 030_initialize_new_schema
# structure — the subset that survives the engine redesign).
TABLES = (
    "profiling_runs",
    "profile_results",
    "profile_anomaly_results",
    "test_suites",
    "test_definitions",
    "test_runs",
    "test_results",
    # scoring refresh layer (ref run_rollup_scores / score card results)
    "score_history",
    "score_cards",
)

# The store's largest relations and the keys their every-refresh consumers
# join/group on: the scoring refresh joins profile_anomaly_results to
# profile_results on (table_name, column_name) and rollup_scores groups on
# the same pair. Bucketing these three on that key makes the whole scoring
# path plan with zero shuffle Exchange (the run-id filter stays a parquet
# min/max pushdown — these are metadata-plane tables, so losing the run-id
# DIRECTORY pruning costs little next to losing the per-refresh shuffles).
BUCKETED_STORE_KEYS: dict[str, list[str]] = {
    "profile_results": ["table_name", "column_name"],
    "profile_anomaly_results": ["table_name", "column_name"],
    "test_results": ["table_name", "column_name"],
}


class RunStore:
    """Append/read accessors + the get_entities query layer.

    ``bucket_results=N`` switches the BUCKETED_STORE_KEYS tables to
    external bucketed catalog tables (data stays under the store root);
    reads re-register the table in a fresh session from the bucketed
    files, so the layout survives process restarts."""

    def __init__(self, spark: SparkSession, root: str,
                 project_key: str = "DEFAULT",
                 bucket_results: int | None = None):
        self.spark = spark
        self.root = root
        self.project_key = project_key
        self.bucket_results = bucket_results
        os.makedirs(root, exist_ok=True)
        meta = os.path.join(root, "project.json")
        if not os.path.exists(meta):
            with open(meta, "w") as fh:
                json.dump({"project_key": project_key,
                           "created": dt.datetime.now().isoformat(),
                           "bucket_results": bucket_results}, fh)
        else:
            with open(meta) as fh:
                m = json.load(fh)
            if bucket_results is None:
                # a store written bucketed stays bucketed: later sessions
                # pick the layout up from the meta, no flag needed
                self.bucket_results = m.get("bucket_results")
            elif m.get("bucket_results") != bucket_results:
                if m.get("bucket_results"):
                    # appending with a different bucket count into the
                    # existing bucketed files would corrupt the layout
                    raise ValueError(
                        f"store at {root} is bucketed with "
                        f"{m['bucket_results']} buckets; cannot switch to "
                        f"{bucket_results} (rewrite the store to change)")
                m["bucket_results"] = bucket_results
                with open(meta, "w") as fh:
                    json.dump(m, fh)

    # -- raw table access ---------------------------------------------------

    def _path(self, table: str) -> str:
        if table not in TABLES:
            raise ValueError(f"unknown store table {table!r}")
        return os.path.join(self.root, table)

    def _bucketed(self, table: str) -> bool:
        return bool(self.bucket_results) and table in BUCKETED_STORE_KEYS

    def _catalog_name(self, table: str) -> str:
        import hashlib
        h = hashlib.md5(os.path.abspath(self.root).encode()).hexdigest()[:8]
        return f"tg_store_{h}_{table}"

    def _bucketed_path(self, table: str) -> str:
        return self._path(table) + "_bucketed"

    def append(self, table: str, df: DataFrame,
               partition_by: str | None = None) -> None:
        """Append-mode parquet write; result tables are directory-partitioned
        on their run/suite id so every entity query's leading filter becomes
        a partition-pruned scan (one run's files read, not the whole
        history). In bucketed mode the BUCKETED_STORE_KEYS tables append
        through the bucketed catalog table instead."""
        if self._bucketed(table):
            self._register_bucketed(table)
            keys = BUCKETED_STORE_KEYS[table]
            (df.write.mode("append")
             .bucketBy(self.bucket_results, keys[0], *keys[1:])
             .sortBy(*keys)
             .option("path", self._bucketed_path(table))
             .format("parquet").saveAsTable(self._catalog_name(table)))
            return
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(self._path(table))

    def _register_bucketed(self, table: str) -> bool:
        """Re-create the catalog entry for a bucketed store table written
        by an earlier session (external-table DDL over the existing
        bucketed files; their names carry the bucket ids). True when the
        table exists (already or after registration)."""
        name = self._catalog_name(table)
        if self.spark.catalog.tableExists(name):
            return True
        path = self._bucketed_path(table)
        if not os.path.isdir(path):
            return False
        ddl = self.spark.read.parquet(path)._jdf.schema().toDDL()
        keys = ", ".join(BUCKETED_STORE_KEYS[table])
        self.spark.sql(
            f"CREATE TABLE {name} ({ddl}) USING parquet "
            f"CLUSTERED BY ({keys}) SORTED BY ({keys}) "
            f"INTO {self.bucket_results} BUCKETS LOCATION '{path}'")
        return True

    def read(self, table: str) -> DataFrame | None:
        if self._bucketed(table):
            if self._register_bucketed(table):
                return self.spark.table(self._catalog_name(table))
            # fall through: a store created without bucketing may still
            # hold this table as plain parquet
        path = self._path(table)
        if not os.path.isdir(path):
            return None
        # an append of an EMPTY relation (e.g. a test run where every
        # definition was deactivated) leaves only _SUCCESS — no data
        # files, so schema inference would throw UNABLE_TO_INFER_SCHEMA
        if not any(f.endswith(".parquet")
                   for _r, _d, fs in os.walk(path) for f in fs):
            return None
        return self.spark.read.parquet(path)

    @staticmethod
    def new_run_id() -> str:
        return str(uuid.uuid4())

    # -- run recording ------------------------------------------------------

    def record_profile_run(self, inferred: DataFrame, anomalies: DataFrame,
                           table_group_id: str, run_date: str,
                           status: str = "Complete") -> str:
        """Persist one profiling run: header row + per-column results +
        anomaly screen output (ref run_profiling_bridge.py writes the same
        three)."""
        run_id = self.new_run_id()
        stamp = dt.datetime.now().isoformat()
        hdr = self.spark.createDataFrame(
            [(run_id, self.project_key, table_group_id, stamp, run_date,
              status)],
            "profile_run_id string, project_key string, table_groups_id "
            "string, start_time string, run_date string, status string")
        self.append("profiling_runs", hdr)
        self.append("profile_results",
                    inferred.withColumn("profile_run_id", F.lit(run_id)),
                    partition_by="profile_run_id")
        self.append("profile_anomaly_results",
                    anomalies.withColumn("profile_run_id", F.lit(run_id)),
                    partition_by="profile_run_id")
        return run_id

    def record_test_generation(self, test_definitions: DataFrame,
                               test_suite_key: str, run_date: str) -> None:
        """Persist generated test_definitions stamped with suite + gen date
        (ref test_definitions.last_auto_gen_date semantics). Regeneration
        for the same suite replaces the prior generation (upsert semantics
        live in generation.selection.merge_test_defs; the store keeps every
        generation, consumers take the latest per suite)."""
        suites = self.read("test_suites")
        known = set()
        if suites is not None:
            known = {r["test_suite_key"]
                     for r in suites.select("test_suite_key").distinct()
                     .collect()}
        if test_suite_key not in known:
            self.append("test_suites", self.spark.createDataFrame(
                [(str(uuid.uuid4()), self.project_key, test_suite_key)],
                "test_suite_id string, project_key string, test_suite_key "
                "string"))
        self.append(
            "test_definitions",
            test_definitions
            .withColumn("test_suite_key", F.lit(test_suite_key))
            .withColumn("last_auto_gen_date",
                        F.lit(dt.datetime.now().isoformat()))
            .withColumn("profiling_as_of_date", F.lit(run_date)),
            partition_by="test_suite_key")

    def record_test_run(self, results: DataFrame, test_suite_key: str,
                        run_date: str, status: str = "Complete",
                        start_time: str | None = None) -> str:
        run_id = self.new_run_id()
        stamp = start_time or dt.datetime.now().isoformat()
        self.append("test_runs", self.spark.createDataFrame(
            [(run_id, self.project_key, test_suite_key, stamp, run_date,
              status)],
            "test_run_id string, project_key string, test_suite_key string, "
            "test_starttime string, run_date string, status string"))
        self.append("test_results",
                    results.withColumn("test_run_id", F.lit(run_id))
                    .withColumn("test_suite_key", F.lit(test_suite_key)),
                    partition_by="test_run_id")
        return run_id

    # -- get_entities queries ----------------------------------------------
    # Each mirrors one template/get_entities/*.sql; all filter before
    # aggregating and join only metadata-sized tables.

    def _empty(self, schema: str) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def list_profiles(self, table_group_id: str | None = None) -> DataFrame:
        """get_profile_list.sql — one row per profiling run with table and
        column counts."""
        runs, res = self.read("profiling_runs"), self.read("profile_results")
        if runs is None or res is None:
            return self._empty(
                "profile_run_id string, project_key string, "
                "table_groups_id string, start_time string, status string, "
                "tables long, columns long")
        if table_group_id:
            runs = runs.filter(F.col("table_groups_id") == table_group_id)
        counts = res.groupBy("profile_run_id").agg(
            F.countDistinct("table_name").alias("tables"),
            F.countDistinct(F.concat_ws(".", "table_name", "column_name"))
            .alias("columns"))
        return (runs.join(counts, "profile_run_id")
                .select("profile_run_id", "project_key", "table_groups_id",
                        "start_time", "status", "tables", "columns")
                .orderBy(F.col("start_time").desc()))

    def profile_info(self, profile_run_id: str,
                     table_name: str | None = None) -> DataFrame:
        """get_profile_info.sql — per-column type detail for one run."""
        res = self.read("profile_results")
        if res is None:
            return self._empty(
                "profile_run_id string, run_date string, table_name string, "
                "column_name string, general_type string, column_type "
                "string, functional_data_type string")
        out = res.filter(F.col("profile_run_id") == profile_run_id)
        if table_name:
            out = out.filter(F.lower("table_name") == table_name.lower())
        return (out.select("profile_run_id", "run_date", "table_name",
                           "column_name", "general_type", "column_type",
                           "functional_data_type")
                .orderBy("table_name", "column_name"))

    def diff_profiles(self, run_a: str | None = None,
                      run_b: str | None = None,
                      table_group_id: str | None = None) -> DataFrame:
        """Per-column metric drift between two stored profile runs —
        volume (record/value/null counts), cardinality, and semantic
        changes (functional type, std pattern). Defaults to the table
        group's two most recent runs so a scheduled
        ``run-profile --store`` cycle can be followed by
        ``diff-profiles`` with no ids. Only columns where a tracked field
        changed (or that appear/disappear) are emitted. No reference CLI
        counterpart (the reference shows run-over-run drift in its UI
        trend views); the metric set mirrors profile_results.

        Metadata-plane: both sides are one row per column."""
        runs = self.read("profiling_runs")
        res = self.read("profile_results")
        empty_schema = (
            "table_name string, column_name string, change string, "
            "record_ct_a long, record_ct_b long, value_ct_a long, "
            "value_ct_b long, null_value_ct_a long, null_value_ct_b long, "
            "distinct_value_ct_a long, distinct_value_ct_b long, "
            "functional_data_type_a string, functional_data_type_b string, "
            "std_pattern_match_a string, std_pattern_match_b string")
        if runs is None or res is None:
            return self._empty(empty_schema)
        if run_a is None or run_b is None:
            # default each missing id INDEPENDENTLY: a caller passing only
            # one id means "diff that run against its natural counterpart",
            # not "ignore what I passed and use the latest two"
            r = runs
            if table_group_id:
                r = r.filter(F.col("table_groups_id") == table_group_id)
            ordered = [x["profile_run_id"] for x in
                       r.orderBy(F.col("start_time").desc()).collect()]
            if run_b is None:
                # newest run (newest distinct from run_a when only a given)
                cands = [x for x in ordered if x != run_a]
                if not cands:
                    return self._empty(empty_schema)
                run_b = cands[0]
            if run_a is None:
                # the run immediately BEFORE run_b in start_time order
                later = (ordered.index(run_b) + 1 if run_b in ordered
                         else len(ordered))
                if later >= len(ordered):
                    return self._empty(empty_schema)
                run_a = ordered[later]
        tracked = ["record_ct", "value_ct", "null_value_ct",
                   "distinct_value_ct", "functional_data_type",
                   "std_pattern_match"]
        keys = ["table_name", "column_name"]
        a = res.filter(F.col("profile_run_id") == run_a).select(
            *keys, *[F.col(m).alias(f"{m}_a") for m in tracked])
        b = res.filter(F.col("profile_run_id") == run_b).select(
            *keys, *[F.col(m).alias(f"{m}_b") for m in tracked])
        j = a.join(b, keys, "full_outer")
        added = F.col("record_ct_a").isNull() & F.col("record_ct_b").isNotNull()
        dropped = F.col("record_ct_b").isNull() & F.col("record_ct_a").isNotNull()
        changed = None
        for m in tracked:
            ne = ~(F.col(f"{m}_a").eqNullSafe(F.col(f"{m}_b")))
            changed = ne if changed is None else (changed | ne)
        change = (F.when(added, F.lit("added"))
                   .when(dropped, F.lit("dropped"))
                   .when(changed, F.lit("changed")))
        out_cols = [*keys, change.alias("change")]
        for m in tracked:
            out_cols.extend([F.col(f"{m}_a"), F.col(f"{m}_b")])
        return (j.select(*out_cols).filter(F.col("change").isNotNull())
                .orderBy("table_name", "column_name"))

    def profile_anomalies(self, profile_run_id: str,
                          table_name: str | None = None) -> DataFrame:
        """get_profile_screen.sql analogue — the hygiene-screen findings
        recorded with the run (the modern anomaly screen supersedes the
        legacy inline screen SQL; same consumer contract: table, column,
        screening test, detail)."""
        res = self.read("profile_anomaly_results")
        if res is None:
            return self._empty(
                "table_name string, column_name string, anomaly_type "
                "string, detail string, likelihood string")
        out = res.filter(F.col("profile_run_id") == profile_run_id)
        if table_name:
            out = out.filter(F.lower("table_name") == table_name.lower())
        return (out.select("table_name", "column_name", "anomaly_type",
                           "detail", "likelihood")
                .orderBy("anomaly_type", "table_name", "column_name"))

    def list_test_generation(self, test_suite_key: str) -> DataFrame:
        """get_test_generation_list.sql — one row per generation run."""
        defs = self.read("test_definitions")
        if defs is None:
            return self._empty(
                "test_suite_key string, last_auto_gen_date string, "
                "profiling_as_of_date string, tables long, columns long, "
                "tests long")
        return (defs.filter(F.col("test_suite_key") == test_suite_key)
                .groupBy("test_suite_key", "last_auto_gen_date",
                         "profiling_as_of_date")
                .agg(F.countDistinct("table_name").alias("tables"),
                     F.countDistinct(
                         F.concat_ws(".", "table_name", "column_name"))
                     .alias("columns"),
                     F.count(F.lit(1)).alias("tests"))
                .orderBy(F.col("last_auto_gen_date").desc()))

    def test_info(self, test_suite_key: str) -> DataFrame:
        """get_test_info.sql — current tests for a suite, latest generation
        only, joined to test-type metadata."""
        from dataops_testgen_spark.execution.test_types import TEST_TYPES

        defs = self.read("test_definitions")
        if defs is None:
            return self._empty(
                "project_key string, test_suite_key string, test_type "
                "string, test_description string, dq_dimension string, "
                "measure_uom string, table_name string, column_name string, "
                "threshold_value string, last_auto_gen_date string")
        latest = (defs.filter(F.col("test_suite_key") == test_suite_key)
                  .agg(F.max("last_auto_gen_date")).first()[0])
        cur = defs.filter(
            (F.col("test_suite_key") == test_suite_key)
            & (F.col("last_auto_gen_date") == F.lit(latest)))
        meta = self.spark.createDataFrame(
            [(m.test_type, m.description, m.dq_dimension, m.measure_uom)
             for m in TEST_TYPES.values()],
            "test_type string, test_description string, dq_dimension "
            "string, measure_uom string")
        thr = ("threshold_value" if "threshold_value" in cur.columns
               else F.lit(None).cast("string").alias("threshold_value"))
        return (cur.join(F.broadcast(meta), "test_type", "left")
                .select(F.lit(self.project_key).alias("project_key"),
                        "test_suite_key", "test_type", "test_description",
                        "dq_dimension", "measure_uom", "table_name",
                        "column_name", thr, "last_auto_gen_date")
                .orderBy("table_name", "column_name", "test_type"))

    def list_test_runs(self, test_suite_key: str) -> DataFrame:
        """get_test_run_list.sql — run header + result/fail counts."""
        runs, res = self.read("test_runs"), self.read("test_results")
        if runs is None or res is None:
            return self._empty(
                "test_suite_key string, test_time string, status string, "
                "test_run_id string, table_ct long, result_ct long, "
                "fail_ct long")
        counts = res.groupBy("test_run_id").agg(
            F.countDistinct(F.lower("table_name")).alias("table_ct"),
            F.count(F.lit(1)).alias("result_ct"),
            F.sum(F.when(F.col("result_code") == 0, 1)).alias("fail_ct"))
        return (runs.filter(F.col("test_suite_key") == test_suite_key)
                .join(counts, "test_run_id")
                .select("test_suite_key",
                        F.col("test_starttime").alias("test_time"),
                        "status", "test_run_id", "table_ct", "result_ct",
                        "fail_ct")
                .orderBy(F.col("test_time").desc()))

    def test_results_for_run(self, test_run_id: str,
                             fails_only: bool = False) -> DataFrame:
        """get_test_results_for_run_cli.sql — per-test outcome rows."""
        from dataops_testgen_spark.execution.test_types import TEST_TYPES

        res = self.read("test_results")
        if res is None:
            return self._empty(
                "test_suite_key string, table_name string, column_name "
                "string, test_type string, result string, result_message "
                "string, result_measure double, measure_uom string")
        out = res.filter(F.col("test_run_id") == test_run_id)
        if fails_only:
            out = out.filter(F.col("result_code") == 0)
        uom = self.spark.createDataFrame(
            [(m.test_type, m.measure_uom) for m in TEST_TYPES.values()],
            "test_type string, measure_uom string")
        return (out.join(F.broadcast(uom), "test_type", "left")
                .select("test_suite_key", "table_name", "column_name",
                        "test_type",
                        F.col("result_status").alias("result"),
                        F.coalesce("result_message", F.lit(""))
                        .alias("result_message"),
                        "result_measure", "measure_uom")
                .orderBy("table_name", "column_name", "test_type"))

    def list_test_suites(self) -> DataFrame:
        """get_test_suite_list.sql — suites with latest-generation test
        counts."""
        suites = self.read("test_suites")
        if suites is None:
            return self._empty("test_suite_id string, project_key string, "
                               "test_suite_key string, tests long")
        defs = self.read("test_definitions")
        if defs is None:
            return suites.withColumn("tests", F.lit(0).cast("long"))
        counts = (defs.groupBy("test_suite_key", "last_auto_gen_date")
                  .agg(F.count(F.lit(1)).alias("tests")))
        latest = (counts.groupBy("test_suite_key")
                  .agg(F.max_by("tests", "last_auto_gen_date")
                       .alias("tests")))
        return (suites.join(latest, "test_suite_key", "left")
                .select("test_suite_id", "project_key", "test_suite_key",
                        F.coalesce("tests", F.lit(0)).alias("tests"))
                .orderBy("test_suite_key"))

    def list_table_groups(self) -> DataFrame:
        """get_table_group_list.sql — distinct table groups seen in
        profiling runs."""
        runs = self.read("profiling_runs")
        if runs is None:
            return self._empty("table_groups_id string, project_key "
                               "string, profile_runs long, last_run string")
        return (runs.groupBy("table_groups_id", "project_key")
                .agg(F.count(F.lit(1)).alias("profile_runs"),
                     F.max("start_time").alias("last_run"))
                .orderBy("table_groups_id"))
