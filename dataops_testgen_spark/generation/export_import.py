"""Test-definition export / import — portable JSON round-trip.

Mirrors the reference's API semantics
(`/root/reference/testgen/api/test_definition_service.py:53-330`, spec'd by
`tests/unit/api/test_td_export_import.py`):

- **Export** filters a suite's definitions by origin (auto = has
  last_auto_gen_date / manual / both), table and type, assigns a stable
  ``external_id`` to manual definitions that lack one (idempotent), and
  emits ``{"source": {...}, "definitions": [...]}``.
- **Import** matches incoming definitions — auto rows by the natural key
  (test_type, table_name, column_name), manual rows by ``external_id`` —
  then applies the configured policies: ``on_match`` (overwrite_all /
  overwrite_unlocked / skip), ``on_new`` (skip / create /
  create_and_lock), ``on_absence`` (do_nothing / delete_all /
  delete_unlocked), under ``mode`` preview / apply / apply_strict
  (strict refuses to apply when anything would be skipped).  Unknown test
  types, unprofiled tables, and manual rows without an external_id are
  skipped with the matching reason; duplicate keys in the payload raise.

Scale shape: test definitions are metadata-plane (one row per generated
test, thousands per suite — never data-scale), so the match/plan pass runs
on a collected lightweight projection exactly like the reference's; the
result re-enters Spark as a DataFrame for the downstream CAT/query engines.
"""

from __future__ import annotations

import datetime as _dt
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEF_COLUMNS = ("test_type", "table_name", "column_name", "test_active",
               "last_auto_gen_date", "params", "severity", "lock_refresh",
               "external_id")

DEF_SCHEMA = T.StructType([
    T.StructField("test_type", T.StringType()),
    T.StructField("table_name", T.StringType()),
    T.StructField("column_name", T.StringType()),
    T.StructField("test_active", T.StringType()),
    T.StructField("last_auto_gen_date", T.StringType()),
    T.StructField("params", T.MapType(T.StringType(), T.StringType())),
    T.StructField("severity", T.StringType()),
    T.StructField("lock_refresh", T.BooleanType()),
    T.StructField("external_id", T.StringType()),
])

# identity / matching fields never overwritten on update
# (_UPDATE_EXCLUDE_FIELDS, test_definition_service.py:38-40)
_UPDATE_EXCLUDE = {"test_type", "last_auto_gen_date", "external_id"}


class ImportError_(ValueError):
    """400-equivalent: invalid payload (duplicate keys)."""


def normalize_defs(defs: DataFrame) -> DataFrame:
    """Add the optional columns older pipelines don't carry."""
    out = defs
    if "severity" not in out.columns:
        out = out.withColumn("severity", F.lit(None).cast("string"))
    if "lock_refresh" not in out.columns:
        out = out.withColumn("lock_refresh", F.lit(False))
    if "external_id" not in out.columns:
        out = out.withColumn("external_id", F.lit(None).cast("string"))
    if "test_active" not in out.columns:
        out = out.withColumn("test_active", F.lit("Y"))
    return out.select(*DEF_COLUMNS)


def _row_to_export(r) -> dict:
    d = {
        "test_type": r["test_type"],
        "table_name": r["table_name"],
        "column_name": r["column_name"],
        "test_active": r["test_active"],
        "last_auto_gen_date": r["last_auto_gen_date"],
        "params": dict(r["params"] or {}),
        "severity": r["severity"],
        "lock_refresh": bool(r["lock_refresh"]),
    }
    if r["external_id"] is not None:
        d["external_id"] = r["external_id"]
    return d


def export_definitions(
    defs: DataFrame,
    source: dict | None = None,
    origin: str = "both",                  # auto | manual | both
    table_name: str | None = None,
    test_type: str | None = None,
    now: _dt.datetime | None = None,
) -> tuple[dict, DataFrame]:
    """Returns (document, defs_with_assigned_external_ids).

    Manual definitions (last_auto_gen_date IS NULL) without an external_id
    get one assigned — deterministic UUID5 over the natural key + a
    disambiguating row number, so repeated exports are idempotent and the
    updated DataFrame should be persisted back (the reference UPDATEs the
    suite in place, :64-74)."""
    defs = normalize_defs(defs)

    if origin in ("manual", "both"):
        from pyspark.sql import Window

        needs_id = F.col("last_auto_gen_date").isNull() \
            & F.col("external_id").isNull()
        rn = F.row_number().over(
            Window.partitionBy("test_type", "table_name", "column_name")
            .orderBy(F.col("params").cast("string")))
        seed = F.concat_ws("|", F.col("test_type"), F.col("table_name"),
                           F.coalesce(F.col("column_name"), F.lit("")),
                           rn.cast("string"))
        # UUID5-style: md5 of the seed formatted as a UUID (stable across
        # engines and runs, unlike the reference's gen_random_uuid — an
        # intentional improvement so exports diff cleanly in VCS)
        h = F.md5(seed)
        stable = F.concat_ws(
            "-", F.substring(h, 1, 8), F.substring(h, 9, 4),
            F.substring(h, 13, 4), F.substring(h, 17, 4),
            F.substring(h, 21, 12))
        defs = defs.withColumn(
            "external_id", F.when(needs_id, stable)
            .otherwise(F.col("external_id")))

    filtered = defs
    if origin == "auto":
        filtered = filtered.filter(F.col("last_auto_gen_date").isNotNull())
    elif origin == "manual":
        filtered = filtered.filter(F.col("last_auto_gen_date").isNull())
    if table_name is not None:
        filtered = filtered.filter(F.col("table_name") == table_name)
    if test_type is not None:
        filtered = filtered.filter(F.col("test_type") == test_type)

    rows = filtered.orderBy("test_type", "table_name", "column_name").collect()
    doc = {
        "source": {
            **(source or {}),
            "exported_at": (now or _dt.datetime.now(_dt.timezone.utc))
            .isoformat(),
        },
        "definitions": [_row_to_export(r) for r in rows],
    }
    return doc, defs


@dataclass
class ImportConfig:
    mode: str = "preview"              # preview | apply | apply_strict
    on_match: str = "overwrite_unlocked"   # overwrite_all | overwrite_unlocked | skip
    on_new: str = "create"             # skip | create | create_and_lock
    on_absence: str = "do_nothing"     # do_nothing | delete_all | delete_unlocked


@dataclass
class ImportItem:
    index: int | None                  # None for absence deletes
    action: str                        # create | update | skip | delete
    reason: str                        # matched | no_match | policy | locked |
    #                                    invalid_test_type | invalid_table |
    #                                    missing_external_id | absent
    test_type: str | None = None
    table_name: str | None = None
    column_name: str | None = None


@dataclass
class ImportResult:
    items: list[ImportItem]
    applied: bool
    result_defs: DataFrame | None      # post-apply definitions (None if not applied)
    summary: dict = field(default_factory=dict)

    def __post_init__(self):
        counts = {"create": 0, "update": 0, "skip": 0, "delete": 0}
        for it in self.items:
            counts[it.action] += 1
        self.summary = {**counts, "total": len(self.items)}


def _check_duplicate_keys(incoming: list[dict]) -> None:
    auto_keys, manual_keys = set(), set()
    for idx, td in enumerate(incoming):
        if td.get("last_auto_gen_date") is not None:
            key = (td["test_type"], td.get("table_name"), td.get("column_name"))
            if key in auto_keys:
                raise ImportError_(
                    f"duplicate_natural_key at index {idx}: {key}")
            auto_keys.add(key)
        elif td.get("external_id") is not None:
            if td["external_id"] in manual_keys:
                raise ImportError_(
                    f"duplicate_natural_key at index {idx}: "
                    f"{td['external_id']}")
            manual_keys.add(td["external_id"])


def import_definitions(
    spark: SparkSession,
    existing: DataFrame | None,
    payload: dict,
    config: ImportConfig | None = None,
    valid_test_types: set[str] | None = None,
    profiled_tables: set[str] | None = None,
    now: str | None = None,
) -> ImportResult:
    """Plan + (optionally) apply an import document against a suite.

    ``valid_test_types`` defaults to the full registry in execution.defs;
    ``profiled_tables`` of None skips the table check (mirrors the
    reference passing every profiled table)."""
    config = config or ImportConfig()
    incoming = list(payload.get("definitions", []))
    _check_duplicate_keys(incoming)
    if valid_test_types is None:
        from dataops_testgen_spark.execution.drilldown import TEST_LOOKUPS
        from dataops_testgen_spark.generation.selection import selection_catalog

        valid_test_types = ({t for t, *_ in selection_catalog()}
                            | set(TEST_LOOKUPS))

    existing = normalize_defs(existing) if existing is not None else \
        spark.createDataFrame([], DEF_SCHEMA)
    existing_rows = existing.collect()

    auto_index, manual_index = {}, {}
    for i, row in enumerate(existing_rows):
        if row["last_auto_gen_date"] is not None:
            auto_index[(row["test_type"], row["table_name"],
                        row["column_name"])] = i
        elif row["external_id"] is not None:
            manual_index[row["external_id"]] = i

    items: list[ImportItem] = []
    plans: list[tuple[str, int | None, dict | None]] = []  # action, target idx, payload row
    matched: set[int] = set()

    for idx, td in enumerate(incoming):
        is_auto = td.get("last_auto_gen_date") is not None
        target: int | None = None
        if is_auto:
            target = auto_index.get(
                (td["test_type"], td.get("table_name"), td.get("column_name")))
        elif td.get("external_id") is not None:
            target = manual_index.get(td["external_id"])
        if target is not None:
            matched.add(target)   # protect from absence-delete even on skip

        def _item(action, reason):
            items.append(ImportItem(idx, action, reason, td.get("test_type"),
                                    td.get("table_name"),
                                    td.get("column_name")))
            plans.append((action, target, td))

        if not is_auto and td.get("external_id") is None:
            _item("skip", "missing_external_id")
            continue
        if td.get("test_type") not in valid_test_types:
            _item("skip", "invalid_test_type")
            continue
        if (profiled_tables is not None and td.get("table_name") is not None
                and td["table_name"] not in profiled_tables):
            _item("skip", "invalid_table")
            continue

        if target is None:
            if config.on_new == "skip":
                _item("skip", "no_match")
            else:
                _item("create", "no_match")
        else:
            trow = existing_rows[target]
            if config.on_match == "skip":
                _item("skip", "policy")
            elif config.on_match == "overwrite_unlocked" \
                    and trow["lock_refresh"]:
                _item("skip", "locked")
            else:
                _item("update", "matched")

    if config.on_absence != "do_nothing":
        for i, row in enumerate(existing_rows):
            if i in matched:
                continue
            if config.on_absence == "delete_all" or (
                    config.on_absence == "delete_unlocked"
                    and not row["lock_refresh"]):
                items.append(ImportItem(None, "delete", "absent",
                                        row["test_type"], row["table_name"],
                                        row["column_name"]))
                plans.append(("delete", i, None))

    should_apply = config.mode in ("apply", "apply_strict")
    has_skips = any(it.action == "skip" for it in items)
    if not should_apply or (config.mode == "apply_strict" and has_skips):
        return ImportResult(items, applied=False, result_defs=None)

    # --- apply: rebuild the definition rows driver-side, re-enter Spark ---
    now = now or _dt.date.today().isoformat()
    out_rows = [dict(r.asDict()) for r in existing_rows]
    deletes: set[int] = set()
    for action, target, td in plans:
        if action == "create":
            is_auto = td.get("last_auto_gen_date") is not None
            out_rows.append({
                "test_type": td["test_type"],
                "table_name": td.get("table_name"),
                "column_name": td.get("column_name"),
                "test_active": td.get("test_active", "Y"),
                "last_auto_gen_date": now if is_auto else None,
                "params": dict(td.get("params") or {}),
                "severity": td.get("severity"),
                "lock_refresh": True
                if (config.on_new == "create_and_lock" and is_auto)
                else bool(td.get("lock_refresh", False)),
                "external_id": td.get("external_id"),
            })
        elif action == "update":
            row = out_rows[target]
            for k in ("table_name", "column_name", "test_active", "params",
                      "severity", "lock_refresh"):
                if k in td and k not in _UPDATE_EXCLUDE:
                    row[k] = dict(td[k]) if k == "params" else td[k]
            # inherit the payload's external_id when the target has none
            if row["external_id"] is None and td.get("external_id"):
                row["external_id"] = td["external_id"]
        elif action == "delete":
            deletes.add(target)
    final = [r for i, r in enumerate(out_rows)
             if i >= len(existing_rows) or i not in deletes]
    result_defs = spark.createDataFrame(
        [tuple(r[c] for c in DEF_COLUMNS) for r in final], DEF_SCHEMA)
    return ImportResult(items, applied=True, result_defs=result_defs)
