"""Test-definition export/import round-trip tests.

Spec: the reference API semantics in
`/root/reference/testgen/api/test_definition_service.py` as exercised by
`/root/reference/tests/unit/api/test_td_export_import.py` — matching,
policy resolution (on_match/on_new/on_absence), strict mode, validation
skips, duplicate-key rejection, and export idempotency.
"""

from __future__ import annotations

import pytest

from dataops_testgen_spark.generation import export_import as EI

VALID = {"Unique", "Min_Val", "Row_Ct", "LOV_Match"}


def _defs(spark, rows):
    return spark.createDataFrame(
        [tuple(r.get(c) if c != "lock_refresh" else bool(r.get(c, False))
               for c in EI.DEF_COLUMNS) for r in rows], EI.DEF_SCHEMA)


def _auto(tt="Unique", tbl="orders", col="o_orderkey", **kw):
    return {"test_type": tt, "table_name": tbl, "column_name": col,
            "test_active": "Y", "last_auto_gen_date": "2026-01-01",
            "params": {"threshold_value": "0"}, **kw}


def _manual(tt="Min_Val", tbl="orders", col="o_totalprice", ext=None, **kw):
    return {"test_type": tt, "table_name": tbl, "column_name": col,
            "test_active": "Y", "last_auto_gen_date": None,
            "params": {"baseline_value": "1"}, "external_id": ext, **kw}


def test_export_assigns_stable_external_ids(spark):
    defs = _defs(spark, [_auto(), _manual()])
    doc1, updated1 = EI.export_definitions(defs, {"test_suite": "s1"})
    doc2, _ = EI.export_definitions(updated1, {"test_suite": "s1"})
    manual1 = [d for d in doc1["definitions"]
               if d["last_auto_gen_date"] is None]
    manual2 = [d for d in doc2["definitions"]
               if d["last_auto_gen_date"] is None]
    assert manual1[0]["external_id"] is not None
    # idempotent: the second export keeps the assigned id
    assert manual1[0]["external_id"] == manual2[0]["external_id"]
    # auto rows don't get one
    autos = [d for d in doc1["definitions"] if d["last_auto_gen_date"]]
    assert all("external_id" not in d for d in autos)


def test_export_origin_and_filters(spark):
    defs = _defs(spark, [_auto(), _auto(tbl="lineitem", col="l_orderkey"),
                         _manual(ext="e-1")])
    doc, _ = EI.export_definitions(defs, origin="auto")
    assert len(doc["definitions"]) == 2
    doc, _ = EI.export_definitions(defs, origin="manual")
    assert len(doc["definitions"]) == 1
    doc, _ = EI.export_definitions(defs, table_name="lineitem")
    assert len(doc["definitions"]) == 1
    doc, _ = EI.export_definitions(defs, test_type="Min_Val")
    assert len(doc["definitions"]) == 1


def test_import_round_trip_into_empty_suite(spark):
    defs = _defs(spark, [_auto(), _manual(ext="e-7")])
    doc, _ = EI.export_definitions(defs)
    res = EI.import_definitions(
        spark, None, doc, EI.ImportConfig(mode="apply"),
        valid_test_types=VALID)
    assert res.applied and res.summary["create"] == 2
    doc2, _ = EI.export_definitions(res.result_defs, now=None)
    # round-trip: same definitions (timestamps refreshed on create)
    key = lambda d: (d["test_type"], d["table_name"], d["column_name"])  # noqa: E731
    assert sorted(map(key, doc["definitions"])) \
        == sorted(map(key, doc2["definitions"]))
    p1 = {key(d): d["params"] for d in doc["definitions"]}
    p2 = {key(d): d["params"] for d in doc2["definitions"]}
    assert p1 == p2


def test_match_auto_by_natural_key_manual_by_external_id(spark):
    existing = _defs(spark, [_auto(), _manual(ext="e-1")])
    payload = {"definitions": [
        {**_auto(), "params": {"threshold_value": "5"}},
        {**_manual(ext="e-1", col="RENAMED"), "params": {"baseline_value": "9"}},
    ]}
    res = EI.import_definitions(
        spark, existing, payload,
        EI.ImportConfig(mode="apply", on_match="overwrite_all"),
        valid_test_types=VALID)
    assert [i.action for i in res.items] == ["update", "update"]
    rows = {r["test_type"]: r for r in res.result_defs.collect()}
    assert rows["Unique"]["params"]["threshold_value"] == "5"
    # manual update rewrites non-identity fields (column_name moved)
    assert rows["Min_Val"]["column_name"] == "RENAMED"


def test_on_match_policies(spark):
    existing = _defs(spark, [_auto(), _auto(tt="Row_Ct", col=None,
                                            lock_refresh=True)])
    payload = {"definitions": [_auto(), _auto(tt="Row_Ct", col=None)]}
    res = EI.import_definitions(spark, existing, payload,
                                EI.ImportConfig(on_match="skip"),
                                valid_test_types=VALID)
    assert [(i.action, i.reason) for i in res.items] \
        == [("skip", "policy"), ("skip", "policy")]
    res = EI.import_definitions(spark, existing, payload,
                                EI.ImportConfig(on_match="overwrite_unlocked"),
                                valid_test_types=VALID)
    assert [(i.action, i.reason) for i in res.items] \
        == [("update", "matched"), ("skip", "locked")]
    res = EI.import_definitions(spark, existing, payload,
                                EI.ImportConfig(on_match="overwrite_all"),
                                valid_test_types=VALID)
    assert all(i.action == "update" for i in res.items)


def test_on_new_policies_and_create_and_lock(spark):
    payload = {"definitions": [_auto(), _manual(ext="e-2")]}
    res = EI.import_definitions(spark, None, payload,
                                EI.ImportConfig(on_new="skip"),
                                valid_test_types=VALID)
    assert [(i.action, i.reason) for i in res.items] \
        == [("skip", "no_match")] * 2
    res = EI.import_definitions(
        spark, None, payload,
        EI.ImportConfig(mode="apply", on_new="create_and_lock"),
        valid_test_types=VALID)
    rows = {r["test_type"]: r for r in res.result_defs.collect()}
    assert rows["Unique"]["lock_refresh"] is True       # auto gets locked
    assert rows["Min_Val"]["lock_refresh"] is False     # manual doesn't


def test_on_absence_policies(spark):
    existing = _defs(spark, [
        _auto(),                                        # matched
        _auto(tt="Row_Ct", col=None),                   # absent, unlocked
        _manual(ext="e-3", lock_refresh=True),          # absent, locked
    ])
    payload = {"definitions": [_auto()]}
    res = EI.import_definitions(
        spark, existing, payload,
        EI.ImportConfig(mode="apply", on_absence="delete_unlocked"),
        valid_test_types=VALID)
    deleted = [(i.test_type, i.reason) for i in res.items
               if i.action == "delete"]
    assert deleted == [("Row_Ct", "absent")]            # locked row survives
    left = {r["test_type"] for r in res.result_defs.collect()}
    assert left == {"Unique", "Min_Val"}
    res = EI.import_definitions(
        spark, existing, payload,
        EI.ImportConfig(mode="apply", on_absence="delete_all"),
        valid_test_types=VALID)
    left = {r["test_type"] for r in res.result_defs.collect()}
    assert left == {"Unique"}


def test_validation_skips(spark):
    payload = {"definitions": [
        _manual(ext=None),                              # missing_external_id
        _auto(tt="Nope"),                               # invalid_test_type
        _auto(tbl="unknown_table"),                     # invalid_table
    ]}
    res = EI.import_definitions(
        spark, None, payload, EI.ImportConfig(),
        valid_test_types=VALID, profiled_tables={"orders"})
    assert [(i.action, i.reason) for i in res.items] == [
        ("skip", "missing_external_id"),
        ("skip", "invalid_test_type"),
        ("skip", "invalid_table")]


def test_skip_match_still_protects_from_absence_delete(spark):
    """A matched-but-skipped target must NOT be deleted by on_absence —
    the reference matches before validating for exactly this reason."""
    existing = _defs(spark, [_auto(tbl="unknown_table")])
    payload = {"definitions": [_auto(tbl="unknown_table")]}
    res = EI.import_definitions(
        spark, existing, payload,
        EI.ImportConfig(mode="apply", on_absence="delete_all"),
        valid_test_types=VALID, profiled_tables={"orders"})
    assert [(i.action, i.reason) for i in res.items] \
        == [("skip", "invalid_table")]
    assert res.result_defs.count() == 1


def test_duplicate_keys_raise(spark):
    with pytest.raises(EI.ImportError_):
        EI.import_definitions(
            spark, None, {"definitions": [_auto(), _auto()]},
            valid_test_types=VALID)
    with pytest.raises(EI.ImportError_):
        EI.import_definitions(
            spark, None,
            {"definitions": [_manual(ext="x"), _manual(col="c2", ext="x")]},
            valid_test_types=VALID)


def test_preview_and_strict_modes(spark):
    payload = {"definitions": [_auto(), _auto(tt="Nope")]}
    res = EI.import_definitions(spark, None, payload,
                                EI.ImportConfig(mode="preview"),
                                valid_test_types=VALID)
    assert not res.applied and res.result_defs is None
    # strict: one skip -> nothing applied
    res = EI.import_definitions(spark, None, payload,
                                EI.ImportConfig(mode="apply_strict"),
                                valid_test_types=VALID)
    assert not res.applied
    # strict with a clean payload applies
    res = EI.import_definitions(spark, None, {"definitions": [_auto()]},
                                EI.ImportConfig(mode="apply_strict"),
                                valid_test_types=VALID)
    assert res.applied and res.summary["create"] == 1


def test_round_trip_property(spark):
    """Hypothesis-style round-trip: export(import(export(defs))) is stable
    for arbitrary suites (bounded here: hypothesis + a live SparkSession
    per example is too slow, so we enumerate a deterministic grid)."""
    import itertools

    tts = ["Unique", "Min_Val", "Row_Ct"]
    tables = ["orders", "lineitem"]
    rows = []
    for i, (tt, tbl, is_auto, locked) in enumerate(
            itertools.product(tts, tables, [True, False], [True, False])):
        rows.append({
            "test_type": tt, "table_name": tbl, "column_name": f"c{i}",
            "test_active": "Y",
            "last_auto_gen_date": "2026-01-01" if is_auto else None,
            "params": {"threshold_value": str(i)},
            "lock_refresh": locked,
            "external_id": None if is_auto else f"e-{i}",
        })
    defs = _defs(spark, rows)
    doc, _ = EI.export_definitions(defs)
    res = EI.import_definitions(spark, None, doc,
                                EI.ImportConfig(mode="apply"),
                                valid_test_types=set(tts))
    assert res.applied and res.summary["create"] == len(rows)
    doc2, _ = EI.export_definitions(res.result_defs)
    strip = lambda d: {k: v for k, v in d.items()  # noqa: E731
                       if k != "last_auto_gen_date"}
    key = lambda d: (d["test_type"], d["table_name"], d["column_name"])  # noqa: E731
    assert sorted(map(strip, doc["definitions"]), key=key) \
        == sorted(map(strip, doc2["definitions"]), key=key)
    # and a second import of the SAME doc into the result is a pure update
    # (idempotent upsert, no creates, no deletes)
    res2 = EI.import_definitions(
        spark, res.result_defs, doc,
        EI.ImportConfig(mode="apply", on_match="overwrite_all",
                        on_absence="delete_all"),
        valid_test_types=set(tts))
    assert res2.summary["create"] == 0 and res2.summary["delete"] == 0
    assert res2.summary["update"] == len(rows)
