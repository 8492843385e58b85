"""Inclusion-dependency (FK candidate) discovery —
inference/fk_discovery.py. The reference's ID-FK layer links keys only
by shared column NAME (functional_datatype.sql:559-571); this extension
finds renamed keys by profile pruning + measured containment."""

import pytest
from pyspark.sql import functions as F

from dataops_testgen_spark.inference.fk_discovery import (
    fk_candidate_pairs,
    fk_discovery,
)

SF = "/root/testdata/sf0.001"


def _prof(spark, rows):
    return spark.createDataFrame(
        rows,
        "table_name string, column_name string, general_type string,"
        " record_ct long, value_ct long, distinct_value_ct long,"
        " min_value double, max_value double,"
        " min_text string, max_text string")


def test_candidate_pruning(spark):
    """Parents must be unique non-null keys; children must match the
    parent's general_type, fit inside its distinct count and [min,max]
    bounds; NULL bounds are conservative-keep; self pairs excluded."""
    prof = _prof(spark, [
        # unique numeric key: qualifies as parent
        ("p", "pk", "N", 100, 100, 100, 1.0, 100.0, None, None),
        # non-unique: never a parent (but still a child candidate)
        ("c", "fk", "N", 500, 500, 80, 1.0, 90.0, None, None),
        # bounds outside the parent's: pruned as child of pk
        ("c", "big", "N", 500, 500, 50, 0.0, 150.0, None, None),
        # wider distinct count than the parent: pruned
        ("c", "wide", "N", 500, 500, 200, 1.0, 50.0, None, None),
        # type mismatch: pruned
        ("c", "name", "A", 500, 500, 60, None, None, "a", "z"),
        # NULL bounds: kept (verification decides)
        ("c", "nob", "N", 500, 500, 10, None, None, None, None),
    ])
    pairs, dropped = fk_candidate_pairs(prof)
    assert dropped == 0
    assert set(pairs) == {("c", "fk", "p", "pk"), ("c", "nob", "p", "pk")}
    # restriction by columns= drops unlisted children/parents
    only, _ = fk_candidate_pairs(prof, columns={"p": ["pk"], "c": ["fk"]})
    assert only == [("c", "fk", "p", "pk")]
    # cap: deterministic prefix + dropped count reported
    capped, d2 = fk_candidate_pairs(prof, max_candidates=1)
    assert len(capped) == 1 and d2 == 1


def test_fk_discovery_containment(spark):
    """Exact containment counting: a true FK flags at 1.0, a partial
    overlap reports its share unflagged, and the discovery DataFrame is
    built from ONE dictionary join per pair (exact integer counts)."""
    parent = spark.createDataFrame([(i,) for i in range(1, 101)], "pk long")
    child = spark.createDataFrame(
        [(1 + i % 100,) for i in range(400)], "fk long")
    partial = spark.createDataFrame(
        [(i,) for i in range(51, 151)], "half long")   # 50/100 inside
    prof = _prof(spark, [
        ("p", "pk", "N", 100, 100, 100, 1.0, 100.0, None, None),
        ("c", "fk", "N", 400, 400, 100, 1.0, 100.0, None, None),
        ("h", "half", "N", 100, 100, 100, 51.0, 150.0, None, None),
    ])
    out = fk_discovery({"p": parent, "c": child, "h": partial}, prof)
    rows = {(r["child_table"], r["child_column"],
             r["parent_table"], r["parent_column"]): r
            for r in out.collect()}
    fk = rows[("c", "fk", "p", "pk")]
    assert fk["child_distinct"] == 100 and fk["matched"] == 100
    assert fk["flagged"] and fk["containment"] == pytest.approx(1.0)
    # 'half' fails the bounds pruning against pk (max 150 > 100), so it
    # never reaches verification as a child of pk
    assert ("h", "half", "p", "pk") not in rows
    # pk ⊆ fk's values: also a candidate in the reverse direction only
    # if fk were unique — it is (100 distinct over 400 rows? no: 400
    # values, 100 distinct → not unique, so never a parent)
    assert not any(pt == "c" for _, _, pt, _ in rows)


def test_fk_discovery_seat(spark):
    """The registry seat discovers the real TPC-H FKs at sf0.001 —
    o_custkey ⊆ c_custkey and l_orderkey ⊆ o_orderkey both flag at
    containment 1.0 — and reports the small-domain l_linenumber IND
    honestly (1..7 sits inside any dense key range)."""
    import __spark_entry__ as e

    out = e.q_fk_discovery_tpch(spark, SF)
    rows = {(r["child_column"], r["parent_column"]): r
            for r in out.collect()}
    assert rows[("o_custkey", "c_custkey")]["flagged"]
    assert rows[("o_custkey", "c_custkey")]["containment"] == 1.0
    assert rows[("l_orderkey", "o_orderkey")]["flagged"]
    # the documented small-domain false positive
    ln = [k for k in rows if k[0] == "l_linenumber"]
    assert ln, "l_linenumber candidates pruned unexpectedly"
    # partial containments (l_partkey / l_suppkey vs sparse orderkeys)
    # report exact shares without flagging when below the gate
    for k, r in rows.items():
        assert r["matched"] <= r["child_distinct"]
        # flagged is computed on the UNROUNDED ratio; the seat's
        # containment column is rounded 5dp, so recompute the exact
        # ratio here (a true containment in [0.989995, 0.99) would
        # round to 0.99 and fail a rounded-value comparison spuriously)
        exact = (r["matched"] / r["child_distinct"]
                 if r["child_distinct"] else None)
        assert r["flagged"] == (exact is not None and exact >= 0.99)


def test_fk_discovery_max_candidates_warns(spark):
    prof = _prof(spark, [
        ("p", "pk", "N", 100, 100, 100, 1.0, 100.0, None, None),
        ("c", "a", "N", 10, 10, 5, 1.0, 50.0, None, None),
        ("c", "b", "N", 10, 10, 5, 1.0, 50.0, None, None),
    ])
    parent = spark.createDataFrame([(i,) for i in range(1, 101)], "pk long")
    child = spark.createDataFrame([(i, i) for i in range(1, 6)],
                                  "a long, b long")
    with pytest.warns(UserWarning, match="dropped 1"):
        out = fk_discovery({"p": parent, "c": child}, prof,
                           max_candidates=1)
    assert out.count() == 1


def test_min_child_distinct_guard(spark):
    """The small-domain guard removes low-cardinality children without
    touching real FKs."""
    prof = _prof(spark, [
        ("p", "pk", "N", 100, 100, 100, 1.0, 100.0, None, None),
        ("c", "fk", "N", 400, 400, 80, 1.0, 100.0, None, None),
        ("c", "tiny", "N", 400, 400, 5, 1.0, 7.0, None, None),
    ])
    pairs, _ = fk_candidate_pairs(prof, min_child_distinct=10)
    assert set(pairs) == {("c", "fk", "p", "pk")}


def test_fk_dictionary_built_once_per_column(spark, monkeypatch):
    """r12 verdict #4: a column referenced by K candidate pairs must
    build its distinct dictionary exactly once (checkpointed, shared) —
    with two children and two unique parents (6 candidate pairs —
    children a/b vs each parent, plus the parents vs each other),
    _dictionary runs 4 times (one per distinct column), not 12 (one
    per pair side); the verification collapses to one join per parent
    (pinned indirectly: results unchanged)."""
    from dataops_testgen_spark.inference import fk_discovery as mod

    calls = []
    real = mod._dictionary

    def counting(tables, t, c):
        calls.append((t, c))
        return real(tables, t, c)

    monkeypatch.setattr(mod, "_dictionary", counting)
    prof = _prof(spark, [
        ("p", "pk1", "N", 100, 100, 100, 1.0, 100.0, None, None),
        ("p", "pk2", "N", 100, 100, 100, 1.0, 100.0, None, None),
        ("c", "a", "N", 200, 200, 50, 1.0, 100.0, None, None),
        ("c", "b", "N", 200, 200, 50, 1.0, 100.0, None, None),
    ])
    parent = spark.createDataFrame([(i, i) for i in range(1, 101)],
                                   "pk1 long, pk2 long")
    child = spark.createDataFrame([(1 + i % 50, 1 + i % 50)
                                   for i in range(200)], "a long, b long")
    out = mod.fk_discovery({"p": parent, "c": child}, prof)
    rows = {(r["child_column"], r["parent_column"]): r
            for r in out.collect()}
    assert len(rows) == 6      # a/b x pk1/pk2 + pk1<->pk2
    assert sorted(calls) == [("c", "a"), ("c", "b"),
                             ("p", "pk1"), ("p", "pk2")]
    for (cc, pc), r in rows.items():
        expect = 50 if cc in ("a", "b") else 100
        assert r["child_distinct"] == expect and r["matched"] == expect
        assert r["flagged"]


def test_fk_to_test_defs_execute(spark):
    """Flagged FKs become Combo_Match definitions that run through the
    REAL query engine: intact referential integrity passes; deleting
    parent rows makes the same definition fail."""
    from dataops_testgen_spark.execution.query_runner import run_query_tests
    from dataops_testgen_spark.generation.selection import to_test_defs
    from dataops_testgen_spark.inference.fk_discovery import (
        fk_discovery, fk_to_test_defs)

    parent = spark.createDataFrame([(i,) for i in range(1, 101)], "pk long")
    child = spark.createDataFrame(
        [(1 + i % 100,) for i in range(400)], "fk long")
    prof = _prof(spark, [
        ("p", "pk", "N", 100, 100, 100, 1.0, 100.0, None, None),
        ("c", "fk", "N", 400, 400, 100, 1.0, 100.0, None, None),
    ])
    disc = fk_discovery({"p": parent, "c": child}, prof)
    defs_df = fk_to_test_defs(disc, "2026-08-01")
    defs = to_test_defs(defs_df)
    assert len(defs) == 1
    td = defs[0]
    assert td.test_type == "Combo_Match"
    assert td.p("match_table_name") == "p"
    assert td.p("match_groupby_names") == "pk"

    ok = run_query_tests({"p": parent, "c": child}, defs).collect()
    assert len(ok) == 1 and ok[0]["result_status"] == "Passed"

    broken = parent.filter("pk > 10")         # 10 child combos orphaned
    bad = run_query_tests({"p": broken, "c": child}, defs).collect()
    assert bad[0]["result_status"] == "Failed"


def test_fk_to_test_defs_nullable_child(spark):
    """A NULLABLE FK child must round-trip (r12 ADVICE): discovery
    measures containment over non-null values, so the emitted
    Combo_Match carries a `<child> IS NOT NULL` subset_condition —
    without it the {NULL} combo is an eternal orphan and the
    threshold-0 monitor fails on perfectly referential data."""
    from dataops_testgen_spark.execution.query_runner import run_query_tests
    from dataops_testgen_spark.generation.selection import to_test_defs
    from dataops_testgen_spark.inference.fk_discovery import (
        fk_discovery, fk_to_test_defs)

    parent = spark.createDataFrame([(i,) for i in range(1, 101)], "pk long")
    child = spark.createDataFrame(
        [(1 + i % 100,) for i in range(400)] + [(None,)] * 30, "fk long")
    # profile reflects the nullable child: value_ct < record_ct
    prof = _prof(spark, [
        ("p", "pk", "N", 100, 100, 100, 1.0, 100.0, None, None),
        ("c", "fk", "N", 430, 400, 100, 1.0, 100.0, None, None),
    ])
    disc = fk_discovery({"p": parent, "c": child}, prof)
    rows = disc.collect()
    assert len(rows) == 1 and rows[0]["flagged"]   # NULLs don't break IND
    defs = to_test_defs(fk_to_test_defs(disc, "2026-08-01"))
    assert defs[0].p("subset_condition") == "fk IS NOT NULL"

    ok = run_query_tests({"p": parent, "c": child}, defs).collect()
    assert len(ok) == 1 and ok[0]["result_status"] == "Passed"

    broken = parent.filter("pk > 5")
    bad = run_query_tests({"p": broken, "c": child}, defs).collect()
    assert bad[0]["result_status"] == "Failed"     # real orphans still fire


def test_sync_fk_monitors_unit(spark):
    """sync_fk_monitors deactivates a stored FK monitor whose inclusion
    dependency vanished, appends a newly-discovered one, and never
    touches a manually-authored Combo_Match (no provenance param)."""
    from dataops_testgen_spark.inference.fk_discovery import (
        fk_discovery, fk_to_test_defs, sync_fk_monitors)

    parent = spark.createDataFrame([(i, i) for i in range(1, 101)],
                                   "pk long, pk2 long")
    child = spark.createDataFrame([(1 + i % 100, 1 + i % 100)
                                   for i in range(400)], "fk long, fk2 long")
    prof_t0 = _prof(spark, [
        ("p", "pk", "N", 100, 100, 100, 1.0, 100.0, None, None),
        ("c", "fk", "N", 400, 400, 100, 1.0, 100.0, None, None),
    ])
    disc0 = fk_discovery({"p": parent, "c": child}, prof_t0)
    stored = fk_to_test_defs(disc0, "2026-08-01").drop("last_auto_gen_date")
    manual = spark.createDataFrame(
        [("Combo_Match", "c", "fk_manual", "Y",
          {"match_table_name": "p", "match_groupby_names": "pk",
           "threshold_value": "0"})],
        stored.schema)
    stored = stored.unionByName(manual)

    # t1: fk->pk vanished (pk no longer unique per profile), fk2->pk2 new
    prof_t1 = _prof(spark, [
        ("p", "pk", "N", 100, 100, 50, 1.0, 100.0, None, None),
        ("p", "pk2", "N", 100, 100, 100, 1.0, 100.0, None, None),
        ("c", "fk", "N", 400, 400, 100, 1.0, 100.0, None, None),
        ("c", "fk2", "N", 400, 400, 100, 1.0, 100.0, None, None),
    ])
    out, changes = sync_fk_monitors({"p": parent, "c": child}, prof_t1,
                                    stored, run_date="2026-08-02",
                                    min_child_distinct=60)
    # fk->pk stale; BOTH children now contain in the new unique pk2
    assert changes == {"deactivated": 1, "added": 2}
    rows = {(r["table_name"], r["column_name"],
             dict(r["params"]).get("match_groupby_names")): r
            for r in out.collect()}
    assert rows[("c", "fk", "pk")]["test_active"] == "N"       # stale
    assert rows[("c", "fk", "pk2")]["test_active"] == "Y"      # added
    assert rows[("c", "fk2", "pk2")]["test_active"] == "Y"     # added
    assert rows[("c", "fk_manual", "pk")]["test_active"] == "Y"  # manual
    # idempotent second sync: nothing further changes
    out2, changes2 = sync_fk_monitors(
        {"p": parent, "c": child}, prof_t1,
        out.filter("test_active = 'Y'"), run_date="2026-08-03",
        min_child_distinct=60)
    assert changes2 == {"deactivated": 0, "added": 0}


def test_run_tests_fk_sync_deactivates_stale(spark, tmp_path):
    """E2E (r12 verdict #7): discover-fks --store, then BREAK an FK's
    parent uniqueness and run-tests — the sync deactivates the stale
    referential monitor (instead of running it forever), records a new
    generation, and the deactivated def does not execute."""
    import shutil

    from dataops_testgen_spark.__main__ import main
    from dataops_testgen_spark.store import RunStore

    data = tmp_path / "data"
    data.mkdir()
    shutil.copy(f"{SF}/customer.parquet", data / "customer.parquet")
    # remap o_orderkey out of every child's [min,max] so the dense-key
    # accidental IND (o_custkey 1..150 ⊆ a dense orderkey range) never
    # seeds a monitor — the stored suite holds only c_custkey-parented FKs
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    (orders.withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000)
     .write.mode("overwrite").parquet(str(data / "orders.parquet")))
    store = str(tmp_path / "appdb")
    rc = main(["discover-fks", "--data-dir", str(data), "--store", store,
               "--test-suite", "fk_suite", "--min-child-distinct", "20",
               "--csv-dir", str(tmp_path)])
    assert rc == 0
    rs = RunStore(spark, store)
    defs0 = rs.read("test_definitions").collect()
    fk0 = {(r["table_name"], r["column_name"],
            dict(r["params"])["match_groupby_names"]) for r in defs0
           if r["test_type"] == "Combo_Match"}
    assert ("orders", "o_custkey", "c_custkey") in fk0
    assert all(parent == "c_custkey" for _, _, parent in fk0)

    # break the FK: duplicate every customer row -> c_custkey no longer a
    # unique parent key, so no c_custkey IND is discoverable anymore
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    cust.union(cust).write.mode("overwrite").parquet(
        str(data / "customer.parquet"))

    rc = main(["run-tests", "--data-dir", str(data), "--store", store,
               "--test-suite", "fk_suite", "--csv-dir", str(tmp_path)])
    assert rc in (0, 1)
    latest = rs.read("test_definitions")
    latest = latest.filter(
        latest["last_auto_gen_date"]
        == latest.agg({"last_auto_gen_date": "max"}).first()[0])
    combo = [r for r in latest.collect() if r["test_type"] == "Combo_Match"]
    assert combo and all(r["test_active"] == "N" for r in combo)
    # the deactivated monitors did not execute: the suite held ONLY FK
    # monitors, so the results table received an empty append (read
    # returns None — the empty-table store contract)
    res_df = rs.read("test_results")
    res = [] if res_df is None else res_df.collect()
    assert not any(r["test_type"] == "Combo_Match" for r in res)


def test_discover_fks_cli_store_roundtrip(spark, tmp_path):
    """discover-fks --store records the flagged FKs as a stored test
    generation; run-tests --test-suite then executes the referential
    Combo_Match monitors from the store against live data."""
    from dataops_testgen_spark.__main__ import main

    store = str(tmp_path / "appdb")
    rc = main(["discover-fks", "--data-dir", SF, "--store", store,
               "--test-suite", "fk_suite", "--min-child-distinct", "20",
               "--csv-dir", str(tmp_path)])
    assert rc == 0
    rc = main(["run-tests", "--data-dir", SF, "--store", store,
               "--test-suite", "fk_suite", "--csv-dir", str(tmp_path)])
    assert rc in (0, 1)      # 1 = some test failed; either way it RAN
    from dataops_testgen_spark.store import RunStore

    rs = RunStore(spark, store)
    rows = rs.read("test_results").collect()
    combo = [r for r in rows if r["test_type"] == "Combo_Match"]
    assert combo
    # the real FKs hold on untouched data
    ok = {(r["table_name"], r["column_name"]): r["result_status"]
          for r in combo}
    assert ok.get(("orders", "o_custkey")) == "Passed"
    assert ok.get(("lineitem", "l_orderkey")) == "Passed"
