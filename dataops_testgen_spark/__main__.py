"""Thin CLI over the engine — mirrors the reference's primary commands
(`testgen/__main__.py:238` run-profile, `:253` run-test-generation,
`:311` run-tests) against a directory of parquet tables.

Usage:
  python -m dataops_testgen_spark run-profile --data-dir DIR [--out DIR]
  python -m dataops_testgen_spark run-anomalies --data-dir DIR [--out DIR]
  python -m dataops_testgen_spark run-test-generation --data-dir DIR [--out DIR]
  python -m dataops_testgen_spark run-tests --data-dir DIR [--out DIR]

``run-tests`` executes the full loop: profile → infer → generate →
CAT-execute → prevalence → score.
"""

from __future__ import annotations

import argparse
import datetime as dt
import glob
import os
import sys


def _load_tables(spark, data_dir: str) -> dict:
    from dataops_testgen_spark.io.loaders import load_table

    tables = {}
    for path in sorted(glob.glob(os.path.join(data_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        tables[name] = load_table(spark, data_dir, name)
    return tables


def _profile_all(spark, tables, run_date):
    from dataops_testgen_spark.inference import apply_inference
    from dataops_testgen_spark.profiling.profiler import profile_tables

    prof = profile_tables(tables, run_date=run_date)
    return apply_inference(prof)


def _write(df, out_dir: str, name: str) -> None:
    if out_dir:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, name))
    df.show(20, truncate=False)


def _run_monitors(spark, tables, args) -> int:
    """Monitor test types (Volume_Trend fingerprint-style volume +
    Table_Freshness MD5) over every table — one-shot, or looped on a cron
    schedule (ref scheduler/base.py:1-120; monitors are the 'Monitor'
    generation set in 050_populate_new_schema_metadata.sql:55-58)."""
    import json

    from pyspark.sql import functions as F

    from dataops_testgen_spark.execution.query_tests import table_fingerprint

    def one_cycle() -> list[dict]:
        results = []
        for name, df in tables.items():
            n = df.count()
            fp_cols = df.columns[: min(4, len(df.columns))]
            fp = table_fingerprint(
                df, [F.count(F.lit(1))] + [F.max(c).cast("string") for c in fp_cols])
            results.append({"test_id": f"mon_volume_{name}",
                            "test_type": "Volume_Trend", "table_name": name,
                            "column_name": None, "result_status": "Log",
                            "result_message": None,
                            "result_measure": float(n),
                            "threshold_value": None})
            results.append({"test_id": f"mon_freshness_{name}",
                            "test_type": "Table_Freshness", "table_name": name,
                            "column_name": None, "result_status": "Log",
                            "result_message": fp, "result_measure": None,
                            "threshold_value": None})
        print(f"monitors: {len(results)} results over {len(tables)} tables")
        if args.observability_out:
            from dataops_testgen_spark.observability import (
                build_event_payload, post_event)

            with open(args.observability_out, "a") as fh:
                post_event(build_event_payload("monitors", "monitors"),
                           results,
                           lambda body: fh.write(json.dumps(body) + "\n"))
        return results

    if not args.schedule:
        one_cycle()
        return 0

    import datetime as _dt
    import itertools

    from dataops_testgen_spark.scheduler import Cron

    cron = Cron(args.schedule)
    cycles = itertools.count() if not args.max_cycles else range(args.max_cycles)
    for _ in cycles:
        now = _dt.datetime.now()
        nxt = cron.next_after(now)
        wait = (nxt - now).total_seconds()
        print(f"next monitor cycle at {nxt.isoformat()} (+{wait:.0f}s)")
        import time as _time

        _time.sleep(max(0.0, wait))
        one_cycle()
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="dataops_testgen_spark")
    parser.add_argument("command", choices=[
        "run-profile", "run-anomalies", "run-test-generation", "run-tests",
        "run-monitors", "export-tests", "import-tests"])
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--out", default="")
    parser.add_argument("--run-date", default=dt.date.today().isoformat())
    parser.add_argument("--schedule", default="",
                        help="5-field cron expr: loop run-monitors on this "
                             "schedule (scheduler/base.py semantics) instead "
                             "of a one-shot run")
    parser.add_argument("--max-cycles", type=int, default=0,
                        help="with --schedule: stop after N firings (0 = "
                             "run until interrupted)")
    parser.add_argument("--observability-out", default="",
                        help="append exported observability event payloads "
                             "to this JSONL file")
    parser.add_argument("--test-types", default="",
                        help="comma-separated test-type subset for "
                             "generation (reference --generation-set / "
                             "test_types_filter)")
    parser.add_argument("--tables", default="",
                        help="comma-separated table subset for generation")
    parser.add_argument("--doc", default="",
                        help="export-tests: output JSON path; import-tests: "
                             "input JSON document path")
    parser.add_argument("--defs", default="",
                        help="existing test_definitions parquet dir "
                             "(import-tests target / export-tests source; "
                             "export-tests defaults to freshly generated "
                             "definitions when omitted)")
    parser.add_argument("--mode", default="preview",
                        choices=["preview", "apply", "apply_strict"],
                        help="import-tests mode")
    parser.add_argument("--on-match", default="overwrite_unlocked",
                        choices=["overwrite_all", "overwrite_unlocked",
                                 "skip"])
    parser.add_argument("--on-new", default="create",
                        choices=["skip", "create", "create_and_lock"])
    parser.add_argument("--on-absence", default="do_nothing",
                        choices=["do_nothing", "delete_all",
                                 "delete_unlocked"])
    args = parser.parse_args(argv)

    from dataops_testgen_spark.session import get_spark

    spark = get_spark("dataops-testgen-cli")
    tables = _load_tables(spark, args.data_dir)

    if args.command == "run-monitors":
        return _run_monitors(spark, tables, args)

    if args.command == "import-tests":
        import json as _json

        from dataops_testgen_spark.generation import export_import as EI

        existing = (spark.read.parquet(args.defs)
                    if args.defs else None)
        with open(args.doc) as fh:
            payload = _json.load(fh)
        res = EI.import_definitions(
            spark, existing, payload,
            EI.ImportConfig(mode=args.mode, on_match=args.on_match,
                            on_new=args.on_new, on_absence=args.on_absence),
            profiled_tables=set(tables))
        print(f"import ({args.mode}): {res.summary}")
        for it in res.items:
            if it.action == "skip":
                print(f"  skip[{it.reason}]: {it.test_type} "
                      f"{it.table_name}.{it.column_name}")
        if res.applied and args.out:
            _write(res.result_defs, args.out, "test_definitions")
        return 0 if (res.applied or args.mode == "preview") else 1

    inferred = _profile_all(spark, tables, args.run_date)

    if args.command == "export-tests":
        import json as _json

        from dataops_testgen_spark.generation import export_import as EI
        from dataops_testgen_spark.generation import generate_selection_tests

        if args.defs:
            defs = spark.read.parquet(args.defs)
        else:
            defs = generate_selection_tests(inferred)
        doc, _updated = EI.export_definitions(
            defs, {"data_dir": args.data_dir, "run_date": args.run_date})
        out_path = args.doc or "test_definitions_export.json"
        with open(out_path, "w") as fh:
            _json.dump(doc, fh, indent=1, default=str)
        print(f"exported {len(doc['definitions'])} definitions -> {out_path}")
        return 0

    if args.command == "run-profile":
        _write(inferred, args.out, "profile_results")
        return 0

    if args.command == "run-anomalies":
        from dataops_testgen_spark.anomalies import screen_anomalies
        from dataops_testgen_spark.scoring import rollup_scores

        anomalies = screen_anomalies(inferred)
        _write(anomalies, args.out, "profile_anomaly_results")
        detail = anomalies.join(
            inferred.select("table_name", "column_name", "record_ct"),
            ["table_name", "column_name"], "left")
        _write(rollup_scores(detail.filter("record_ct IS NOT NULL")),
               args.out, "profile_scores")
        return 0

    from dataops_testgen_spark.generation import generate_selection_tests
    gen = generate_selection_tests(
        inferred,
        test_types=({t.strip() for t in args.test_types.split(",") if t.strip()}
                    or None),
        table_names=({t.strip() for t in args.tables.split(",") if t.strip()}
                     or None))
    if args.command == "run-test-generation":
        _write(gen, args.out, "test_definitions")
        return 0

    # run-tests: validate, execute generated CAT tests, score the run
    from dataops_testgen_spark.execution.cat import RESULT_SCHEMA, run_cat_tests
    from dataops_testgen_spark.execution.validation import validate_tests
    from dataops_testgen_spark.generation.selection import to_test_defs
    from dataops_testgen_spark.scoring import rollup_scores
    from dataops_testgen_spark.scoring.rollup import attach_test_prevalence

    defs = to_test_defs(gen)
    # validation pre-pass (run_test_validation.py semantics): tests whose
    # table/column no longer exists become Error rows and don't execute
    outcome = validate_tests(tables, defs)
    if outcome.errors:
        print(f"validation: {len(outcome.errors)} test(s) reference missing "
              "tables/columns — deactivated with Error results")
    results = run_cat_tests(tables, outcome.valid, run_date=args.run_date)
    if outcome.errors:
        err_rows = [tuple(e.get(f.name) for f in RESULT_SCHEMA.fields)
                    for e in outcome.errors]
        results = results.unionByName(
            spark.createDataFrame(err_rows, RESULT_SCHEMA))
    _write(results, args.out, "test_results")

    prof_rows = {(r["table_name"], r["column_name"]): r.asDict()
                 for r in inferred.collect()}
    record_cts = {t: r["record_ct"] for (t, _c), r in prof_rows.items()}
    scored = attach_test_prevalence(
        [r.asDict() for r in results.collect()],
        profile_lookup=prof_rows, record_cts=record_cts)
    n_fail = sum(1 for r in scored if r.get("result_code") == 0)
    print(f"tests: {len(scored)}, failed: {n_fail}")
    detail = spark.createDataFrame(
        [(r.get("table_name"), r.get("column_name"),
          int(r.get("dq_record_ct") or 0), float(r.get("dq_prevalence") or 0.0))
         for r in scored],
        "table_name string, column_name string, record_ct long, dq_prevalence double")
    _write(rollup_scores(detail), args.out, "test_scores")
    return 0


if __name__ == "__main__":
    sys.exit(main())
