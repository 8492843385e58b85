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


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="dataops_testgen_spark")
    parser.add_argument("command", choices=[
        "run-profile", "run-anomalies", "run-test-generation", "run-tests"])
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--out", default="")
    parser.add_argument("--run-date", default=dt.date.today().isoformat())
    args = parser.parse_args(argv)

    from dataops_testgen_spark.session import get_spark

    spark = get_spark("dataops-testgen-cli")
    tables = _load_tables(spark, args.data_dir)
    inferred = _profile_all(spark, tables, args.run_date)

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
    gen = generate_selection_tests(inferred)
    if args.command == "run-test-generation":
        _write(gen, args.out, "test_definitions")
        return 0

    # run-tests: execute generated CAT tests, score the run
    from dataops_testgen_spark.execution.cat import run_cat_tests
    from dataops_testgen_spark.generation.selection import to_test_defs
    from dataops_testgen_spark.scoring import rollup_scores
    from dataops_testgen_spark.scoring.rollup import attach_test_prevalence

    defs = to_test_defs(gen)
    results = run_cat_tests(tables, defs, run_date=args.run_date)
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
