"""Per-query perf probe for the optimization rounds.

Usage:
  python scripts/perf_probe.py [--reps N] [--explain DIR_SUFFIX] [--noop]
                               [--phases] q1 q2 ...

Builds the same session as bench.py (same warmup), then for each named
query: times `df.count()` (bench methodology) `--reps` times, and
optionally writes `.explain("formatted")` to plans/r13/<q>_<suffix>.txt
and prints Catalyst phase timings (parsing/analysis/optimization/planning)
from the QueryPlanningTracker of the LAST run.

This is measurement-only tooling; never on any query path.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="write plans/r13/<q>_<suffix>.txt explain dumps")
    ap.add_argument("--noop", action="store_true",
                    help="time a noop-sink write instead of count()")
    ap.add_argument("--phases", action="store_true",
                    help="print Catalyst phase timings for the last rep")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from dataops_testgen_spark.session import get_spark

    spark = get_spark("perf-probe")

    # bench.py's warmup, verbatim shape
    from pyspark.sql import functions as F
    warm = spark.range(2000).select(
        F.col("id"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("s"),
        (F.col("id") % 7).alias("k"))
    warm.agg(
        F.sum(F.when(F.col("s").rlike("[0-9]$"), 1).otherwise(0)),
        F.countDistinct("k"), F.countDistinct("s"),
        F.percentile(F.col("id").cast("double"), F.lit([0.25, 0.5, 0.75])),
        F.min(F.try_to_timestamp(F.col("s"), F.lit("yyyy-MM-dd"))),
        F.max(F.md5(F.col("s"))),
    ).collect()
    w2 = warm.groupBy("k").agg(F.count(F.lit(1)).alias("ct"))
    w2.join(F.broadcast(w2.select(F.col("k").alias("k2"))),
            F.col("k") == F.col("k2")).orderBy("k").collect()
    sf_probe = os.path.join(sf_dir, "region.parquet")
    if os.path.exists(sf_probe):
        spark.read.parquet(sf_probe).count()

    def _warm_workers(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        for b in batches:
            yield b

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4)
    (spark.range(cpus * 4).repartition(cpus)
     .mapInPandas(_warm_workers, "id long").count())

    t0 = time.perf_counter()
    entry_mod._inferred(spark, sf_dir, *entry_mod._UNION_TABLES).count()
    print(f"# warmup_shared: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    qs = entry_mod.queries()
    results: dict[str, list[float]] = {}
    for name in args.queries:
        fn = qs[name]
        times = []
        df = None
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = times
        print(f"# {name}: {times}", file=sys.stderr)
        if args.explain and df is not None:
            os.makedirs("plans/r13", exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"plans/r13/{name}_{args.explain}.txt", "w") as fh:
                fh.write(buf.getvalue())
        if args.phases and df is not None:
            tracker = df._jdf.queryExecution().tracker()
            phases = tracker.phases()
            it = phases.iterator()
            while it.hasNext():
                kv = it.next()
                ph = kv._2()
                print(f"#   phase {kv._1()}: "
                      f"{(ph.endTimeMs() - ph.startTimeMs())} ms",
                      file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
