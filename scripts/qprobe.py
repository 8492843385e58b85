"""Per-query probe: time one or more declared queries with repetitions in
one session (bench-identical warmup), optionally dumping .explain plans.

  python scripts/qprobe.py [-n REPS] [--plan DIR] query [query ...]

Prints per-rep wall seconds; use the minimum (the box shows intermittent
CPU steal — see OPTIMIZATION_r13.md measurement caveat).
"""
from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--plan", default=None,
                    help="dir to write <query>.txt explain('formatted')")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F
    from dataops_testgen_spark.session import get_spark

    spark = get_spark("qprobe")
    if not args.no_warm:
        # the bench's warmups: JVM paths, python worker pool, shared inference
        warm = spark.range(2000).select(
            F.col("id"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("s"),
            (F.col("id") % 7).alias("k"))
        warm.agg(F.countDistinct("s"),
                 F.percentile(F.col("id").cast("double"),
                              F.lit([0.5]))).collect()

        def _warm_workers(batches):
            import numpy  # noqa: F401
            import pandas  # noqa: F401
            yield from batches

        cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4)
        (spark.range(cpus * 4).repartition(cpus)
         .mapInPandas(_warm_workers, "id long").count())
        t0 = time.perf_counter()
        entry_mod._inferred(spark, sf_dir, *entry_mod._UNION_TABLES).count()
        print(f"warmup_shared: {time.perf_counter()-t0:.2f}s", flush=True)

    qs = entry_mod.queries()
    for name in args.queries:
        fn = qs[name]
        reps = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"qprobe:{name}#{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            reps.append(time.perf_counter() - t0)
            if i == 0 and args.plan:
                os.makedirs(args.plan, exist_ok=True)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(args.plan, f"{name}.txt"), "w") as fh:
                    fh.write(buf.getvalue())
        print(f"{name}: rows={n} reps=" +
              " ".join(f"{r:.3f}" for r in reps) +
              f" min={min(reps):.3f}", flush=True)


if __name__ == "__main__":
    main()
