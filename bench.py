"""Benchmark harness: times every queries() entry from __spark_entry__ at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entry_mod
    from dataops_testgen_spark.session import get_spark

    spark = get_spark("bench")

    # Warm the JVM/catalyst once so per-query timings measure the plan, not
    # session startup.
    spark.range(1).collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    print(json.dumps({
        "metric": "total_query_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
