"""Time the round-7-touched queries at sf0.1 and sf1 (scaling probe rows).

Usage: python scripts/probe_new_r7.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util

spec = importlib.util.spec_from_file_location(
    "entry", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__spark_entry__.py"))
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)

from dataops_testgen_spark.session import get_spark  # noqa: E402

QUERIES = ["trigram_lm_documents", "bpe_merges_documents",
           "asof_join_events", "asof_nearest_events",
           "mixture_plan_documents", "mixture_tokens_documents",
           "ann_index_probe_embeddings", "bm25_index_probe_documents",
           "minhash_index_probe_documents", "semantic_dedup_embeddings"]


def main() -> None:
    spark = get_spark("probe-r7")
    qs = entry.queries()
    for sf_dir in ["/root/testdata/sf0.1", "/tmp/sf1"]:
        for name in QUERIES:
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            print(f"{sf_dir} {name}: {time.time() - t0:.2f} s, {n} rows",
                  flush=True)


if __name__ == "__main__":
    main()
