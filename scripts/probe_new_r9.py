"""Time the round-9-touched queries at sf0.1 and sf1 (scaling probe rows).

sf1 comes from scripts/gen_sf1.py (10x sf0.1: 500k docs, 20k vectors,
1M events). Usage: python scripts/probe_new_r9.py [sf1_dir]
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

QUERIES = ["ngram_lm_documents", "kmeans_embeddings",
           "lr_quality_documents", "embedding_covariance_embeddings",
           "benford_orders", "retention_events", "json_props_events",
           "multimodal_features_documents", "trigram_lm_documents"]
# fuzzy_pairs_part is omitted: gen_sf1 ships no part table


def main(sf1_dir: str = "/tmp/sf1") -> None:
    spark = get_spark("probe-r9")
    qs = entry.queries()
    for sf_dir in ["/root/testdata/sf0.1", sf1_dir]:
        for name in QUERIES:
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            print(f"{sf_dir} {name}: {time.time() - t0:.2f} s, {n} rows",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
