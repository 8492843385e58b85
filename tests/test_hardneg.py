"""hard_negatives + embedding_dim_profile (pipeline/similarity.py)."""
import math

import pytest
from pyspark.sql import functions as F

from dataops_testgen_spark.pipeline.similarity import (brute_force_topk,
                                                       embedding_dim_profile,
                                                       hard_negatives)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_hard_negatives_excludes_same_label(spark, emb):
    q = emb.filter(F.col("vec_id") < 5)
    out = hard_negatives(emb, q, k=5).collect()
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    assert out
    for r in out:
        assert labels[r["query_id"]] != labels[r["neighbor_id"]]
        assert r["query_id"] != r["neighbor_id"]
    # exactly 5 per query, ranks 1..5
    from collections import Counter
    per_q = Counter(r["query_id"] for r in out)
    assert all(v == 5 for v in per_q.values()) and len(per_q) == 5


def test_hard_negatives_matches_filtered_brute_force(spark, emb):
    """Exact path == brute_force_topk with a big k, filtered to label
    mismatches, re-ranked."""
    q = emb.filter(F.col("vec_id") < 5)
    got = {(r["query_id"], r["neighbor_id"], r["rank"])
           for r in hard_negatives(emb, q, k=5).collect()}
    full = brute_force_topk(emb, q, k=emb.count()).collect()
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    want = set()
    for qid in (0, 1, 2, 3, 4):
        neg = [r for r in sorted(full, key=lambda r: r["rank"])
               if r["query_id"] == qid
               and labels[r["neighbor_id"]] != labels[qid]
               and not math.isnan(r["cosine"])][:5]
        want |= {(qid, r["neighbor_id"], i + 1) for i, r in enumerate(neg)}
    assert got == want


def test_hard_negatives_shortlist_path_equals_exact_at_full_shortlist(
        spark, emb):
    q = emb.filter(F.col("vec_id") < 3)
    full_cand = (q.select(F.col("vec_id").alias("query_id"))
                 .crossJoin(emb.select(F.col("vec_id")
                                       .alias("neighbor_id")))
                 .filter(F.col("query_id") != F.col("neighbor_id")))
    via_shortlist = sorted(map(tuple, hard_negatives(
        emb, q, k=5, candidates=full_cand)
        .select("query_id", "neighbor_id", "rank").collect()))
    exact = sorted(map(tuple, hard_negatives(emb, q, k=5)
                       .select("query_id", "neighbor_id", "rank").collect()))
    assert via_shortlist == exact


def test_embedding_dim_profile_matches_numpy(spark, emb):
    import numpy as np

    got = {r["dim"]: r for r in embedding_dim_profile(emb).collect()}
    m = np.array([np.asarray(r["embedding"], dtype=float)
                  for r in emb.collect()])
    assert set(got) == set(range(m.shape[1]))
    for d in range(m.shape[1]):
        col = m[:, d]
        assert got[d]["n"] == len(col)
        assert got[d]["mean"] == pytest.approx(col.mean(), abs=1e-9)
        assert got[d]["std"] == pytest.approx(col.std(ddof=1), abs=1e-9)
        assert got[d]["vmin"] == pytest.approx(col.min())
        assert got[d]["vmax"] == pytest.approx(col.max())
