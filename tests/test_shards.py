"""shuffle_shards / write_shuffled_shards (pipeline/sampling.py):
determinism, coverage, within-shard order, balance, writer round-trip."""
import hashlib

import pytest

from dataops_testgen_spark.pipeline.sampling import (shuffle_shards,
                                                     write_shuffled_shards)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_shuffle_shards_covers_every_row_once(spark, docs):
    out = shuffle_shards(docs, 8).select("doc_id", "shard", "pos").collect()
    assert len(out) == docs.count()
    assert len({r["doc_id"] for r in out}) == len(out)
    assert {r["shard"] for r in out} <= set(range(8))


def test_shuffle_shards_matches_python_rederivation(docs):
    rows = shuffle_shards(docs, 8, salt="s1").select(
        "doc_id", "shard", "pos").collect()
    ids = [r["doc_id"] for r in rows]
    want = {}
    per_shard = {}
    for did in ids:
        h = hashlib.md5(f"s1|{did}".encode()).hexdigest()
        want[did] = (int(h[:8], 16) % 8, h)
    for did in sorted(ids, key=lambda d: (want[d][0], want[d][1], d)):
        sh = want[did][0]
        per_shard[sh] = per_shard.get(sh, 0) + 1
        want[did] = (sh, per_shard[sh])
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in rows}
    assert got == want


def test_shuffle_shards_positions_contiguous_and_balanced(docs):
    rows = shuffle_shards(docs, 8).select("shard", "pos").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    n = len(rows)
    for sh, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), sh
        # md5 uniformity: no shard 3x off the even split
        assert len(poss) < 3 * n / 8
    # a different salt produces a different permutation
    other = shuffle_shards(docs, 8, salt="other").select(
        "doc_id", "shard").collect()
    base = shuffle_shards(docs, 8).select("doc_id", "shard").collect()
    assert ({r["doc_id"]: r["shard"] for r in other}
            != {r["doc_id"]: r["shard"] for r in base})


def test_write_shuffled_shards_roundtrip(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_shuffled_shards(docs, path, 4, salt="w")
    back = spark.read.parquet(path)
    want = shuffle_shards(docs, 4, salt="w").select(
        "doc_id", "shard", "pos")
    got = back.select("doc_id", "shard", "pos")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect()))
    # one directory per shard exists
    import os
    assert sorted(d for d in os.listdir(path) if d.startswith("shard=")) == [
        f"shard={k}" for k in range(4)]
