"""Logistic regression by damped diagonal-Newton (classify.lr_train) vs a
plain-numpy reference: exact weight parity, partitioning-invariance, the
learnability sanity check, and scorer edge cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataops_testgen_spark.pipeline import classify as C


def _feats_labels(spark, n_docs=80, n_feats=24, seed=3):
    """Synthetic sparse (id, f, v) features + a linearly-separable-ish
    label, as plain rows (no text round-trip — this pins the OPTIMIZER,
    lr_hash_features has its own path through the driver query)."""
    rng = np.random.default_rng(seed)
    rows, y = [], {}
    for d in range(n_docs):
        nz = rng.choice(n_feats, size=6, replace=False)
        vals = rng.random(6)
        vals /= vals.sum()
        for f, v in zip(nz, vals):
            rows.append((d, int(f), float(v)))
        rows.append((d, -1, 1.0))
        y[d] = 1.0 if (0 in nz or 1 in nz) else 0.0
    feats = spark.createDataFrame(rows, "id long, f long, v double")
    labels = spark.createDataFrame(
        [(d, y[d]) for d in range(n_docs)], "id long, y double")
    return feats, labels, rows, y


def ref_lr(rows, y, n_iters, lam, rd=9):
    ids = sorted(y)
    fs = sorted({f for _, f, _ in rows})
    fpos = {f: i for i, f in enumerate(fs)}
    X = np.zeros((len(ids), len(fs)))
    for d, f, v in rows:
        X[ids.index(d), fpos[f]] = v
    yv = np.array([y[i] for i in ids])
    w = np.zeros(len(fs))
    for _ in range(n_iters):
        p = 1 / (1 + np.exp(-(X @ w)))
        g = X.T @ (p - yv) / len(ids)
        h = (X ** 2).T @ (p * (1 - p)) / len(ids)
        w = np.round(w - g / (h + lam), rd)
    return {fs[i]: w[i] for i in range(len(fs)) if w[i] != 0}


def test_lr_train_matches_numpy_reference(spark):
    feats, labels, rows, y = _feats_labels(spark)
    w = C.lr_train(feats, labels, n_iters=6, damping=0.003)
    ref = ref_lr(rows, y, 6, 0.003)
    keys = set(w) | set(ref)
    diff = max(abs(w.get(f, 0.0) - ref.get(f, 0.0)) for f in keys)
    assert diff == 0.0


def test_lr_train_invariant_to_partitioning(spark):
    feats, labels, _, _ = _feats_labels(spark, seed=11)
    w1 = C.lr_train(feats.coalesce(1), labels, n_iters=4)
    w7 = C.lr_train(feats.repartition(7), labels, n_iters=4)
    assert w1 == w7


def test_lr_learns_the_quality_gate(spark, sf_dir):
    """End-to-end on the fixture corpus: heldout accuracy must clearly
    beat the majority class — the distilled gate genuinely learned."""
    from dataops_testgen_spark.pipeline.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull() & (F.trim("text") != ""))
    t = tokens(F.col("text"))
    sw = (F.size(F.filter(t, lambda x: x.isin("the", "a"))) / F.size(t))
    lab_all = docs.select(F.col("doc_id").alias("id"),
                          (sw >= 0.06).cast("double").alias("y"))
    feats = C.lr_hash_features(docs, n_buckets=512, salt="lrq")
    w = C.lr_train(feats, lab_all.filter(F.col("id") % 2 == 0),
                   n_iters=8, damping=0.003)
    j = (C.lr_score(feats, w)
         .join(lab_all.withColumnRenamed("y", "truth"), "id")
         .withColumn("pred", (F.col("p") >= 0.5).cast("double"))
         .filter(F.col("id") % 2 == 1))
    acc = j.agg(F.avg((F.col("pred") == F.col("truth"))
                      .cast("double"))).first()[0]
    majority = j.agg(F.greatest(F.avg("truth"),
                                1 - F.avg("truth"))).first()[0]
    assert acc > majority + 0.1, (acc, majority)


def test_lr_score_unweighted_features_contribute_zero(spark):
    feats = spark.createDataFrame(
        [(1, 5, 0.5), (1, 6, 0.5), (2, 7, 1.0)], "id long, f long, v double")
    out = {r["id"]: (r["margin"], r["p"])
           for r in C.lr_score(feats, {5: 2.0}).collect()}
    assert out[1][0] == 1.0
    # JVM Math.exp vs numpy libm can differ in the last ulp — tolerance
    assert out[1][1] == pytest.approx(1 / (1 + np.exp(-1.0)), rel=1e-14)
    assert out[2] == (0.0, 0.5)  # every feature unweighted -> p = 0.5


def test_lr_train_empty_labels_raises(spark):
    feats = spark.createDataFrame([(1, 0, 1.0)], "id long, f long, v double")
    labels = spark.createDataFrame([], "id long, y double")
    with pytest.raises(ValueError, match="no labeled"):
        C.lr_train(feats, labels, n_iters=1)


def test_lr_hash_features_bias_and_normalization(spark):
    docs = spark.createDataFrame(
        [(1, "the the cat"), (2, ""), (3, None)], "doc_id long, text string")
    rows = C.lr_hash_features(docs).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    assert set(by_id) == {1}  # blank/null docs produce no rows
    fs = {r["f"]: r["v"] for r in by_id[1]}
    assert fs[-1] == 1.0  # bias
    # 3 unigrams + 2 bigrams = 5 gram occurrences, L1-normalized
    assert abs(sum(v for f, v in fs.items() if f != -1) - 1.0) < 1e-12
