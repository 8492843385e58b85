"""OPQ rotation (similarity.fit_opq / opq_topk — Ge et al. 2013): the
learned orthogonal rotation must actually buy recall/distortion at a
FIXED code budget vs plain PQ, and the Procrustes output must stay
orthogonal through the rounding firewall."""

import numpy as np

from dataops_testgen_spark.pipeline import similarity as SIM

SF = "/root/testdata/sf0.001"


def _topk_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_opq_beats_pq_at_fixed_code_budget(spark):
    """Same (m=4, k=16) budget, same trainer iterations: OPQ recall@10
    against exact ground truth >= plain PQ recall, and quantization
    distortion (the objective Ge et al. minimize) strictly improves."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter("vec_id < 20")
    gt = _topk_map(SIM.brute_force_topk(emb, q, k=10))

    cb_pq = SIM.train_pq_codebook(emb, m=4, k=16, max_iterations=8)
    pq = _topk_map(SIM.pq_topk(emb, q, cb_pq, k=10))
    R, cb_opq = SIM.fit_opq(emb, m=4, k=16, n_iters=3, pq_iters=4,
                            final_pq_iters=8)
    opq = _topk_map(SIM.opq_topk(emb, q, R, cb_opq, k=10))

    rec_pq = np.mean([len(pq[k] & gt[k]) / 10 for k in gt])
    rec_opq = np.mean([len(opq[k] & gt[k]) / 10 for k in gt])
    assert rec_opq >= rec_pq, (rec_opq, rec_pq)

    # distortion: mean squared reconstruction error at the same budget
    X = np.array([r["embedding"] for r in
                  emb.orderBy("vec_id").limit(300).collect()], dtype=float)

    def distortion(V, cb):
        cbv = np.asarray(cb, dtype=float)
        m, _k, ss = cbv.shape
        vs = V.reshape(len(V), m, ss)
        err = 0.0
        for s in range(m):
            d2 = ((vs[:, s, None, :] - cbv[s][None, :, :]) ** 2).sum(-1)
            err += d2.min(axis=1).sum()
        return err / len(V)

    assert distortion(X @ np.array(R), cb_opq) < distortion(X, cb_pq)


def test_opq_rotation_orthogonal_and_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    R, cb = SIM.fit_opq(emb, m=4, k=8, n_iters=2, pq_iters=3,
                        final_pq_iters=3)
    Rm = np.array(R)
    assert Rm.shape == (64, 64)
    # orthogonal within the 9-decimal rounding firewall
    assert np.abs(Rm @ Rm.T - np.eye(64)).max() < 1e-6
    # deterministic: identical on a re-run over the same data
    R2, cb2 = SIM.fit_opq(emb, m=4, k=8, n_iters=2, pq_iters=3,
                          final_pq_iters=3)
    assert R == R2
    assert cb == cb2


def test_opq_validation(spark):
    import pytest

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    with pytest.raises(ValueError, match="not divisible"):
        SIM.fit_opq(emb, m=7)
    with pytest.raises(ValueError, match="no valid vectors"):
        SIM.fit_opq(emb.filter("vec_id < 0"), m=4)


def test_opq_composes_with_ivfadc(spark):
    """The OPQ rotation threads through IVFADC as a pre-rotation: train
    coarse centroids + codebook on the ROTATED vectors, probe with
    rotated queries via vec_col='rotated'. With nprobe = n_centroids the
    cell restriction vanishes, so results must equal opq_topk (the
    pq_topk path) exactly - the same invariance pq/ivfadc already pin,
    now under the rotation."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    R, cb = SIM.fit_opq(emb, m=4, k=8, n_iters=1, pq_iters=3,
                        final_pq_iters=3)
    rot = SIM.rotate(emb, R)
    rows = rot.filter("id < 8").orderBy("id").collect()
    cents = [list(map(float, r["rotated"])) for r in rows]
    got = SIM.ivfadc_topk(rot, SIM.rotate(q, R), cents, cb, k=5,
                          nprobe=len(cents), vec_col="rotated",
                          id_col="id")
    want = SIM.opq_topk(emb, q, R, cb, k=5)
    # the two ADC spellings (per-query einsum LUT vs the shuffled pair
    # scorer) differ in float summation order by a last ulp: compare
    # through the 9-decimal firewall the trainers use
    g = sorted((r[0], r[1], round(r[2], 9), r[3]) for r in got.collect())
    w = sorted((r[0], r[1], round(r[2], 9), r[3]) for r in want.collect())
    assert g == w and g


def test_opq_persisted_index_self_describing(spark, tmp_path):
    """ann_index_append(rotation=R) persists the rotation alongside the
    quantizers; ann_index_probe finds it and rotates queries with no
    caller coordination — probing the rotated index equals the one-shot
    opq/ivfadc path exactly (nprobe = all cells)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    R, cb = SIM.fit_opq(emb, m=4, k=8, n_iters=1, pq_iters=3,
                        final_pq_iters=3)
    rot = SIM.rotate(emb, R)
    cents = [list(map(float, r["rotated"])) for r in
             rot.filter("id < 6").orderBy("id").collect()]

    idx_dir = str(tmp_path / "opq_index")
    SIM.ann_index_append(emb, idx_dir, cents, cb, rotation=R)
    got = SIM.ann_index_probe(q, idx_dir, k=5, nprobe=len(cents))
    want = SIM.ivfadc_topk(rot, SIM.rotate(q, R), cents, cb, k=5,
                           nprobe=len(cents), vec_col="rotated",
                           id_col="id")
    g = sorted((r[0], r[1], round(r[2], 9), r[3]) for r in got.collect())
    w = sorted((r[0], r[1], round(r[2], 9), r[3]) for r in want.collect())
    assert g == w and g


def test_opq_topk_seat_rows_only(spark):
    """The retired registry seat (r12: opq_topk_embeddings left the timed
    registry once opq_query_embeddings hash-oracled the query path — the
    ngram_jaccard r9 precedent): its end-to-end shape stays pinned here
    rows-only — trainer + rotate + ADC scan produce exactly k rows per
    query with a stable schema."""
    import __spark_entry__ as entry_mod

    df = entry_mod.q_opq_topk_embeddings(spark, SF)
    assert [f.name for f in df.schema.fields] == [
        "query_id", "neighbor_id", "est_cosine", "rank"]
    rows = df.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], set()).add(r["rank"])
    assert per_q and all(v == {1, 2, 3, 4, 5} for v in per_q.values())
