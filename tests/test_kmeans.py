"""Distributed spherical k-means (similarity.kmeans_train) vs a plain-numpy
reference: centroids, assignments, the empty-cell keep-previous rule, and
partitioning-invariance (the rounding firewall)."""

import numpy as np
import pytest

from dataops_testgen_spark.pipeline import similarity as SIM


def ref_kmeans(V, k, iters, rd=9):
    """Plain-numpy spherical Lloyd's with the trainer's exact contract:
    first-k init, argmax-cosine stable ties, SUM update renormalized and
    rounded, empty/zero-norm cell keeps its previous centroid."""
    n = np.linalg.norm(V, axis=1)
    keep = n > 0
    Vk, nk = V[keep], n[keep]
    c = np.round(Vk[:k] / nk[:k, None], rd)
    for _ in range(iters):
        cn = np.linalg.norm(c, axis=1)
        sims = (Vk / nk[:, None]) @ (c / cn[:, None]).T
        best = np.argsort(-sims, axis=1, kind="stable")[:, 0]
        nxt = c.copy()
        for cid in range(k):
            members = Vk[best == cid]
            if not len(members):
                continue
            s = members.sum(axis=0)
            nn = np.linalg.norm(s)
            if nn > 0:
                nxt[cid] = np.round(s / nn, rd)
        c = nxt
    cn = np.linalg.norm(c, axis=1)
    sims = (Vk / nk[:, None]) @ (c / cn[:, None]).T
    best = np.argsort(-sims, axis=1, kind="stable")[:, 0]
    return c, best


def _df_from(spark, V, start_id=0):
    rows = [(i + start_id, [float(x) for x in v]) for i, v in enumerate(V)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    V = rng.normal(size=(300, 16))
    df = _df_from(spark, V)
    cents = SIM.kmeans_train(df, k=5, n_iters=3)
    rc, rbest = ref_kmeans(V, 5, 3)
    assert np.abs(np.array(cents) - rc).max() == 0.0
    a = (SIM.kmeans_assign(df, cents).orderBy("id")
         .select("cell").toPandas()["cell"].to_numpy())
    assert (a == rbest).all()


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    # seeds 0 and 1 are EXACT duplicates, so every vector's cosine ties
    # across both centroids and the stable tie rule sends everything to
    # cell 0 — cell 1 is empty in iteration 1 and must keep its previous
    # (init) centroid verbatim
    rng = np.random.default_rng(5)
    a = np.array([1.0, 0.0, 0.0, 0.0])
    V = np.vstack([a, a, rng.normal(size=(30, 4))])
    df = _df_from(spark, V)
    cents = SIM.kmeans_train(df, k=2, n_iters=1)
    rc, _ = ref_kmeans(V, 2, 1)
    assert np.abs(np.array(cents) - rc).max() == 0.0
    init1 = np.round(a / np.linalg.norm(a), 9)
    assert (np.array(cents[1]) == init1).all(), "empty cell must keep init"
    assert not (np.array(cents[0]) == init1).all(), "cell 0 must have moved"


def test_kmeans_invariant_to_partitioning(spark):
    rng = np.random.default_rng(11)
    V = rng.normal(size=(240, 12))
    df = _df_from(spark, V)
    c1 = SIM.kmeans_train(df.coalesce(1), k=4, n_iters=3)
    c7 = SIM.kmeans_train(df.repartition(7), k=4, n_iters=3)
    assert c1 == c7


def test_kmeans_drops_invalid_and_zero_vectors(spark):
    rng = np.random.default_rng(3)
    V = rng.normal(size=(50, 8))
    rows = ([(i, [float(x) for x in v]) for i, v in enumerate(V)]
            + [(100, None), (101, [0.0] * 8),
               (102, [1.0, None] + [0.0] * 6)])
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = SIM.kmeans_train(df, k=3, n_iters=2)
    rc, _ = ref_kmeans(V, 3, 2)
    assert np.abs(np.array(cents) - rc).max() == 0.0
    a = SIM.kmeans_assign(df, cents).toPandas()
    assert set(a["id"]) == set(range(50))  # 100/101/102 all dropped


def test_kmeans_k_exceeds_rows_raises(spark):
    df = _df_from(spark, np.eye(4))
    with pytest.raises(ValueError, match="exceeds"):
        SIM.kmeans_train(df, k=10, n_iters=1)


def test_kmeans_zero_norm_seed_skipped(spark):
    """A zero vector among the k lowest ids cannot seed a spherical
    centroid: the contract (trainer == numpy reference == SQL oracle) is
    that the NEXT valid id takes its seat."""
    rng = np.random.default_rng(9)
    V = np.vstack([np.zeros(8), rng.normal(size=(40, 8))])
    df = _df_from(spark, V)
    cents = SIM.kmeans_train(df, k=3, n_iters=2)
    rc, _ = ref_kmeans(V, 3, 2)  # ref filters zero-norm BEFORE first-k
    assert np.abs(np.array(cents) - rc).max() == 0.0
    # seed 0 must be V[1] normalized+rounded (V[0] skipped), post-update
    # drift aside: re-derive iteration-0 seeds directly
    seeds = SIM.kmeans_train(df, k=3, n_iters=0)
    want0 = np.round(V[1] / np.linalg.norm(V[1]), 9)
    assert (np.array(seeds[0]) == want0).all()


def test_kmeans_oracle_parity_on_dirty_data(spark, tmp_path):
    """The DuckDB kmeans oracle (_sql_kmeans) must mirror the trainer on
    DIRTY data too (driver ADVICE r9): NULL vectors, NULL-element
    vectors, and DUPLICATE vec_ids — the oracle's clean-filter + rid
    keying has to keep long-format joins from cross-multiplying the
    duplicates."""
    import duckdb

    import __spark_entry__ as entry
    from conftest import assert_matches_oracle

    rng = np.random.default_rng(11)
    V = rng.normal(size=(60, 8))
    rows = ([(i, [float(x) for x in v]) for i, v in enumerate(V)]
            # duplicate ids (two DIFFERENT vectors under vec_id 7)
            + [(7, [float(x) for x in rng.normal(size=8)])]
            # NULL vector + NULL-element vector: dropped on both sides
            + [(200, None), (201, [1.0, None] + [0.0] * 6)])
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    path = str(tmp_path / "dirty_emb")
    df.coalesce(1).write.parquet(path)

    emb = spark.read.parquet(path)
    cents = SIM.kmeans_train(emb, k=4, n_iters=2)
    from pyspark.sql import functions as F
    out = (SIM.kmeans_assign(emb, cents)
           .select("id", "cell", F.round("cosine", 5).alias("cosine")))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS "
                f"SELECT * FROM read_parquet('{path}/*.parquet')")
    assert_matches_oracle(out, con, entry._sql_kmeans(k=4, n_iters=2))


def test_kmeans_wide_path_matches_narrow_path(spark):
    """The wide-D update (long-format pos-sum kernel) and the narrow
    update (D agg expressions) are the same function of the data up to
    the rounding firewall: forcing the wide path at a D where the
    narrow path is the default must reproduce the narrow centroids
    bit-for-bit."""
    rng = np.random.default_rng(13)
    V = rng.normal(size=(200, 24))
    df = _df_from(spark, V)
    narrow = SIM.kmeans_train(df, k=5, n_iters=3)
    wide = SIM.kmeans_train(df, k=5, n_iters=3, wide_dim_threshold=1)
    assert np.abs(np.array(narrow) - np.array(wide)).max() == 0.0


def test_kmeans_wide_dim_1024(spark):
    """Production-width embeddings (D=1024 > the 256 default threshold)
    dispatch to the pos-sum kernel — no D-wide expression reaches
    Catalyst, so there is nothing for whole-stage codegen to fall back
    on — and still match the numpy reference exactly."""
    rng = np.random.default_rng(17)
    V = rng.normal(size=(80, 1024))
    df = _df_from(spark, V)
    cents = SIM.kmeans_train(df, k=3, n_iters=2)
    rc, rbest = ref_kmeans(V, 3, 2)
    assert np.abs(np.array(cents) - rc).max() == 0.0
    a = (SIM.kmeans_assign(df, cents).orderBy("id")
         .select("cell").toPandas()["cell"].to_numpy())
    assert (a == rbest).all()
