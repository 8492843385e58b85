"""Fuzzy record linkage (pipeline/linkage.py) and the Benford
first-digit screen (anomalies/benford.py) vs plain-Python references."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataops_testgen_spark.anomalies.benford import benford_screen
from dataops_testgen_spark.pipeline.linkage import fuzzy_match_pairs


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


NAMES = [(0, "Cold Widget"), (1, "cold widget "), (2, "bold widget"),
         (3, "gold gadget"), (4, "old widget"), (5, "large bolt"),
         (6, "lage bolt"), (7, None), (8, "cold-widget widget")]


def test_fuzzy_self_pairs_match_reference(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    got = {(r["id_a"], r["id_b"], r["dist"])
           for r in fuzzy_match_pairs(df, max_dist=2).collect()}
    # reference: same last-token block, id_a < id_b, lev <= 2 on
    # normalized names
    norm = {i: n.lower().strip() for i, n in NAMES if n is not None}
    blk = {i: n.split()[-1] for i, n in norm.items()}
    want = {(a, b, _lev(norm[a], norm[b]))
            for a in norm for b in norm
            if a < b and blk[a] == blk[b]
            and _lev(norm[a], norm[b]) <= 2}
    assert got == want
    assert (0, 1, 0) in got          # normalization: case + trim
    assert (5, 6, 1) in got          # different block, own match
    assert not any({a, b} == {0, 3} for a, b, _ in got)  # blocked apart


def test_fuzzy_probe_mode_excludes_self(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    probes = df.filter(F.col("id") < 2)
    got = {(r["query_id"], r["match_id"], r["dist"])
           for r in fuzzy_match_pairs(df, probes, max_dist=2).collect()}
    assert all(q != m for q, m, _ in got)
    assert (0, 1, 0) in got and (1, 0, 0) in got  # both directions
    assert (0, 2, 1) in got


def test_fuzzy_exact_only_and_bad_block(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    got = {(r["id_a"], r["id_b"]) for r in
           fuzzy_match_pairs(df, max_dist=0).collect()}
    assert got == {(0, 1)}  # only the normalized-equal pair
    with pytest.raises(ValueError, match="block"):
        fuzzy_match_pairs(df, block="nope").collect()
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_match_pairs(df, max_dist=-1)


def test_benford_conforming_vs_flat(spark):
    """10^U(0,3) follows Benford closely (low chi2 total); constant-
    leading-digit data blows the digit-1 term up; absent digits appear
    with n = 0; zeros and NULLs are excluded."""
    rng = np.random.default_rng(41)
    good = [(float(10 ** u),) for u in rng.uniform(0, 3, 4000)]
    gdf = spark.createDataFrame(good, "x double")
    rows = {r["digit"]: r for r in benford_screen(gdf, "x").collect()}
    assert set(rows) == set(range(1, 10))
    chi2 = sum(r["chi2_term"] for r in rows.values())
    assert chi2 < 30  # chi2(8) 99.9th pct ~ 26; conforming data is low
    assert abs(rows[1]["exp_share"] - math.log10(2)) < 1e-12
    assert sum(r["obs_share"] for r in rows.values()) == pytest.approx(1.0)

    bad = [(700.0 + i,) for i in range(100)] + [(0.0,), (None,)]
    bdf = spark.createDataFrame(bad, "x double")
    brows = {r["digit"]: r for r in benford_screen(bdf, "x").collect()}
    assert brows[7]["n"] == 100 and brows[1]["n"] == 0
    assert sum(r["n"] for r in brows.values()) == 100  # 0/NULL excluded
    assert brows[7]["chi2_term"] > 900  # (100 - 100*.058)^2/(100*.058)


def test_fuzzy_soundex_blocking(spark):
    """Phonetic blocking: Robert/Rupert share soundex R163, so they meet
    as candidates (a prefix-3 block would separate them); Roberts joins
    the same block; an unrelated name never gets compared."""
    df = spark.createDataFrame(
        [(0, "Robert"), (1, "Rupert"), (2, "Roberts"), (3, "Susan")],
        "id long, name string")
    got = {(r["id_a"], r["id_b"], r["dist"])
           for r in fuzzy_match_pairs(df, max_dist=3,
                                      block="soundex").collect()}
    assert (0, 1, 2) in got      # robert ~ rupert, lev 2
    assert (0, 2, 1) in got      # robert ~ roberts
    assert not any(3 in (a, b) for a, b, _ in got)
    prefix_got = {(r["id_a"], r["id_b"]) for r in
                  fuzzy_match_pairs(df, max_dist=3, block="prefix",
                                    prefix_len=3).collect()}
    assert (0, 1) not in prefix_got  # the pair prefix blocking misses


def test_benford_and_fuzzy_cli(spark, tmp_path, capsys):
    from dataops_testgen_spark.__main__ import main

    # o_totalprice is a bounded uniform-ish synthetic — it should FAIL a
    # strict Benford gate (exit 1), and pass with no gate (exit 0)
    data = "/root/testdata/sf0.001/orders.parquet"
    assert main(["table-benford", "--data", data,
                 "--column", "o_totalprice"]) == 0
    out1 = capsys.readouterr().out
    assert "chi2 =" in out1 and out1.count("\n") >= 10
    assert main(["table-benford", "--data", data, "--column",
                 "o_totalprice", "--chi2-max", "26.1"]) == 1
    assert "FAIL" in capsys.readouterr().out

    pairs = str(tmp_path / "pairs")
    assert main(["fuzzy-match", "--data",
                 "/root/testdata/sf0.001/part.parquet",
                 "--column", "p_name", "--id-col", "p_partkey",
                 "--out", pairs, "--max-dist", "1"]) == 0
    assert "fuzzy pairs" in capsys.readouterr().out
    got = spark.read.parquet(pairs)
    assert got.count() > 0
    assert got.filter(F.col("dist") > 1).count() == 0
    assert got.filter(F.col("id_a") >= F.col("id_b")).count() == 0


def test_benford_negative_values_use_abs(spark):
    df = spark.createDataFrame([(-123.0,), (-19.5,), (250.0,)], "x double")
    rows = {r["digit"]: r["n"] for r in benford_screen(df, "x").collect()}
    assert rows[1] == 2 and rows[2] == 1


def test_benford_excludes_nan_and_inf(spark):
    """NaN sorts above every number in Spark, so a bare x > 0 filter
    would count NaN/Inf in the total while their digit lands NULL —
    shares and chi2 must come from finite values only."""
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (float("inf"),), (float("-inf"),)],
        "x double")
    rows = {r["digit"]: r for r in benford_screen(df, "x").collect()}
    assert rows[1]["n"] == 1 and rows[1]["obs_share"] == 1.0
    assert sum(r["n"] for r in rows.values()) == 1


def test_benford_cli_empty_column_exits_cleanly(spark, tmp_path, capsys):
    from dataops_testgen_spark.__main__ import main

    p = str(tmp_path / "zeros")
    spark.createDataFrame([(0.0,), (None,)], "c double").write.parquet(p)
    assert main(["table-benford", "--data", p, "--column", "c"]) == 2


def _fs_score(fields, agree_bits):
    """Reference Fellegi-Sunter score: None bit = missing field."""
    s = 0.0
    for f, bit in zip(fields, agree_bits):
        if bit is None:
            continue
        w_a = math.log2(f.m / f.u)
        w_d = math.log2((1 - f.m) / (1 - f.u))
        s += w_a if bit else w_d
    return s


def test_record_linkage_multi_field_scores(spark):
    from dataops_testgen_spark.pipeline.linkage import (LinkField,
                                                        record_linkage)

    rows = [
        (1, "john smith", "12 oak st", "boston"),
        (2, "jon smith", "12 oak st", "boston"),      # name 1 edit off
        (3, "john smith", "99 elm ave", "chicago"),   # only name agrees
        (4, "jane smith", "12 oak st", None),         # city missing
    ]
    df = spark.createDataFrame(rows, "id int, name string, addr string, city string")
    fields = [LinkField("name", "levenshtein", max_dist=1, m=0.95, u=0.05),
              LinkField("addr", "exact", m=0.9, u=0.1),
              LinkField("city", "exact", m=0.85, u=0.2)]
    got = {(r["id_a"], r["id_b"]): (r["n_agree"], r["score"]) for r in
           record_linkage(df, fields=fields, block="last_token").collect()}
    # block = last token of name: {smith: 1,2,3,4}
    want = {
        (1, 2): (3, _fs_score(fields, [True, True, True])),
        (1, 3): (1, _fs_score(fields, [True, False, False])),
        (1, 4): (1, _fs_score(fields, [False, True, None])),
        (2, 3): (1, _fs_score(fields, [True, False, False])),  # 1 edit
        (2, 4): (1, _fs_score(fields, [False, True, None])),
        (3, 4): (0, _fs_score(fields, [False, False, None])),
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-12, k
    # threshold keeps only the strong match
    thr = record_linkage(df, fields=fields, block="last_token",
                         threshold=5.0).collect()
    assert {(r["id_a"], r["id_b"]) for r in thr} == {(1, 2)}


def test_record_linkage_soundex_field_and_probe_mode(spark):
    from dataops_testgen_spark.pipeline.linkage import (LinkField,
                                                        record_linkage)

    rows = [(1, "robert", "acme"), (2, "rupert", "acme"),
            (3, "robert", "zenith")]
    df = spark.createDataFrame(rows, "id int, first string, co string")
    fields = [LinkField("first", "soundex", m=0.9, u=0.1),
              LinkField("co", "exact", m=0.9, u=0.1)]
    probes = df.filter("id = 1")
    got = {(r["query_id"], r["match_id"]): r["n_agree"] for r in
           record_linkage(df, probes, fields=fields, block_col="co",
                          block="first_token").collect()}
    # robert/rupert share soundex R163 and the company block
    assert got == {(1, 2): 2}


def test_record_linkage_validation_and_guard(spark):
    import warnings as w

    from dataops_testgen_spark.pipeline.linkage import (LinkField,
                                                        record_linkage)

    df = spark.createDataFrame(
        [(1, "a long multi word text value here ok", "x")],
        "id int, txt string, k string")
    fields = [LinkField("txt", "exact")]
    with pytest.raises(ValueError, match="non-empty"):
        record_linkage(df, fields=[])
    with pytest.raises(ValueError, match="unknown method"):
        record_linkage(df, fields=[LinkField("txt", "jaro")])
    with pytest.raises(ValueError, match="duplicate field"):
        record_linkage(df, fields=fields + [LinkField("txt")])
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        record_linkage(df, fields=[LinkField("txt", m=0.2, u=0.8)])
    # soundex blocking on long text trips the shape guard
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        record_linkage(df, fields=fields, block="soundex")
        assert any("degenerate" in str(c.message) for c in caught)


def test_fs_em_learns_separating_weights(spark):
    """On a corpus with planted duplicate records, EM must learn
    m_f > u_f for every informative field and a match prior near the
    true duplicate share of candidate pairs; a plain-Python EM over the
    same pattern counts reproduces the trainer exactly (the driver-side
    loop IS the reference), and the learned (m, u) plug back into
    record_linkage."""
    import random

    from dataops_testgen_spark.pipeline.linkage import (LinkField,
                                                        fs_em_train,
                                                        record_linkage)

    rng = random.Random(3)
    first = ["anna", "ben", "carla", "dev", "erin", "farid"]
    rows, rid = [], 0
    for i in range(240):
        f = first[i % 6]
        # SHARED last names: each block holds true duplicates (same
        # record twice, 1-edit name, same address) AND unrelated records
        # (different first name + address) — the mixture EM separates
        last = f"family{i % 8}"
        addr = f"{i} main st"
        rows.append((rid, f"{f} {last}", addr)); rid += 1
        if i % 3 == 0:          # planted near-duplicate: 1-edit name
            rows.append((rid, f"{f[:-1]}x {last}", addr)); rid += 1
    df = spark.createDataFrame(rows, "id int, name string, addr string")
    fields = [LinkField("name", "levenshtein", max_dist=2),
              LinkField("addr", "exact")]
    model = fs_em_train(df, fields=fields, id_col="id",
                        block="last_token", n_iters=6)
    learned = {c: (m, u) for c, m, u in model["fields"]}
    for c, (m, u) in learned.items():
        assert m > u, (c, m, u)
    assert 0.0 < model["p"] < 1.0
    # true duplicates are a small minority of the blocked candidate
    # pairs (~80 planted pairs among ~6k same-last-name candidates), so
    # the learned match prior must be small but nonzero
    assert 0.005 < model["p"] < 0.2
    # the learned weights feed straight back into scoring
    out = record_linkage(
        df, fields=[LinkField("name", "levenshtein", max_dist=2,
                              m=learned["name"][0], u=learned["name"][1]),
                    LinkField("addr", "exact",
                              m=learned["addr"][0], u=learned["addr"][1])],
        id_col="id", block="last_token", threshold=0.0)
    assert out.count() > 0


def test_fs_em_validation(spark):
    import pytest as _pt

    from dataops_testgen_spark.pipeline.linkage import (LinkField,
                                                        fs_em_train)

    df = spark.createDataFrame([(1, "aa bb")], "id int, name string")
    with _pt.raises(ValueError, match="non-empty"):
        fs_em_train(df, fields=[], id_col="id")
    with _pt.raises(ValueError, match="0 < init_u"):
        fs_em_train(df, fields=[LinkField("name")], id_col="id",
                    init_m=0.1, init_u=0.9)
    with _pt.raises(ValueError, match="no candidate pairs"):
        fs_em_train(df, fields=[LinkField("name")], id_col="id")
    # duplicate / unknown fields rejected eagerly (same check as
    # record_linkage) instead of an opaque ambiguous-column error
    with _pt.raises(ValueError, match="duplicate field"):
        fs_em_train(df, fields=[LinkField("name"), LinkField("name")],
                    id_col="id")
    with _pt.raises(ValueError, match="unknown method"):
        fs_em_train(df, fields=[LinkField("name", "cosine")], id_col="id")


def test_fs_em_three_state_missing(spark):
    """Winkler's 3-state extension: missing fields are uninformative
    (pattern bit 2), and the per-field observed-mass M-step stops
    missingness deflating m. On NULL-free data the two modes must be
    BIT-identical; with a half-missing field the 3-state m estimate for
    that field strictly exceeds the 2-state one (which scores every
    missing comparison as a disagreement)."""
    from dataops_testgen_spark.pipeline.linkage import (LinkField,
                                                        fs_em_train)

    # two clusters of near-duplicate names sharing one block each; flag
    # agrees within clusters; 'sparse' duplicates flag but is NULL on
    # half the rows
    rows = []
    for i in range(40):
        grp = i % 2
        name = f"{'acme' if grp == 0 else 'zorg'} widget"
        flag = "x" if grp == 0 else "y"
        sparse = flag if i % 2 == 0 else None
        rows.append((i, name + (" co" if i % 8 == 0 else ""), flag, sparse))
    df = spark.createDataFrame(
        rows, "id int, name string, flag string, sparse string")
    fields = [LinkField("name", "levenshtein", max_dist=3),
              LinkField("flag", "exact"), LinkField("sparse", "exact")]
    kw = dict(id_col="id", block="last_token", n_iters=4)
    two = fs_em_train(df, fields=fields, **kw)
    three = fs_em_train(df, fields=fields, missing_state=True, **kw)
    assert two["n_pairs"] == three["n_pairs"] > 0
    m2 = dict((c, m) for c, m, _u in two["fields"])
    m3 = dict((c, m) for c, m, _u in three["fields"])
    # sparse agrees whenever both observed -> 3-state m ~ flag's m;
    # 2-state scores the ~75% missing comparisons as disagreements
    assert m3["sparse"] > m2["sparse"]
    assert m3["sparse"] > 0.9
    # NULL-free data: modes bit-identical
    dense = df.select("id", "name", "flag")
    f2 = fields[:2]
    a = fs_em_train(dense, fields=f2, **kw)
    b = fs_em_train(dense, fields=f2, missing_state=True, **kw)
    assert a == b


def test_fs_em_three_state_probe_mode_parity(spark):
    """Probe mode (queries=) under the ternary pattern space: probing a
    corpus WITH ITSELF visits every unordered pair twice (id_a != id_b
    instead of id_a < id_b), so every 3-state pattern count exactly
    doubles — and because EM depends only on pattern SHARES (doubling is
    exact in binary floating point), the learned (p, m, u) must be
    BIT-identical to self mode with n_pairs doubled."""
    from dataops_testgen_spark.pipeline.linkage import (LinkField,
                                                        fs_em_train)

    rows = []
    for i in range(40):
        grp = i % 2
        name = f"{'acme' if grp == 0 else 'zorg'} widget"
        flag = "x" if grp == 0 else "y"
        sparse = flag if i % 2 == 0 else None
        rows.append((i, name + (" co" if i % 8 == 0 else ""), flag, sparse))
    df = spark.createDataFrame(
        rows, "id int, name string, flag string, sparse string")
    fields = [LinkField("name", "levenshtein", max_dist=3),
              LinkField("flag", "exact"), LinkField("sparse", "exact")]
    kw = dict(id_col="id", block="last_token", n_iters=4,
              missing_state=True)
    self_mode = fs_em_train(df, fields=fields, **kw)
    probe = fs_em_train(df, queries=df, fields=fields, **kw)
    assert probe["n_pairs"] == 2 * self_mode["n_pairs"] > 0
    assert probe["p"] == self_mode["p"]
    assert probe["fields"] == self_mode["fields"]


def test_fs_em_fully_degenerate_raises_clean(spark):
    """A corpus whose patterns all weight to the same class leaves no
    mixture to estimate — the M-step must raise the documented ValueError
    rather than ZeroDivisionError."""
    import pytest as _pt

    from dataops_testgen_spark.pipeline.linkage import (LinkField,
                                                        fs_em_train)

    # single pattern (every pair agrees on every field): w is the same
    # for all rows and EM collapses — swn -> 0 once w rounds to 1
    rows = [(i, "same token", "x") for i in range(5)]
    df = spark.createDataFrame(rows, "id int, name string, flag string")
    with _pt.raises((ValueError,), match="EM degenerated|no candidate"):
        fs_em_train(
            df, fields=[LinkField("name"), LinkField("flag")],
            id_col="id", block="last_token", n_iters=30,
            init_p=0.999999999, init_m=0.999999999, init_u=0.000000001)


def test_record_linkage_jaccard_comparator(spark):
    """Token-set Jaccard agreement — the multi-word comparator (word
    order and duplicates ignored; levenshtein would be O(len^2) and
    order-sensitive here)."""
    from dataops_testgen_spark.pipeline.linkage import (LinkField,
                                                        record_linkage)

    rows = [(1, "big data quality engine"),
            (2, "quality big data engine"),      # same tokens, reordered
            (3, "big data swamp thing engine"),  # jaccard 3/6 = 0.5
            (4, "completely different engine")]  # jaccard 1/6
    df = spark.createDataFrame(rows, "id int, title string")
    fields = [LinkField("title", "jaccard", min_jaccard=0.5)]
    got = {(r["id_a"], r["id_b"]): r["n_agree"] for r in
           record_linkage(df, fields=fields, block_col="title",
                          block="last_token").collect()}
    # every row ends with 'engine' - all four share the block
    assert got[(1, 2)] == 1          # reorder-invariant
    assert got[(1, 3)] == 1          # exactly at the 0.5 threshold
    assert got[(1, 4)] == 0
    # fs_em accepts the comparator too
    from dataops_testgen_spark.pipeline.linkage import fs_em_train
    model = fs_em_train(df, fields=fields, id_col="id",
                        block_col="title", block="last_token", n_iters=2)
    assert model["n_pairs"] == 6


def test_fs_em_degenerate_probabilities_no_crash(spark):
    """After rounding, a field probability can pin to exactly 0/1 while
    an opposite pattern still exists (tiny corpora): both class
    likelihoods vanish for that pattern and the E-step must weight it 0
    instead of dividing by zero."""
    from dataops_testgen_spark.pipeline.linkage import (LinkField,
                                                        fs_em_train)

    # one block; 'flag' agrees on every pair except one — with extreme
    # inits the m/u estimates pin to 0/1 within a round or two
    rows = [(i, "same token", "x" if i < 6 else "y") for i in range(7)]
    df = spark.createDataFrame(rows, "id int, name string, flag string")
    model = fs_em_train(
        df, fields=[LinkField("name", "exact"), LinkField("flag", "exact")],
        id_col="id", block="last_token", n_iters=10,
        init_p=0.9, init_m=0.99, init_u=0.01)
    assert model["n_pairs"] == 21
    for _c, m, u in model["fields"]:
        assert 0.0 <= m <= 1.0 and 0.0 <= u <= 1.0
