"""Mergeable quantile sketch (profiling/sketches.py): exact below
capacity, bounded rank error above, order-insensitive merge — the numeric
half of the partition-incremental profiling path (VERDICT r4 'do this'
#5)."""

import numpy as np
import pytest

from dataops_testgen_spark.profiling.sketches import (QuantileSketch,
                                                      merge_sketch_blobs)


def _exact_percentile(data, p):
    """Spark's exact Percentile interpolation, the formula the sketch
    reproduces."""
    s = np.sort(np.asarray(data, dtype=float))
    pos = p * (len(s) - 1)
    lo, hi = int(np.floor(pos)), int(np.ceil(pos))
    if lo == hi:
        return float(s[lo])
    return (hi - pos) * float(s[lo]) + (pos - lo) * float(s[hi])


def test_exact_below_capacity():
    rng = np.random.default_rng(7)
    data = rng.normal(100, 15, 20_000)
    s = QuantileSketch.from_values(data, capacity=50_000)
    for p in (0.0, 0.25, 0.5, 0.75, 0.9, 1.0):
        assert s.percentile(p) == _exact_percentile(data, p)


def test_duplicate_consolidation_is_lossless():
    # 100k values but only 11 distinct -> zero compression, exact answers
    data = np.tile(np.arange(11.0), 10_000)
    s = QuantileSketch.from_values(data, capacity=64)
    assert len(s.values) == 11 and s.n == 110_000
    assert s.percentile(0.5) == _exact_percentile(data, 0.5)


def test_merge_exact_and_order_insensitive():
    rng = np.random.default_rng(11)
    data = rng.uniform(-5, 5, 30_000)
    parts = [QuantileSketch.from_values(data[i::5], capacity=100_000)
             for i in range(5)]
    whole = QuantileSketch.from_values(data, capacity=100_000)
    m1 = parts[0].merge(*parts[1:])
    m2 = parts[3].merge(parts[1], parts[4], parts[0], parts[2])
    assert m1.n == m2.n == len(data)
    for p in (0.25, 0.5, 0.75):
        assert m1.percentile(p) == whole.percentile(p)
        assert m2.percentile(p) == m1.percentile(p)


def test_compression_rank_error_bound():
    rng = np.random.default_rng(3)
    data = rng.exponential(10, 100_000)       # skewed on purpose
    s = QuantileSketch.from_values(data, capacity=256)
    assert len(s.values) <= 256
    for p in (0.1, 0.25, 0.5, 0.75, 0.95):
        est = s.percentile(p)
        rank = float((data <= est).mean())
        # documented bound ~2/capacity of the mass; assert 4x slack
        assert abs(rank - p) <= 4 * (2 / 256), (p, rank)


def test_serialization_round_trip():
    data = np.arange(1000.0)
    s = QuantileSketch.from_values(data, capacity=128)
    r = QuantileSketch.from_bytes(s.to_bytes())
    assert np.array_equal(r.values, s.values)
    assert np.array_equal(r.weights, s.weights)
    assert r.capacity == s.capacity
    with pytest.raises(ValueError):
        QuantileSketch.from_bytes(b"nope" + bytes(16))


def test_empty_and_nan():
    assert QuantileSketch.from_values([]).percentile(0.5) is None
    assert QuantileSketch.from_values([np.nan, np.nan]).n == 0
    m = merge_sketch_blobs([None, QuantileSketch.empty().to_bytes()])
    assert m.percentile(0.5) is None


def test_merged_profile_percentiles_exact(spark, sf_dir):
    """merge_profiles folds per-slice quantile sketches: with capacity
    above the distinct count the merged percentile_25/50/75 equal the
    full-table exact profile values bit-for-bit; without sketches they
    stay NULL."""
    import datetime

    from pyspark.sql import functions as F

    from dataops_testgen_spark.profiling.merge import merge_profiles
    from dataops_testgen_spark.profiling.profiler import profile_table

    df = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    rd = datetime.date(2026, 1, 1)
    full = {r["column_name"]: r
            for r in profile_table(df, "orders", run_date=rd).collect()}
    parts = None
    for i in range(3):
        p = profile_table(df.filter(F.col("o_orderkey") % 3 == i), "orders",
                          run_date=rd, keep_sketches=True,
                          sketch_capacity=100_000)
        parts = p if parts is None else parts.unionByName(p)
    merged = {r["column_name"]: r for r in merge_profiles(parts).collect()}
    for c, f in full.items():
        if f["general_type"] != "N":
            assert merged[c]["percentile_50"] is None
            continue
        for m in ("percentile_25", "percentile_50", "percentile_75"):
            assert merged[c][m] == f[m], (c, m, merged[c][m], f[m])
        assert merged[c]["quantile_sketch"] is not None


def test_merged_profile_percentiles_compressed(spark, sf_dir):
    """With a small capacity the sketches compress; merged percentiles
    must land within the documented rank-error bound of the exact
    values."""
    import datetime

    from pyspark.sql import functions as F

    from dataops_testgen_spark.profiling.merge import merge_profiles
    from dataops_testgen_spark.profiling.profiler import profile_table

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_orderkey", "l_extendedprice")
    rd = datetime.date(2026, 1, 1)
    vals = np.array([r[0] for r in
                     df.select("l_extendedprice").dropna().collect()],
                    dtype=float)
    parts = None
    for i in range(2):
        p = profile_table(df.filter(F.col("l_orderkey") % 2 == i),
                          "lineitem", run_date=rd, keep_sketches=True,
                          sketch_capacity=128)
        parts = p if parts is None else parts.unionByName(p)
    row = {r["column_name"]: r for r in
           merge_profiles(parts).collect()}["l_extendedprice"]
    for m, p in (("percentile_25", 0.25), ("percentile_50", 0.5),
                 ("percentile_75", 0.75)):
        rank = float((vals <= row[m]).mean())
        assert abs(rank - p) <= 4 * (2 / 128), (m, rank)


# ---------------------------------------------------------------------------
# FreqSketch: exact-or-NULL frequency summary for merged top-k metrics


def test_freq_sketch_exact_below_capacity():
    from dataops_testgen_spark.profiling.sketches import FreqSketch

    s = FreqSketch(capacity=8)
    s.add_counts([("b", 3), ("a", 5), ("c", 3)])
    s.add_counts([("b", 2)])
    assert s.n_distinct == 3 and not s.overflowed
    # tiebreak: count DESC, value ASC — b(5) before a(5) is wrong, a wins
    assert s.top_k(2) == [("a", 5), ("b", 5)]
    import hashlib
    assert s.distinct_hash() == hashlib.md5(b"a|b|c").hexdigest()
    assert s.max_len == 1


def test_freq_sketch_overflow_is_null():
    from dataops_testgen_spark.profiling.sketches import FreqSketch

    s = FreqSketch(capacity=3)
    s.add_counts([(f"v{i}", 1) for i in range(5)])
    assert s.overflowed and s.top_k(3) is None
    assert s.n_distinct is None and s.distinct_hash() is None
    assert s.max_len == 2  # still tracked exactly through overflow
    # overflow is sticky through merges
    t = FreqSketch(capacity=3)
    t.add_counts([("x", 1)])
    assert t.merge(s).overflowed and s.merge(t).overflowed


def test_freq_sketch_merge_order_insensitive():
    from dataops_testgen_spark.profiling.sketches import (FreqSketch,
                                                          merge_freq_blobs)

    parts = []
    for i in range(4):
        s = FreqSketch(capacity=64)
        s.add_counts([(f"v{j}", j + i) for j in range(10)])
        parts.append(s)
    a = merge_freq_blobs([p.to_bytes() for p in parts])
    b = merge_freq_blobs([p.to_bytes() for p in reversed(parts)])
    assert a.counts == b.counts and a.top_k(5) == b.top_k(5)


def test_merged_profile_topfreq_exact(spark, sf_dir):
    """merge_profiles folds value/pattern frequency sketches: merged
    top_freq_values / distinct_value_hash / top_patterns /
    distinct_pattern_ct equal the full-table secondary profile exactly;
    a > capacity-distinct column (c_name) reports the same NULL/values
    the full profile's qualification rule produces."""
    import datetime

    from pyspark.sql import functions as F

    from dataops_testgen_spark.profiling.merge import merge_profiles
    from dataops_testgen_spark.profiling.profiler import profile_table

    df = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .select("c_custkey", "c_name", "c_mktsegment")
    rd = datetime.date(2026, 1, 1)
    full = {r["column_name"]: r
            for r in profile_table(df, "customer", run_date=rd).collect()}
    parts = None
    for i in range(3):
        p = profile_table(df.filter(F.col("c_custkey") % 3 == i),
                          "customer", run_date=rd, keep_sketches=True,
                          secondary=False)
        parts = p if parts is None else parts.unionByName(p)
    merged = {r["column_name"]: r for r in merge_profiles(parts).collect()}
    for c in ("c_name", "c_mktsegment"):
        for fld in ("top_freq_values", "distinct_value_hash",
                    "top_patterns", "distinct_pattern_ct"):
            assert merged[c][fld] == full[c][fld], (c, fld)
    # the high-cardinality column exercised the NULL path for values but
    # kept its (few) patterns
    assert merged["c_name"]["top_freq_values"] is None
    assert merged["c_name"]["top_patterns"] is not None
