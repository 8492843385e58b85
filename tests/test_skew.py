"""Skew utilities: salted join equivalence + hot-key detection."""

from pyspark.sql import functions as F

from dataops_testgen_spark.pipeline import skew


def test_top_keys(spark):
    rows = [("hot",)] * 80 + [("warm",)] * 15 + [(f"k{i}",) for i in range(5)]
    df = spark.createDataFrame(rows, "k: string")
    keys = skew.top_keys(df, ["k"], min_share=0.10)
    assert keys == [("hot",), ("warm",)]


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        "k: string, v: long")
    small = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("absent", "A")], "k: string, tag: string")
    plain = big.join(small, ["k"], "inner").groupBy("k", "tag") \
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    salted = skew.salted_join(big, small, ["k"], salt_n=8).groupBy("k", "tag") \
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], "k: string, v: long")
    small = spark.createDataFrame([("a", "A")], "k: string, tag: string")
    out = {(r["k"], r["tag"]) for r in
           skew.salted_join(big, small, ["k"], salt_n=4, how="left").collect()}
    assert out == {("a", "A"), ("b", None)}


def test_salted_join_preserves_user_salt_column(spark):
    from dataops_testgen_spark.pipeline.skew import salted_join
    import pyspark.sql.functions as F

    big = spark.createDataFrame([(1, "a"), (2, "b")], "k: long, _salt: string")
    small = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k: long, v: double")
    out = salted_join(big, small, ["k"]).orderBy("k").collect()
    # the user's _salt column survives untouched
    assert [(r["k"], r["_salt"], r["v"]) for r in out] == [
        (1, "a", 10.0), (2, "b", 20.0)]
    # the reserved internal name is refused outright
    bad = big.withColumn("__tg_salt__", F.lit(1))
    import pytest
    with pytest.raises(ValueError):
        salted_join(bad, small, ["k"])
