"""Bucketed storage (io/bucketing.py): the join/agg Exchange disappears
when both sides are bucketed on the key — the physical-design lever for
repeated 100 TB joins."""

import pytest
from pyspark.sql import functions as F

from dataops_testgen_spark.io.bucketing import (is_exchange_free_join,
                                                read_bucketed,
                                                write_bucketed)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .withColumnRenamed("c_custkey", "o_custkey")
    write_bucketed(orders, "b_orders", ["o_custkey"], num_buckets=8)
    write_bucketed(customer, "b_customer", ["o_custkey"], num_buckets=8)
    # at fixture scale Catalyst would broadcast the small side, which
    # bypasses bucketing entirely — force the SMJ path the 100 TB shape
    # takes so the plans under test are the ones bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield {"orders": orders, "customer": customer}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    a = read_bucketed(spark, "b_orders")
    b = read_bucketed(spark, "b_customer")
    assert is_exchange_free_join(a, b, ["o_custkey"])
    # the plain parquet join DOES shuffle — the baseline the bucketing beats
    assert not is_exchange_free_join(
        bucketed["orders"], bucketed["customer"], ["o_custkey"])


def test_bucketed_join_results_match_plain(spark, bucketed):
    a = read_bucketed(spark, "b_orders")
    b = read_bucketed(spark, "b_customer")
    got = (a.join(b, "o_custkey").groupBy("o_custkey")
           .agg(F.count(F.lit(1)).alias("n")).orderBy("o_custkey").collect())
    want = (bucketed["orders"].join(bucketed["customer"], "o_custkey")
            .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("o_custkey").collect())
    assert got == want and got


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    a = read_bucketed(spark, "b_orders")
    plan = (a.groupBy("o_custkey").agg(F.sum("o_totalprice"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_write_bucketed_validation(spark, bucketed):
    with pytest.raises(ValueError):
        write_bucketed(bucketed["orders"], "b_bad", [])


def test_bucketed_aggregate_balance_zero_exchange(spark, sf_dir, tmp_path):
    """aggregate_balance over null-safe-struct-bucketed inputs plans with
    ZERO shuffle Exchange end-to-end (r6 VERDICT #4: the eqNullSafe join
    used to shuffle its group-cardinality rows because Catalyst's
    Coalesce/IsNull key rewrite never matches the scans'
    HashPartitioning) — and the results equal the default null-safe
    operator exactly, INCLUDING null group keys."""
    from dataops_testgen_spark.execution.query_tests import (
        aggregate_balance)
    from dataops_testgen_spark.io.bucketing import (NULL_SAFE_KEY_COL,
                                                    read_bucketed,
                                                    write_bucketed)

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .withColumn("o_custkey",
                    F.when(F.col("o_orderkey") % 7 == 0, None)
                    .otherwise(F.col("o_custkey")))
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .withColumn("c_custkey",
                    F.when(F.col("c_custkey") % 11 == 0, None)
                    .otherwise(F.col("c_custkey")))
    write_bucketed(orders, "nsb_orders", ["o_custkey"], num_buckets=8,
                   null_safe_key=True)
    write_bucketed(customer, "nsb_customer", ["c_custkey"], num_buckets=8,
                   null_safe_key=True)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fast = aggregate_balance(
            read_bucketed(spark, "nsb_orders"), ["o_custkey"],
            F.sum("o_totalprice"),
            read_bucketed(spark, "nsb_customer"), ["c_custkey"],
            F.sum("c_acctbal") * 100,
            mode="exact", struct_key_col=NULL_SAFE_KEY_COL)
        plan = fast._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        want = aggregate_balance(
            orders, ["o_custkey"], F.sum("o_totalprice"),
            customer, ["c_custkey"], F.sum("c_acctbal") * 100,
            mode="exact")
        canon = lambda df: {
            (r["o_custkey"],
             None if r["total"] is None else round(r["total"], 5),
             None if r["match_total"] is None
             else round(r["match_total"], 5))
            for r in df.collect()}
        got, ref = canon(fast), canon(want)
        assert got == ref and got
        # the null group key actually exercised both paths
        assert any(k is None for k, _, _ in got)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS nsb_orders")
        spark.sql("DROP TABLE IF EXISTS nsb_customer")
