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
