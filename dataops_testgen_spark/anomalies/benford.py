"""Benford's-law conformity screen for numeric columns.

Naturally-occurring multi-magnitude quantities (amounts, populations,
transaction totals) follow Benford's first-digit law
P(d) = log10(1 + 1/d); fabricated or constrained data doesn't — the
standard forensic-accounting / data-quality screen (Nigrini 2012),
extending the hygiene-screen family (anomalies/screen.py) with a
distribution-shape rule the reference lacks.

Spark shape: the first significant digit is a pure expression
(floor(|x| / 10^floor(log10|x|)) — no string formatting, which differs
between engines), so the whole screen is ONE partial-agg groupBy(digit)
over at most 9 groups; chi-square terms finalize per digit from the
group counts. Zero/NULL values carry no first digit and are excluded.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def benford_screen(df: DataFrame, col: str) -> DataFrame:
    """(digit, n, obs_share, exp_share, chi2_term) for digits 1-9:
    observed vs Benford-expected first-significant-digit shares plus the
    per-digit chi-square contribution (n_d - N*p_d)^2 / (N*p_d) — their
    sum against chi2(8) critical values is the conformity decision.
    Digits with zero observations still appear (their term is N*p_d)."""
    x = F.abs(F.col(col).cast("double"))
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x))))
    # NaN sorts above every number in Spark, so `x > 0` alone would let
    # NaN/Inf rows into the total while their digit lands NULL — the
    # shares and chi2 would be silently wrong
    counts = (df.filter(F.col(col).isNotNull() & (x > 0)
                        & ~F.isnan(x) & (x != float("inf")))
              .select(digit.cast("int").alias("digit"))
              .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [(d, math.log10(1.0 + 1.0 / d)) for d in range(1, 10)],
        "digit int, exp_share double")
    total = counts.agg(F.sum("n").alias("total"))
    return (expected.join(counts, "digit", "left")
            .crossJoin(F.broadcast(total))
            .select("digit",
                    F.coalesce("n", F.lit(0)).alias("n"),
                    (F.coalesce("n", F.lit(0)) / F.col("total"))
                    .alias("obs_share"),
                    "exp_share",
                    (F.pow(F.coalesce("n", F.lit(0))
                           - F.col("total") * F.col("exp_share"), 2)
                     / (F.col("total") * F.col("exp_share")))
                    .alias("chi2_term")))
