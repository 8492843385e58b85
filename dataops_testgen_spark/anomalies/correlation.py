"""Numeric-correlation screen: derived/duplicate column detection.

Extends the hygiene-screen family (anomalies/screen.py) sideways the way
the Benford screen does: the reference's contingency rules
(`/root/reference/testgen/template/profiling/contingency_columns.sql`)
find FUNCTIONALLY DEPENDENT categorical pairs; this is the numeric
analogue — a near-1 |Pearson r| between two numeric columns flags a
derived column (unit conversion, tax = rate x price, a copy-paste
duplicate) that wastes storage and double-counts signals downstream.

Spark shape: ONE fused agg over the table — per pair a ``F.corr``
(algebraic CentralMomentAgg: partial-aggregated map-side, exact) plus a
both-non-null pair count; the pair list is K(K-1)/2 expressions over the
column COUNT, never a self-join over rows, and the output unpivots
lazily (explode over literal structs), so the whole screen is one
scan + one single-row exchange regardless of table size."""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _numeric_cols(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields
            if isinstance(f.dataType, T.NumericType)]


def correlation_screen(df: DataFrame, cols: list[str] | None = None,
                       min_abs_corr: float = 0.95,
                       min_n: int = 500) -> DataFrame:
    """(col_a, col_b, n, corr, flagged) for every unordered pair of
    ``cols`` (default: all numeric columns, schema order): sample
    Pearson correlation over both-non-null rows, with ``flagged`` =
    |corr| >= min_abs_corr and n >= min_n — the derived/duplicate-column
    signal. Constant columns yield NULL corr (undefined), never a flag.
    """
    cols = cols if cols is not None else _numeric_cols(df)
    if len(cols) < 2:
        raise ValueError("need at least two numeric columns")
    seen = set()
    for c in cols:
        if c in seen:
            raise ValueError(f"duplicate column {c!r}")
        seen.add(c)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = []
    for i, (a, b) in enumerate(pairs):
        ad, bd = F.col(a).cast("double"), F.col(b).cast("double")
        # sample Pearson spelled as covar/(sd*sd) over the PAIRWISE
        # non-null rows, with try_divide: F.corr under ANSI mode throws
        # DIVIDE_BY_ZERO on a constant column instead of returning the
        # undefined-correlation NULL (DuckDB CORR's behavior)
        a_pair = F.when(F.col(b).isNotNull(), ad)
        b_pair = F.when(F.col(a).isNotNull(), bd)
        aggs.append(F.try_divide(
            F.covar_samp(ad, bd),
            F.stddev_samp(a_pair) * F.stddev_samp(b_pair)).alias(f"c{i}"))
        aggs.append(F.count(F.when(F.col(a).isNotNull()
                                   & F.col(b).isNotNull(), 1))
                    .alias(f"n{i}"))
    one = df.agg(*aggs)
    entries = [
        F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                 F.col(f"n{i}").alias("n"), F.col(f"c{i}").alias("corr"))
        for i, (a, b) in enumerate(pairs)]
    out = (one.select(F.explode(F.array(*entries)).alias("p"))
           .select("p.col_a", "p.col_b", "p.n", "p.corr"))
    return out.withColumn(
        "flagged",
        F.coalesce((F.abs("corr") >= float(min_abs_corr))
                   & (F.col("n") >= int(min_n)), F.lit(False)))
