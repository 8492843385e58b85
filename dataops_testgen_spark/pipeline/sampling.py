"""Deterministic corpus sampling for training-data pipelines.

Reproducibility is the point: a training-data pipeline must be able to
re-derive EXACTLY the same sample on re-runs, across clusters, and across
engines (Spark job vs warehouse SQL audit). ``rand()`` can't do that, so
these operators derive the randomness from a salted hash of a stable id —
the standard "deterministic sampling" trick (same idea as the reference's
seeded Bernoulli profiling sample, `commands/queries/profiling_query.py`
seed 64, but content-addressed instead of RNG-stream-addressed).

All operators are narrow or single-shuffle DataFrame plans:

- ``hash_sample``       — Bernoulli p by hash threshold. Narrow (no
  shuffle, no state); at 100 TB it is a scan-speed filter.
- ``stratified_cap``    — at most N rows per stratum, hash-ranked. One
  shuffle on the strata key (the window partition); skewed strata are
  bounded by the cap itself on output.
- ``stratified_sample`` — per-stratum Bernoulli fractions (e.g. downweight
  over-represented languages/sources). Narrow: the fraction lookup is a
  literal CASE, the filter is hash-threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32 buckets from the first 8 hex chars of md5 — available bit-for-bit
# in every engine (Spark, DuckDB, warehouses), so a sample drawn here can
# be re-derived exactly in an audit SQL query. The salt isolates
# independent draws.
_BUCKETS = float(2 ** 32)


def _unit_hash(id_col: Column, salt: str) -> Column:
    """Deterministic uniform value in [0, 1) from (salt, id)."""
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), id_col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            / F.lit(_BUCKETS))


def hash_sample(df: DataFrame, id_col: str = "doc_id",
                fraction: float = 0.1, salt: str = "tg") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by salted id hash — same rows on
    every run/engine. Change ``salt`` for an independent draw."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_unit_hash(F.col(id_col), salt) < F.lit(fraction))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float],
                      id_col: str = "doc_id",
                      default_fraction: float = 0.0,
                      salt: str = "tg") -> DataFrame:
    """Per-stratum Bernoulli keep-rates (Spark's ``sampleBy`` shape, but
    deterministic): e.g. ``{"en": 0.1, "de": 1.0}`` to rebalance a corpus.
    Strata not listed keep ``default_fraction``."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1]")
    frac = F.lit(default_fraction)
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(frac)
    return df.filter(_unit_hash(F.col(id_col), salt) < frac)


def stratified_cap(df: DataFrame, strata_cols: list[str], cap: int,
                   id_col: str = "doc_id", salt: str = "tg") -> DataFrame:
    """At most ``cap`` rows per stratum, selected by hash rank (stable
    across runs). One shuffle (window partition on the strata); output per
    stratum is bounded by ``cap`` regardless of input skew."""
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError("cap must be >= 1")
    w = (Window.partitionBy(*strata_cols)
         .orderBy(_unit_hash(F.col(id_col), salt), F.col(id_col)))
    return (df.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= cap).drop("__rn__"))
