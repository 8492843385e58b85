"""Fuzzy record linkage: blocked candidate generation + edit-distance
verification — the classic two-stage dedup/matching shape (Fellegi &
Sunter lineage; same candidates→verify discipline as
``dedup.verified_near_dups``, at record rather than document scale).

Reference analogue: TestGen has no fuzzy matching; this extends the
data-quality surface the way the dedup/similarity families do.

Spark shape: candidates come from ONE equi-join on a deterministic
blocking key (never a cross join); verification is JVM-side
``F.levenshtein`` (whole-stage codegen, no UDF). Cost and recall are
both set by the blocking choice: a pair in different blocks is never
compared (recall loss), and a hot block does |block|² comparisons —
at scale pick a key with enough cardinality (prefix length up,
``last_token`` only for short structured names) and let AQE's skew
handling split stragglers.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOCKERS = ("last_token", "first_token", "prefix", "soundex")


def _norm(col: Column) -> Column:
    return F.lower(F.trim(col))


def _block_key(col: Column, block: str, prefix_len: int) -> Column:
    n = _norm(col)
    if block == "last_token":
        return F.regexp_extract(n, r"(\S+)$", 1)
    if block == "first_token":
        return F.regexp_extract(n, r"^(\S+)", 1)
    if block == "prefix":
        return F.substring(n, 1, prefix_len)
    if block == "soundex":
        # phonetic blocking (JVM soundex): "Robert"/"Rupert" share R163 —
        # catches misspellings a prefix block separates; person-name
        # shaped data only (the code degenerates on long multi-word text)
        return F.soundex(n)
    raise ValueError(f"block must be one of {BLOCKERS}")


def fuzzy_match_pairs(df: DataFrame, queries: DataFrame | None = None,
                      col: str = "name", id_col: str = "id",
                      max_dist: int = 2, block: str = "last_token",
                      prefix_len: int = 3) -> DataFrame:
    """Pairs whose normalized ``col`` values are within ``max_dist``
    Levenshtein edits, restricted to same-block candidates.

    - self mode (``queries=None``): output (id_a, id_b, dist) with
      id_a < id_b — each near-duplicate pair once.
    - probe mode: ``queries`` (same schema) matches against ``df`` —
      output (query_id, match_id, dist), self-matches by id excluded.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    base = (df.filter(F.col(col).isNotNull())
            .select(F.col(id_col).alias("id_b"),
                    _norm(F.col(col)).alias("nm_b"),
                    _block_key(F.col(col), block, prefix_len).alias("blk")))
    q = (df if queries is None else queries)
    probes = (q.filter(F.col(col).isNotNull())
              .select(F.col(id_col).alias("id_a"),
                      _norm(F.col(col)).alias("nm_a"),
                      _block_key(F.col(col), block, prefix_len)
                      .alias("blk")))
    cond = (F.col("id_a") < F.col("id_b") if queries is None
            else F.col("id_a") != F.col("id_b"))
    cand = probes.join(base, "blk").filter(cond)
    out = (cand.select("id_a", "id_b",
                       F.levenshtein("nm_a", "nm_b").alias("dist"))
           .filter(F.col("dist") <= max_dist))
    if queries is None:
        return out
    return out.select(F.col("id_a").alias("query_id"),
                      F.col("id_b").alias("match_id"), "dist")
