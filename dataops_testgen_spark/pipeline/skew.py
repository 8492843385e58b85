"""Skew-aware join/aggregation utilities for the 100 TB path.

A shuffle join on a skewed key sends every row of the hot key to ONE
reducer; with web-scale corpora (a handful of domains owning most documents,
one customer owning most orders) that single task dominates the stage. AQE's
skew-join handling splits oversized partitions at runtime; these helpers are
the explicit, plannable version for when the skew is known or must be
handled deterministically:

- ``salted_join``: replicate the small(er) side ``salt_n`` ways and scatter
  the big side's hot keys uniformly across the replicas — an N-way fan-out
  of the build side buys an N-way fan-in of the hot key's rows.
- ``top_keys``: cheap hot-key detection (one partial-agg scan) to decide
  whether salting is worth the replication.

Both are pure DataFrame compositions — Catalyst still plans the join; the
salt column only changes the shuffle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_keys(df: DataFrame, keys: list[str], min_share: float = 0.01,
             max_keys: int = 100) -> list[tuple]:
    """Keys holding at least ``min_share`` of the rows — candidates for
    skew handling. One partial-aggregated scan; driver receives ≤max_keys
    rows."""
    total = df.count()
    if not total:
        return []
    rows = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("ct"))
            .filter(F.col("ct") >= max(1, int(min_share * total)))
            .orderBy(F.col("ct").desc()).limit(max_keys).collect())
    return [tuple(r[k] for k in keys) for r in rows]


def hot_key_profile(df: DataFrame, keys: list[str],
                    min_share: float = 0.01,
                    max_keys: int = 100) -> DataFrame:
    """DataFrame form of ``top_keys`` for pipelines/reporting: per hot key
    its row count and corpus share, ordered hottest-first. Same single
    partial-agg scan; the one-row total is broadcast into the share
    division (no second pass, no driver collect)."""
    total = df.agg(F.count(F.lit(1)).alias("__total__"))
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("key_ct"))
    return (counts.crossJoin(F.broadcast(total))
            .filter(F.col("key_ct") >=
                    F.greatest(F.lit(1),
                               (F.lit(min_share) * F.col("__total__"))
                               .cast("long")))
            .select(*keys, "key_ct",
                    (F.col("key_ct") / F.col("__total__")).alias("share"))
            .orderBy(F.col("key_ct").desc(), *keys)
            .limit(max_keys))


def salted_join(big: DataFrame, small: DataFrame, keys: list[str],
                salt_n: int = 16, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: each ``big`` row gets a random salt in
    [0, salt_n); ``small`` is replicated once per salt value; the join key
    becomes (keys…, salt), so a hot key's rows spread over ``salt_n``
    reducers instead of one.

    Use when the small side fits ``salt_n`` replications (dimension-sized)
    but is too big (or the key too hot) for a plain broadcast. The output
    equals ``big.join(small, keys, how)`` row-for-row.
    """
    assert how in ("inner", "left"), "salted_join supports inner/left"
    # collision-proof internal name: a user '_salt' column must survive
    salt = "__tg_salt__"
    if salt in big.columns or salt in small.columns:
        raise ValueError(f"salted_join: reserved column name {salt!r} "
                         "already present in an input")
    salted_big = big.withColumn(
        salt, (F.rand(seed=7) * salt_n).cast("int"))
    replicas = small.withColumn(
        salt, F.explode(F.array(*[F.lit(i) for i in range(salt_n)])))
    out = salted_big.join(replicas, [*keys, salt], how)
    return out.drop(salt)
