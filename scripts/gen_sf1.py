"""Generate an sf1-scale synthetic dataset (10x sf0.1) for the scaling probe.

/root/testdata is read-only and the driver ships no sf1, so this script
synthesizes the four tables the heaviest bench queries touch — lineitem
(6M), orders (1.5M), documents (50k), embeddings (20k) — matching the
driver tables' schemas and value distributions (vocab-word documents with
an exact/near-duplicate tail, 64-dim 10-cluster embeddings, TPC-H-ish
fact columns).  Deterministic: every random column derives from
md5/xxhash of the row id, no RNG state.

Usage: python scripts/gen_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataops_testgen_spark.session import get_spark  # noqa: E402

VOCAB = ("batch part spark line column order small sort fast value scan hash "
         "slow group agg filter big merge stream the a key query table row "
         "data join window vector customer").split()


def _h(col, seed: str):
    """Deterministic uniform [0,1) from a row id + seed."""
    return (F.conv(F.substring(F.md5(F.concat(F.lit(seed),
                                              col.cast("string"))), 1, 8),
                   16, 10).cast("double") / F.lit(float(16 ** 8)))


def main(out_dir: str = "/tmp/sf1") -> None:
    spark = get_spark("gen-sf1")
    os.makedirs(out_dir, exist_ok=True)

    # --- orders: 1.5M ---
    o = spark.range(1_500_000).select(
        F.col("id").alias("o_orderkey"),
        (F.floor(_h(F.col("id"), "cust") * 150_000)).alias("o_custkey"),
        F.element_at(F.array(*[F.lit(s) for s in ("O", "F", "P")]),
                     (F.floor(_h(F.col("id"), "st") * 3) + 1).cast("int")
                     ).alias("o_orderstatus"),
        (F.round(_h(F.col("id"), "tp") * 400_000 + 900, 2)
         ).alias("o_totalprice"),
        (F.lit("1992-01-01").cast("timestamp")
         + F.make_interval(days=(_h(F.col("id"), "od") * 2400)
                           .cast("int"))).alias("o_orderdate"),
        F.element_at(
            F.array(*[F.lit(s) for s in
                      ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                       "5-LOW")]),
            (F.floor(_h(F.col("id"), "pr") * 5) + 1).cast("int")
        ).alias("o_orderpriority"),
    )
    o.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    # --- lineitem: 6M (4 lines per order) ---
    li = spark.range(6_000_000).select(
        (F.col("id") / 4).cast("long").alias("l_orderkey"),
        (F.floor(_h(F.col("id"), "pk") * 200_000)).alias("l_partkey"),
        (F.floor(_h(F.col("id"), "sk") * 10_000)).alias("l_suppkey"),
        (F.col("id") % 4 + 1).cast("int").alias("l_linenumber"),
        (F.floor(_h(F.col("id"), "q") * 50) + 1).cast("double")
        .alias("l_quantity"),
        (F.round(_h(F.col("id"), "ep") * 99_000 + 900, 2))
        .alias("l_extendedprice"),
        (F.round(F.floor(_h(F.col("id"), "d") * 11) / 100.0, 2))
        .alias("l_discount"),
        (F.round(F.floor(_h(F.col("id"), "t") * 9) / 100.0, 2))
        .alias("l_tax"),
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                     (F.floor(_h(F.col("id"), "rf") * 3) + 1).cast("int")
                     ).alias("l_returnflag"),
        F.element_at(F.array(F.lit("O"), F.lit("F")),
                     (F.floor(_h(F.col("id"), "ls") * 2) + 1).cast("int")
                     ).alias("l_linestatus"),
        (F.lit("1992-01-01").cast("timestamp")
         + F.make_interval(days=(_h(F.col("id"), "sd") * 2500)
                           .cast("int"))).alias("l_shipdate"),
    )
    li.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    # --- documents: 50k, 8-100 vocab words; ~6% near-dup tail ---
    n_docs = 50_000
    base = spark.range(n_docs)
    n_words = (F.floor(_h(F.col("id"), "nw") * 93) + 8).cast("int")
    word = F.element_at(
        F.array(*[F.lit(w) for w in VOCAB]),
        (F.floor(_h(F.col("id") * F.lit(1_000_003) + F.col("pos"), "w")
                 * len(VOCAB)) + 1).cast("int"))
    docs = (base
            .select("id", F.explode(F.sequence(F.lit(0), n_words - 1))
                    .alias("pos"))
            .select("id", "pos", word.alias("w"))
            .groupBy("id")
            .agg(F.concat_ws(" ", F.collect_list("w")).alias("text")))
    # near-dup tail: the last 6% of ids copy an original with one word
    # appended (keeps the dedup queries' candidate structure meaningful)
    cutoff = int(n_docs * 0.94)
    originals = docs.filter(F.col("id") < cutoff)
    dup_rows = (spark.range(cutoff, n_docs)
                .select("id", (F.col("id") - cutoff).alias("k"))
                .join(originals.select(F.col("id").alias("k2"), "text"),
                      F.col("k") == F.col("k2"))
                .select("id",
                        F.concat(F.col("text"), F.lit(" "),
                                 F.when(_h(F.col("id"), "mut") < 0.5,
                                        F.lit("spark")).otherwise(
                                     F.lit("batch"))).alias("text")))
    all_docs = originals.select("id", "text").unionByName(dup_rows)
    out_docs = all_docs.select(
        F.col("id").alias("doc_id"),
        "text",
        F.element_at(F.array(*[F.lit(s) for s in
                               ("en", "en", "en", "zh", "fr")]),
                     (F.floor(_h(F.col("id"), "lg") * 5) + 1).cast("int")
                     ).alias("lang"),
        F.concat(F.lit("src"),
                 (F.floor(_h(F.col("id"), "sc") * 20)).cast("string")
                 ).alias("source"),
        F.length("text").alias("n_chars"),
    )
    out_docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    # --- embeddings: 20k x 64 dims, 10 gaussian-ish clusters ---
    dims = 64
    lab = (F.floor(_h(F.col("id"), "lb") * 10)).cast("int")
    vec = F.array(*[
        (F.when(lab == (d % 10), F.lit(3.0)).otherwise(F.lit(0.0))
         + (_h(F.col("id") * F.lit(131) + F.lit(d), "e") - 0.5) * 2.0
         ).cast("float")
        for d in range(dims)])
    emb = spark.range(20_000).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"),
        lab.alias("label"))
    emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    # --- events: 1M over 30 days, 15k users (10x sf0.1's 100k/1.5k) ---
    ev = spark.range(1_000_000).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-01-01").cast("timestamp")
         + F.make_interval(secs=_h(F.col("id"), "ets")
                           * (30 * 24 * 3600))).alias("ts"),
        (F.floor(_h(F.col("id"), "eu") * 15_000)).alias("user_id"),
        F.element_at(F.array(*[F.lit(s) for s in
                               ("view", "click", "buy", "search")]),
                     (F.floor(_h(F.col("id"), "et") * 4) + 1).cast("int")
                     ).alias("event_type"),
        F.round(_h(F.col("id"), "ev") * 100, 2).alias("value"),
        F.concat(F.lit('{"k": '),
                 F.floor(_h(F.col("id"), "ek") * 100).cast("int")
                 .cast("string"), F.lit("}")).alias("props"),
    )
    ev.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    for t in ("orders", "lineitem", "documents", "embeddings", "events"):
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
