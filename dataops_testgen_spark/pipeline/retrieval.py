"""Corpus retrieval ops: Okapi BM25 scoring / top-k search.

A training-data pipeline needs lexical retrieval for targeted corpus
queries (find documents about X for curriculum mixing, audit a filter by
pulling the top matches for a probe phrase, nearest-neighbour text lookup
for contamination spot checks). This is the sparse, exact counterpart to
the dense ANN operators in ``pipeline/similarity.py``.

Spark-first shape: one explode of the corpus feeds the postings
(term frequency), document-length and document-frequency aggregates —
all partial-aggregated map-side; the query-term relation is tiny and
broadcast, so scoring touches only postings whose term appears in some
query. No global sort: the final top-k is a per-query window.

Determinism note (shared with every DuckDB oracle in
``__spark_entry__``): the per-(query, doc) score is a sum of per-term
double contributions, and floating-point addition is order-sensitive, so
the sum is folded over the term-sorted contribution array in BOTH
engines instead of relying on aggregation order. That makes scores —
and therefore rankings — bit-identical across engines.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataops_testgen_spark.pipeline.text import tokens


def bm25_topk(df: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              query_id_col: str = "query_id",
              query_text_col: str = "query_text") -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25 (Robertson et al.,
    TREC-3; the idf is Lucene's non-negative variant
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``).

    ``queries`` is a small DataFrame of (query_id, query_text); duplicate
    terms within one query count once (the standard bag-of-unique-terms
    simplification — no query-term-frequency factor).

    100 TB shape: corpus-side stats are three partial aggs off one
    explode (postings, doc length from the postings, document
    frequency); ``queries`` is broadcast into the postings join so only
    matching postings survive into the scoring joins; the per-query
    top-k is a window partitioned by query_id (≤ |queries| partitions of
    candidate rows, never a global sort). Document length joins back on
    id AFTER the query-term semi-restriction, so the shuffled relation
    is already candidate-only.

    Output: (query_id, id, score, rnk) with score rounded to 5 decimals
    and rnk 1..k by (score DESC, id ASC).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # doc length re-derived from the postings agg (no second corpus scan)
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    # exact integer sum, THEN one double division — engine-stable avgdl
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   (F.sum("dl").cast("double")
                    / F.count(F.lit(1))).alias("avgdl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qterms = (queries.select(F.col(query_id_col).alias("query_id"),
                             F.explode(tokens(F.col(query_text_col)))
                             .alias("term"))
              .distinct())

    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl") / F.col("avgdl")))
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom

    # document frequency only matters for terms some query contains:
    # semi-restrict the (vocab-sized) dfreq relation through the broadcast
    # query terms, leaving a ≤|query-vocabulary| relation that broadcasts
    # into the scoring join — the full vocabulary never shuffles
    qdfreq = dfreq.join(F.broadcast(qterms.select("term").distinct()),
                        "term")
    matched = (tf.join(F.broadcast(qterms), "term")
               .join(F.broadcast(qdfreq), "term")
               .join(dl, "id")
               .crossJoin(F.broadcast(stats))
               .select("query_id", "id", "term", contrib.alias("contrib")))

    # canonical-order sum: fold the term-sorted contribution array so the
    # double sum is bit-identical regardless of aggregation order/engine
    scored = (matched.groupBy("query_id", "id")
              .agg(F.array_sort(F.collect_list(F.struct("term", "contrib")))
                   .alias("parts"))
              .select("query_id", "id",
                      F.aggregate("parts", F.lit(0.0),
                                  lambda acc, p: acc + p["contrib"])
                      .alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("id").asc())
    return (scored.select("query_id", "id", F.col("score"),
                          F.row_number().over(w).alias("rnk"))
            .filter(F.col("rnk") <= k)
            .select("query_id", "id", F.round("score", 5).alias("score"),
                    "rnk"))
