"""End-to-end corpus curation gate: one keep/drop decision per document.

Real curation pipelines don't run quality ops one at a time — every doc
gets a single gate decision combining rule-based quality (Gopher),
exact-duplicate canonicalization, and a trained model filter (the
fastText-style language/quality classifier), and only the keepers flow
to tokenization. This operator is that composition, kept fully
declarative so Catalyst fuses the rule columns into the same scan and
the only extra work is the dedup hash shuffle and the classifier's
postings fold.

Spark shape: ``gopher_quality_flags`` is a narrow codegen'd expression
bundle (no shuffle); canonicalization is ONE window over md5(text)
(keep-first = min id per content hash, the ``exact_duplicates``
convention); the NB classifier trains on the labeled seed (two count
aggs) and scores through broadcast-model joins
(``pipeline/classify.py``). The final decision is a plain boolean
expression over the three joined columns — no collect, no UDF.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataops_testgen_spark.pipeline.classify import nb_predict, nb_train
from dataops_testgen_spark.pipeline.text import gopher_quality_flags


def curation_gate(df: DataFrame, train: DataFrame,
                  allowed_langs: list[str],
                  required_flags: list[str] | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  label_col: str = "lang") -> DataFrame:
    """Per-document curation decision:

    - ``quality_ok`` — AND of the chosen Gopher flags
      (``required_flags``, default the full ``gopher_pass``; pass a
      subset — e.g. ``["word_count_ok", "alpha_ratio_ok"]`` — when the
      corpus domain makes some Rae et al. 2021 rules inapplicable, the
      standard per-domain threshold tuning);
    - ``is_canonical`` — the doc is the min-id holder of its exact
      content hash (later exact duplicates fail the gate);
    - ``pred_lang`` — NB classifier trained on ``train`` (labeled seed
      rows with ``label_col``), applied to every doc;
    - ``keep`` — all three: quality, canonical, and predicted language
      in ``allowed_langs``.

    Output: (id, quality_ok, is_canonical, pred_lang, keep).
    """
    if not allowed_langs:
        raise ValueError("allowed_langs must be non-empty")
    flags = gopher_quality_flags(F.col(text_col))
    names = required_flags if required_flags is not None else ["gopher_pass"]
    unknown = [n for n in names if n not in flags]
    if unknown or not names:
        raise ValueError(f"unknown gopher flags: {unknown or names}")
    quality = flags[names[0]]
    for n in names[1:]:
        quality = quality & flags[n]
    w = Window.partitionBy(F.md5(F.col(text_col)))
    base = df.select(F.col(id_col).alias("id"),
                     quality.alias("quality_ok"),
                     (F.col(id_col) == F.min(id_col).over(w))
                     .alias("is_canonical"))
    cond, priors = nb_train(train, text_col=text_col, label_col=label_col)
    pred = (nb_predict(df, cond, priors, text_col=text_col, id_col=id_col)
            .select("id", F.col("label").alias("pred_lang")))
    langs = sorted(allowed_langs)
    return (base.join(pred, "id")
            .select("id", "quality_ok", "is_canonical", "pred_lang",
                    (F.col("quality_ok") & F.col("is_canonical")
                     & F.col("pred_lang").isin(langs)).alias("keep")))
