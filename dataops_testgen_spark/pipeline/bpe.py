"""Distributed BPE vocabulary induction (Sennrich et al. 2016).

Training a byte-pair-encoding vocabulary is THE canonical corpus →
tokenizer step; at 100 TB the corpus can't reach one machine, but the
algorithm only ever needs the WORD-FREQUENCY relation (vocab-sized, not
corpus-sized) plus, per merge round, the adjacent-symbol-pair counts —
both partial-agg friendly.

Spark shape: ONE corpus scan builds (word, freq); every merge round is
one cheap job over that cached relation — explode adjacent symbol pairs
weighted by word freq, partial-agg the counts, take the argmax pair
(deterministic tiebreak: count DESC, then pair lexicographically), and
re-segment with a greedy left-to-right fold (a plain `F.aggregate` over
the symbol array — no UDF, no shuffle growth; the relation is
re-materialized every few rounds so lineage stays bounded). The corpus
itself is never touched again after round 0.

Segmentation (``bpe_segment``) applies the learned merge list with a
broadcast pandas UDF — the classic rank-based merge loop per word,
Arrow-batched; per-doc token counts come out of one narrow pass.

Not ONE-SHOT SQL-expressible (each round's argmax feeds the next
round's segmentation), but for a FIXED small n_merges the loop unrolls:
the driver oracle (`__spark_entry__._sql_bpe_merges`) generates one
chained MATERIALIZED-CTE block per round that re-derives the argmax and
replays the greedy fold with window functions, giving a full hash check
in DuckDB. Correctness is additionally pinned against an independent
plain-Python BPE implementation in ``tests/test_bpe.py``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataops_testgen_spark.pipeline.text import tokens

# end-of-word marker, appended as its own symbol (Sennrich et al. §3.2)
EOW = "</w>"


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    return (df.select(F.explode(tokens(F.col(text_col))).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))


def _initial_syms() -> F.Column:
    # chars of the word, plus the EOW marker symbol
    return F.concat(F.split(F.col("w"), ""), F.array(F.lit(EOW)))


def _merge_fold(a: str, b: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b over the
    ``syms`` array — one interpreted fold per word, no derived-array
    re-evaluation (the lambda only inspects the accumulator's last
    element)."""
    ab = a + b
    return F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(ab)))
        ).otherwise(F.concat(acc, F.array(x))))


def _merge_word(syms: list, a: str, b: str) -> list:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) —
    the plain-Python twin of ``_merge_fold`` (identical output by
    construction: both consume occurrences left to right and never
    re-match across a fresh merge)."""
    out, j, n = [], 0, len(syms)
    while j < n:
        if j < n - 1 and syms[j] == a and syms[j + 1] == b:
            out.append(a + b)
            j += 2
        else:
            out.append(syms[j])
            j += 1
    return out


def _bpe_train_local(words: list, n_merges: int) -> list[tuple[str, str]]:
    """Finish BPE training driver-side over the collected word-frequency
    relation — the classic incrementally-maintained-counts algorithm
    (Sennrich et al.'s learn_bpe): global pair counts plus a pair →
    {word indices} inverted map, so each merge round touches ONLY the
    words containing the chosen pair instead of rescanning the vocab.
    Same argmax and tiebreak (count DESC, a ASC, b ASC — Python tuple
    compare equals Spark's UTF-8 string order, both code-point
    monotone) and same early stop (max count < 2) as the distributed
    rounds, so the merge list is identical by construction.

    ``words``: list of ``[syms list, freq]`` (mutated in place)."""
    from collections import Counter, defaultdict

    def pair_counts(syms):
        return Counter(zip(syms, syms[1:]))

    stats: Counter = Counter()
    where = defaultdict(set)
    for wi, (syms, freq) in enumerate(words):
        for p, c in pair_counts(syms).items():
            stats[p] += c * freq
            where[p].add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not stats:
            break
        (a, b), n = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        for wi in list(where[(a, b)]):
            syms, freq = words[wi]
            new = _merge_word(syms, a, b)
            old_c, new_c = pair_counts(syms), pair_counts(new)
            for p in set(old_c) | set(new_c):
                d = new_c.get(p, 0) - old_c.get(p, 0)
                if d:
                    stats[p] += d * freq
                    if stats[p] == 0:
                        del stats[p]
                if new_c.get(p, 0):
                    where[p].add(wi)
                else:
                    where[p].discard(wi)
            words[wi][0] = new
    return merges


def bpe_train(df: DataFrame, n_merges: int = 50,
              text_col: str = "text",
              materialize_every: int = 8,
              driver_finish_rows: int | None = 2_000_000,
              ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list. Stops early when no adjacent pair repeats. Deterministic:
    ties break on (count DESC, a ASC, b ASC).

    Scale shape: the corpus is scanned ONCE (word-frequency relation,
    vocab-sized); when that relation fits ``driver_finish_rows`` it is
    collected once and training finishes driver-side with the classic
    incrementally-maintained-counts algorithm (``_bpe_train_local``) —
    identical merges, no per-merge Spark job, so a production 32k-merge
    vocab does not become 32k sequential jobs. Only a vocab too large to
    collect (order 10⁷+ distinct words) takes the distributed rounds,
    where each merge is one pair-count job over the cached relation;
    pass ``driver_finish_rows=None`` (or 0) to force that path."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    words = _word_freqs(df, text_col).withColumn("syms", _initial_syms())
    words = words.select("freq", "syms").persist()
    n_words = words.count()
    if driver_finish_rows and n_words <= driver_finish_rows:
        rows = words.collect()
        words.unpersist()
        return _bpe_train_local(
            [[list(r["syms"]), int(r["freq"])] for r in rows], n_merges)
    merges: list[tuple[str, str]] = []
    persisted = words       # exactly one persisted generation at a time
    try:
        for i in range(n_merges):
            pairs = (words
                     .filter(F.size("syms") >= 2)
                     .select("freq", F.explode(F.expr(
                         "transform(sequence(0, size(syms) - 2),"
                         " i -> struct(syms[i] AS a, syms[i + 1] AS b))"))
                         .alias("p"))
                     .groupBy("p.a", "p.b")
                     .agg(F.sum("freq").alias("n"))
                     .orderBy(F.col("n").desc(), "a", "b")
                     .limit(1).collect())
            if not pairs or pairs[0]["n"] < 2:
                break
            a, b = pairs[0]["a"], pairs[0]["b"]
            merges.append((a, b))
            words = words.withColumn("syms", _merge_fold(a, b))
            if (i + 1) % materialize_every == 0:
                words = words.persist()
                words.count()
                persisted.unpersist()
                persisted = words
    finally:
        persisted.unpersist()
    return merges


def bpe_segment(df: DataFrame, merges: list[tuple[str, str]],
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge list: (id, n_tokens, tokens) per document —
    the rank-based greedy merge loop per word (always merges the
    LOWEST-rank applicable pair first, the standard BPE apply rule),
    broadcast to an Arrow-batched pandas UDF."""
    rank = {pair: i for i, pair in enumerate(merges)}

    def seg(batches):
        import pandas as pd

        def word_tokens(w):
            syms = list(w) + [EOW]
            while len(syms) >= 2:
                best, bi = None, None
                for j in range(len(syms) - 1):
                    r = rank.get((syms[j], syms[j + 1]))
                    if r is not None and (best is None or r < best):
                        best, bi = r, j
                if best is None:
                    break
                syms[bi:bi + 2] = [syms[bi] + syms[bi + 1]]
            return syms

        for pdf in batches:
            out_id, out_n, out_t = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = []
                for w in (text or "").lower().split():
                    toks.extend(word_tokens(w))
                out_id.append(did)
                out_n.append(len(toks))
                out_t.append(toks)
            yield pd.DataFrame({"id": out_id, "n_tokens": out_n,
                                "tokens": out_t})

    idt = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        seg, schema=f"id {idt}, n_tokens long, tokens array<string>")
