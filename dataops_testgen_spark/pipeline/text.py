"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage-codegen'd — no Python UDFs), so they run at full scan speed over
100 TB of documents. Formulas are deliberately expressible in ANSI SQL so the
DuckDB oracle can verify them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic: score = number of token hits; argmax with
# alphabetical tiebreak; 'und' (undetermined) when all scores are 0.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "por", "con"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}

_PUNCT_RE = r"[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text (empty array for blank).

    Edge semantics, deliberately shared with every DuckDB oracle: the
    blank guard uses ``trim`` (SPACES only — Spark and DuckDB agree), so a
    tab/newline-only string is NOT blank and splits to empty-string
    tokens; `tests/test_regex_parity.py` fuzzes this equivalence."""
    t = F.split(F.trim(F.lower(text)), r"\s+")
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(t)


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: alnum runs + individual punctuation marks —
    a cheap upper-bound proxy for BPE vocabulary tokenization."""
    return F.regexp_count(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(words)))  # noqa: B023
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Stopword-hit language ID: argmax score, alphabetical tiebreak, 'und'
    when nothing matches."""
    scores = lang_scores(text)
    # greatest, then first (alphabetical) language achieving it
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in sorted(scores, reverse=True):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


def quality_metrics(text: Column) -> dict[str, Column]:
    """Length/punctuation/stopword quality signals (per-doc, single pass)."""
    n_chars = F.length(text).cast("long")
    toks = tokens(text)
    n_tokens = F.size(toks).cast("long")
    punct_ct = F.regexp_count(text, F.lit(_PUNCT_RE)).cast("long")
    stop_ct = F.size(F.filter(toks, lambda t: t.isin(LANG_STOPWORDS["en"])))
    mean_tok_len = (F.length(F.regexp_replace(F.trim(text), r"\s+", ""))
                    / F.nullif(n_tokens.cast("double"), F.lit(0.0)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": punct_ct / F.nullif(n_chars.cast("double"), F.lit(0.0)),
        "stopword_ratio": stop_ct / F.nullif(n_tokens.cast("double"), F.lit(0.0)),
        "mean_token_len": mean_tok_len,
    }


def quality_score(text: Column) -> Column:
    """Composite 0–1 quality score: rewards sane token length (3–12 chars),
    some stopwords, low punctuation noise, and non-trivial length."""
    m = quality_metrics(text)
    len_ok = F.when((m["mean_token_len"] >= 3) & (m["mean_token_len"] <= 12), 1.0).otherwise(0.5)
    stop_ok = F.least(m["stopword_ratio"] * 5.0, F.lit(1.0))
    punct_ok = F.greatest(F.lit(0.0), 1.0 - m["punct_ratio"] * 5.0)
    size_ok = F.least(m["n_tokens"].cast("double") / 20.0, F.lit(1.0))
    return (0.25 * len_ok + 0.25 * stop_ok + 0.25 * punct_ok + 0.25 * size_ok)


def gopher_quality_flags(text: Column) -> dict[str, Column]:
    """Gopher/C4-style document quality filter flags (Rae et al. 2021 §A1.1
    heuristics; all thresholds are the published ones). Each flag is True
    when the document PASSES that rule; ``gopher_pass`` is their AND. Pure
    expressions — one codegen'd pass per document, no shuffle:

    - word count in [50, 100000]
    - mean word length in [3, 10]
    - ≤ 90% of lines start with a bullet, ≤ 30% end with an ellipsis
    - ≥ 80% of words contain at least one alphabetic character
    - ≥ 2 distinct hits from a small English stopword list
    - symbol-to-word ratio (# and ellipsis) ≤ 0.1
    """
    toks = tokens(text)
    n_tokens = F.size(toks).cast("long")
    nt = F.nullif(n_tokens.cast("double"), F.lit(0.0))
    mean_len = (F.length(F.regexp_replace(F.trim(text), r"\s+", "")) / nt)
    lines = F.split(text, r"\n")
    n_lines = F.nullif(F.size(lines).cast("double"), F.lit(0.0))
    bullet_ratio = (F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike(r"^([•‣▪-]\s)")))
        / n_lines)
    ellipsis_ratio = (F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"))) / n_lines)
    alpha_ratio = (F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / nt)
    stop_hits = F.size(F.array_intersect(
        toks, F.array(*[F.lit(w) for w in
                        ("the", "be", "to", "of", "and", "that", "have",
                         "with")])))
    symbol_ratio = ((F.regexp_count(text, F.lit(r"#"))
                     + F.regexp_count(text, F.lit(r"(\.\.\.|…)"))) / nt)
    flags = {
        "word_count_ok": (n_tokens >= 50) & (n_tokens <= 100_000),
        "mean_word_len_ok": (mean_len >= 3) & (mean_len <= 10),
        "bullet_ratio_ok": F.coalesce(bullet_ratio <= 0.9, F.lit(True)),
        "ellipsis_ratio_ok": F.coalesce(ellipsis_ratio <= 0.3, F.lit(True)),
        "alpha_ratio_ok": F.coalesce(alpha_ratio >= 0.8, F.lit(False)),
        "stopword_ok": stop_hits >= 2,
        "symbol_ratio_ok": F.coalesce(symbol_ratio <= 0.1, F.lit(False)),
    }
    acc = None
    for c in flags.values():
        acc = c if acc is None else (acc & c)
    flags["gopher_pass"] = acc
    return flags


def gopher_filter(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  keep_only: bool = False) -> DataFrame:
    """Attach the Gopher flags per document (or keep only passing docs).
    Narrow scan-speed plan, composable before dedup/sampling stages."""
    flags = gopher_quality_flags(F.col(text_col))
    out = df.select(F.col(id_col).alias("id"),
                    *[v.alias(k) for k, v in flags.items()])
    return out.filter(F.col("gopher_pass")) if keep_only else out


# PII patterns for in-text scrubbing (training corpora must not memorize
# these). Kept RE2-compatible (no backrefs/lookaheads) so the DuckDB oracle
# runs the identical patterns; Java regex accepts the same syntax. Order
# matters: longer/more-specific shapes first so e.g. a 16-digit card is
# redacted before the phone pattern could claim a suffix. Mirrors the
# reference's PII category list (ref testgen/template/profiling/pii_flag.sql
# SSN/credit-card/email/phone rules) applied to free text instead of columns.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, regex, replacement token)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("credit_card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\(\d{3}\) ?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              keep_text: bool = False) -> DataFrame:
    """Detect and redact PII spans in free text — one codegen'd projection,
    no shuffle, no Python in the path (scan-speed at 100 TB).

    The scrub applies the patterns sequentially in ``PII_PATTERNS`` order,
    so replaced text is never re-redacted by a later pattern. Per-pattern
    counts (and ``pii_total``) are measured independently on the ORIGINAL
    text, so a single span matching two patterns (e.g. an SSN-shaped digit
    run inside an email local part) is counted by both even though only
    one token appears in the scrubbed output. Returns
    (id, n_<name>... per pattern, pii_total, scrubbed_md5[, scrubbed_text]);
    the md5 lets correctness checks compare redacted content without
    shipping it."""
    t = F.col(text_col)
    counts = {name: F.regexp_count(t, F.lit(rx)).cast("long")
              for name, rx, _ in PII_PATTERNS}
    scrubbed = t
    for _, rx, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, rx, token)
    total = None
    for c in counts.values():
        total = c if total is None else (total + c)
    cols = [F.col(id_col).alias("id"),
            *[c.alias(f"n_{name}") for name, c in counts.items()],
            total.alias("pii_total"),
            F.md5(scrubbed).alias("scrubbed_md5")]
    if keep_text:
        cols.append(scrubbed.alias("scrubbed_text"))
    return df.select(*cols)


def _run_fold(arr: Column, weighted: bool, dup_only: bool) -> Column:
    """Fold a SORTED string array into a run statistic in one pass:

    - weighted+not dup_only: max over distinct values of count*length
      (numerator of Gopher's top-n-gram character fraction)
    - weighted+dup_only: sum of count*length over values with count>1
      (numerator of the duplicate-line character fraction)
    - not weighted+dup_only: sum of counts over values with count>1
      (numerator of the duplicate-line fraction)

    Pure expression (F.aggregate with a struct accumulator) — the array
    never leaves the row, so this stays a narrow projection."""
    def run_val(prev: Column, run: Column) -> Column:
        base = run * F.length(prev) if weighted else run.cast("long")
        if dup_only:
            return F.when(run > 1, base).otherwise(F.lit(0).cast("long"))
        return base

    def combine(acc: Column, best: Column) -> Column:
        return (acc + best) if dup_only else F.greatest(acc, best)

    zero = F.lit(0).cast("long")
    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    zero.alias("run"), zero.alias("acc"))
    folded = F.aggregate(
        arr, init,
        lambda a, x: F.when(
            x.eqNullSafe(a["prev"]),
            F.struct(a["prev"].alias("prev"), (a["run"] + 1).alias("run"),
                     a["acc"].alias("acc")),
        ).otherwise(
            F.struct(
                x.alias("prev"), F.lit(1).cast("long").alias("run"),
                F.when(a["prev"].isNull(), a["acc"])
                 .otherwise(combine(a["acc"], run_val(a["prev"], a["run"])))
                 .alias("acc"))),
        lambda a: F.when(a["prev"].isNull(), a["acc"])
                   .otherwise(combine(a["acc"], run_val(a["prev"], a["run"]))))
    return folded


def repetition_flags(text: Column) -> dict[str, Column]:
    """Gopher repetition-filter signals (Rae et al. 2021 Table A1) as pure
    per-row expressions — sort each document's lines / n-gram arrays in
    place and fold runs, so the whole filter is one narrow scan (no
    explode, no shuffle, nothing leaves the row):

    - ``dup_line_fraction``: occurrences of non-unique lines / total lines
      (threshold 0.30)
    - ``dup_line_char_fraction``: characters inside non-unique lines /
      total line characters (0.20)
    - ``top_2gram_char_fraction`` / ``top_3gram_char_fraction`` /
      ``top_4gram_char_fraction``: characters covered by the single most
      frequent word n-gram / total characters (0.20 / 0.18 / 0.16)

    Character coverage counts count*length(gram) over the space-joined
    gram (a documented simplification of the paper's span accounting).
    ``repetition_pass`` ANDs the five thresholds."""
    lines = F.filter(F.transform(F.split(text, r"\n"), F.trim),
                     lambda ln: ln != "")
    sorted_lines = F.array_sort(lines)
    n_lines = F.nullif(F.size(lines).cast("double"), F.lit(0.0))
    line_chars = F.nullif(
        F.aggregate(lines, F.lit(0).cast("long"),
                    lambda acc, ln: acc + F.length(ln)).cast("double"),
        F.lit(0.0))
    text_chars = F.nullif(
        F.length(F.regexp_replace(F.trim(text), r"\s+", "")).cast("double"),
        F.lit(0.0))
    out: dict[str, Column] = {
        "dup_line_fraction":
            _run_fold(sorted_lines, weighted=False, dup_only=True) / n_lines,
        "dup_line_char_fraction":
            _run_fold(sorted_lines, weighted=True, dup_only=True) / line_chars,
    }
    for n, col_name in ((2, "top_2gram_char_fraction"),
                        (3, "top_3gram_char_fraction"),
                        (4, "top_4gram_char_fraction")):
        grams = F.array_sort(shingles(text, n))
        # count*len over the space-joined gram, minus the joining spaces
        # is not subtracted — documented simplification kept identical in
        # the oracle SQL.
        out[col_name] = (_run_fold(grams, weighted=True, dup_only=False)
                         / text_chars)
    thresholds = {
        "dup_line_fraction": 0.30,
        "dup_line_char_fraction": 0.20,
        "top_2gram_char_fraction": 0.20,
        "top_3gram_char_fraction": 0.18,
        "top_4gram_char_fraction": 0.16,
    }
    acc = None
    for name, thr in thresholds.items():
        ok = F.coalesce(out[name] <= thr, F.lit(True))
        acc = ok if acc is None else (acc & ok)
    out["repetition_pass"] = acc
    return out


def repetition_filter(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      keep_only: bool = False) -> DataFrame:
    """Attach Gopher repetition signals per document (or keep passers)."""
    flags = repetition_flags(F.col(text_col))
    out = df.select(F.col(id_col).alias("id"),
                    *[v.alias(k) for k, v in flags.items()])
    return out.filter(F.col("repetition_pass")) if keep_only else out


def unigram_logprob_score(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          vocab_size: int | None = None) -> DataFrame:
    """CCNet-style LM quality proxy (Wenzek et al. 2020 filter on KenLM
    perplexity; this is the documented unigram reduction — a corpus-relative
    signal, not a real LM): score(doc) = mean over tokens of −ln p(token),
    p estimated from the corpus's own unigram counts with add-one smoothing
    over the observed vocabulary. High score = rare-token-heavy documents
    (typically noise); low = common-token prose.

    100 TB shape: two corpus passes by design — one explode+groupBy builds
    the unigram table (partial aggs), then scoring is an equi-join on token
    + groupBy(id) mean. The vocab relation is an aggregate (≤ |V| rows);
    no forced broadcast — AQE converts the join when it is small, and
    ``vocab_size`` caps it by keeping the top-V tokens (OOV tokens fall to
    the add-one floor). The top-V selection is ``orderBy().limit()``,
    which Spark executes as TakeOrderedAndProject — each partition keeps
    its own top V and the driver merges the per-partition heads — so a
    web-corpus vocabulary (100 M+ terms) never sorts through one
    partition the way a global ``row_number`` window would.
    Output: (id, n_tokens, mean_nll)."""
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(F.col(text_col))).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("ct"))
    if vocab_size is not None:
        # same deterministic total order as the row_number form it replaces
        vocab = vocab.orderBy(F.col("ct").desc(), F.col("tok").asc()) \
                     .limit(vocab_size)
    totals = vocab.agg(F.sum("ct").alias("n_total"),
                       F.count(F.lit(1)).alias("n_vocab"))
    scored = (toks.join(vocab, "tok", "left")
              .crossJoin(F.broadcast(totals))      # one-row totals
              .select("id",
                      (-F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1)
                              / (F.col("n_total") + F.col("n_vocab"))))
                      .alias("nll")))
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("nll").alias("mean_nll"))


def bigram_lm_score(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    cache_model: bool = False) -> DataFrame:
    """Bigram-LM perplexity filter — one Markov order closer to CCNet's
    actual KenLM gate (Wenzek et al. 2020 filter on 5-gram perplexity;
    ``unigram_logprob_score`` is the order-0 reduction, this is order-1):
    train add-one-smoothed bigram probabilities on the corpus's own
    adjacent-token pairs, then score every document by its mean bigram
    negative log-likelihood and perplexity. High perplexity = token
    sequences the corpus itself finds improbable (shuffled text, tag soup,
    mid-word line breaks) — exactly what a fluency gate drops; documents
    with <2 tokens carry n_bigrams=0 and NULL scores so callers can route
    them separately.

        p(w2 | w1) = (C(w1 w2) + 1) / (C(w1 ·) + V)

    with V = the corpus's distinct-unigram vocabulary size, C(w1 ·) = the
    count of w1 in bigram-context (non-final) position.

    100 TB shape: bigram pairs come from ``zip_with`` over each doc's own
    token array (narrow, no posexplode self-join); the model is two
    partial-agg groupBys over the exploded pairs (bigram + context
    counts, both vocabulary-bounded relations, never corpus-sized);
    scoring re-joins pairs to the two count relations on their keys (AQE
    broadcasts them when small) and folds per-doc means with plain AVG.
    Catalyst does not share un-persisted subplans, so by default each
    count consumer replays its column-pruned corpus scan (four total:
    vocab, bigram counts, context counts, scoring) —
    ``cache_model=True`` persists the three vocabulary-bounded model
    relations so each trains off one scan and is reused from memory
    (caller owns the lifetime: ``spark.catalog.clearCache()``).

    Output: (id, n_bigrams, mean_nll, perplexity)."""
    arr = tokens(F.col(text_col))
    pairs = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.when(
                F.size(arr) >= 2,
                F.zip_with(F.slice(arr, 1, F.size(arr) - 1),
                           F.slice(arr, 2, F.size(arr) - 1),
                           lambda a, b: F.struct(a.alias("w1"),
                                                 b.alias("w2"))))
            .otherwise(F.array().cast(
                "array<struct<w1: string, w2: string>>"))).alias("bg"))
    pairs = pairs.select("id", F.col("bg.w1").alias("w1"),
                         F.col("bg.w2").alias("w2"))
    # explode_outer keeps 0/1-token docs as a NULL-pair row -> n_bigrams 0
    bg_ct = (pairs.filter(F.col("w1").isNotNull())
             .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg")))
    ctx_ct = bg_ct.groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))
    vocab = (df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
             .agg(F.countDistinct("tok").alias("v_size")))
    if cache_model:
        bg_ct = bg_ct.persist()
        vocab = vocab.persist()
    scored = (pairs.join(bg_ct, ["w1", "w2"], "left")
              .join(ctx_ct, "w1", "left")
              .crossJoin(F.broadcast(vocab))      # one-row vocab size
              .select("id",
                      (-F.log((F.col("c_bg") + 1)
                              / (F.col("c_ctx") + F.col("v_size"))))
                      .alias("nll")))
    return scored.groupBy("id").agg(
        F.count("nll").alias("n_bigrams"),
        F.avg("nll").alias("mean_nll"),
        F.exp(F.avg("nll")).alias("perplexity"))


def trigram_lm_score(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     train_df: DataFrame | None = None,
                     alpha: float = 0.4,
                     cache_model: bool = False) -> DataFrame:
    """Trigram LM with STUPID BACKOFF (Brants et al. 2007 §3) — the next
    Markov order toward CCNet's 5-gram KenLM gate after
    ``bigram_lm_score``, and the first one where backoff matters: score
    corpus docs against a model trained on ``train_df`` (default: the
    corpus itself), falling back order by order when a higher-order
    n-gram was never seen in training:

        S(w3 | w1 w2) = C(w1w2w3) / C(w1w2·)            if seen
                      = α · C(w2w3) / C(w2·)             else if seen
                      = α² · (C(w3) + 1) / (N + V)       else (add-one
                                                         unigram floor,
                                                         so OOV scores
                                                         stay finite)

    with · denoting context position counts, N = total train tokens,
    V = train vocabulary. Stupid backoff uses raw relative frequencies
    and a fixed α (0.4 in the paper) instead of normalized discounting —
    the form that scales to web corpora because every quantity is a
    partial-agg count.

    Per doc: mean trigram NLL (−ln S) and its exp (perplexity-like
    score); docs with <3 tokens carry n_trigrams=0 and NULL scores so
    callers route them separately (same contract as bigram_lm_score).

    100 TB shape: trigram/bigram structs come from ``zip_with`` over
    each doc's own token array (narrow, no posexplode self-join); the
    MODEL is three count relations (trigram, bigram, unigram — each a
    vocabulary-bounded partial-agg groupBy over one column-pruned train
    scan); context counts (C(w1w2·), C(w2·)) and the one-row (N, V)
    totals re-aggregate the count relations themselves, never the
    corpus. Scoring left-joins the corpus's trigrams to those counts on
    their keys (AQE broadcasts the model relations when small) and
    folds per-doc means with plain AVG. As with ``bigram_lm_score``,
    Catalyst does not share un-persisted subplans, so by default each
    count consumer replays its (text-only) train scan —
    ``cache_model=True`` persists the three vocabulary-bounded count
    relations (trigram/bigram/unigram; the context and totals relations
    derive from them), so the train corpus is scanned once per order
    and every scoring join reads from memory. For a SINGLE-scan model
    build use ``ngram_lm_score`` (its padded-gram relation derives all
    orders from one pass); this function keeps the three-scan shape for
    hash-stability. Caller owns the persist lifetime.

    Output: (id, n_trigrams, mean_nll, score)."""
    train = train_df if train_df is not None else df

    def _tri_structs(col):
        arr = tokens(col)
        n = F.size(arr)
        pair12 = F.zip_with(
            F.slice(arr, 1, n - 2), F.slice(arr, 2, n - 2),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
        tri = F.zip_with(
            pair12, F.slice(arr, 3, n - 2),
            lambda p, c: F.struct(p["w1"].alias("w1"),
                                  p["w2"].alias("w2"), c.alias("w3")))
        return F.when(n >= 3, tri).otherwise(F.array().cast(
            "array<struct<w1: string, w2: string, w3: string>>"))

    def _bg_structs(col):
        arr = tokens(col)
        n = F.size(arr)
        bg = F.zip_with(
            F.slice(arr, 1, n - 1), F.slice(arr, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
        return F.when(n >= 2, bg).otherwise(F.array().cast(
            "array<struct<w1: string, w2: string>>"))

    # the model: three corpus scans (trigrams, bigrams, unigrams); the
    # CONTEXT counts and the (N, V) totals derive from the count
    # relations themselves (vocabulary-sized re-aggregations, integer
    # exact) instead of re-scanning the corpus
    tr_tri = (train.select(F.explode(_tri_structs(F.col(text_col)))
                           .alias("t"))
              .select("t.w1", "t.w2", "t.w3"))
    tri_ct = tr_tri.groupBy("w1", "w2", "w3") \
        .agg(F.count(F.lit(1)).alias("c_tri"))
    ctx2_ct = tri_ct.groupBy("w1", "w2") \
        .agg(F.sum("c_tri").alias("c_ctx2"))
    bg_ct = (train.select(F.explode(_bg_structs(F.col(text_col)))
                          .alias("b"))
             .groupBy(F.col("b.w1").alias("bw1"),
                      F.col("b.w2").alias("bw2"))
             .agg(F.count(F.lit(1)).alias("c_bg")))
    ctx1_ct = bg_ct.groupBy("bw1").agg(F.sum("c_bg").alias("c_ctx1"))
    uni_ct = (train.select(F.explode(tokens(F.col(text_col)))
                           .alias("tok"))
              .groupBy("tok").agg(F.count(F.lit(1)).alias("c_uni")))
    totals = uni_ct.agg(F.sum("c_uni").alias("n_total"),
                        F.count(F.lit(1)).alias("v_size"))
    if cache_model:
        # the three vocabulary-bounded count relations; ctx2/ctx1/totals
        # derive from them, so every downstream consumer (including the
        # derived re-aggregations) reads from memory after one build
        tri_ct = tri_ct.persist()
        bg_ct = bg_ct.persist()
        uni_ct = uni_ct.persist()
        ctx2_ct = tri_ct.groupBy("w1", "w2") \
            .agg(F.sum("c_tri").alias("c_ctx2"))
        ctx1_ct = bg_ct.groupBy("bw1").agg(F.sum("c_bg").alias("c_ctx1"))
        totals = uni_ct.agg(F.sum("c_uni").alias("n_total"),
                            F.count(F.lit(1)).alias("v_size"))

    # score: the corpus's own trigrams against the model
    tris = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(_tri_structs(F.col(text_col))).alias("t"))
    tris = tris.select("id", F.col("t.w1").alias("w1"),
                       F.col("t.w2").alias("w2"),
                       F.col("t.w3").alias("w3"))
    a1 = F.lit(float(alpha))
    s = (tris.filter(F.col("w1").isNotNull())
         .join(tri_ct, ["w1", "w2", "w3"], "left")
         .join(ctx2_ct, ["w1", "w2"], "left")
         .join(bg_ct, (F.col("w2") == F.col("bw1"))
               & (F.col("w3") == F.col("bw2")), "left")
         .join(ctx1_ct.withColumnRenamed("bw1", "cw1"),
               F.col("w2") == F.col("cw1"), "left")
         .join(uni_ct, F.col("w3") == F.col("tok"), "left")
         .crossJoin(F.broadcast(totals))
         .select("id", (-F.log(
             F.when(F.col("c_tri").isNotNull(),
                    F.col("c_tri") / F.col("c_ctx2"))
             .when(F.col("c_bg").isNotNull(),
                   a1 * F.col("c_bg") / F.col("c_ctx1"))
             .otherwise(a1 * a1
                        * (F.coalesce(F.col("c_uni"), F.lit(0)) + 1)
                        / (F.col("n_total") + F.col("v_size")))))
             .alias("nll")))
    agg = s.groupBy("id").agg(
        # count ROWS (oracle COUNT(*)): with an empty train relation the
        # floor NLL is NULL but the doc still HAS its trigrams
        F.count(F.lit(1)).alias("n_trigrams"),
        F.avg("nll").alias("mean_nll"),
        F.exp(F.avg("nll")).alias("score"))
    ids = df.select(F.col(id_col).alias("id"))
    return (ids.join(agg, "id", "left")
            .select("id",
                    F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
                    "mean_nll", "score"))


def _padded_gram_counts(train: DataFrame, text_col: str, n: int) -> DataFrame:
    """The one-relation n-gram model: each token position becomes one
    NULL-padded n-gram struct (g1 = the token, g2..gn = the following
    tokens or NULL past the doc end) over a MATERIALIZED token array, so
    every order's n-gram and context counts re-aggregate exactly from
    this single groupBy of a single train scan."""
    toks = F.coalesce(tokens(F.col(text_col)),
                      F.array().cast("array<string>"))
    tr = train.select(toks.alias("toks"))
    pos = F.sequence(F.lit(1), F.size("toks"))
    padded = F.transform(pos, lambda i: F.struct(
        *[F.get(F.col("toks"), i + F.lit(k) - 1).alias(f"g{k + 1}")
          for k in range(n)]))
    grams = (tr.filter(F.size("toks") > 0)   # sequence(1,0) would descend
             .select(F.explode(padded).alias("g"))
             .select(*[F.col(f"g.g{j}").alias(f"g{j}")
                       for j in range(1, n + 1)]))
    return grams.groupBy(*[f"g{j}" for j in range(1, n + 1)]) \
        .agg(F.count(F.lit(1)).alias("c"))


def ngram_model_train(train_df: DataFrame, model_path: str,
                      text_col: str = "text", n: int = 5) -> None:
    """Train-once/score-many for ``ngram_lm_score`` (the fitted-model
    handle ``nb_train`` already gives the NB classifier): persist the
    single padded-gram count relation the whole backoff model derives
    from. Scoring any number of corpora later via
    ``ngram_lm_score(df, model_path=...)`` never rescans the train
    corpus — the 100 TB shape where the reference gate (CCNet) trains
    its KenLM once on curated text and scores every crawl snapshot."""
    _padded_gram_counts(train_df, text_col, n) \
        .write.mode("overwrite").parquet(model_path)


def ngram_lm_score(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", n: int = 5,
                   train_df: DataFrame | None = None,
                   alpha: float = 0.4,
                   cache_model: bool = False,
                   model_path: str | None = None) -> DataFrame:
    """Order-``n`` LM gate with STUPID BACKOFF (Brants et al. 2007 §3) —
    at ``n=5`` this is CCNet parity: the gate Wenzek et al. 2020 actually
    deploy is a 5-gram KenLM-style model, of which
    ``trigram_lm_score``/``bigram_lm_score`` are the lower-order
    reductions. Score corpus docs against a model trained on ``train_df``
    (default: the corpus itself), falling back order by order when a
    higher-order n-gram was never seen in training:

        S(w_n | w_1..w_{n-1}) = C(w_1..w_n) / C(w_1..w_{n-1} ·)
                              = α   · S(w_n | w_2..w_{n-1})   if unseen
        ...
        floor: α^{n-1} · (C(w_n) + 1) / (N + V)   (add-one unigram, so
                                                   OOV stays finite)

    with · = context-position counts, N = total train tokens, V = train
    vocabulary. Raw relative frequencies and a fixed α (0.4 in the
    paper), never normalized discounting — the form that scales to web
    corpora because every quantity is a partial-agg count.

    100 TB shape — ONE train scan for the whole model: each token
    position becomes one NULL-padded n-gram struct (g1 = the token,
    g2..gn = the following tokens or NULL past the doc end), built by a
    ``transform`` over a position sequence against a MATERIALIZED token
    array (the lambda indexes a bound attribute, never re-evaluates a
    derived array). One groupBy of that single exploded relation yields
    ``c_full``, from which every order's count and context relation is
    an exact re-aggregation: C_j = Σ c_full over (g1..gj) where gj is
    non-NULL (the padding makes tail positions first-class, so low-order
    counts match direct per-order scans bit-for-bit — pinned against
    trigram_lm_score at n=3). ``cache_model=True`` persists ``c_full``
    (the one relation everything derives from), so the train corpus is
    scanned EXACTLY ONCE no matter how many backoff legs consume counts
    — without it Catalyst replays the (column-pruned) scan per derived
    relation, the cost trigram_lm_score's docstring concedes. The
    caller owns the persist lifetime (``spark.catalog.clearCache()``).
    ``model_path`` loads a model persisted by ``ngram_model_train``
    instead of training at all (train once, score every snapshot);
    mutually exclusive with ``train_df``, order-checked on load.

    Scoring left-joins the corpus's full n-grams to the 2(n-1)+1 derived
    relations on their suffix keys (all vocabulary-bounded; AQE
    broadcasts them when small) and folds per-doc means with plain AVG.
    Docs with < n tokens carry n_ngrams=0 and NULL scores (same routing
    contract as the lower-order scorers).

    Output: (id, n_ngrams, mean_nll, score)."""
    if n < 2:
        raise ValueError("ngram_lm_score needs n >= 2; use "
                         "unigram_logprob_score for order 0/1 semantics")
    if model_path is not None:
        if train_df is not None:
            raise ValueError("pass train_df OR model_path, not both")
        c_full = df.sparkSession.read.parquet(model_path)
        want = [f"g{j}" for j in range(1, n + 1)] + ["c"]
        if sorted(c_full.columns) != sorted(want):
            raise ValueError(
                f"model at {model_path} has columns {c_full.columns}; "
                f"an order-{n} score needs {want} — train with "
                f"ngram_model_train(..., n={n})")
    else:
        c_full = _padded_gram_counts(
            train_df if train_df is not None else df, text_col, n)
    if cache_model:
        c_full = c_full.persist()

    def cnt_rel(j: int) -> DataFrame:
        """C of j-grams, keys renamed k{j}_1..k{j}_j, value c{j}."""
        return (c_full.filter(F.col(f"g{j}").isNotNull())
                .groupBy(*[F.col(f"g{i}").alias(f"k{j}_{i}")
                           for i in range(1, j + 1)])
                .agg(F.sum("c").alias(f"c{j}")))

    def ctx_rel(j: int) -> DataFrame:
        """C(prefix ·): j-gram positions re-grouped on the first j-1."""
        return (c_full.filter(F.col(f"g{j}").isNotNull())
                .groupBy(*[F.col(f"g{i}").alias(f"x{j}_{i}")
                           for i in range(1, j)])
                .agg(F.sum("c").alias(f"cx{j}")))

    uni = c_full.groupBy(F.col("g1").alias("k1_1")) \
        .agg(F.sum("c").alias("c1"))
    totals = uni.agg(F.sum("c1").alias("n_total"),
                     F.count(F.lit(1)).alias("v_size"))

    # --- scoring: the corpus's own full n-grams ---
    dtoks = df.select(F.col(id_col).alias("id"),
                      F.coalesce(tokens(F.col(text_col)),
                                 F.array().cast("array<string>"))
                      .alias("toks"))
    m = F.size("toks")
    full_pos = F.sequence(F.lit(1), m - n + 1)
    doc_grams = F.when(m >= n, F.transform(full_pos, lambda i: F.struct(
        *[F.get(F.col("toks"), i + F.lit(k) - 1).alias(f"w{k + 1}")
          for k in range(n)]))).otherwise(F.array().cast(
              "array<struct<" + ", ".join(f"w{j}: string"
                                          for j in range(1, n + 1)) + ">>"))
    ngrams = (dtoks.select("id", F.explode_outer(doc_grams).alias("t"))
              .select("id", *[F.col(f"t.w{j}").alias(f"w{j}")
                              for j in range(1, n + 1)]))

    s = ngrams.filter(F.col("w1").isNotNull())
    for j in range(n, 1, -1):
        # leg j scores the LAST j tokens of the n-gram
        off = n - j
        s = s.join(cnt_rel(j),
                   [F.col(f"w{off + i}") == F.col(f"k{j}_{i}")
                    for i in range(1, j + 1)], "left")
        s = s.join(ctx_rel(j),
                   [F.col(f"w{off + i}") == F.col(f"x{j}_{i}")
                    for i in range(1, j)], "left")
    s = s.join(uni, F.col(f"w{n}") == F.col("k1_1"), "left")
    s = s.crossJoin(F.broadcast(totals))      # one-row (N, V)

    a = float(alpha)
    expr = (F.lit(a ** (n - 1))
            * (F.coalesce(F.col("c1"), F.lit(0)) + 1)
            / (F.col("n_total") + F.col("v_size")))
    for j in range(2, n + 1):                  # wrap floor outward
        expr = F.when(F.col(f"c{j}").isNotNull(),
                      F.lit(a ** (n - j))
                      * F.col(f"c{j}") / F.col(f"cx{j}")).otherwise(expr)
    scored = s.select("id", (-F.log(expr)).alias("nll"))
    agg = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.avg("nll").alias("mean_nll"),
        F.exp(F.avg("nll")).alias("score"))
    ids = df.select(F.col(id_col).alias("id"))
    return (ids.join(agg, "id", "left")
            .select("id",
                    F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
                    "mean_nll", "score"))


def c4_clean(text: Column) -> dict[str, Column]:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2) as pure per-row
    expressions — one narrow pass, no explode/shuffle:

    - keep only lines ending in terminal punctuation (. ! ? or a closing
      double-quote after one) AND containing at least 5 words
    - flag pages containing 'lorem ipsum' (case-insensitive) or '{' (code)
    - count sentences (terminal-punctuation runs) in the KEPT text;
      ``c4_pass`` = ≥3 sentences and neither flag

    Returns cleaned_text (kept lines re-joined with newlines) plus the
    stats; callers hash cleaned_text for correctness checks rather than
    shipping it."""
    lines = F.filter(F.transform(F.split(text, r"\n"), F.trim),
                     lambda ln: ln != "")
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(r'[.!?]"?$')
        & (F.size(F.split(ln, r"\s+")) >= 5))
    cleaned = F.array_join(kept, "\n")
    n_sentences = F.regexp_count(cleaned, F.lit(r"[.!?]"))
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_lines_kept": F.size(kept).cast("long"),
        "n_sentences": n_sentences.cast("long"),
        "has_lorem_ipsum": has_lorem,
        "has_code_brace": has_brace,
        "c4_pass": (n_sentences >= 3) & ~has_lorem & ~has_brace,
        "cleaned_text": cleaned,
    }


def c4_filter(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              keep_only: bool = False) -> DataFrame:
    """Attach C4 cleaning stats per document (cleaned text as md5 so the
    result stays metadata-sized); ``keep_only`` returns passers with their
    cleaned text instead."""
    parts = c4_clean(F.col(text_col))
    if keep_only:
        out = df.select(F.col(id_col).alias("id"),
                        parts["cleaned_text"].alias("cleaned_text"),
                        parts["c4_pass"].alias("c4_pass"))
        return out.filter(F.col("c4_pass")).drop("c4_pass")
    return df.select(
        F.col(id_col).alias("id"),
        *[parts[k].alias(k) for k in
          ("n_lines", "n_lines_kept", "n_sentences",
           "has_lorem_ipsum", "has_code_brace", "c4_pass")],
        F.md5(parts["cleaned_text"]).alias("cleaned_md5"))


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles as an array<string> (empty when fewer than k tokens).

    The tokenization is a PLAIN split (no CASE wrapper) referenced from the
    slice lambda: a conditional expression inside a higher-order-function
    body defeats Catalyst's subexpression elimination, so the regex split
    re-ran once PER SHINGLE (O(tokens²) regex work — 13.9s → 1.2s on the
    sf0.1 documents). The blank-text guard moves to one outer CASE whose
    branch is evaluated once per row; '' still yields an empty array because
    split('') → [''] has fewer than k tokens."""
    t = F.split(F.trim(F.lower(text)), r"\s+")
    n = F.size(t)
    return F.when(
        (F.trim(text) != "") & (n >= k),
        F.transform(F.sequence(F.lit(1), n - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(t, i, k))),
    ).otherwise(F.array().cast("array<string>"))


def fingerprint(text: Column, k: int = 3) -> Column:
    """Winnowing-style document fingerprint: minimum MD5 over word k-shingles
    (a rolling-hash min-sketch); falls back to MD5 of the whole text for very
    short docs. Identical fingerprints → near-identical prefixes content."""
    sh = shingles(text, k)
    return F.when(F.size(sh) > 0,
                  F.array_min(F.transform(sh, F.md5))).otherwise(F.md5(text))


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 128,
                    overlap: int = 0) -> DataFrame:
    """Split each document into token-window chunks — the unit a training
    pipeline feeds to a tokenizer/packer. Pure expressions: whitespace
    tokens → ``sequence`` of window starts (stride = chunk_tokens −
    overlap) → ``slice`` + ``posexplode``. No Python in the path, no
    shuffle (a per-row narrow transform: each document expands to its own
    chunks in place), so it runs at scan speed over 100 TB and parallelism
    follows the input partitioning.

    Returns (id, chunk_index, n_tokens, chunk_text); empty/blank documents
    produce no chunks; the final window may be shorter than
    ``chunk_tokens``; with ``overlap`` > 0 consecutive chunks share that
    many tokens. Window starts run by ``stride`` up to the last token, so
    with ``overlap`` > 0 a short trailing window CAN be fully contained in
    its predecessor (e.g. 7 tokens, chunk 4 / overlap 3 emits 'g' after
    'd e f g') — packers that must not duplicate tail text should drop
    chunks with ``n_tokens`` ≤ ``overlap`` whose index > 0.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    starts = F.sequence(F.lit(0), F.col("__n__") - 1, F.lit(stride))
    base = (df.select(F.col(id_col).alias("id"), toks.alias("__toks__"),
                      F.size(toks).alias("__n__"))
            .filter(F.col("__n__") > 0)
            .select("id", "__toks__", "__n__",
                    F.posexplode(starts).alias("chunk_index", "__start__")))
    return base.select(
        "id", "chunk_index",
        F.least(F.lit(chunk_tokens),
                F.col("__n__") - F.col("__start__")).alias("n_tokens"),
        F.array_join(
            F.slice(F.col("__toks__"), F.col("__start__") + 1,
                    F.lit(chunk_tokens)), " ").alias("chunk_text"))


def tfidf_keywords(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Top-k TF-IDF keywords per document — corpus-relative salience for
    tagging/routing. tf = in-doc term count, idf = ln(N/df) over distinct
    document frequency; ties break (score DESC, term ASC) so results are
    deterministic.

    100 TB shape: one explode feeds both the per-(doc, term) counts and
    the document-frequency agg (partial aggs); the idf join is on term
    (AQE broadcasts the df relation when small) and the top-k is a
    per-doc window — no global sort. Output: (id, term, tfidf, rank)."""
    from pyspark.sql import Window

    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("id").alias("df"))
    ndocs = toks.agg(F.countDistinct("id").alias("n_docs"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(ndocs))     # one-row total
              .select("id", "term",
                      (F.col("tf")
                       * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf")))
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(),
                                         F.col("term").asc())
    return (scored.select("*", F.row_number().over(w).alias("rank"))
            .filter(F.col("rank") <= k))


def pack_token_spans(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", window: int = 2048,
                     num_buckets: int | None = None) -> DataFrame:
    """Concat-and-cut sequence packing — the standard LLM-pretraining step:
    documents are laid end-to-end in ``id`` order and the token stream is
    cut every ``window`` tokens; a document overlapping a cut is split
    across the adjacent training sequences. Returns the packing PLAN, one
    row per (document, sequence) overlap: (seq_id, id, tok_start — 0-based
    offset within the document, tok_count), which a writer can apply
    without ever materializing the global stream.

    100 TB shape: token counts reduce per document first, so the global
    prefix sum runs over ONE ROW PER DOCUMENT (metadata-plane) — and even
    that never funnels through one partition. The prefix sum is two-phase:
    deterministic id-range buckets (approxQuantile boundaries → a codegen'd
    monotone bucket expression), per-bucket token totals collected as
    ``num_buckets`` scalars, cumulative bucket base offsets re-broadcast as
    a literal map, and a PARTITIONED window adds the within-bucket running
    sum — no ``Exchange SinglePartition`` anywhere in the plan, so at
    billions of docs each bucket is an independent task. Bucketing only
    changes physical grouping, never offsets, so results are identical to
    the naive global window. The (id, n) relation is persisted
    (MEMORY_AND_DISK) because both phases read it — one tokenize scan of
    the corpus total. The span explode is a narrow per-row expansion, so
    document text never shuffles. Non-numeric id columns (no quantile
    boundaries) fall back to the single global window.
    """
    if window <= 0:
        raise ValueError("window must be positive")
    from pyspark.sql import Window
    from pyspark.sql import types as T

    counts = df.select(F.col(id_col).alias("id"),
                       token_count(F.col(text_col)).alias("n")) \
               .filter(F.col("n") > 0)
    if num_buckets is None:
        try:
            num_buckets = int(df.sparkSession.conf.get(
                "spark.sql.shuffle.partitions", "200"))
        except ValueError:
            num_buckets = 200
    numeric_id = isinstance(df.schema[id_col].dataType, T.NumericType)
    bounds: list[float] = []
    if numeric_id and num_buckets > 1:
        from pyspark import StorageLevel

        counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
        qs = [i / num_buckets for i in range(1, num_buckets)]
        bounds = sorted(set(counts.approxQuantile("id", qs, 0.001)))
    if bounds:
        pid = F.lit(0)
        for b in bounds:
            pid = pid + (F.col("id") > F.lit(b)).cast("int")
        parts = counts.withColumn("__pid__", pid)
        totals = {r["__pid__"]: r["t"] for r in
                  parts.groupBy("__pid__").agg(F.sum("n").alias("t"))
                       .collect()}
        base: dict[int, int] = {}
        acc = 0
        for p in sorted(totals):
            base[p] = acc
            acc += totals[p]
        base_map = F.create_map(
            *[F.lit(x) for p in sorted(base) for x in (p, base[p])])
        w = Window.partitionBy("__pid__").orderBy("id") \
                  .rowsBetween(Window.unboundedPreceding, -1)
        placed = parts.select(
            "id", "n",
            (F.coalesce(F.sum("n").over(w), F.lit(0))
             + F.coalesce(F.element_at(base_map, F.col("__pid__")),
                          F.lit(0))).alias("offset"))
    else:
        # empty input, non-numeric ids, or a single bucket: the plain
        # global running sum (correct, single-partition — small inputs only)
        w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
        placed = counts.select(
            "id", "n",
            F.coalesce(F.sum("n").over(w), F.lit(0)).alias("offset"))
    first_bin = F.floor(F.col("offset") / window)
    last_bin = F.floor((F.col("offset") + F.col("n") - 1) / window)
    spans = placed.select(
        "id", "n", "offset",
        F.explode(F.sequence(first_bin, last_bin)).alias("seq_id"))
    bin_start = F.col("seq_id") * window
    tok_start = F.greatest(bin_start - F.col("offset"), F.lit(0))
    tok_end = F.least(bin_start + window - F.col("offset"), F.col("n"))
    return spans.select(
        F.col("seq_id").cast("long"), "id",
        tok_start.cast("long").alias("tok_start"),
        (tok_end - tok_start).cast("long").alias("tok_count"))


def perplexity_buckets(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       sample_fraction: float = 1.0,
                       salt: str = "ppl",
                       vocab_size: int | None = None) -> DataFrame:
    """CCNet head/middle/tail quality bucketing (Wenzek et al. 2020 §4.4):
    score every document with the corpus-relative LM proxy
    (``unigram_logprob_score``), estimate the corpus tercile thresholds,
    and tag each document ``head`` (lowest third of mean NLL — most
    fluent), ``middle``, or ``tail``. CCNet trains its LM on a sample and
    buckets the full crawl; ``sample_fraction`` mirrors that — thresholds
    come from a deterministic salted-hash sample (same draw every
    run/engine, see ``sampling.hash_sample``) while every document is
    tagged.

    100 TB shape: the exact tercile aggregate (``percentile`` collects
    the score multiset on one reducer) runs over the hash SAMPLE, which
    is how it stays bounded — size ``sample_fraction`` so the sampled
    score column fits one executor (it is one double per sampled doc).
    The resulting 1-row threshold relation is broadcast back over the
    full scored corpus; no global sort or window anywhere. Scores are
    rounded to 5 decimals BEFORE the percentile so the threshold — and
    every boundary comparison — is engine-exact.

    Output: (id, n_tokens, mean_nll, bucket)."""
    from dataops_testgen_spark.pipeline.sampling import _unit_hash

    if not 0.0 < sample_fraction <= 1.0:
        raise ValueError("sample_fraction must be in (0, 1]")
    scored = (unigram_logprob_score(df, text_col, id_col,
                                    vocab_size=vocab_size)
              .select("id", "n_tokens",
                      F.round("mean_nll", 5).alias("mean_nll")))
    sample = scored
    if sample_fraction < 1.0:
        sample = scored.filter(
            _unit_hash(F.col("id"), salt) < F.lit(sample_fraction))
    thr = sample.agg(
        F.percentile("mean_nll", F.lit(1.0 / 3)).alias("t1"),
        F.percentile("mean_nll", F.lit(2.0 / 3)).alias("t2"))
    return (scored.crossJoin(F.broadcast(thr))
            .select("id", "n_tokens", "mean_nll",
                    F.when(F.col("mean_nll") <= F.col("t1"), F.lit("head"))
                    .when(F.col("mean_nll") <= F.col("t2"), F.lit("middle"))
                    .otherwise(F.lit("tail")).alias("bucket")))


def corpus_report(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """One-row corpus health report — the dashboard a pipeline owner reads
    before training: document/token volume, exact-duplicate rate, English
    share (stopword language-ID), and Gopher quality pass rate. ONE
    partial-aggregate scan (the exact distinct adds Catalyst's expand;
    swap md5 for an HLL sketch at 100 TB if one pass matters more than
    exactness)."""
    t = F.col(text_col)
    n_toks = token_count(t)
    gp = gopher_quality_flags(t)["gopher_pass"]
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_toks).alias("total_tokens"),
        F.round(F.avg(n_toks), 5).alias("avg_tokens"),
        F.countDistinct(F.md5(t)).alias("distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5(t))).alias("dup_docs"),
        F.sum((lang_id(t) == "en").cast("long")).alias("en_docs"),
        F.sum(gp.cast("long")).alias("gopher_pass_docs"))


def analyze(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass text analysis: id, token counts, lang, quality, fingerprint."""
    t = F.col(text_col)
    m = quality_metrics(t)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        lang_id(t).alias("lang_pred"),
        m["punct_ratio"].alias("punct_ratio"),
        m["stopword_ratio"].alias("stopword_ratio"),
        m["mean_token_len"].alias("mean_token_len"),
        quality_score(t).alias("quality_score"),
        fingerprint(t).alias("fingerprint"),
    )
