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

import math
import warnings
from dataclasses import dataclass

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


def fs_em_train(df: DataFrame, queries: DataFrame | None = None,
                fields: list["LinkField"] | None = None,
                id_col: str = "id", block_col: str | None = None,
                block: str = "last_token", prefix_len: int = 3,
                n_iters: int = 5, init_p: float = 0.1,
                init_m: float = 0.9, init_u: float = 0.1,
                round_decimals: int = 9, missing_state: bool = False):
    """EM estimation of the Fellegi-Sunter (m, u) weights (Fellegi &
    Sunter 1969 §3; Winkler 1988's EM formulation) — ``record_linkage``
    takes user-supplied probabilities; this LEARNS them from the blocked
    candidate pairs themselves, unsupervised:

      E-step: per agreement pattern gamma in {0,1}^F,
              w(gamma) = p prod_f m_f^g (1-m_f)^(1-g)
                       / (that + (1-p) prod_f u_f^g (1-u_f)^(1-g))
      M-step: p = sum n w / N;  m_f = sum n w g_f / sum n w;
              u_f = sum n (1-w) g_f / sum n (1-w)

    The distributed work is ONE pass: candidates from the same blocked
    equi-join as record_linkage, agreement bits as JVM expressions, and
    a groupBy over the bit columns — at most 2^F pattern rows reach the
    driver (parameters, not data), where the fixed ``n_iters`` EM
    iterations run in plain Python. Deterministic end to end: fixed
    iteration count, fixed init, every updated probability ROUNDed to
    ``round_decimals`` (the kmeans/LR float firewall — summation order
    over the <=2^F pattern rows cannot leak into the next iteration), so
    the whole trainer is DuckDB-oracle-able by unrolling the iterations
    over the same pattern-count relation.

    Missing data: by default a field missing on either side scores
    agreement 0 for its bit (the conservative 2-state treatment — it
    deflates m on sparse fields). ``missing_state=True`` switches to
    Winkler's 3-state pattern space (agree=1 / disagree=0 / missing=2,
    3^F patterns — still driver-sized at F<=8): a missing field is
    UNINFORMATIVE under MAR (contributes factor 1 to both class
    likelihoods, the P(missing) terms cancel in w), and the M-step
    normalizes each field's m/u over its OBSERVED pattern mass only, so
    missingness stops biasing the estimates. With no missing values the
    two modes are bit-identical (the observed mass equals the total).

    Returns {"p": float, "n_pairs": int, "fields": [(col, m, u), ...]}
    — feed the learned (m, u) back into LinkField/record_linkage."""
    if not fields:
        raise ValueError("fields must be a non-empty list of LinkField")
    if not (0.0 < init_u < init_m < 1.0) or not 0.0 < init_p < 1.0:
        raise ValueError("need 0 < init_u < init_m < 1 and 0 < init_p < 1")
    seen: set[str] = set()
    for f in fields:
        if f.method not in ("exact", "levenshtein", "soundex", "jaccard"):
            raise ValueError(f"{f.col}: unknown method {f.method!r}")
        if f.col in seen:
            raise ValueError(f"duplicate field {f.col!r}")
        seen.add(f.col)
    block_col = block_col or fields[0].col
    if block == "soundex":
        _soundex_shape_guard(df, block_col)

    def side(rel: DataFrame, tag: str):
        cols = [F.col(id_col).alias(f"id_{tag}"),
                _block_key(F.col(block_col), block, prefix_len)
                .alias("blk")]
        cols += [_norm(F.col(f.col)).alias(f"{f.col}_{tag}")
                 for f in fields]
        return rel.select(*cols).filter(F.col("blk").isNotNull()
                                        & (F.col("blk") != ""))

    base = side(df, "b")
    probes = side(df if queries is None else queries, "a")
    cond = (F.col("id_a") < F.col("id_b") if queries is None
            else F.col("id_a") != F.col("id_b"))
    cand = probes.join(base, "blk").filter(cond)
    bits = []
    for i, f in enumerate(fields):
        a, b = F.col(f"{f.col}_a"), F.col(f"{f.col}_b")
        agree = _field_agree(f, a, b)
        if missing_state:
            bits.append(F.when(a.isNull() | b.isNull(), 2)
                        .when(agree, 1).otherwise(0).alias(f"g{i}"))
        else:
            bits.append((F.when(a.isNotNull() & b.isNotNull() & agree, 1)
                         .otherwise(0)).alias(f"g{i}"))
    patterns = (cand.select(*bits)
                .groupBy(*[f"g{i}" for i in range(len(fields))])
                .agg(F.count(F.lit(1)).alias("n"))
                .collect())
    if not patterns:
        raise ValueError("no candidate pairs — check the blocking choice")
    pats = [([int(r[f"g{i}"]) for i in range(len(fields))], int(r["n"]))
            for r in patterns]
    pats.sort()                          # engine-independent fold order
    n_total = sum(n for _g, n in pats)
    p = init_p
    m = [init_m] * len(fields)
    u = [init_u] * len(fields)
    nf = len(fields)
    for _ in range(n_iters):
        sw = swn = 0.0
        sm = [0.0] * nf
        su = [0.0] * nf
        smo = [0.0] * nf        # per-field OBSERVED pattern mass (match)
        suo = [0.0] * nf        # per-field observed mass (non-match)
        for g, n in pats:
            lm = p
            lu = 1.0 - p
            for i, gi in enumerate(g):
                if gi == 2:     # missing: uninformative under MAR — the
                    continue    # P(missing) factors cancel inside w
                lm *= m[i] if gi else (1.0 - m[i])
                lu *= u[i] if gi else (1.0 - u[i])
            # 0/0 guard: after rounding, a probability can pin to
            # exactly 0/1 while an opposite pattern still carries rows
            # (tiny-n corpora); both likelihoods then vanish and the
            # pattern is uninformative — weight 0, don't crash
            w = lm / (lm + lu) if (lm + lu) > 0.0 else 0.0
            sw += n * w
            swn += n * (1.0 - w)
            for i, gi in enumerate(g):
                if gi == 2:
                    continue
                smo[i] += n * w
                suo[i] += n * (1.0 - w)
                if gi:
                    sm[i] += n * w
                    su[i] += n * (1.0 - w)
        if sw <= 0.0 or swn <= 0.0 or min(smo) <= 0.0 or min(suo) <= 0.0:
            # every pattern's weight pinned to one class (no mixture
            # left), or a field has no observed pattern mass in a class
            # (all-missing field) — fail loudly rather than
            # ZeroDivisionError; degenerate corpora only
            raise ValueError(
                "EM degenerated: no estimable mixture mass "
                f"(sw={sw!r}, swn={swn!r})")
        p = round(sw / n_total, round_decimals)
        # 2-state mode: smo[i]/suo[i] fold exactly the sw/swn addend
        # sequences (no pattern skips), so these divisions are
        # bit-identical to the historical m=sm/sw, u=su/swn
        m = [round(sm[i] / smo[i], round_decimals) for i in range(nf)]
        u = [round(su[i] / suo[i], round_decimals) for i in range(nf)]
    return {"p": p, "n_pairs": n_total,
            "fields": [(f.col, m[i], u[i]) for i, f in enumerate(fields)]}


@dataclass(frozen=True)
class LinkField:
    """One comparison field in a Fellegi-Sunter linkage: compare
    ``col`` by ``method`` ('exact' | 'levenshtein' | 'soundex' |
    'jaccard'), with
    (m, u) = P(agree | same entity) / P(agree | different entities).
    The field contributes log2(m/u) on agreement, log2((1-m)/(1-u)) on
    disagreement, and 0 when either side is NULL (the standard FS
    missing-data treatment). Deterministic user-supplied (m, u) — not
    EM-estimated — keeps every score an exact function of the inputs."""
    col: str
    method: str = "exact"
    max_dist: int = 2
    m: float = 0.9
    u: float = 0.1
    min_jaccard: float = 0.5      # 'jaccard' method's agree threshold

    def weights(self) -> tuple[float, float]:
        if not (0.0 < self.u < self.m < 1.0):
            raise ValueError(
                f"{self.col}: need 0 < u < m < 1, got m={self.m} u={self.u}")
        return (math.log2(self.m / self.u),
                math.log2((1.0 - self.m) / (1.0 - self.u)))


def _field_agree(f: "LinkField", a: Column, b: Column) -> Column:
    """JVM agreement predicate for one LinkField (no UDFs): exact
    normalized equality; levenshtein <= max_dist; soundex equality; or
    token-set Jaccard >= min_jaccard (array_intersect/union sizes — the
    multi-word comparator levenshtein is too O(len^2)-costly for)."""
    if f.method == "exact":
        return a == b
    if f.method == "levenshtein":
        return F.levenshtein(a, b) <= f.max_dist
    if f.method == "soundex":
        return F.soundex(a) == F.soundex(b)
    if f.method == "jaccard":
        ta, tb = F.split(a, r"\s+"), F.split(b, r"\s+")
        inter = F.size(F.array_intersect(ta, tb)).cast("double")
        union = F.size(F.array_union(ta, tb))
        return inter / F.nullif(union.cast("double"), F.lit(0.0)) \
            >= f.min_jaccard
    raise ValueError(f"{f.col}: unknown method {f.method!r}")


def _soundex_shape_guard(df: DataFrame, col: str) -> None:
    """Soundex encodes ONE word; on long multi-word text every value
    collapses toward the first word's code and recall silently dies.
    One limit(1000) sample probe (metadata-scale job) warns before that
    happens — the function accepts any column, so the guard is the only
    thing standing between a caller and a degenerate block key."""
    probe = (df.select(_norm(F.col(col)).alias("v"))
             .filter(F.col("v").isNotNull()).limit(1000)
             .agg(F.avg(F.size(F.split("v", r"\s+"))).alias("toks"))
             .first())
    if probe and probe["toks"] is not None and probe["toks"] > 4:
        warnings.warn(
            f"soundex blocking on '{col}': avg {probe['toks']:.1f} tokens "
            "per value — soundex encodes one word, long text degenerates "
            "to near-constant blocks; use 'prefix' or a structured field",
            stacklevel=3)


def record_linkage(df: DataFrame, queries: DataFrame | None = None,
                   fields: list[LinkField] | None = None,
                   id_col: str = "id", block_col: str | None = None,
                   block: str = "last_token", prefix_len: int = 3,
                   threshold: float | None = None) -> DataFrame:
    """Multi-field record linkage (Fellegi & Sunter 1969): blocked
    candidates scored by per-field agreement weights.

    The single-field ``fuzzy_match_pairs`` answers "are these two
    STRINGS close"; real record linkage scores agreement across several
    fields (name + address + phone ...) so one noisy field can't sink a
    match that three clean fields support. Reference analogue: the
    Combo_Match test family
    (`/root/reference/testgen/template/dbsetup_test_types/
    test_types_Combo_Match.yaml`) is the single-table multi-column
    match; this is the cross-record generalization on the same blocked
    candidates as ``fuzzy_match_pairs``.

    - candidates: ONE equi-join on the deterministic blocking key of
      ``block_col`` (defaults to the first field) — never a cross join;
      a pair in different blocks is never scored (recall is set by the
      blocking choice, cost by the hottest block, AQE splits stragglers).
    - score: sum over fields of w_agree / w_disagree / 0-if-missing —
      every comparator is a JVM expression (equality, ``levenshtein``,
      ``soundex``), whole-stage codegen end to end, no UDFs.
    - ``threshold``: keep pairs with score >= threshold (None = all).

    Output: (id_a, id_b | query_id, match_id), n_agree, score.
    Self mode emits each pair once (id_a < id_b); probe mode excludes
    self-matches by id."""
    if not fields:
        raise ValueError("fields must be a non-empty list of LinkField")
    seen: set[str] = set()
    for f in fields:
        if f.method not in ("exact", "levenshtein", "soundex", "jaccard"):
            raise ValueError(f"{f.col}: unknown method {f.method!r}")
        if f.col in seen:
            raise ValueError(f"duplicate field {f.col!r}")
        seen.add(f.col)
        f.weights()                      # validate (m, u) eagerly
    block_col = block_col or fields[0].col
    if block == "soundex":
        _soundex_shape_guard(df, block_col)

    def side(rel: DataFrame, tag: str):
        cols = [F.col(id_col).alias(f"id_{tag}"),
                _block_key(F.col(block_col), block, prefix_len)
                .alias("blk")]
        cols += [_norm(F.col(f.col)).alias(f"{f.col}_{tag}")
                 for f in fields]
        return rel.select(*cols).filter(F.col("blk").isNotNull()
                                        & (F.col("blk") != ""))

    base = side(df, "b")
    probes = side(df if queries is None else queries, "a")
    cond = (F.col("id_a") < F.col("id_b") if queries is None
            else F.col("id_a") != F.col("id_b"))
    cand = probes.join(base, "blk").filter(cond)

    score = F.lit(0.0)
    n_agree = F.lit(0)
    for f in fields:
        a, b = F.col(f"{f.col}_a"), F.col(f"{f.col}_b")
        agree = _field_agree(f, a, b)
        w_a, w_d = f.weights()
        missing = a.isNull() | b.isNull()
        score = score + (F.when(missing, F.lit(0.0))
                         .when(agree, F.lit(w_a)).otherwise(F.lit(w_d)))
        n_agree = n_agree + F.when(~missing & agree, 1).otherwise(0)
    out = cand.select(
        "id_a", "id_b", n_agree.alias("n_agree"), score.alias("score"))
    if threshold is not None:
        out = out.filter(F.col("score") >= float(threshold))
    if queries is None:
        return out
    return out.select(F.col("id_a").alias("query_id"),
                      F.col("id_b").alias("match_id"), "n_agree", "score")
