"""Inclusion-dependency (foreign-key candidate) discovery.

The reference's ID-FK inference (functional_datatype.sql:559-571, our
`functional_type._apply_id_refinement`) marks a column ID-FK only when
the SAME column name is ID-Unique in another table. Real schemas rename
keys at every hop — TPC-H itself: ``n_regionkey`` referencing
``r_regionkey`` — so this extension discovers candidates by PROFILE
signature and verifies them by measured containment, the directional
inclusion dependency child ⊆ parent (Casanova et al. 1982's IND; the
SPIDER/BINDER pruning idea of using min/max/distinct metadata before
touching data).

Spark shape, 100 TB discipline:

- **Candidate pruning is metadata-only** — one collect over the inferred
  profile (the correlation/dependence eligibility pattern). A parent
  must be a unique non-null key by its own profile
  (``distinct_value_ct = value_ct = record_ct > 0``); a child must share
  the parent's general_type, have ``1 <= distinct_value_ct <=``
  parent's, and its [min, max] bounds must sit inside the parent's
  (``min_value``/``max_value`` for numerics, ``min_text``/``max_text``
  lexically for strings) — a necessary condition for containment, so
  pruning never drops a true FK.
- **Verification is ONE join per surviving pair**: the child's distinct
  dictionary LEFT-joined to the parent's on value equality, folded to a
  single (child_distinct, matched) row. Dictionaries are
  distinct-bounded, the join is a key-equality shuffle at worst
  (broadcast when a side is small) — never an all-pairs or data×data
  product. ``max_candidates`` caps the pair count so a pathological
  profile cannot fan out unbounded jobs; the cap is applied on a
  deterministic ordering and reported via the ``pruned`` return.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FK_MIN_CONTAINMENT = 0.99

_PROFILE_FIELDS = ["table_name", "column_name", "general_type",
                   "record_ct", "value_ct", "distinct_value_ct",
                   "min_value", "max_value", "min_text", "max_text"]


def _is_parent(r) -> bool:
    return (r["record_ct"] is not None and r["record_ct"] > 0
            and r["value_ct"] == r["record_ct"]
            and r["distinct_value_ct"] == r["value_ct"]
            and r["general_type"] in ("N", "A"))


def _bounds_within(child, parent) -> bool:
    gt = parent["general_type"]
    if gt == "N":
        lo, hi, plo, phi = (child["min_value"], child["max_value"],
                            parent["min_value"], parent["max_value"])
    else:
        lo, hi, plo, phi = (child["min_text"], child["max_text"],
                            parent["min_text"], parent["max_text"])
    if None in (lo, hi, plo, phi):
        # missing bounds: keep the candidate (conservative — pruning
        # must never drop a true FK), let verification decide
        return True
    return lo >= plo and hi <= phi


def fk_candidate_pairs(inferred_profile: DataFrame,
                       columns: dict[str, list[str]] | None = None,
                       max_candidates: int = 64,
                       min_child_distinct: int = 1):
    """[(child_table, child_col, parent_table, parent_col)] surviving the
    metadata pruning, deterministically ordered; second return is the
    number dropped by the ``max_candidates`` cap (0 = complete).

    ``columns``: optional {table: [cols]} restriction (the seat/CLI
    shape); default considers every profiled column."""
    rows = (inferred_profile.select(*_PROFILE_FIELDS).collect())
    prof = {}
    for r in rows:
        if columns is not None:
            allowed = columns.get(r["table_name"])
            if allowed is None or r["column_name"] not in allowed:
                continue
        prof[(r["table_name"], r["column_name"])] = r
    parents = sorted(k for k, r in prof.items() if _is_parent(r))
    pairs = []
    for ck in sorted(prof):
        child = prof[ck]
        if (child["distinct_value_ct"] is None
                or child["distinct_value_ct"] < max(1, min_child_distinct)):
            # min_child_distinct is the standard IND noise guard: a
            # 1..7-valued column sits inside EVERY dense key range and
            # flags against all of them (Papenbrock's BINDER reports the
            # same small-domain pathology) — raising the floor cuts the
            # false-positive fan without touching real FKs
            continue
        for pk in parents:
            if pk == ck:
                continue
            parent = prof[pk]
            if child["general_type"] != parent["general_type"]:
                continue
            if child["distinct_value_ct"] > parent["distinct_value_ct"]:
                continue
            if not _bounds_within(child, parent):
                continue
            pairs.append((ck[0], ck[1], pk[0], pk[1]))
    dropped = max(0, len(pairs) - max_candidates)
    return pairs[:max_candidates], dropped


def fk_discovery(tables: dict[str, DataFrame], inferred_profile: DataFrame,
                 columns: dict[str, list[str]] | None = None,
                 min_containment: float = FK_MIN_CONTAINMENT,
                 max_candidates: int = 64,
                 min_child_distinct: int = 1) -> DataFrame | None:
    """(child_table, child_column, parent_table, parent_column,
    child_distinct, matched, containment, flagged) for every candidate
    pair; ``flagged`` when containment >= min_containment. Counts are
    exact integers (hash-stable); containment is their ratio. Returns
    None when nothing survives pruning."""
    pairs, dropped = fk_candidate_pairs(inferred_profile, columns=columns,
                                        max_candidates=max_candidates,
                                        min_child_distinct=min_child_distinct)
    if dropped:
        import warnings

        warnings.warn(f"fk_discovery: max_candidates={max_candidates} "
                      f"dropped {dropped} candidate pair(s)")
    out = None
    for ct, cc, pt, pc in pairs:
        cd = (tables[ct].select(F.col(cc).alias("v"))
              .filter(F.col("v").isNotNull()).distinct())
        pdict = (tables[pt].select(F.col(pc).alias("v"))
                 .filter(F.col("v").isNotNull()).distinct()
                 .withColumn("_hit", F.lit(1)))
        one = (cd.join(pdict, "v", "left")
               .agg(F.count(F.lit(1)).alias("child_distinct"),
                    F.count("_hit").alias("matched")))
        row = one.select(
            F.lit(ct).alias("child_table"), F.lit(cc).alias("child_column"),
            F.lit(pt).alias("parent_table"), F.lit(pc).alias("parent_column"),
            F.col("child_distinct"), F.col("matched"),
            F.try_divide(F.col("matched").cast("double"),
                         F.col("child_distinct").cast("double"))
            .alias("containment"))
        out = row if out is None else out.unionByName(row)
    if out is None:
        return None
    return out.withColumn(
        "flagged",
        F.coalesce(F.col("containment") >= float(min_containment),
                   F.lit(False)))


def fk_to_test_defs(discovered: DataFrame, run_date: str) -> DataFrame:
    """Flagged inclusion dependencies → ``Combo_Match`` test definitions
    (the generation/selection.py test_definitions schema): every child
    (table, column) combination must keep existing in the parent — the
    referential-integrity monitor the reference leaves to manual
    configuration. Feed through ``merge_test_defs`` / ``to_test_defs``
    like any generated test; the CAT/query runner executes it as the
    standard set-difference Combo_Match."""
    return discovered.filter("flagged").select(
        F.lit("Combo_Match").alias("test_type"),
        F.col("child_table").alias("table_name"),
        F.col("child_column").alias("column_name"),
        F.lit("Y").alias("test_active"),
        F.lit(run_date).alias("last_auto_gen_date"),
        F.map_from_arrays(
            F.array(F.lit("match_table_name"),
                    F.lit("match_groupby_names"),
                    # fail on ANY orphaned combo (measure > 0): a NULL
                    # threshold would fall through evaluate_condition's
                    # ELSE and always pass
                    F.lit("threshold_value"),
                    # NULL-FK semantics (r12 ADVICE): discovery measures
                    # containment over NON-NULL child values only (and
                    # referential_monitor documents NULL reference = "no
                    # reference", not an orphan), but combo_match joins
                    # with eqNullSafe — without this subset a nullable
                    # child column yields a {NULL} orphan combo and the
                    # threshold-0 test fails forever
                    F.lit("subset_condition")),
            F.array(F.col("parent_table"), F.col("parent_column"),
                    F.lit("0"),
                    F.concat(F.col("child_column"),
                             F.lit(" IS NOT NULL"))),
        ).alias("params"))
