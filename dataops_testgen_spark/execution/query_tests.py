"""QUERY-type tests — standalone relational pipelines.

Reference templates: ``test_templates`` in
`/root/reference/testgen/template/dbsetup_test_types/*.yaml` (postgresql
flavor).  Each function returns the *detail* DataFrame (the offending rows /
groups); the measure is its count (or SUM(record_ct) for Dupe_Rows) and the
test fails when measure > skip_errors (threshold).

Scale notes: every pipeline aggregates *before* joining, so the joined
relations are group-cardinality, not row-cardinality; Catalyst broadcast-joins
them when small and AQE handles skew. The scalar MAX(date) needed by the
Timeframe tests is computed as its own tiny job rather than a per-row
correlated subquery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _subset(df: DataFrame, condition: str | None) -> DataFrame:
    return df.filter(F.expr(condition)) if condition and condition != "1=1" else df


def dupe_rows(df: DataFrame, groupby_names: list[str],
              subset_condition: str | None = None) -> DataFrame:
    """GROUP BY cols HAVING COUNT(*)>1 (test_types_Dupe_Rows.yaml template).
    Measure = COALESCE(SUM(record_ct),0) over this result."""
    return (
        _subset(df, subset_condition)
        .groupBy(*groupby_names)
        .agg(F.count(F.lit(1)).alias("record_ct"))
        .filter(F.col("record_ct") > 1)
    )


def dupe_rows_measure(detail: DataFrame) -> int:
    row = detail.agg(F.coalesce(F.sum("record_ct"), F.lit(0)).alias("m")).collect()[0]
    return int(row["m"])


def combo_match(df: DataFrame, keys: list[str],
                match_df: DataFrame, match_keys: list[str] | None = None,
                subset_condition: str | None = None,
                match_subset_condition: str | None = None,
                struct_key_col: str | None = None) -> DataFrame:
    """Key combinations present in ``df`` but absent from ``match_df``
    (test_types_Combo_Match.yaml: GROUP BY ... EXCEPT GROUP BY ...).
    Implemented as distinct + left_anti join (null-safe on each key).

    ``struct_key_col``: same bucketed fast path as
    ``aggregate_balance`` — both inputs carry the materialized
    positional-field struct of their keys (io/bucketing.py
    ``add_null_safe_key``) and are bucketed by it, so the distinct AND
    the anti join run on that one scan-partitioning attribute with
    plain ``=`` (struct equality is null-safe per field): zero shuffle
    Exchange end-to-end, identical results including NULL keys."""
    if struct_key_col is not None:
        gk = struct_key_col
        left = _subset(df, subset_condition).select(gk).distinct()
        right = _subset(match_df, match_subset_condition) \
            .select(gk).distinct()
        anti = left.join(right, left[gk] == right[gk], "left_anti")
        return anti.select(*[F.col(gk)[f"k{i}"].alias(k)
                             for i, k in enumerate(keys)])
    match_keys = match_keys or keys
    left = _subset(df, subset_condition).select(*keys).distinct()
    right = _subset(match_df, match_subset_condition).select(
        *[F.col(mk).alias(k) for k, mk in zip(keys, match_keys)]).distinct()
    cond = [left[k].eqNullSafe(right[k]) for k in keys]
    return left.join(right, cond, "left_anti")


def _grouped_totals(df: DataFrame, groupby: list[str], total: Column,
                    subset: str | None, having: str | None, alias: str) -> DataFrame:
    g = _subset(df, subset).groupBy(*groupby).agg(total.alias(alias))
    if having:
        g = g.filter(F.expr(having))
    return g


def aggregate_balance(
    df: DataFrame, groupby_names: list[str], total_expr: Column,
    match_df: DataFrame, match_groupby_names: list[str], match_total_expr: Column,
    mode: str = "exact",                    # exact | percent | range | minimum
    lower_tolerance: float | None = None, upper_tolerance: float | None = None,
    subset_condition: str | None = None, match_subset_condition: str | None = None,
    having_condition: str | None = None, match_having_condition: str | None = None,
    struct_key_col: str | None = None,
) -> DataFrame:
    """Per-group totals compared across two tables
    (test_types_Aggregate_Balance[_Percent/_Range]/Aggregate_Minimum.yaml).

    The reference UNION-ALLs both sides then re-groups; grouped-then-full-outer
    join (null-safe keys) produces the same (group, total, match_total) set.

    ``struct_key_col`` is the bucketed-storage fast path: both inputs
    carry a materialized struct of the group keys (io/bucketing.py
    ``add_null_safe_key`` — positional fields, so the types match across
    differently-named key columns) and are bucketed BY that column. The
    operator then groups and full-outer joins on that ONE attribute with
    plain ``=`` — struct equality is null-safe per field, so the
    semantics are identical to the ``eqNullSafe`` path — and because the
    join key IS the scan's bucket column, the whole plan runs with ZERO
    shuffle Exchange (the ``<=>`` form can't: Catalyst rewrites its keys
    to Coalesce/IsNull pairs that never match the scans'
    HashPartitioning). Pinned by test_bucketed_aggregate_balance.
    """
    if struct_key_col is not None:
        gk = struct_key_col

        def _grouped(src, sub, total, alias, keys, having):
            g = _subset(src, sub).groupBy(gk).agg(total.alias(alias))
            if having:
                # having may reference the group-key COLUMNS (the raw
                # path exposes them): project them out of the struct for
                # the filter, then drop them so the join output carries
                # each side's columns unambiguously
                g = (g.select(gk, alias,
                              *[F.col(gk)[f"k{i}"].alias(k)
                                for i, k in enumerate(keys)])
                     .filter(F.expr(having)).select(gk, alias))
            return g

        left = _grouped(df, subset_condition, total_expr, "total",
                        groupby_names, having_condition)
        right = _grouped(match_df, match_subset_condition,
                         match_total_expr, "match_total",
                         match_groupby_names, match_having_condition)
        j = left.join(right, left[gk] == right[gk], "full_outer")
        key = F.coalesce(left[gk], right[gk])
        joined = j.select(
            *[key[f"k{i}"].alias(k) for i, k in enumerate(groupby_names)],
            "total", "match_total")
    else:
        left = _grouped_totals(df, groupby_names, total_expr,
                               subset_condition, having_condition, "total")
        right = _grouped_totals(match_df, match_groupby_names,
                                match_total_expr, match_subset_condition,
                                match_having_condition, "match_total")
        right = right.select(*[F.col(mk).alias(k) for k, mk
                               in zip(groupby_names, match_groupby_names)],
                             "match_total")
        cond = [left[k].eqNullSafe(right[k]) for k in groupby_names]
        joined = left.join(right, cond, "full_outer").select(
            *[F.coalesce(left[k], right[k]).alias(k)
              for k in groupby_names],
            "total", "match_total",
        )
    t, m = F.col("total"), F.col("match_total")
    one_sided = (t.isNotNull() & m.isNull()) | (t.isNull() & m.isNotNull())
    if mode == "exact":
        bad = (t != m) | one_sided
    elif mode in ("percent", "range"):
        if mode == "percent":
            lo = m * (1 + F.lit(lower_tolerance) / 100.0)
            hi = m * (1 + F.lit(upper_tolerance) / 100.0)
        else:
            lo = m - F.lit(lower_tolerance)
            hi = m + F.lit(upper_tolerance)
        bad = one_sided | ~t.between(lo, hi)
    elif mode == "minimum":
        # Aggregate_Minimum: fail when total dropped below match, or category
        # vanished; new categories are fine.
        bad = (t < m) | (t.isNull() & m.isNotNull())
    else:
        raise ValueError(mode)
    return joined.filter(bad)


def _window_bounds(df: DataFrame, date_col: str) -> "tuple":
    return df.agg(F.max(F.col(date_col)).alias("mx")).collect()[0]["mx"]


def timeframe_combo_match(df: DataFrame, key_cols: list[str], window_date_column: str,
                          window_days: int,
                          subset_condition: str | None = None) -> DataFrame:
    """Symmetric difference of key sets between the latest [max-w, max] window
    and the prior [max-2w, max-w) window (test_types_Timeframe_Combo_Match.yaml).
    Output: (missing_from, *key_cols)."""
    base = _subset(df, subset_condition)
    mx = _window_bounds(base, window_date_column)
    d = F.col(window_date_column)
    latest = base.filter(d >= F.lit(mx) - F.expr(f"INTERVAL {window_days} DAYS")) \
                 .select(*key_cols).distinct()
    prior = base.filter(
        (d >= F.lit(mx) - F.expr(f"INTERVAL {2 * window_days} DAYS"))
        & (d < F.lit(mx) - F.expr(f"INTERVAL {window_days} DAYS"))
    ).select(*key_cols).distinct()
    gone = latest.exceptAll(prior).select(F.lit("Prior Timeframe").alias("missing_from"),
                                          *key_cols)
    new = prior.exceptAll(latest).select(F.lit("Latest Timeframe").alias("missing_from"),
                                         *key_cols)
    return gone.unionByName(new)


def timeframe_combo_gain(df: DataFrame, key_cols: list[str], window_date_column: str,
                         window_days: int,
                         subset_condition: str | None = None) -> DataFrame:
    """Keys in the prior window missing from the latest
    (test_types_Timeframe_Combo_Gain.yaml)."""
    base = _subset(df, subset_condition)
    mx = _window_bounds(base, window_date_column)
    d = F.col(window_date_column)
    latest = base.filter(d >= F.lit(mx) - F.expr(f"INTERVAL {window_days} DAYS")) \
                 .select(*key_cols).distinct()
    prior = base.filter(
        (d >= F.lit(mx) - F.expr(f"INTERVAL {2 * window_days} DAYS"))
        & (d < F.lit(mx) - F.expr(f"INTERVAL {window_days} DAYS"))
    ).select(*key_cols).distinct()
    return prior.exceptAll(latest)


def distribution_shift(df: DataFrame, category_cols: list[str],
                       match_df: DataFrame, match_category_cols: list[str] | None = None,
                       subset_condition: str | None = None,
                       match_subset_condition: str | None = None,
                       smoothing: float = 1e-7) -> DataFrame:
    """Jensen–Shannon divergence between categorical distributions
    (test_types_Distribution_Shift.yaml template):
    0.5*|Σ p·log2(p/m)| + 0.5*|Σ q·log2(q/m)| with 1e-7 smoothing on the
    FULL-JOINed per-category shares. Returns one row: (js_divergence)."""
    match_category_cols = match_category_cols or category_cols

    def shares(d: DataFrame, cols: list[str], sub: str | None) -> DataFrame:
        cat = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        g = _subset(d, sub).groupBy(cat.alias("category")).agg(
            F.count(F.lit(1)).alias("ct"))
        total = F.sum("ct").over(Window.partitionBy())
        return g.select("category", (F.col("ct") / total).alias("pct"))

    new = shares(df, category_cols, subset_condition)
    old = shares(match_df, match_category_cols, match_subset_condition)
    j = new.alias("n").join(old.alias("o"), F.col("n.category") == F.col("o.category"),
                            "full_outer").select(
        F.coalesce(F.col("n.pct"), F.lit(smoothing)).alias("new_pct"),
        F.coalesce(F.col("o.pct"), F.lit(smoothing)).alias("old_pct"),
    ).withColumn("avg_pct", (F.col("new_pct") + F.col("old_pct")) / 2.0)
    return j.agg(
        (0.5 * F.abs(F.sum(F.col("new_pct") * F.log(F.col("new_pct") / F.col("avg_pct"))
                           / F.log(F.lit(2.0))))
         + 0.5 * F.abs(F.sum(F.col("old_pct") * F.log(F.col("old_pct") / F.col("avg_pct"))
                             / F.log(F.lit(2.0))))).alias("js_divergence")
    )


def table_fingerprint(df: DataFrame, agg_exprs: list[Column],
                      subset_condition: str | None = None) -> str:
    """MD5 fingerprint of concatenated aggregates — Table_Freshness /
    Freshness_Trend signal (test_types_Table_Freshness.yaml: MD5({CUSTOM_QUERY}))."""
    row = _subset(df, subset_condition).agg(
        F.md5(F.concat_ws("|", *[e.cast("string") for e in agg_exprs])).alias("fp")
    ).collect()[0]
    return row["fp"]


def freshness_trend(
    df: DataFrame,
    fingerprint_exprs: list[Column],
    baseline_fingerprint: str | None,
    update_history,        # pandas DataFrame: DatetimeIndex + result_signal (0 = update)
    run_ts,                # pd.Timestamp of this check
    sensitivity: str = "medium",
    subset_condition: str | None = None,
    schedule_tz: str | None = None,
):
    """Freshness_Trend (test_types_Freshness_Trend.yaml): compare the MD5
    fingerprint to the baseline; when changed, a fresh update is recorded
    (result_signal 0); the business-minutes gap since the last update is
    checked against predicted [lower, upper] tolerances
    (`execute_tests_query.py:327-355` + prediction.freshness).

    Returns a dict result row: fingerprint, changed, gap_minutes,
    lower/upper tolerance, result_code (-1 while training — the reference's
    training sentinel — 1 pass, 0 fail).
    """
    import pandas as pd

    from dataops_testgen_spark.prediction.freshness import (
        NotEnoughData,
        compute_freshness_threshold,
    )

    fp = table_fingerprint(df, fingerprint_exprs, subset_condition)
    changed = baseline_fingerprint is not None and fp != baseline_fingerprint

    lower, upper, staleness, prediction = compute_freshness_threshold(
        update_history, sensitivity, schedule_tz=schedule_tz)

    updates = update_history[update_history.iloc[:, 0] == 0]
    last_update = updates.index[-1] if len(updates) else None
    gap_minutes = (
        (run_ts - last_update).total_seconds() / 60.0 if last_update is not None else None
    )

    if upper is None or gap_minutes is None:
        code = -1  # training: not enough gap history for tolerances
    elif changed:
        code = 1   # fresh update observed
    else:
        code = 1 if gap_minutes <= upper else 0
    return {
        "fingerprint": fp,
        "changed": changed,
        "gap_minutes": gap_minutes,
        "lower_tolerance": lower,
        "upper_tolerance": upper,
        "staleness_minutes": staleness,
        "result_code": code,
        "prediction": prediction,
    }
