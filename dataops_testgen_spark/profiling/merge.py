"""Mergeable profile statistics — partition-incremental profiling at scale.

At 100 TB a daily pipeline should profile only NEW partitions and fold the
result into the running table profile, not rescan history. Most of the
reference's ~60 metrics are algebraically mergeable from per-slice profile
rows (the same idea as Spark's own partial aggregates, one level up):

- count-like metrics add; min/max combine by min/max
- means combine weighted by ``value_ct``
- sample stddev combines through the sum-of-squares identity
  ``SS_total = Σ((n_i−1)·sd_i² + n_i·mean_i²) − n·mean²`` (the grouped form
  of Chan et al.'s pairwise update), then ``sd = sqrt(SS/(n−1))``

Metrics that are NOT mergeable from scalars come back NULL — unless the
slices were profiled with ``keep_sketches=True``, which carries mergeable
sketches per column: DataSketches HLL for ``distinct_value_ct``, a
quantile sketch (profiling/sketches.py — exact below capacity, bounded
rank error above) for ``percentile_25/50/75``, and bounded exact
value/pattern counters for ``top_freq_values`` / ``distinct_value_hash``
/ ``top_patterns`` / ``distinct_pattern_ct`` (exact-or-NULL by the
reference's own 70-distinct qualification). Still NULL without a sketch
path: date bucket counts (``date_days/weeks/months_present``),
``distinct_std_value_ct``, and the derived ``std_pattern_match`` label —
those a scheduled full profile refreshes. Merging SAMPLED profiles is
refused: scaled estimates of disjoint slices do not add.

No reference-file counterpart: the reference re-profiles whole tables per
run (`run_profiling.py`); this operator exists for the Spark target's
partitioned-lake reality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataops_testgen_spark.profiling.profiler import PROFILE_SCHEMA

KEY_FIELDS = ["table_name", "column_name"]
META_FIRST = ["ordinal_position", "column_type", "general_type", "is_decimal"]

SUM_FIELDS = [
    "record_ct", "value_ct", "null_value_ct", "zero_value_ct",
    "zero_length_ct", "lead_space_ct", "quoted_value_ct",
    "includes_digit_ct", "filled_value_ct", "upper_case_ct",
    "lower_case_ct", "non_alpha_ct", "mixed_case_ct", "non_printing_ct",
    "numeric_ct", "date_ct", "embedded_space_ct", "before_1yr_date_ct",
    "before_5yr_date_ct", "before_20yr_date_ct", "before_100yr_date_ct",
    "within_1yr_date_ct", "within_1mo_date_ct", "future_date_ct",
    "distant_future_date_ct", "boolean_true_ct",
]
SUM_DOUBLE_FIELDS = ["fractional_sum"]
MIN_FIELDS = ["min_length", "min_value", "min_value_over_0", "min_date",
              "min_text"]
MAX_FIELDS = ["max_length", "max_value", "max_date", "max_text"]
# (metric, weight column): weighted means — every avg_* is over non-null
# values of the profiled column, so the weight is value_ct
WEIGHTED_AVG_FIELDS = [("avg_length", "value_ct"),
                       ("avg_value", "value_ct"),
                       ("avg_embedded_spaces", "value_ct")]
# distinct_value_ct IS merged (approximately) when the slices carry HLL
# sketches, percentile_25/50/75 ARE merged when they carry quantile
# sketches, and the top_freq/pattern metrics ARE merged (exact-or-NULL)
# when they carry frequency sketches — profile_table(keep_sketches=True)
# stores all three; without sketches everything here stays NULL.
NON_MERGEABLE_FIELDS = [
    "distinct_value_ct", "distinct_std_value_ct", "std_pattern_match",
    "percentile_25", "percentile_50", "percentile_75", "date_days_present",
    "date_weeks_present", "date_months_present", "top_patterns",
    "distinct_pattern_ct", "top_freq_values", "distinct_value_hash",
]
_SKETCH_PERCENTILES = {"percentile_25": "p25", "percentile_50": "p50",
                       "percentile_75": "p75"}


def _merge_freq_sketches_udf():
    """Arrow-batched merge of per-slice value/pattern frequency sketches →
    the secondary-profile metrics (top_freq_values / distinct_value_hash /
    top_patterns / distinct_pattern_ct) plus the merged sketches for
    further folding. Exact-or-NULL: a qualifying column (2–70 distinct,
    max length ≤ 70 — secondary_profiling_columns.sql) can't overflow a
    capacity-256 sketch, so survivors reproduce the full-table strings
    bit-for-bit; overflowed VALUE sketches mean > 70 distinct → NULL is
    the reference's own answer. Overflowed PATTERN sketches (> 256
    distinct patterns) also yield NULL — the one documented divergence,
    since the reference computes top_patterns for every string column."""
    from pyspark.sql.functions import pandas_udf

    from dataops_testgen_spark.profiling.secondary import (FREQ_MAX_DISTINCT,
                                                           FREQ_MAX_LENGTH,
                                                           FREQ_MIN_DISTINCT,
                                                           TOP_FREQ_K,
                                                           TOP_PATTERN_K)

    @pandas_udf("struct<top_freq_values:string, distinct_value_hash:string, "
                "top_patterns:string, distinct_pattern_ct:bigint, "
                "freq_sketch:binary, pattern_sketch:binary>")
    def _merge(val_lists, pat_lists):
        import pandas as pd

        from dataops_testgen_spark.profiling.sketches import merge_freq_blobs

        out = {"top_freq_values": [], "distinct_value_hash": [],
               "top_patterns": [], "distinct_pattern_ct": [],
               "freq_sketch": [], "pattern_sketch": []}
        for vblobs, pblobs in zip(val_lists, pat_lists):
            if vblobs is None or not len(vblobs):
                for k in out:
                    out[k].append(None)
                continue
            vs = merge_freq_blobs(vblobs)
            ps = merge_freq_blobs(pblobs if pblobs is not None else [])
            qualifies = (not vs.overflowed
                         and FREQ_MIN_DISTINCT <= len(vs.counts)
                         <= FREQ_MAX_DISTINCT
                         and vs.max_len <= FREQ_MAX_LENGTH)
            if qualifies:
                top = vs.top_k(TOP_FREQ_K)
                out["top_freq_values"].append(
                    " | ".join(f"{v}:{c}" for v, c in top))
                out["distinct_value_hash"].append(vs.distinct_hash())
            else:
                out["top_freq_values"].append(None)
                out["distinct_value_hash"].append(None)
            if not ps.overflowed and ps.counts:
                ptop = ps.top_k(TOP_PATTERN_K)
                out["top_patterns"].append(
                    " | ".join(f"{v}:{c}" for v, c in ptop))
                out["distinct_pattern_ct"].append(len(ps.counts))
            else:
                out["top_patterns"].append(None)
                out["distinct_pattern_ct"].append(None)
            out["freq_sketch"].append(vs.to_bytes())
            out["pattern_sketch"].append(ps.to_bytes())
        return pd.DataFrame(out)

    return _merge


def _merge_quantile_sketches_udf():
    """Arrow-batched merge of per-slice quantile-sketch blobs → merged
    percentiles + merged sketch (metadata-plane: one input row per
    (table, column)). The multiset merge in sketches.py makes the result
    independent of slice order."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<p25:double,p50:double,p75:double,sketch:binary>")
    def _merge(blob_lists):
        import pandas as pd

        from dataops_testgen_spark.profiling.sketches import (
            merge_sketch_blobs)

        out = {"p25": [], "p50": [], "p75": [], "sketch": []}
        for blobs in blob_lists:
            if blobs is None or not len(blobs):
                for k in out:
                    out[k].append(None)
                continue
            s = merge_sketch_blobs(blobs)
            out["p25"].append(s.percentile(0.25))
            out["p50"].append(s.percentile(0.50))
            out["p75"].append(s.percentile(0.75))
            out["sketch"].append(s.to_bytes() if s.n else None)
        return pd.DataFrame(out)

    return _merge


def merge_profiles(profiles: DataFrame) -> DataFrame:
    """Fold per-slice profile rows (one row per (slice, table, column),
    the output of ``profile_table`` over disjoint slices of the same
    table) into whole-table profile rows. Metadata-plane: input size is
    slices × columns. See the module docstring for merge rules; output
    keeps the ``PROFILE_SCHEMA`` column order with non-mergeable metrics
    NULL."""
    if profiles.filter(F.coalesce(F.col("sample_ratio"), F.lit(1.0))
                       < 1.0).limit(1).count():
        raise ValueError(
            "cannot merge sampled profiles: scaled estimates of disjoint "
            "slices do not add — profile slices with sample=False")

    aggs = []
    for f in SUM_FIELDS:
        aggs.append(F.sum(f).cast("long").alias(f))
    for f in SUM_DOUBLE_FIELDS:
        aggs.append(F.sum(f).alias(f))
    for f in MIN_FIELDS:
        aggs.append(F.min(f).alias(f))
    for f in MAX_FIELDS:
        aggs.append(F.max(f).alias(f))
    for f, w in WEIGHTED_AVG_FIELDS:
        aggs.append(
            (F.sum(F.col(f) * F.col(w))
             / F.nullif(F.sum(F.when(F.col(f).isNotNull(), F.col(w))),
                        F.lit(0))).alias(f))
    # sample stddev via the grouped sum-of-squares identity; slices with a
    # single value carry sd NULL but still contribute their mean/count
    n_i = F.col("value_ct")
    ss_i = (F.coalesce(F.col("stdev_value"), F.lit(0.0)) ** 2) * (n_i - 1)
    aggs.append(F.sum(F.when(F.col("avg_value").isNotNull(),
                             ss_i + n_i * F.col("avg_value") ** 2))
                .alias("__ss__"))
    aggs.append(F.sum(F.when(F.col("avg_value").isNotNull(), n_i))
                .alias("__n_num__"))
    for f in META_FIRST:
        aggs.append(F.first(f, ignorenulls=True).alias(f))
    aggs.append(F.max("run_date").alias("run_date"))
    has_sketches = "distinct_hll" in profiles.columns
    if has_sketches:
        # mergeable distinct counts: union the slices' DataSketches HLLs
        # (guarded — an all-NULL union yields an EMPTY sketch, which would
        # turn "sketches not kept" into a false distinct count of 0)
        aggs.append(F.when(F.count("distinct_hll") > 0,
                           F.hll_union_agg("distinct_hll"))
                    .alias("distinct_hll"))
    has_qsketch = "quantile_sketch" in profiles.columns
    if has_qsketch:
        # collect_list drops NULL blobs, so string/date columns (no numeric
        # sketch) arrive as empty lists and merge to NULL percentiles
        aggs.append(F.collect_list("quantile_sketch").alias("__qsk__"))
    has_fsketch = "freq_sketch" in profiles.columns
    if has_fsketch:
        aggs.append(F.collect_list("freq_sketch").alias("__fsk__"))
        aggs.append(F.collect_list("pattern_sketch").alias("__psk__"))

    g = profiles.groupBy(*KEY_FIELDS).agg(*aggs)
    if has_qsketch:
        g = g.withColumn("__q__", _merge_quantile_sketches_udf()(F.col("__qsk__"))) \
             .drop("__qsk__")
    if has_fsketch:
        g = g.withColumn("__f__", _merge_freq_sketches_udf()(
                F.col("__fsk__"), F.col("__psk__"))) \
             .drop("__fsk__", "__psk__")
    # avg_value in g is already the merged weighted mean, so the identity
    # reduces to SS_total − n·mean², divided by n−1 for the sample sd
    g = g.withColumn(
        "stdev_value",
        F.when(
            F.col("__n_num__") > 1,
            F.sqrt((F.col("__ss__")
                    - F.col("__n_num__") * F.col("avg_value") ** 2)
                   / (F.col("__n_num__") - 1)),
        )).drop("__ss__", "__n_num__")

    out_cols = []
    for field in PROFILE_SCHEMA.fields:
        name = field.name
        if name == "distinct_hll":
            out_cols.append(
                (F.col(name) if has_sketches
                 else F.lit(None).cast("binary")).alias(name))
        elif name == "quantile_sketch":
            out_cols.append(
                (F.col("__q__.sketch") if has_qsketch
                 else F.lit(None).cast("binary")).alias(name))
        elif name in ("freq_sketch", "pattern_sketch"):
            out_cols.append(
                (F.col(f"__f__.{name}") if has_fsketch
                 else F.lit(None).cast("binary")).alias(name))
        elif name in ("top_freq_values", "distinct_value_hash",
                      "top_patterns", "distinct_pattern_ct") and has_fsketch:
            out_cols.append(F.col(f"__f__.{name}").alias(name))
        elif name == "distinct_value_ct" and has_sketches:
            out_cols.append(
                F.hll_sketch_estimate("distinct_hll").cast("long").alias(name))
        elif name in _SKETCH_PERCENTILES and has_qsketch:
            out_cols.append(
                F.col(f"__q__.{_SKETCH_PERCENTILES[name]}").alias(name))
        elif name in NON_MERGEABLE_FIELDS:
            out_cols.append(F.lit(None).cast(field.dataType).alias(name))
        elif name == "sample_ratio":
            # merged-from-unsampled-slices is itself an unsampled profile
            out_cols.append(F.lit(1.0).alias(name))
        else:
            out_cols.append(F.col(name).cast(field.dataType).alias(name))
    return g.select(*out_cols)
