"""Streaming monitor queries.

Each monitor takes a streaming DataFrame (``spark.readStream`` source) with
an event-time column and returns the monitored aggregate stream:

- ``volume_monitor`` — Volume_Trend semantics
  (`gen_query_tests/gen_Volume_Trend.sql:20`:
  ``COUNT(CASE WHEN {SUBSET_CONDITION} THEN 1 END)``) per tumbling window,
  with optional predicted tolerance bounds evaluated inline (result_code 0
  when outside [lower, upper] — Metric_Trend's NOT BETWEEN).
- ``freshness_monitor`` — Table_Freshness: latest event time + fingerprint
  per window; downstream gap analysis reuses prediction.freshness.
- ``metric_trend_monitor`` — Metric_Trend: arbitrary aggregate expression
  per window vs tolerances.

Late data: bounded by ``watermark`` (reference parity is business-time
exclusion windows — `freshness_service.py:200-341` — which map to
event-time watermarks here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_event_time(stream: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP; parquet sources written without a
    timezone surface as TIMESTAMP_NTZ, which ``withWatermark`` rejects —
    normalize (wall-clock instant is preserved; session TZ is UTC)."""
    field = stream.schema[ts_col]
    if field.dataType.simpleString() == "timestamp_ntz":
        return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def _windowed(stream: DataFrame, ts_col: str, window: str, watermark: str):
    stream = _as_event_time(stream, ts_col)
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w")))


def _with_tolerances(agg: DataFrame, measure_col: str,
                     lower: float | None, upper: float | None) -> DataFrame:
    if lower is None and upper is None:
        return agg.withColumn("result_code", F.lit(None).cast("int"))
    cond = F.lit(True)
    if lower is not None:
        cond = cond & (F.col(measure_col) >= F.lit(lower))
    if upper is not None:
        cond = cond & (F.col(measure_col) <= F.lit(upper))
    return agg.withColumn("result_code", F.when(cond, 1).otherwise(0))


def volume_monitor(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    subset_condition: str | None = None,
    lower_tolerance: float | None = None,
    upper_tolerance: float | None = None,
) -> DataFrame:
    subset = F.expr(subset_condition) if subset_condition else F.lit(True)
    agg = _windowed(stream, ts_col, window, watermark).agg(
        F.sum(F.when(subset, 1).otherwise(0)).cast("long").alias("record_ct")
    )
    out = agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "record_ct",
    )
    return _with_tolerances(out, "record_ct", lower_tolerance, upper_tolerance)


def referential_monitor(
    stream: DataFrame,
    parent: DataFrame,
    key_col: str,
    parent_key: str | None = None,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    max_orphan_pct: float = 0.0,
) -> DataFrame:
    """Per-window referential-integrity monitor (NEW r12): the streaming
    twin of the Combo_Match definitions `discover-fks --emit-tests`
    generates — counts arriving records whose ``key_col`` does not exist
    in the ``parent`` relation's key dictionary.

    Shape: a STREAM-STATIC left join against the parent's distinct key
    dictionary (Structured Streaming re-plans the static side per
    microbatch, so a parquet-backed parent picks up new keys between
    batches — the late-arriving-dimension case), then the standard
    windowed aggregate. NULL child keys are counted separately, not as
    orphans (SQL FK semantics: NULL references nothing). ``result_code``
    1/0 flags windows whose orphan share exceeds ``max_orphan_pct``.
    At scale the dictionary join broadcasts when the parent key set is
    small and shuffles on the key otherwise — never a per-row lookup."""
    parent_key = parent_key or key_col
    dictionary = (parent.select(F.col(parent_key).alias(key_col))
                  .filter(F.col(key_col).isNotNull()).distinct()
                  .withColumn("__hit", F.lit(1)))
    joined = _as_event_time(stream, ts_col).join(dictionary, key_col, "left")
    agg = (_windowed(joined, ts_col, window, watermark)
           .agg(
               F.count(F.lit(1)).cast("long").alias("record_ct"),
               F.sum(F.when(F.col(key_col).isNull(), 1).otherwise(0))
               .cast("long").alias("null_key_ct"),
               F.sum(F.when(F.col(key_col).isNotNull()
                            & F.col("__hit").isNull(), 1).otherwise(0))
               .cast("long").alias("orphan_ct")))
    out = agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "record_ct", "null_key_ct", "orphan_ct",
        F.try_divide(F.col("orphan_ct").cast("double"),
                     (F.col("record_ct") - F.col("null_key_ct"))
                     .cast("double")).alias("orphan_pct"))
    return out.withColumn(
        "result_code",
        F.when(F.coalesce(F.col("orphan_pct"), F.lit(0.0))
               <= F.lit(float(max_orphan_pct)), 1).otherwise(0))


def freshness_monitor(
    stream: DataFrame,
    ts_col: str = "ts",
    fingerprint_cols: list[str] | None = None,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Latest event time + content fingerprint per window.

    Fingerprint = MD5 of max-aggregates over the named columns — the shape
    of gen_Table_Freshness.sql's ``MD5({CUSTOM_QUERY})``.
    """
    aggs = [F.max(F.col(ts_col)).alias("latest_ts"),
            F.count(F.lit(1)).cast("long").alias("event_ct")]
    fp_parts = [F.max(F.col(c)).cast("string") for c in (fingerprint_cols or [])]
    if fp_parts:
        aggs.append(F.md5(F.concat_ws("|", *fp_parts)).alias("fingerprint"))
    agg = _windowed(stream, ts_col, window, watermark).agg(*aggs)
    cols = [F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"), "latest_ts", "event_ct"]
    if fp_parts:
        cols.append("fingerprint")
    return agg.select(*cols)


def metric_trend_monitor(
    stream: DataFrame,
    measure: Column | str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    lower_tolerance: float | None = None,
    upper_tolerance: float | None = None,
) -> DataFrame:
    m = F.expr(measure) if isinstance(measure, str) else measure
    agg = _windowed(stream, ts_col, window, watermark).agg(
        m.alias("result_measure"))
    out = agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "result_measure",
    )
    return _with_tolerances(out, "result_measure", lower_tolerance, upper_tolerance)


def stateful_freshness_monitor(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    stale_minutes: float = 24 * 60.0,
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per key, keep the
    latest event time seen across micro-batches in state; each batch emits
    the gap since the previous batch's latest and flags staleness — the
    streaming analogue of Freshness_Trend's gap check
    (`prediction/freshness.py` does the batch-side tolerance math; here the
    state machine IS the update-history tracker).

    Output per (key, batch): (key, prev_ts, last_ts, gap_minutes, stale);
    gap_minutes is NULL on the first observation of a key (training, like
    result_code −1 in the batch path).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (f"{key_col} string, prev_ts timestamp, last_ts timestamp,"
                  " gap_minutes double, stale int")
    state_schema = "last_ts timestamp"

    def track(key, pdfs, state: GroupState):
        mx = None
        for pdf in pdfs:
            if len(pdf):
                m = pd.to_datetime(pdf[ts_col]).max()
                mx = m if mx is None or m > mx else mx
        if mx is None:
            return
        prev = pd.Timestamp(state.get[0]) if state.exists else None
        gap = ((mx - prev).total_seconds() / 60.0) if prev is not None else None
        stale = (1 if gap is not None and gap > stale_minutes else 0)
        state.update((mx.to_pydatetime(),))
        yield pd.DataFrame({
            key_col: [key[0]],
            "prev_ts": [prev],
            "last_ts": [mx],
            "gap_minutes": [gap],
            "stale": [stale],
        })

    return (stream.groupBy(key_col)
            .applyInPandasWithState(track, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    text_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: emit only the first row per dedup key
    seen within the watermark horizon.

    The batch `dedup_exact` shape (md5-of-content groupBy) carried into
    Structured Streaming: state is keyed on the dedup key and expired by the
    watermark (``dropDuplicatesWithinWatermark``), so state size is bounded
    by keys-per-horizon instead of growing with the whole stream — the
    property that makes continuous ingest dedup feasible at 100 TB/day.
    Pass ``key_cols`` for key-based identity or ``text_col`` to dedup on the
    md5 of a content column.
    """
    if (key_cols is None) == (text_col is None):
        raise ValueError("pass exactly one of key_cols / text_col")
    stream = _as_event_time(stream, ts_col)
    content_key = "__tg_content_md5__"
    if text_col is not None:
        stream = stream.withColumn(content_key, F.md5(F.col(text_col)))
        key_cols = [content_key]
    out = (stream.withWatermark(ts_col, watermark)
           .dropDuplicatesWithinWatermark(key_cols))
    return out.drop(content_key) if text_col is not None else out


def _already_folded(spark, marker_dir: str, batch_id: int) -> bool:
    """Replay guard shared by the stateful foreachBatch sinks: batch ids
    are monotonic per query, so one persisted scalar decides whether an
    (at-least-once re-delivered) batch was already folded."""
    from dataops_testgen_spark.io.fs import path_exists

    if not path_exists(spark, marker_dir):
        return False
    last = spark.read.parquet(marker_dir).first()
    return last is not None and batch_id <= last["batch_id"]


def _mark_folded(spark, marker_dir: str, batch_id: int) -> None:
    from dataops_testgen_spark.io.fs import write_small_df

    write_small_df(spark, [(int(batch_id),)], "batch_id long", marker_dir)


def _register_sink(spark, marker_dir: str) -> None:
    """Write a sentinel marker (batch_id=-1, 'stream attached, nothing
    folded yet') BEFORE a sink's first data append. Without it, a crash
    between the FIRST append and its marker write leaves stamped
    ``batch_id>=0`` rows with NO marker dir at all — exactly the state
    ``guard_unresolved_sink_batches`` reads as 'one-shot maintenance
    index, safe to compact', so compaction would fold the unreplayed
    batch into ``batch_id=-1`` and the replay would duplicate it (driver
    ADVICE r7, io/fs.py:96). With the sentinel in place the guard sees
    marker −1 < data max 0 and refuses until the stream recovers. A
    no-op when the marker already exists (any later batch)."""
    from dataops_testgen_spark.io.fs import path_exists

    if not path_exists(spark, marker_dir):
        _mark_folded(spark, marker_dir, -1)


def ann_index_sink(index_dir: str, centroids: list[list[float]], codebook,
                   vec_col: str = "embedding", id_col: str = "vec_id"):
    """foreachBatch sink that maintains the PERSISTED IVFADC vector index
    (similarity.ann_index_append) from a stream — the ANN leg of the
    streaming-incremental story (profiles: ``incremental_profile_sink``;
    the index state is cell-partitioned codes + quantizers, so state size
    is O(rows × m) code bytes, never vectors). Exactly-once: the
    monotone-batch-id marker skips already-folded replays, and the
    append itself is a batch-stamped dynamic partition OVERWRITE
    (ann_index_append batch_id=N), so even a crash BETWEEN append and
    marker — or mid-append — re-delivers a batch that simply overwrites
    its own ``batch_id=N`` partitions instead of duplicating codes.

    Usage::

        q = (stream.writeStream
             .foreachBatch(ann_index_sink(index_dir, centroids, codebook))
             .trigger(availableNow=True).start())
    """
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        from dataops_testgen_spark.pipeline.similarity import (
            ann_index_append)

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        marker_dir = index_dir.rstrip("/") + "__last_batch"
        if _already_folded(spark, marker_dir, batch_id):
            return
        _register_sink(spark, marker_dir)
        ann_index_append(batch_df, index_dir, centroids, codebook,
                         vec_col, id_col, batch_id=batch_id)
        _mark_folded(spark, marker_dir, batch_id)

    return fold


def minhash_index_sink(index_dir: str, k: int = 3, num_hashes: int = 16,
                       bands: int = 4, text_col: str = "text",
                       id_col: str = "doc_id"):
    """foreachBatch sink that maintains the persisted MinHash LSH index
    (dedup.minhash_index_append) from a document stream — each
    micro-batch's band buckets + signatures append without rescanning
    (or retaining) earlier text. Probe results stay CORRECT under
    replays (the probe's pair list is DISTINCT); the shared
    monotone-batch-id guard skips folded replays, and the append is a
    batch-stamped dynamic partition overwrite, so a crash between append
    and marker re-writes the same ``batch_id=N`` partitions
    idempotently — no duplicate rows in any crash window."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        from dataops_testgen_spark.pipeline.dedup import minhash_index_append

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        marker_dir = index_dir.rstrip("/") + "__last_batch"
        if _already_folded(spark, marker_dir, batch_id):
            return
        _register_sink(spark, marker_dir)
        minhash_index_append(batch_df, index_dir, text_col=text_col,
                             id_col=id_col, k=k, num_hashes=num_hashes,
                             bands=bands, batch_id=batch_id)
        _mark_folded(spark, marker_dir, batch_id)

    return fold


def exact_index_sink(index_dir: str, text_col: str = "text",
                     id_col: str = "doc_id"):
    """foreachBatch sink for the persisted EXACT-dedup index
    (dedup.exact_index_append). The append itself is idempotent for
    already-indexed hashes (anti-join against the index), so replays are
    naturally harmless; the batch-id guard still skips them to avoid the
    wasted scan."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        from dataops_testgen_spark.pipeline.dedup import exact_index_append

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        marker_dir = index_dir.rstrip("/") + "__last_batch"
        if _already_folded(spark, marker_dir, batch_id):
            return
        _register_sink(spark, marker_dir)
        exact_index_append(batch_df, index_dir, text_col=text_col,
                           id_col=id_col)
        _mark_folded(spark, marker_dir, batch_id)

    return fold


def lexical_index_sink(index_dir: str, text_col: str = "text",
                       id_col: str = "doc_id", n_buckets: int = 64):
    """foreachBatch sink that maintains the persisted lexical BM25 index
    (retrieval.lexical_index_append) from a document stream — each
    micro-batch's postings/doclen append so searches
    (``bm25_index_topk``) always reflect everything streamed so far. A
    re-delivered batch would double postings (inflating tf/df/n_docs and
    corrupting scores): the shared monotone-batch-id guard skips folded
    replays, and the append is a batch-stamped dynamic partition
    overwrite, so even the crash window between append and marker
    re-writes idempotently — the same exactly-once discipline as the
    profile/ANN sinks."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        from dataops_testgen_spark.pipeline.retrieval import (
            lexical_index_append)

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        marker_dir = index_dir.rstrip("/") + "__last_batch"
        if _already_folded(spark, marker_dir, batch_id):
            return
        _register_sink(spark, marker_dir)
        lexical_index_append(batch_df, index_dir, text_col=text_col,
                             id_col=id_col, n_buckets=n_buckets,
                             batch_id=batch_id)
        _mark_folded(spark, marker_dir, batch_id)

    return fold


def incremental_profile_sink(table_name: str, state_dir: str,
                             run_date=None, sketch_capacity: int = 4096,
                             screen_dir: str | None = None):
    """foreachBatch sink: fold each micro-batch's sketch-kept profile into
    the running table profile persisted at ``state_dir`` — continuous
    incremental profiling for streams (profiling/merge.py semantics driven
    by arriving micro-batches instead of partition predicates).

    The sink state is the merged profile ITSELF: one row per column plus
    bounded sketch blobs, so state is O(columns × sketch_capacity)
    regardless of rows ingested — the streaming twin of
    ``run-profile --incremental``. Metric-completeness matches the batch
    merge: exact-or-NULL distincts/top-k/std metrics, exact day sets,
    HLL fallback past capacity (test_merge_profiles_metric_complete).
    With ``screen_dir`` set, every fold also refreshes the anomaly screen
    over the running profile (same inference cascade as the batch path),
    so the stream continuously maintains current DQ decisions.

    Exactly-once folding: foreachBatch is at-least-once — after a failure
    or restart Structured Streaming MAY re-deliver the last micro-batch
    with the SAME batch_id. Folding a replayed batch twice would silently
    inflate record_ct/value_ct, sums, day sets and every sketch-derived
    metric, so the sink persists the last folded batch_id INSIDE the
    state (``<state_dir>/_last_batch`` — underscore-prefixed, so parquet
    readers of the state dir never see it) and returns early when the
    incoming batch_id is not greater. State + marker commit in ONE
    atomic rename (``io/fs.py commit_state_swap``): the next state is
    fully staged (profile parquet plus marker) before a single
    filesystem rename publishes both, and ``recover_state_swap`` rolls
    any crash window back to a complete previous state — there is no
    instant where the profile and its replay marker disagree, closing
    the re-fold-once window a separate marker write left open. Batch ids
    are monotonically increasing per query, so one scalar suffices (a
    pre-existing external ``<state_dir>__last_batch`` marker from an
    older layout is still honored read-only).

    Usage::

        q = (stream.writeStream
             .foreachBatch(incremental_profile_sink("events", state_dir))
             .trigger(availableNow=True).start())
    """
    def _refresh_screen(spark, profile_df) -> None:
        # continuous DQ: re-run the SAME inference cascade + hygiene
        # screen the batch path uses, over the running merged profile
        # (metric-complete, so decisions match a full rescan — the
        # streaming twin of the incremental_screen flagship)
        from dataops_testgen_spark.anomalies import screen_anomalies
        from dataops_testgen_spark.inference import apply_inference

        screen_anomalies(apply_inference(profile_df)).coalesce(1) \
            .write.mode("overwrite").parquet(screen_dir)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        from dataops_testgen_spark.io.fs import (commit_state_swap,
                                                 path_exists,
                                                 recover_state_swap)
        from dataops_testgen_spark.profiling.merge import merge_profiles
        from dataops_testgen_spark.profiling.profiler import (PROFILE_SCHEMA,
                                                              profile_table)

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        base = state_dir.rstrip("/")
        # roll any half-finished commit back to a complete previous state
        recover_state_swap(spark, base)
        have_state = path_exists(spark, base)
        # replay guard: skip batch ids already folded into the state
        # (marker lives inside the state dir and commits atomically with
        # it; an older layout's external marker is honored read-only)
        if have_state and (
                _already_folded(spark, base + "/_last_batch", batch_id)
                or _already_folded(spark, base + "__last_batch", batch_id)):
            if screen_dir is not None:
                # the crash may have hit after the state commit but before
                # the screen write — the screen is derived state, so just
                # re-derive it from the live profile (idempotent)
                _refresh_screen(spark, spark.read.parquet(base))
            return
        # approx=True: every folded field is count- or sketch-derived, so
        # the exact-distinct/percentile side jobs would be pure waste here
        prof = profile_table(batch_df, table_name, run_date=run_date,
                             keep_sketches=True, secondary=False,
                             approx=True, sketch_capacity=sketch_capacity)
        cols = [f.name for f in PROFILE_SCHEMA.fields]
        if have_state:
            prev = spark.read.parquet(base).select(*cols)
            prof = merge_profiles(prev.unionByName(prof.select(*cols)))
        # the state is metadata-plane (one row per column) — materialize
        # on the driver so the staged write doesn't re-read the live path
        # mid-overwrite. Single-slice parallelize: createDataFrame+
        # coalesce(1) would make one task pay 32 sequential Python-worker
        # evals PER MICRO-BATCH (io/fs.py write_small_df rationale)
        rows = prof.select(*cols).collect()
        merged = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), PROFILE_SCHEMA)
        # stage the COMPLETE next state (profile + replay marker), then
        # publish both with one atomic rename
        staged = base + "__staged"
        merged.write.mode("overwrite").parquet(staged)
        _mark_folded(spark, staged + "/_last_batch", batch_id)
        commit_state_swap(spark, base)
        if screen_dir is not None:
            _refresh_screen(spark, merged)

    return fold


def retention_sink(state_dir: str, user_col: str = "user_id",
                   ts_col: str = "ts", max_horizon: int = 7):
    """foreachBatch sink: the streaming twin of
    ``pipeline/sessions.py retention_cohorts`` (r8 verdict missing #5).
    State is ONE row per user — (uid, cohort_day, mask) where bit k of
    ``mask`` records activity exactly k days after the user's cohort
    day, k <= ``max_horizon`` — so state size is O(users × 1), never
    events, and any horizon <= max_horizon can be rolled up from it at
    read time (``retention_state_result``).

    Late data is handled EXACTLY, including events that predate the
    recorded cohort: a pre-cohort event re-bases the user's cohort day
    and the old mask shifts left by the day difference (offsets are
    relative to the cohort), bits past ``max_horizon`` dropping off —
    so the folded state always equals what the batch rollup would
    compute over all events seen so far
    (test_retention_sink_matches_batch pins stream == batch across
    micro-batches with late and cohort-shifting users).

    Spark shape per fold: one distinct + one uid groupBy over the
    micro-batch (batch-sized), one full-outer join against the persisted
    state on uid (both sides hash-partition on uid), bitmask merges as
    codegen'd integer expressions — no UDFs, no driver materialization
    (state streams straight to the staged dir). Exactly-once: same
    staged-swap discipline as ``incremental_profile_sink`` — the next
    state plus its ``_last_batch`` replay marker are staged completely,
    then published by one atomic rename (``commit_state_swap``), and
    ``recover_state_swap`` rolls any crash window back to a complete
    previous state.

    Usage::

        q = (events.writeStream
             .foreachBatch(retention_sink(state_dir))
             .trigger(availableNow=True).start())
    """
    if max_horizon < 1 or max_horizon > 62:
        raise ValueError("max_horizon must be in 1..62 (bitmask in a long)")
    lim = (1 << (max_horizon + 1)) - 1

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        from dataops_testgen_spark.io.fs import (commit_state_swap,
                                                 path_exists,
                                                 recover_state_swap)

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        base = state_dir.rstrip("/")
        recover_state_swap(spark, base)
        have_state = path_exists(spark, base)
        if have_state and _already_folded(spark, base + "/_last_batch",
                                          batch_id):
            return
        day = F.to_date(F.col(ts_col))
        # NULL actors drop out of the batch rollup through its equi-join
        # (null keys never match); drop them here too so stream == batch
        dd = (batch_df.filter(F.col(user_col).isNotNull())
              .select(F.col(user_col).alias("uid"),
                      day.alias("d")).distinct())
        mins = dd.groupBy("uid").agg(F.min("d").alias("bc"))
        per = (dd.join(mins, "uid")
               .withColumn("off", F.datediff("d", "bc"))
               .groupBy("uid", "bc")
               .agg(F.sum(F.when(F.col("off") <= max_horizon,
                                 F.expr("shiftleft(1L, off)"))
                          .otherwise(F.lit(0)))
                    .cast("long").alias("bm")))
        if have_state:
            st = spark.read.parquet(base).select("uid", "cohort_day",
                                                 "mask")
        else:
            st = spark.createDataFrame(
                [], "uid long, cohort_day date, mask long")
        merged = (st.join(per, "uid", "full")
                  .withColumn("nc", F.least("cohort_day", "bc"))
                  .withColumn("sm", F.when(F.col("mask").isNull(),
                                           F.lit(0))
                              .when(F.datediff("cohort_day", "nc")
                                    > max_horizon, F.lit(0))
                              .otherwise(F.expr(
                                  "shiftleft(mask,"
                                  " datediff(cohort_day, nc))")))
                  .withColumn("b2", F.when(F.col("bm").isNull(), F.lit(0))
                              .when(F.datediff("bc", "nc") > max_horizon,
                                    F.lit(0))
                              .otherwise(F.expr(
                                  "shiftleft(bm, datediff(bc, nc))")))
                  .select("uid", F.col("nc").alias("cohort_day"),
                          F.col("sm").bitwiseOR(F.col("b2"))
                          .bitwiseAND(F.lit(lim)).cast("long")
                          .alias("mask")))
        staged = base + "__staged"
        merged.write.mode("overwrite").parquet(staged)
        _mark_folded(spark, staged + "/_last_batch", batch_id)
        commit_state_swap(spark, base)

    return fold


def retention_state_result(spark, state_dir: str,
                           horizons: tuple = (1, 7)) -> DataFrame:
    """Roll the retention sink's per-user state up to the exact schema
    ``retention_cohorts`` returns — (cohort_day, n_users, retained_d{k},
    rate_d{k} per k): one date-cardinality groupBy; bit k of the mask IS
    'active exactly k days after cohort'."""
    if not horizons or any(h < 1 for h in horizons):
        raise ValueError("horizons must be positive day offsets")
    st = spark.read.parquet(state_dir.rstrip("/"))
    aggs = [F.count(F.lit(1)).alias("n_users")]
    for h in horizons:
        aggs.append(F.sum(F.expr(f"shiftright(mask, {h}) & 1"))
                    .cast("long").alias(f"retained_d{h}"))
    out = st.groupBy("cohort_day").agg(*aggs)
    for h in horizons:
        out = out.withColumn(
            f"rate_d{h}",
            F.round(F.col(f"retained_d{h}")
                    / F.col("n_users").cast("double"), 9))
    return out


def streaming_sessionize(stream_df, gap_minutes: float = 30.0,
                         user_col: str = "user_id", ts_col: str = "ts",
                         value_col: str = "value"):
    """TRUE incremental sessionization as a custom stateful operator
    (``applyInPandasWithState``): per-actor state is the one OPEN session
    (start, last-event, count, value sum); each micro-batch folds its
    events in time order, emitting a session the moment a gap of
    >= ``gap_minutes`` closes it — the same half-open semantics as
    ``pipeline/sessions.py`` and ``session_window``, but with
    hand-managed state (the escape hatch for session logic
    ``session_window`` can't express: value-dependent gaps, per-actor
    caps, session-long derived features).

    Emits CLOSED sessions only: (user_id, start_us, end_us, n_events,
    total_value) with microsecond-long timestamps. The final open
    session per actor stays in state (a production stream would close it
    by event-time timeout; with availableNow triggers the stream simply
    ends first). Requires micro-batches to arrive in per-actor time
    order (true for time-split file feeds and watermarked sources).

    Usage::

        out = streaming_sessionize(spark.readStream...load(...))
        q = out.writeStream.format("memory").queryName("s").start()
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    gap_us = int(gap_minutes * 60_000_000)

    out_type = StructType([
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ])
    state_type = StructType([
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ])

    def fold(key, pdf_iter, state):
        import pandas as pd

        start = last = n = total = None
        if state.exists:
            start, last, n, total = state.get
        closed = []
        # materialize the WHOLE group before folding: one actor's
        # micro-batch may span multiple Arrow chunks delivered in
        # arbitrary relative order — sorting each chunk independently
        # could move `last` backward and split/merge sessions wrongly
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
            for ts, val in zip(pdf[ts_col], pdf[value_col]):
                us = int(pd.Timestamp(ts).value // 1_000)
                if start is None:
                    start, last, n, total = us, us, 1, float(val)
                elif us - last >= gap_us:
                    closed.append((key[0], start, last, n, total))
                    start, last, n, total = us, us, 1, float(val)
                else:
                    last, n, total = us, n + 1, total + float(val)
        if start is not None:
            state.update((start, last, n, total))
        if closed:
            yield pd.DataFrame(closed, columns=["user_id", "start_us",
                                                "end_us", "n_events",
                                                "total_value"])

    return (stream_df.groupBy(user_col)
            .applyInPandasWithState(fold, out_type, state_type, "append",
                                    GroupStateTimeout.NoTimeout))


def streaming_funnel(stream_df, steps: list[str],
                     user_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type",
                     within_minutes: float | None = None):
    """Streaming twin of ``pipeline/sessions.py funnel`` as a custom
    stateful operator (``applyInPandasWithState``): per-actor state is
    the k first-completion times so far (one long per step — bounded,
    never the event log), and each micro-batch extends the chain with
    the same strictly-after / within-window semantics as the batch
    funnel. Because a funnel chain only ever EXTENDS (the first step-i
    completion after us_{i-1} can never move once set), the fold is
    exact under the same contract ``streaming_sessionize`` documents:
    micro-batches arrive in per-actor event-time order (true for
    time-split file feeds and watermarked sources); within a batch,
    arbitrary Arrow-chunk order is fine (the whole group materializes
    and sorts before folding).

    Emits, per micro-batch, one row for each actor whose chain ADVANCED
    this batch — (user_id, ts_step_1..k, steps_completed) — so the
    latest row per actor always equals the batch funnel over all events
    so far (test_streaming_funnel_matches_batch). Actors that never
    complete step 1 emit nothing, matching the batch output's row set.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)

    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    k = len(steps)
    limit_us = (int(within_minutes * 60_000_000)
                if within_minutes is not None else None)

    out_type = StructType(
        [StructField("user_id", LongType())]
        + [StructField(f"us_step_{i}", LongType()) for i in range(1, k + 1)]
        + [StructField("steps_completed", IntegerType())])
    state_type = StructType(
        [StructField(f"us_{i}", LongType()) for i in range(1, k + 1)])

    def fold(key, pdf_iter, state):
        firsts = list(state.get) if state.exists else [None] * k
        before = list(firsts)
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
            for ts, et in zip(pdf[ts_col], pdf[type_col]):
                i = next((j for j in range(k) if firsts[j] is None), None)
                if i is None:
                    break                      # chain already complete
                if et != steps[i]:
                    continue
                us = int(pd.Timestamp(ts).value // 1_000)
                if i > 0 and us <= firsts[i - 1]:
                    continue                   # strictly-after, tie-safe
                if (limit_us is not None and i > 0
                        and us > firsts[0] + limit_us):
                    continue
                firsts[i] = us
        if firsts != before and firsts[0] is not None:
            state.update(tuple(firsts))
            done = sum(1 for v in firsts if v is not None)
            yield pd.DataFrame(
                [(key[0], *firsts, done)],
                columns=(["user_id"]
                         + [f"us_step_{i}" for i in range(1, k + 1)]
                         + ["steps_completed"]))

    return (stream_df.groupBy(user_col)
            .applyInPandasWithState(fold, out_type, state_type, "append",
                                    GroupStateTimeout.NoTimeout))


def quality_gate_sink(out_dir: str, model_dir: str, min_p: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id"):
    """foreachBatch sink applying a PERSISTED LR quality model
    (``corpus-quality-train``'s layout: ``weights`` + featurization
    ``meta``) to a document stream — the distilled gate run online: each
    micro-batch featurizes with the model's OWN buckets/salt (a
    mismatch would silently hash grams to the wrong features, which is
    why the sink refuses flags and reads meta), scores through the
    broadcast weight relation, and stamped-appends the keepers
    (id, margin, p) under ``batch_id=N``. The dynamic partition
    overwrite makes crash-window re-deliveries rewrite the SAME
    partition instead of duplicating keepers — the exactly-once
    discipline every sink in this family shares. Model weights live in
    a driver-side dict (bucket-bounded) broadcast per batch via
    lr_score's weight join, and RELOAD when the model commit marker
    changes: each batch stats ``weights/_SUCCESS`` (one metadata op, no
    data I/O) and re-reads weights+meta when its (mtime, len) moves —
    so ``corpus-quality-train`` re-run against the same ``model_dir``
    retargets a LONG-RUNNING stream on its next micro-batch, no
    restart. A retrain caught mid-overwrite (no ``_SUCCESS`` yet)
    keeps the current model — the marker is written last, so the sink
    only ever loads a fully-committed model."""
    import posixpath

    state: dict = {}

    def _model_marker(spark):
        """(mtime, len) of weights/_SUCCESS, or None mid-overwrite."""
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(
            posixpath.join(model_dir, "weights", "_SUCCESS"))
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(p):
            return None
        st = fs.getFileStatus(p)
        return (st.getModificationTime(), st.getLen())

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        from dataops_testgen_spark.io.fs import stamped_append
        from dataops_testgen_spark.pipeline.classify import (
            lr_hash_features, lr_score)

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        marker_dir = out_dir.rstrip("/") + "__last_batch"
        if _already_folded(spark, marker_dir, batch_id):
            return
        _register_sink(spark, marker_dir)
        marker = _model_marker(spark)
        if "w" not in state or (marker is not None
                                and marker != state.get("marker")):
            state["w"] = {
                int(r["f"]): float(r["w"])
                for r in spark.read.parquet(
                    posixpath.join(model_dir, "weights")).collect()}
            meta = spark.read.parquet(
                posixpath.join(model_dir, "meta")).first()
            state["buckets"] = int(meta["buckets"])
            state["salt"] = meta["salt"]
            state["marker"] = marker
        docs = batch_df.filter(F.col(text_col).isNotNull()
                               & (F.trim(text_col) != ""))
        feats = lr_hash_features(docs, text_col=text_col, id_col=id_col,
                                 n_buckets=state["buckets"],
                                 salt=state["salt"])
        kept = lr_score(feats, state["w"]).filter(F.col("p") >= min_p)
        stamped_append(kept, posixpath.join(out_dir, "kept"),
                       batch_id=batch_id)
        _mark_folded(spark, marker_dir, batch_id)

    return fold
