"""Structured Streaming monitor tests: file source over the events fixture,
availableNow trigger, memory sink — verifies windowed results match the
equivalent batch aggregation."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dataops_testgen_spark.io.loaders import load_table
from dataops_testgen_spark.streaming import freshness_monitor, volume_monitor


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    """Re-write events with proper timestamps so readStream can infer schema."""
    tmp = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(tmp)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _run_stream(spark, df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


def test_volume_monitor_matches_batch(spark, events_dir):
    batch_df = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    out = _run_stream(
        spark, volume_monitor(stream, ts_col="ts", window="1 day",
                              watermark="0 seconds"), "vol_mon")
    got = {(r["window_start"], r["record_ct"]) for r in out.collect()}
    max_ts = batch_df.agg(F.max("ts")).collect()[0][0]
    expected = {
        (r["w"]["start"], r["ct"])
        for r in batch_df.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("ct")).collect()
        # append mode emits only windows closed below the final watermark —
        # the window containing max event time stays open
        if r["w"]["end"] <= max_ts
    }
    assert got == expected and got


def test_volume_monitor_tolerances(spark, events_dir):
    batch_df = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    out = _run_stream(
        spark, volume_monitor(stream, ts_col="ts", window="1 day",
                              watermark="0 seconds",
                              lower_tolerance=1, upper_tolerance=10**9),
        "vol_mon_tol")
    rows = out.collect()
    assert rows and all(r["result_code"] == 1 for r in rows)


def test_freshness_monitor_fingerprint(spark, events_dir):
    batch_df = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    out = _run_stream(
        spark, freshness_monitor(stream, ts_col="ts",
                                 fingerprint_cols=["event_type", "user_id"],
                                 window="1 day", watermark="0 seconds"),
        "fresh_mon")
    rows = out.collect()
    assert rows
    assert all(r["fingerprint"] is not None and r["latest_ts"] is not None
               for r in rows)
    # fingerprint matches batch MD5 of max-aggregates for the same window
    max_ts = batch_df.agg(F.max("ts")).collect()[0][0]
    b = (batch_df.groupBy(F.window("ts", "1 day").alias("w"))
         .agg(F.md5(F.concat_ws("|", F.max("event_type").cast("string"),
                                F.max("user_id").cast("string"))).alias("fp"),
              F.max("ts").alias("latest")))
    expected = {(r["w"]["start"], r["fp"]) for r in b.collect()
                if r["w"]["end"] <= max_ts}
    got = {(r["window_start"], r["fingerprint"]) for r in rows}
    assert got == expected


def test_stateful_freshness_monitor(spark, tmp_path):
    """applyInPandasWithState tracks the last event time per key ACROSS
    micro-batches: batch 1 trains (gap NULL), batch 2 reports the gap from
    batch 1's latest and flags staleness."""
    import time

    from dataops_testgen_spark.streaming import stateful_freshness_monitor

    d = str(tmp_path / "stream_src")
    early = spark.createDataFrame(
        [("load", "2026-01-01 00:00:00"), ("load", "2026-01-01 06:00:00")],
        "event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    late = spark.createDataFrame(
        [("load", "2026-01-03 06:00:00")],
        "event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    early.coalesce(1).write.mode("overwrite").parquet(d)
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    late.coalesce(1).write.mode("append").parquet(d)

    stream = (spark.readStream.schema(early.schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    out = stateful_freshness_monitor(stream, ts_col="ts",
                                     key_col="event_type",
                                     stale_minutes=24 * 60.0)
    q = (out.writeStream.format("memory").queryName("stateful_fresh")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = sorted(spark.table("stateful_fresh").collect(),
                  key=lambda r: r["last_ts"])
    assert len(rows) == 2
    first, second = rows
    assert first["gap_minutes"] is None and first["stale"] == 0
    # 2026-01-01 06:00 -> 2026-01-03 06:00 = 2880 minutes > 1440
    assert second["gap_minutes"] == 2880.0 and second["stale"] == 1


def test_streaming_exact_dedup(spark):
    """Duplicate content across two appended files: only the first instance
    per md5 survives within the watermark horizon."""
    import datetime as dt
    import os
    import tempfile

    from dataops_testgen_spark.streaming.monitors import streaming_exact_dedup

    d = tempfile.mkdtemp(prefix="dedup_stream_")
    t0 = dt.datetime(2026, 1, 1, 12, 0)
    batch1 = spark.createDataFrame(
        [(1, t0, "hello world"), (2, t0, "unique one")],
        "doc_id: long, ts: timestamp, text: string")
    batch2 = spark.createDataFrame(
        [(3, t0 + dt.timedelta(minutes=5), "hello world"),   # dup of 1
         (4, t0 + dt.timedelta(minutes=6), "unique two")],
        "doc_id: long, ts: timestamp, text: string")
    batch1.coalesce(1).write.mode("overwrite").parquet(d)
    batch2.coalesce(1).write.mode("append").parquet(d)

    stream = (spark.readStream.schema(batch1.schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    out = streaming_exact_dedup(stream, ts_col="ts", text_col="text",
                                watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.table("dedup_stream").collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["hello world", "unique one", "unique two"]
    assert {r["doc_id"] for r in rows} <= {1, 2, 3, 4} and len(rows) == 3
    # schema untouched: helper key column does not leak
    assert "__tg_content_md5__" not in spark.table("dedup_stream").columns
    import shutil
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_document_filters_match_batch(spark):
    """The document quality filters (Gopher flags + C4 cleaning + PII
    scrub) are pure narrow projections, so they compose with Structured
    Streaming unchanged: an availableNow pass over a parquet stream must
    produce exactly the batch results."""
    import os
    import shutil
    import tempfile

    from dataops_testgen_spark.pipeline.text import (
        c4_filter, gopher_filter, pii_scrub)

    d = tempfile.mkdtemp(prefix="filter_stream_")
    clean = " ".join(["the quick brown fox and that dog have fun with it"]
                     * 6)
    rows = [
        (1, clean + "\nthis appended line keeps five words today."),
        (2, "too short"),
        (3, clean + " mail me: a@b.com or 555-123-4567"),
    ]
    batch = spark.createDataFrame(rows, "doc_id: long, text: string")
    batch.coalesce(1).write.mode("overwrite").parquet(d)

    def run_stream(fn, name):
        stream = spark.readStream.schema(batch.schema).parquet(d)
        q = (fn(stream).writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {tuple(r) for r in spark.table(name).collect()}

    for fn, name in ((gopher_filter, "s_gopher"), (c4_filter, "s_c4"),
                     (pii_scrub, "s_pii")):
        got = run_stream(fn, name)
        want = {tuple(r) for r in fn(batch).collect()}
        assert got == want, name
    shutil.rmtree(d, ignore_errors=True)


def test_incremental_profile_sink_matches_batch(spark, tmp_path):
    """Streaming incremental profiling: an availableNow pass over two
    parquet files (one micro-batch each) folds per-batch sketch profiles
    into a running state whose final metrics equal the one-shot batch
    profile of all the data — the streaming twin of
    run-profile --incremental."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dataops_testgen_spark.profiling.profiler import profile_table
    from dataops_testgen_spark.streaming.monitors import (
        incremental_profile_sink)

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    d = str(tmp_path / "stream_src")
    src.filter(F.col("o_orderkey") % 2 == 0).coalesce(1) \
       .write.mode("overwrite").parquet(d)
    src.filter(F.col("o_orderkey") % 2 == 1).coalesce(1) \
       .write.mode("append").parquet(d)

    state = str(tmp_path / "profile_state")
    screen = str(tmp_path / "screen_state")
    rd = dt.date(2026, 1, 1)
    stream = (spark.readStream.schema(src.schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    q = (stream.writeStream
         .foreachBatch(incremental_profile_sink("orders", state, run_date=rd,
                                                screen_dir=screen))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    merged = {r["column_name"]: r
              for r in spark.read.parquet(state).collect()}
    full = {r["column_name"]: r
            for r in profile_table(src, "orders", run_date=rd,
                                   secondary=False).collect()}
    assert set(merged) == set(full)
    for c, f in full.items():
        m = merged[c]
        for name in ("record_ct", "value_ct", "distinct_value_ct",
                     "null_value_ct", "date_days_present",
                     "date_weeks_present", "std_pattern_match",
                     "distinct_std_value_ct", "min_value", "max_value"):
            assert m[name] == f[name], (c, name, m[name], f[name])
        for name in ("avg_value", "stdev_value", "percentile_50"):
            a, b = m[name], f[name]
            if b is None:
                assert a is None, (c, name)
            else:
                assert abs(a - b) < 1e-9 + 1e-9 * abs(b), (c, name, a, b)

    # continuous DQ: the stream-maintained screen equals the batch path's
    # screen over the one-shot full profile
    from dataops_testgen_spark.anomalies import screen_anomalies
    from dataops_testgen_spark.inference import apply_inference

    got = {tuple(r) for r in spark.read.parquet(screen)
           .select("table_name", "column_name", "anomaly_type").collect()}
    want_df = screen_anomalies(apply_inference(
        profile_table(src, "orders", run_date=rd, secondary=False)))
    want = {tuple(r) for r in
            want_df.select("table_name", "column_name",
                           "anomaly_type").collect()}
    assert got == want

    # sketch-carried secondary metrics survive the multi-batch fold too:
    # top-freq/pattern counters and value hashes folded across micro-
    # batches equal the one-shot secondary profile (the last untested
    # corner of the metric-complete merge under streaming)
    sec = {r["column_name"]: r
           for r in profile_table(src, "orders", run_date=rd,
                                  secondary=True).collect()}
    for c, m in merged.items():
        s = sec[c]
        for name in ("top_freq_values", "distinct_value_hash",
                     "top_patterns", "distinct_pattern_ct"):
            assert m[name] == s[name], (c, name, m[name], s[name])


def test_incremental_profile_sink_replayed_batch_is_skipped(spark, tmp_path):
    """foreachBatch is at-least-once: after a failure Structured Streaming
    may re-deliver the last micro-batch with the SAME batch_id. The sink
    must treat a batch_id it has already folded as a no-op — otherwise the
    replay silently doubles record_ct, sums, day sets and every
    sketch-derived metric (r5 ADVICE)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dataops_testgen_spark.streaming.monitors import (
        incremental_profile_sink)

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    state = str(tmp_path / "profile_state")
    fold = incremental_profile_sink("orders", state,
                                    run_date=dt.date(2026, 1, 1))
    even = src.filter(F.col("o_orderkey") % 2 == 0)
    odd = src.filter(F.col("o_orderkey") % 2 == 1)
    fold(even, 0)
    fold(odd, 1)

    def snap():
        return sorted(
            (r["column_name"], r["record_ct"], r["value_ct"],
             r["null_value_ct"], r["distinct_value_ct"])
            for r in spark.read.parquet(state).collect())

    before = snap()
    assert before and before[0][1] == 1500   # both halves folded once
    fold(odd, 1)    # replay of the last batch — must not re-fold
    assert snap() == before
    fold(even, 0)   # stale batch id — must not re-fold either
    assert snap() == before
    fold(odd.limit(100), 2)   # a genuinely new batch still folds
    assert snap() != before


def test_incremental_profile_sink_crash_atomicity(spark, tmp_path):
    """State + replay marker commit in ONE rename: every crash window of
    the staged-swap protocol recovers to a state indistinguishable from
    a crash-free run, whether the interrupted batch was or wasn't
    committed (foreachBatch re-delivers it either way)."""
    import datetime as dt
    import os
    import pathlib

    from pyspark.sql import functions as F

    from dataops_testgen_spark.streaming.monitors import (
        incremental_profile_sink)

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    b0 = src.filter(F.col("o_orderkey") % 2 == 0)
    b1 = src.filter(F.col("o_orderkey") % 2 == 1)
    b2 = src.filter(F.col("o_orderkey") % 10 == 3)
    rd = dt.date(2026, 1, 1)

    def snap(state):
        return sorted(
            (r["column_name"], r["record_ct"], r["value_ct"],
             r["null_value_ct"], r["distinct_value_ct"])
            for r in spark.read.parquet(state).collect())

    # crash-free control
    control = str(tmp_path / "control")
    fold_c = incremental_profile_sink("orders", control, run_date=rd)
    fold_c(b0, 0), fold_c(b1, 1), fold_c(b2, 2)
    want = snap(control)

    # window (a): crash after staging, before the commit renames — a torn
    # staged dir is lying around when the batch is re-delivered
    sa = str(tmp_path / "state_a")
    fold_a = incremental_profile_sink("orders", sa, run_date=rd)
    fold_a(b0, 0), fold_a(b1, 1)
    os.makedirs(sa + "__staged")
    pathlib.Path(sa + "__staged", "part-torn.parquet").write_bytes(b"junk")
    fold_a(b2, 2)
    assert snap(sa) == want
    assert not os.path.exists(sa + "__staged")
    assert not os.path.exists(sa + "__pre_commit")

    # window (b): crash BETWEEN the two renames — live is gone, the
    # previous state sits at __pre_commit, a staged next state exists.
    # Recovery must roll back and re-fold the re-delivered batch once.
    sb = str(tmp_path / "state_b")
    fold_b = incremental_profile_sink("orders", sb, run_date=rd)
    fold_b(b0, 0), fold_b(b1, 1)
    os.rename(sb, sb + "__pre_commit")
    os.makedirs(sb + "__staged")
    pathlib.Path(sb + "__staged", "part-next.parquet").write_bytes(b"junk")
    fold_b(b2, 2)
    assert snap(sb) == want

    # window (c): crash after the commit rename, before backup cleanup —
    # the new state (marker included) is live; the replayed batch must
    # SKIP, and the stale backup must be cleared
    sc = str(tmp_path / "state_c")
    fold_sc = incremental_profile_sink("orders", sc, run_date=rd)
    fold_sc(b0, 0), fold_sc(b1, 1), fold_sc(b2, 2)
    os.makedirs(sc + "__pre_commit")
    pathlib.Path(sc + "__pre_commit", "part-old.parquet").write_bytes(b"junk")
    fold_sc(b2, 2)
    assert snap(sc) == want
    assert not os.path.exists(sc + "__pre_commit")


def test_streaming_ann_index_maintenance(spark, tmp_path):
    """A stream maintains the persisted IVFADC index: availableNow over
    two parquet files (one micro-batch each) appends codes per batch via
    ann_index_sink; probing afterwards equals a one-shot index of all the
    data, and a replayed batch_id is a no-op (no duplicate codes)."""
    from pyspark.sql import functions as F

    from dataops_testgen_spark.pipeline import similarity
    from dataops_testgen_spark.streaming.monitors import ann_index_sink

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.filter("vec_id < 16").orderBy("vec_id").collect()
    codebook = [[list(map(float, r["embedding"]))[s * 16:(s + 1) * 16]
                 for r in rows] for s in range(4)]
    cents = [list(map(float, r["embedding"])) for r in rows[:8]]

    src = str(tmp_path / "stream_src")
    emb.filter(F.col("vec_id") % 2 == 0).coalesce(1) \
       .write.mode("overwrite").parquet(src)
    emb.filter(F.col("vec_id") % 2 == 1).coalesce(1) \
       .write.mode("append").parquet(src)
    idx = str(tmp_path / "ann_idx")
    q = (spark.readStream.schema(emb.schema)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(ann_index_sink(idx, cents, codebook))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    queries = emb.filter("vec_id < 10")
    probed = similarity.ann_index_probe(queries, idx, k=5, nprobe=2)
    oneshot = similarity.ivfadc_probe(
        similarity.pq_index(emb, cents, codebook), queries, cents,
        codebook, k=5, nprobe=2)

    def canon(df):
        return sorted((r["query_id"], r["neighbor_id"],
                       round(r["est_cosine"], 9), r["rank"])
                      for r in df.collect())
    assert canon(probed) == canon(oneshot) and canon(probed)

    # replayed batch id -> no duplicate codes appended
    n_before = spark.read.parquet(idx + "/codes").count()
    ann_index_sink(idx, cents, codebook)(emb.limit(50), 1)
    assert spark.read.parquet(idx + "/codes").count() == n_before


def test_streaming_dedup_index_maintenance(spark, tmp_path):
    """Streams maintain the persisted dedup indexes too: minhash bands +
    signatures and exact content hashes append per micro-batch; after
    availableNow drains, a probe of a new increment against the
    stream-built history equals one built by direct appends."""
    from pyspark.sql import functions as F

    from dataops_testgen_spark.pipeline import dedup
    from dataops_testgen_spark.streaming.monitors import (exact_index_sink,
                                                          minhash_index_sink)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    src = str(tmp_path / "docs_src")
    hist.filter(F.col("doc_id") % 4 == 0).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    hist.filter(F.col("doc_id") % 4 == 2).coalesce(1) \
        .write.mode("append").parquet(src)

    mh_idx = str(tmp_path / "mh_idx")
    ex_idx = str(tmp_path / "ex_idx")
    for sink in (minhash_index_sink(mh_idx), exact_index_sink(ex_idx)):
        q = (spark.readStream.schema(docs.schema)
             .option("maxFilesPerTrigger", 1).parquet(src)
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation",
                     str(tmp_path / f"ckpt_{id(sink)}"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    probe = docs.filter(F.col("doc_id") % 2 == 1)
    got_mh = {tuple(r) for r in
              dedup.minhash_index_probe(probe, mh_idx)
              .select("id_a", "id_b").collect()}
    want_dir = str(tmp_path / "mh_direct")
    dedup.minhash_index_append(hist, want_dir)
    want_mh = {tuple(r) for r in
               dedup.minhash_index_probe(probe, want_dir)
               .select("id_a", "id_b").collect()}
    assert got_mh == want_mh and got_mh

    got_ex = {(r["id"], r["keep"]) for r in
              dedup.exact_index_probe(probe, ex_idx).collect()}
    want_ex_dir = str(tmp_path / "ex_direct")
    dedup.exact_index_append(hist, want_ex_dir)
    want_ex = {(r["id"], r["keep"]) for r in
               dedup.exact_index_probe(probe, want_ex_dir).collect()}
    assert got_ex == want_ex and got_ex

    # replayed batch ids are no-ops (no index bloat)
    n_bands = spark.read.parquet(mh_idx + "/bands").count()
    minhash_index_sink(mh_idx)(hist.limit(20), 1)
    assert spark.read.parquet(mh_idx + "/bands").count() == n_bands


def test_streaming_lexical_index_maintenance(spark, tmp_path):
    """The lexical BM25 index is stream-maintained too: after an
    availableNow drain over two micro-batch files, a search of the
    stream-built index equals the one-shot bm25_topk over the streamed
    corpus bit-for-bit; a replayed batch id appends nothing."""
    from pyspark.sql import functions as F

    from dataops_testgen_spark.pipeline import retrieval
    from dataops_testgen_spark.streaming.monitors import lexical_index_sink

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    src = str(tmp_path / "lex_src")
    hist.filter(F.col("doc_id") % 4 == 0).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    hist.filter(F.col("doc_id") % 4 == 2).coalesce(1) \
        .write.mode("append").parquet(src)

    idx = str(tmp_path / "lex_idx")
    q = (spark.readStream.schema(docs.schema)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(lexical_index_sink(idx))
         .option("checkpointLocation", str(tmp_path / "lex_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    qs = spark.createDataFrame([(1, "spark shuffle window")],
                               "query_id long, query_text string")
    got = sorted(map(tuple,
                     retrieval.bm25_index_topk(spark, qs, idx, k=10)
                     .collect()))
    want = sorted(map(tuple, retrieval.bm25_topk(hist, qs, k=10).collect()))
    assert got == want and got

    # replayed batch id: postings unchanged
    n = spark.read.parquet(idx + "/postings").count()
    lexical_index_sink(idx)(hist.limit(10), 0)
    assert spark.read.parquet(idx + "/postings").count() == n


def _relation_snapshot(spark, path):
    df = spark.read.parquet(path)
    return sorted(
        tuple(x if not isinstance(x, list) else tuple(x) for x in r)
        for r in df.select(*sorted(df.columns)).collect())


def test_minhash_index_sink_crash_window_idempotent(spark, tmp_path):
    """The at-least-once crash windows of the minhash index sink: a crash
    BETWEEN index append and replay-marker write (and even mid-append,
    leaving a PARTIAL batch) must converge on re-delivery — the stamped
    dynamic-partition-overwrite append rewrites exactly its own
    ``batch_id=N`` partitions, so the final index is byte-for-byte the
    crash-free run's."""
    from pyspark.sql import functions as F

    from dataops_testgen_spark.pipeline.dedup import minhash_index_append
    from dataops_testgen_spark.streaming.monitors import minhash_index_sink

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)

    control = str(tmp_path / "control")
    minhash_index_sink(control)(b0, 0)
    minhash_index_sink(control)(b1, 1)
    want = {rel: _relation_snapshot(spark, f"{control}/{rel}")
            for rel in ("signatures", "bands")}

    # crash after a FULL append of batch 1 but before the marker write;
    # the batch is re-delivered with the same id
    crashed = str(tmp_path / "crashed")
    minhash_index_sink(crashed)(b0, 0)
    minhash_index_append(b1, crashed, batch_id=1)   # no marker written
    minhash_index_sink(crashed)(b1, 1)              # re-delivery
    for rel in ("signatures", "bands"):
        assert _relation_snapshot(spark, f"{crashed}/{rel}") == want[rel]

    # crash MID-append: only part of batch 1's rows hit the index
    torn = str(tmp_path / "torn")
    minhash_index_sink(torn)(b0, 0)
    minhash_index_append(b1.filter(F.col("doc_id") % 3 == 0), torn,
                         batch_id=1)
    minhash_index_sink(torn)(b1, 1)
    for rel in ("signatures", "bands"):
        assert _relation_snapshot(spark, f"{torn}/{rel}") == want[rel]


def test_ann_index_sink_crash_window_idempotent(spark, tmp_path):
    """Same crash-window discipline for the ANN (IVFADC) index sink: a
    re-delivered batch overwrites its own ``ivf_cell=*/batch_id=N``
    partitions, whether the interrupted append was full or partial."""
    from pyspark.sql import functions as F

    from dataops_testgen_spark.pipeline.similarity import ann_index_append
    from dataops_testgen_spark.streaming.monitors import ann_index_sink

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.filter("vec_id < 16").orderBy("vec_id").collect()
    codebook = [[list(map(float, r["embedding"]))[s * 16:(s + 1) * 16]
                 for r in rows] for s in range(4)]
    cents = [list(map(float, r["embedding"])) for r in rows[:8]]
    b0 = emb.filter(F.col("vec_id") % 2 == 0)
    b1 = emb.filter(F.col("vec_id") % 2 == 1)

    control = str(tmp_path / "control")
    ann_index_sink(control, cents, codebook)(b0, 0)
    ann_index_sink(control, cents, codebook)(b1, 1)
    want = _relation_snapshot(spark, control + "/codes")

    crashed = str(tmp_path / "crashed")
    ann_index_sink(crashed, cents, codebook)(b0, 0)
    ann_index_append(b1, crashed, cents, codebook, batch_id=1)
    ann_index_sink(crashed, cents, codebook)(b1, 1)
    assert _relation_snapshot(spark, crashed + "/codes") == want

    torn = str(tmp_path / "torn")
    ann_index_sink(torn, cents, codebook)(b0, 0)
    ann_index_append(b1.filter(F.col("vec_id") % 3 == 0), torn,
                     cents, codebook, batch_id=1)
    ann_index_sink(torn, cents, codebook)(b1, 1)
    assert _relation_snapshot(spark, torn + "/codes") == want


def test_lexical_index_sink_crash_window_idempotent(spark, tmp_path):
    """Same discipline for the lexical BM25 sink — the one where a
    double-append is most corrosive (duplicated postings inflate
    tf/df/n_docs and silently corrupt every score)."""
    from pyspark.sql import functions as F

    from dataops_testgen_spark.pipeline.retrieval import (
        bm25_index_topk, lexical_index_append)
    from dataops_testgen_spark.streaming.monitors import lexical_index_sink

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)

    control = str(tmp_path / "control")
    lexical_index_sink(control)(b0, 0)
    lexical_index_sink(control)(b1, 1)
    want = {rel: _relation_snapshot(spark, f"{control}/{rel}")
            for rel in ("postings", "doclen")}

    crashed = str(tmp_path / "crashed")
    lexical_index_sink(crashed)(b0, 0)
    lexical_index_append(b1, crashed, batch_id=1)
    lexical_index_sink(crashed)(b1, 1)
    for rel in ("postings", "doclen"):
        assert _relation_snapshot(spark, f"{crashed}/{rel}") == want[rel]

    torn = str(tmp_path / "torn")
    lexical_index_sink(torn)(b0, 0)
    lexical_index_append(b1.filter(F.col("doc_id") % 3 == 0), torn,
                         batch_id=1)
    lexical_index_sink(torn)(b1, 1)
    for rel in ("postings", "doclen"):
        assert _relation_snapshot(spark, f"{torn}/{rel}") == want[rel]
    # and the scores over the recovered index match the crash-free run
    qs = spark.createDataFrame([(1, "spark shuffle window")],
                               "query_id long, query_text string")
    got = sorted(map(tuple,
                     bm25_index_topk(spark, qs, torn, k=10).collect()))
    ctl = sorted(map(tuple,
                     bm25_index_topk(spark, qs, control, k=10).collect()))
    assert got == ctl and got


def test_streaming_sessionize_multichunk_group(spark, tmp_path):
    """One actor's micro-batch spanning MULTIPLE Arrow chunks delivered
    in arbitrary (here: reverse-time) order must still fold sessions
    correctly: the fold materializes and sorts the WHOLE group before
    folding (r6 ADVICE — per-chunk sorts let state move backward in
    time and split/merge sessions wrongly). Forced by writing the
    events newest-first and shrinking arrow.maxRecordsPerBatch to 2."""
    import datetime as dt

    from dataops_testgen_spark.pipeline.sessions import session_stats
    from dataops_testgen_spark.streaming.monitors import (
        streaming_sessionize)

    base = dt.datetime(2024, 1, 1)
    # user 1: three sessions (gaps at >=30 min), 12 events total
    rows = []
    minute = 0
    for burst, n in enumerate((5, 4, 3)):
        for k in range(n):
            rows.append((len(rows), 1, base + dt.timedelta(
                minutes=minute), float(burst * 10 + k)))
            minute += 5
        minute += 40                       # close the session
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    src = str(tmp_path / "rev_src")
    # newest-first file order -> reverse-time Arrow chunks
    events.orderBy(F.col("ts").desc()).coalesce(1) \
        .write.mode("overwrite").parquet(src)

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        out = streaming_sessionize(
            spark.readStream.schema(events.schema).parquet(src))
        q = (out.writeStream.format("memory").queryName("sess_chunks")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt_chunks"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       prev)
    got = {(r["user_id"], r["start_us"], r["end_us"], r["n_events"]):
           r["total_value"]
           for r in spark.sql("select * from sess_chunks").collect()}
    # expected: the batch sessionizer's CLOSED sessions (all but the last)
    full = sorted(session_stats(events).collect(),
                  key=lambda r: r["session_idx"])
    want = {}
    for r in full[:-1]:
        key = (r["user_id"],
               int(r["start_ts"].timestamp() * 1_000_000),
               int(r["end_ts"].timestamp() * 1_000_000),
               r["n_events"])
        want[key] = r["total_value"]
    assert got == want and len(got) == 2


def test_compaction_refuses_unresolved_crash_window(spark, tmp_path):
    """Compacting an index whose sink crashed between append and marker
    would fold the unmarked batch into batch_id=-1 and the replay would
    re-add it — the guard refuses until the stream recovers, then
    compaction proceeds and the index equals the crash-free state."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from dataops_testgen_spark.pipeline.dedup import (
        minhash_index_append, minhash_index_compact)
    from dataops_testgen_spark.streaming.monitors import minhash_index_sink

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "guard_idx")
    minhash_index_sink(idx)(b0, 0)
    minhash_index_append(b1, idx, batch_id=1)      # crash before marker
    with _pt.raises(RuntimeError, match="not.*been replayed|replay"):
        minhash_index_compact(spark, idx)
    minhash_index_sink(idx)(b1, 1)                 # recovery replay
    minhash_index_compact(spark, idx)              # now fine
    control = str(tmp_path / "ctl_idx")
    minhash_index_sink(control)(b0, 0)
    minhash_index_sink(control)(b1, 1)
    got = _relation_snapshot(spark, idx + "/signatures")
    want = {tuple(x for x in r) for r in
            spark.read.parquet(control + "/signatures")
            .drop("batch_id").collect()}
    got_nb = {tuple(r) for r in
              spark.read.parquet(idx + "/signatures")
              .drop("batch_id").collect()}
    assert got_nb == want and got


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """Streaming funnel == batch funnel over the union of time-split
    micro-batches: chains that advance across batches, a step-2 event
    before any step-1 (ignored), same-timestamp ties (strictly-after),
    a never-converting user (no rows), and the within-window variant.
    The latest emitted row per user is the batch row."""
    import datetime as dt

    from dataops_testgen_spark.pipeline.sessions import funnel
    from dataops_testgen_spark.streaming.monitors import streaming_funnel

    base = dt.datetime(2024, 5, 1)

    def ev(uid, minutes, etype):
        return (uid, base + dt.timedelta(minutes=minutes), etype)

    rows = [
        # u1 completes across the batch split (view+click early, buy late)
        ev(1, 0, "view"), ev(1, 5, "click"), ev(1, 95, "buy"),
        # u2: click BEFORE any view is ignored; then view->click; the
        # tied-timestamp buy (== click time) must NOT count (strictly >)
        ev(2, 1, "click"), ev(2, 10, "view"), ev(2, 20, "click"),
        ev(2, 20, "buy"), ev(2, 99, "buy"),
        # u3 never views -> absent from both outputs
        ev(3, 2, "click"), ev(3, 96, "buy"),
        # u4 views only
        ev(4, 3, "view"),
    ]
    schema = "user_id long, ts timestamp, event_type string"
    events = spark.createDataFrame(rows, schema)
    steps = ["view", "click", "buy"]

    src = str(tmp_path / "funnel_src")
    # two time-split files -> availableNow folds them as ordered batches
    events.filter("ts < '2024-05-01 01:30:00'").coalesce(1) \
        .write.mode("overwrite").parquet(src + "/b=0")
    events.filter("ts >= '2024-05-01 01:30:00'").coalesce(1) \
        .write.mode("append").parquet(src + "/b=1")

    for within in (None, 60.0):
        out = streaming_funnel(
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1").parquet(src + "/b=*"),
            steps, within_minutes=within)
        name = f"funnel_{int(within or 0)}"
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation",
                     str(tmp_path / f"ckpt_{name}"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        got_rows = spark.table(name).collect()
        latest = {}
        for r in got_rows:                 # chains only extend
            cur = latest.get(r["user_id"])
            if cur is None or r["steps_completed"] > cur["steps_completed"]:
                latest[r["user_id"]] = r
        got = {u: tuple(r[f"us_step_{i}"] for i in (1, 2, 3))
               + (r["steps_completed"],) for u, r in latest.items()}
        want = {}
        for r in funnel(events, steps, within_minutes=within).collect():
            to_us = [(int(r[f"ts_step_{i}"].timestamp() * 1_000_000)
                      if r[f"ts_step_{i}"] is not None else None)
                     for i in (1, 2, 3)]
            want[r["user_id"]] = tuple(to_us) + (r["steps_completed"],)
        assert got == want, within
        assert 3 not in got and 1 in got


def test_retention_sink_matches_batch(spark, tmp_path):
    """Streaming retention (r8 verdict missing #5): folding micro-batches
    through retention_sink yields exactly retention_cohorts over the
    union — including a LATE user event that predates the recorded
    cohort (the state re-bases the cohort day and shifts the activity
    mask), re-activity duplicates, and a replayed micro-batch (skipped
    by the marker, state unchanged)."""
    import datetime as dtm

    from pyspark.sql import functions as F

    from dataops_testgen_spark.pipeline.sessions import retention_cohorts
    from dataops_testgen_spark.streaming.monitors import (
        retention_sink, retention_state_result)

    d0 = dtm.datetime(2024, 3, 1, 10, 0)

    def ev(uid, days):
        return (uid, d0 + dtm.timedelta(days=days))

    b0_rows = [ev(1, 0), ev(1, 1), ev(2, 3), ev(4, 0), ev(4, 7),
               ev(None, 0)]           # NULL actor: dropped by both paths
    # u2's batch-1 event on day 2 PREDATES its recorded day-3 cohort:
    # cohort re-bases to day 2 and the old day-3 bit shifts to offset 1
    b1_rows = [ev(2, 2), ev(2, 4), ev(3, 5), ev(3, 6), ev(3, 12),
               ev(1, 7), ev(4, 0), ev(None, 1)]
    schema = "user_id long, ts timestamp"
    b0 = spark.createDataFrame(b0_rows, schema)
    b1 = spark.createDataFrame(b1_rows, schema)
    state = str(tmp_path / "retention_state")

    sink = retention_sink(state, max_horizon=7)
    sink(b0, 0)
    sink(b1, 1)

    def canon(df):
        return {tuple(r) for r in df.collect()}

    want = canon(retention_cohorts(b0.unionByName(b1), horizons=(1, 7)))
    got = canon(retention_state_result(spark, state, horizons=(1, 7)))
    assert got == want and got
    # sanity on the late-user semantics: u2's cohort re-based to day 2
    # (2024-03-03) and its old day-3 activity became d1 retention
    by_day = {r["cohort_day"].isoformat(): r
              for r in retention_state_result(spark, state).collect()}
    assert by_day["2024-03-03"]["retained_d1"] == 1
    # replay of batch 1: marker skips it, state unchanged
    sink(b1, 1)
    assert canon(retention_state_result(spark, state, horizons=(1, 7))) \
        == want
    # state is one row per user with a horizon-bounded mask
    st = spark.read.parquet(state)
    assert st.count() == 4
    assert st.filter(F.col("mask") >= (1 << 8)).count() == 0


def test_compaction_refuses_first_batch_crash_window(spark, tmp_path):
    """A sink that crashes during its FIRST micro-batch (after the data
    append, before the marker write) used to leave stamped batch_id=0
    rows with NO marker dir — the exact state the guard read as 'one-shot
    index, safe to compact' (driver ADVICE r7, io/fs.py:96). The sinks now
    register a sentinel marker (batch_id=-1) before their first append,
    so the guard refuses; after the replay recovers the batch, compaction
    proceeds and the index equals the crash-free state. One-shot
    maintenance indexes (direct appends, no sink ever attached) still
    compact freely."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from dataops_testgen_spark.pipeline.dedup import (
        minhash_index_append, minhash_index_compact)
    from dataops_testgen_spark.streaming.monitors import (_register_sink,
                                                          minhash_index_sink)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    idx = str(tmp_path / "first_crash_idx")
    # simulate the sink's first fold crashing between append and marker:
    # the sentinel registration and the data append ran, _mark_folded not
    _register_sink(spark, idx + "__last_batch")
    minhash_index_append(b0, idx, batch_id=0)
    with _pt.raises(RuntimeError, match="not.*been replayed|replay"):
        minhash_index_compact(spark, idx)
    minhash_index_sink(idx)(b0, 0)                 # recovery replay
    minhash_index_compact(spark, idx)              # now fine
    control = str(tmp_path / "first_ctl_idx")
    minhash_index_sink(control)(b0, 0)
    want = {tuple(r) for r in
            spark.read.parquet(control + "/signatures")
            .drop("batch_id").collect()}
    got = {tuple(r) for r in
           spark.read.parquet(idx + "/signatures")
           .drop("batch_id").collect()}
    assert got == want and got
    # one-shot maintenance index: no sink, no marker -> compacts freely
    oneshot = str(tmp_path / "oneshot_idx")
    minhash_index_append(b0, oneshot)
    minhash_index_compact(spark, oneshot)


def test_quality_gate_sink_stream_equals_batch(spark, tmp_path):
    """The distilled LR gate run ONLINE: drain a two-micro-batch document
    stream through quality_gate_sink and the kept (id, margin, p) rows
    equal the one-shot batch lr_score filter bit-for-bit; a replayed
    batch id appends nothing (exactly-once)."""
    from pyspark.sql import functions as F

    from dataops_testgen_spark.__main__ import main
    from dataops_testgen_spark.pipeline.classify import (lr_hash_features,
                                                         lr_score)
    from dataops_testgen_spark.streaming.monitors import quality_gate_sink

    from dataops_testgen_spark.pipeline.text import tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
    # train once via the CLI surface (persists weights + meta) on the
    # stopword-share gate the driver query distills — a label the model
    # actually separates (8 Newton steps reach ~0.85 train accuracy)
    t = tokens(F.col("text"))
    sw = (F.size(F.filter(t, lambda x: x.isin("the", "a"))) / F.size(t))
    labeled = str(tmp_path / "labeled")
    docs.withColumn("y", (sw >= 0.06).cast("int")).write.parquet(labeled)
    model = str(tmp_path / "model")
    assert main(["corpus-quality-train", "--corpus", labeled,
                 "--label-col", "y", "--model", model,
                 "--iters", "8", "--salt", "qsink"]) == 0

    hist = docs.filter(F.col("doc_id") % 2 == 0)
    src = str(tmp_path / "docs_src")
    hist.filter(F.col("doc_id") % 4 == 0).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    hist.filter(F.col("doc_id") % 4 == 2).coalesce(1) \
        .write.mode("append").parquet(src)

    out = str(tmp_path / "gated")
    q = (spark.readStream.schema(docs.schema)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(
             quality_gate_sink(out, model, min_p=0.5))
         .option("checkpointLocation", str(tmp_path / "gate_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = sorted((r["id"], r["margin"], r["p"]) for r in
                 spark.read.parquet(out + "/kept").collect())
    w = {int(r["f"]): float(r["w"])
         for r in spark.read.parquet(model + "/weights").collect()}
    want = sorted(
        (r["id"], r["margin"], r["p"]) for r in
        lr_score(lr_hash_features(hist, salt="qsink"), w)
        .filter(F.col("p") >= 0.5).collect())
    # same ids, same scores to 1e-9 relative: the margin's token-sum
    # accumulates in partition order, and stream micro-batches split the
    # rows differently than the one-shot batch, so the last ulp can
    # differ between the two paths (observed: ...2580066 vs ...25800664
    # under a loaded box). Identity must be exact; float equality to
    # 1e-9 is already 1000x stricter than the driver's 1e-6 rounding.
    assert got and len(got) == len(want)
    import math
    for (gi, gm, gp), (wi, wm, wp) in zip(got, want):
        assert gi == wi
        assert math.isclose(gm, wm, rel_tol=1e-9, abs_tol=1e-12), (gi, gm, wm)
        assert math.isclose(gp, wp, rel_tol=1e-9, abs_tol=1e-12), (gi, gp, wp)
    assert len(got) < hist.count()  # the gate actually drops documents

    # replayed batch id: keepers unchanged
    n = spark.read.parquet(out + "/kept").count()
    quality_gate_sink(out, model, min_p=0.5)(hist.limit(10), 0)
    assert spark.read.parquet(out + "/kept").count() == n


def test_quality_gate_sink_crash_window_idempotent(spark, tmp_path):
    """Quality-gate sink crash windows: a crash between the keeper append
    and the replay marker (full OR torn append) converges on re-delivery
    — the stamped dynamic-partition overwrite rewrites exactly the
    batch's own partition, so kept rows equal the crash-free run's."""
    from pyspark.sql import functions as F

    from dataops_testgen_spark.__main__ import main
    from dataops_testgen_spark.io.fs import stamped_append
    from dataops_testgen_spark.pipeline.classify import (lr_hash_features,
                                                         lr_score)
    from dataops_testgen_spark.pipeline.text import tokens
    from dataops_testgen_spark.streaming.monitors import quality_gate_sink

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
    t = tokens(F.col("text"))
    sw = (F.size(F.filter(t, lambda x: x.isin("the", "a"))) / F.size(t))
    labeled = str(tmp_path / "labeled")
    docs.withColumn("y", (sw >= 0.06).cast("int")).write.parquet(labeled)
    model = str(tmp_path / "model")
    assert main(["corpus-quality-train", "--corpus", labeled,
                 "--label-col", "y", "--model", model,
                 "--iters", "6", "--salt", "qcrash"]) == 0

    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)

    control = str(tmp_path / "control")
    quality_gate_sink(control, model)(b0, 0)
    quality_gate_sink(control, model)(b1, 1)
    want = _relation_snapshot(spark, control + "/kept")

    w = {int(r["f"]): float(r["w"])
         for r in spark.read.parquet(model + "/weights").collect()}

    def scored(batch):
        return (lr_score(lr_hash_features(batch, salt="qcrash"), w)
                .filter(F.col("p") >= 0.5))

    # crash after a FULL keeper append of batch 1 but before the marker
    crashed = str(tmp_path / "crashed")
    quality_gate_sink(crashed, model)(b0, 0)
    stamped_append(scored(b1), crashed + "/kept", batch_id=1)
    quality_gate_sink(crashed, model)(b1, 1)        # re-delivery
    assert _relation_snapshot(spark, crashed + "/kept") == want

    # crash MID-append: only part of batch 1's keepers landed
    torn = str(tmp_path / "torn")
    quality_gate_sink(torn, model)(b0, 0)
    stamped_append(scored(b1.filter(F.col("doc_id") % 3 == 0)),
                   torn + "/kept", batch_id=1)
    quality_gate_sink(torn, model)(b1, 1)
    assert _relation_snapshot(spark, torn + "/kept") == want


def test_quality_gate_sink_reloads_retrained_model(spark, tmp_path):
    """A long-running gate stream picks up a retrained model WITHOUT a
    restart: the sink stats weights/_SUCCESS each batch and reloads when
    the commit marker moves. Batch 0 scores under model v1; after
    corpus-quality-train overwrites the same model dir (inverted
    labels), batch 1 scores under v2 through the SAME sink closure; a
    deleted _SUCCESS (mid-overwrite window) keeps the loaded model
    instead of reading a half-committed one."""
    import os

    from pyspark.sql import functions as F

    from dataops_testgen_spark.__main__ import main
    from dataops_testgen_spark.pipeline.classify import (lr_hash_features,
                                                         lr_score)
    from dataops_testgen_spark.pipeline.text import tokens
    from dataops_testgen_spark.streaming.monitors import quality_gate_sink

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
    t = tokens(F.col("text"))
    sw = (F.size(F.filter(t, lambda x: x.isin("the", "a"))) / F.size(t))
    labeled = str(tmp_path / "labeled")
    model = str(tmp_path / "model")

    def train(invert: bool) -> dict[int, float]:
        y = (sw < 0.06) if invert else (sw >= 0.06)
        docs.withColumn("y", y.cast("int")) \
            .write.mode("overwrite").parquet(labeled)
        assert main(["corpus-quality-train", "--corpus", labeled,
                     "--label-col", "y", "--model", model,
                     "--iters", "6", "--salt", "qreload"]) == 0
        return {int(r["f"]): float(r["w"])
                for r in spark.read.parquet(model + "/weights").collect()}

    def scored(batch, w):
        return sorted(
            (r["id"], r["margin"], r["p"]) for r in
            lr_score(lr_hash_features(batch, salt="qreload"), w)
            .filter(F.col("p") >= 0.5).collect())

    def kept(out, bid):
        return sorted(
            (r["id"], r["margin"], r["p"]) for r in
            spark.read.parquet(out + "/kept")
            .filter(F.col("batch_id") == bid).collect())

    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)

    w1 = train(invert=False)
    out = str(tmp_path / "gated")
    sink = quality_gate_sink(out, model, min_p=0.5)
    sink(b0, 0)
    assert kept(out, 0) == scored(b0, w1)

    w2 = train(invert=True)            # retrain MID-STREAM, same dir
    assert w1 != w2
    sink(b1, 1)                        # same closure, no restart
    assert kept(out, 1) == scored(b1, w2)
    assert kept(out, 1) != scored(b1, w1)

    # mid-overwrite window: marker gone -> keep the loaded v2 model
    os.remove(os.path.join(model, "weights", "_SUCCESS"))
    sink(b2, 2)
    assert kept(out, 2) == scored(b2, w2)


def test_referential_monitor_matches_batch(spark, events_dir, tmp_path):
    """Streaming referential-integrity monitor (r12, the streaming twin
    of discover-fks' Combo_Match defs): per-window orphan counts against
    a parent key dictionary match the batch computation; NULL child keys
    are counted separately (SQL FK semantics) and never as orphans; the
    orphan-share gate sets result_code."""
    from dataops_testgen_spark.streaming import referential_monitor

    base = spark.read.parquet(events_dir)
    # null ~1/7 of the keys and keep the rest; parent covers only
    # user_id % 3 != 0 -> every third user is an orphan
    child = base.withColumn(
        "user_id", F.when(F.col("event_id") % 7 == 0,
                          F.lit(None)).otherwise(F.col("user_id")))
    child_dir = str(tmp_path / "child_events")
    child.write.mode("overwrite").parquet(child_dir)
    parent = (base.select(F.col("user_id").alias("uid"))
              .filter("uid % 3 != 0").distinct())

    stream = spark.readStream.schema(child.schema).parquet(child_dir)
    out = _run_stream(
        spark, referential_monitor(stream, parent, "user_id",
                                   parent_key="uid", ts_col="ts",
                                   window="1 day", watermark="0 seconds",
                                   max_orphan_pct=0.10),
        "ref_mon")
    got = {(r["window_start"], r["record_ct"], r["null_key_ct"],
            r["orphan_ct"], r["result_code"]) for r in out.collect()}

    max_ts = child.agg(F.max("ts")).collect()[0][0]
    known = {r["uid"] for r in parent.collect()}
    exp_rows = (child.groupBy(F.window("ts", "1 day").alias("w")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias("nk"),
        F.sum(F.when(F.col("user_id").isNotNull()
                     & ~F.col("user_id").isin(list(known)), 1)
              .otherwise(0)).alias("orph")).collect())
    expected = set()
    for r in exp_rows:
        if r["w"]["end"] > max_ts:
            continue   # append mode: the open window is withheld
        share = r["orph"] / (r["n"] - r["nk"]) if (r["n"] - r["nk"]) else 0
        expected.add((r["w"]["start"], r["n"], r["nk"], r["orph"],
                      1 if share <= 0.10 else 0))
    assert got == expected and got
    # orphans exist by construction, and at least one window flags with
    # a tight gate
    assert any(o > 0 for _, _, _, o, _ in got)
    out2 = _run_stream(
        spark, referential_monitor(
            spark.readStream.schema(child.schema).parquet(child_dir),
            parent, "user_id", parent_key="uid", ts_col="ts",
            window="1 day", watermark="0 seconds", max_orphan_pct=0.0),
        "ref_mon_tight")
    assert any(r["result_code"] == 0 for r in out2.collect())
