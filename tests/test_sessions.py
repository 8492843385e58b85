"""sessionize / session_stats (pipeline/sessions.py): hand-built gaps,
half-open boundary semantics, and batch == streaming session_window."""
import datetime as dt

import pytest
from pyspark.sql import functions as F

from dataops_testgen_spark.pipeline.sessions import (session_stats,
                                                     sessionize)


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


EVENTS = [
    # user 1: two sessions split by a 30-min silence; exact-gap boundary
    (1, 1, _ts(0), 1.0),
    (2, 1, _ts(10), 2.0),
    (3, 1, _ts(40), 4.0),      # exactly 30 min after event 2 -> NEW session
    (4, 1, _ts(41), 8.0),
    # user 2: one session, gap just under 30 min keeps it together
    (5, 2, _ts(0), 1.5),
    (6, 2, _ts(29, 59, 999999), 2.5),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        EVENTS, "event_id long, user_id long, ts timestamp, value double")


def test_sessionize_boundaries(spark, events):
    got = {r["event_id"]: r["session_idx"]
           for r in sessionize(events).collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 0}


def test_session_stats(spark, events):
    rows = {(r["user_id"], r["session_idx"]): r
            for r in session_stats(events).collect()}
    a = rows[(1, 0)]
    assert a["n_events"] == 2 and a["total_value"] == 3.0
    assert a["duration_s"] == pytest.approx(600.0)
    b = rows[(1, 1)]
    assert b["n_events"] == 2 and b["total_value"] == 12.0
    c = rows[(2, 0)]
    assert c["n_events"] == 2 and c["duration_s"] == pytest.approx(
        30 * 60 - 1e-6)


def test_sessionize_rejects_bad_gap(spark, events):
    with pytest.raises(ValueError):
        sessionize(events, gap_minutes=0)


def test_batch_sessions_equal_streaming_session_window(spark, tmp_path):
    """The batch sessionizer's (user, session) partitions carry exactly
    the aggregates Structured Streaming's session_window(30 min) emits
    over the same events — same session boundaries, counts and spans."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev_src")
    events.coalesce(2).write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema(events.schema).parquet(src)
              .groupBy("user_id",
                       F.session_window("ts", "30 minutes").alias("sw"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.min("ts").alias("start_ts"),
                   F.max("ts").alias("end_ts")))
    q = (stream.writeStream.format("memory").queryName("sess_sw")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {(r["user_id"], r["start_ts"]): (r["n_events"], r["end_ts"])
           for r in spark.sql("select * from sess_sw").collect()}

    want = {(r["user_id"], r["start_ts"]): (r["n_events"], r["end_ts"])
            for r in session_stats(events).collect()}
    assert got == want and len(want) > len(
        {u for u, _ in want})  # multiple sessions per some user


def test_rolling_features_hand_check(spark):
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 0), 1.0),
        (2, 1, dt.datetime(2024, 1, 1, 0, 30), 2.0),   # within 60m of 1
        (3, 1, dt.datetime(2024, 1, 1, 1, 30), 4.0),   # exactly 60m after 2
        (4, 2, dt.datetime(2024, 1, 1, 0, 5), 8.0),
    ]
    from dataops_testgen_spark.pipeline.sessions import rolling_features

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    got = {r["event_id"]: r
           for r in rolling_features(df, windows_minutes=(60,)).collect()}
    assert got[1]["n_60m"] == 1 and got[1]["sum_60m"] == 1.0
    assert got[1]["secs_since_prev"] is None
    assert got[2]["n_60m"] == 2 and got[2]["sum_60m"] == 3.0
    assert got[2]["secs_since_prev"] == 1800.0
    # inclusive trailing boundary: event 2 (exactly 60m earlier) counts
    assert got[3]["n_60m"] == 2 and got[3]["sum_60m"] == 6.0
    # other users never leak in
    assert got[4]["n_60m"] == 1 and got[4]["sum_60m"] == 8.0


def test_funnel_hand_check(spark):
    from dataops_testgen_spark.pipeline.sessions import funnel

    rows = [
        # user 1 completes view->click->buy in order
        (1, 1, dt.datetime(2024, 1, 1, 0, 0), "view"),
        (2, 1, dt.datetime(2024, 1, 1, 0, 5), "click"),
        (3, 1, dt.datetime(2024, 1, 1, 0, 9), "buy"),
        # user 2: buy BEFORE click -> chain breaks at step 2? no: click
        # at 0:10, buy at 0:02 (before click) -> steps_completed = 2
        (4, 2, dt.datetime(2024, 1, 1, 0, 0), "view"),
        (5, 2, dt.datetime(2024, 1, 1, 0, 2), "buy"),
        (6, 2, dt.datetime(2024, 1, 1, 0, 10), "click"),
        # user 3 never views -> absent from output
        (7, 3, dt.datetime(2024, 1, 1, 0, 0), "click"),
        # user 4: completes, but only within 20 minutes at step 2
        (8, 4, dt.datetime(2024, 1, 1, 0, 0), "view"),
        (9, 4, dt.datetime(2024, 1, 1, 0, 15), "click"),
        (10, 4, dt.datetime(2024, 1, 1, 1, 0), "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {r["user_id"]: r
           for r in funnel(df, ["view", "click", "buy"]).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1]["steps_completed"] == 3
    assert got[1]["ts_step_3"] == dt.datetime(2024, 1, 1, 0, 9)
    assert got[2]["steps_completed"] == 2 and got[2]["ts_step_3"] is None
    assert got[2]["ts_step_2"] == dt.datetime(2024, 1, 1, 0, 10)
    assert got[4]["steps_completed"] == 3
    # 20-minute completion window: user 4's buy at +60m is out
    within = {r["user_id"]: r["steps_completed"]
              for r in funnel(df, ["view", "click", "buy"],
                              within_minutes=20).collect()}
    assert within[4] == 2 and within[1] == 3

    import pytest as _pt
    with _pt.raises(ValueError):
        funnel(df, ["view"])


def test_asof_join_hand_check(spark):
    """Backward as-of semantics: inclusive <= match picks the greatest
    right ts at-or-before each left ts per key; unmatched and
    out-of-tolerance rows carry NULLs; a pandas merge_asof cross-check
    agrees on every matched timestamp."""
    from dataops_testgen_spark.pipeline.sessions import asof_join

    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(30)), (3, 1, _ts(5)),
         (4, 2, _ts(7)), (5, 3, _ts(1))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0), (1, _ts(10), 100.0), (1, _ts(20), 200.0),
         (2, _ts(8), 800.0)],
        "user_id long, ts timestamp, value double")
    rows = {r["event_id"]: r
            for r in asof_join(left, right, right_cols=["value"]).collect()}
    # inclusive match: left ts==10 takes the right row AT 10, not 5
    assert rows[1]["value_right"] == 100.0 and rows[1]["asof_gap_us"] == 0
    assert rows[2]["value_right"] == 200.0
    assert rows[2]["asof_gap_us"] == 10 * 60_000_000
    assert rows[3]["value_right"] == 50.0      # ts 5 matches ts 5
    # user 2's only right row is LATER than the left row; user 3 has none
    assert rows[4]["value_right"] is None and rows[4]["asof_gap_us"] is None
    assert rows[5]["value_right"] is None
    # tolerance: the 10-min-old match survives a 15-min window, not 5
    tol = {r["event_id"]: r["value_right"] for r in asof_join(
        left, right, right_cols=["value"],
        tolerance_minutes=5.0).collect()}
    assert tol[1] == 100.0 and tol[2] is None
    # pandas cross-check (merge_asof is the reference semantics)
    import pandas as pd
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    ref = pd.merge_asof(lp, rp, on="ts", by="user_id",
                        direction="backward")
    want = {int(r.event_id): (None if pd.isna(r.value) else float(r.value))
            for r in ref.itertuples()}
    got = {eid: rows[eid]["value_right"] for eid in want}
    assert got == want


def test_asof_join_null_right_values(spark):
    """A matched right row whose payload is genuinely NULL must yield
    NULL (pandas merge_asof / DuckDB ASOF semantics), NOT an older
    row's non-null value — the struct-packet carry guarantees it in all
    three directions (repro from the r6 advice: right (t=5,v=50),
    (t=20,v=NULL), left t=30 must see NULL, not 50)."""
    import pandas as pd

    from dataops_testgen_spark.pipeline.sessions import asof_join

    left = spark.createDataFrame(
        [(1, 1, _ts(30)), (2, 1, _ts(6)), (3, 1, _ts(12)),
         (4, 2, _ts(10))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0, "a"), (1, _ts(20), None, None),
         (1, _ts(35), None, "c"), (2, _ts(1), None, "d")],
        "user_id long, ts timestamp, value double, tag string")
    for direction in ("backward", "forward", "nearest"):
        got = {r["event_id"]: r for r in asof_join(
            left, right, right_cols=["value", "tag"],
            direction=direction).collect()}
        ref = pd.merge_asof(
            left.toPandas().sort_values("ts"),
            right.toPandas().sort_values("ts"),
            on="ts", by="user_id", direction=direction)
        for r in ref.itertuples():
            want_v = None if pd.isna(r.value) else float(r.value)
            want_t = None if (not isinstance(r.tag, str)) else r.tag
            g = got[int(r.event_id)]
            assert g["value_right"] == want_v, (direction, r.event_id)
            assert g["tag_right"] == want_t, (direction, r.event_id)
    # the literal advice repro: backward at t=30 matches t=20 (NULL v)
    back = {r["event_id"]: r for r in asof_join(
        left, right, right_cols=["value"]).collect()}
    assert back[1]["ts_right"] == _ts(20)
    assert back[1]["value_right"] is None


def test_asof_join_forward(spark):
    """Forward direction: inclusive >= match picks the SMALLEST right ts
    at-or-after each left ts (next-outcome join); tolerance bounds the
    look-ahead; pandas merge_asof(direction='forward') agrees."""
    from dataops_testgen_spark.pipeline.sessions import asof_join

    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(21)), (3, 1, _ts(30)), (4, 2, _ts(9))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(20), 200.0), (2, _ts(8), 800.0)],
        "user_id long, ts timestamp, value double")
    rows = {r["event_id"]: r for r in asof_join(
        left, right, right_cols=["value"],
        direction="forward").collect()}
    assert rows[1]["value_right"] == 100.0 and rows[1]["asof_gap_us"] == 0
    assert rows[2]["value_right"] is None      # nothing at-or-after 21
    assert rows[3]["value_right"] is None
    assert rows[4]["value_right"] is None      # user 2's row is EARLIER
    # tolerance bounds the look-ahead window
    lt = spark.createDataFrame([(9, 1, _ts(5))],
                               "event_id long, user_id long, ts timestamp")
    tol = {r["event_id"]: r["value_right"] for r in asof_join(
        lt, right, right_cols=["value"], direction="forward",
        tolerance_minutes=4.0).collect()}
    assert tol[9] is None                      # next match is 5 min away
    # pandas cross-check
    import pandas as pd
    ref = pd.merge_asof(left.toPandas().sort_values("ts"),
                        right.toPandas().sort_values("ts"),
                        on="ts", by="user_id", direction="forward")
    want = {int(r.event_id): (None if pd.isna(r.value) else float(r.value))
            for r in ref.itertuples()}
    assert {eid: rows[eid]["value_right"] for eid in want} == want
    import pytest as _pytest
    with _pytest.raises(ValueError):
        asof_join(left, right, direction="sideways")


def test_asof_join_nearest_and_plan(spark):
    """Nearest direction picks the closer inclusive match (backward wins
    ties, pandas rule) — cross-checked against merge_asof on a random
    table — and every direction plans exactly ONE Exchange (the key
    shuffle): no range-join row expansion anywhere."""
    import random

    import pandas as pd

    from dataops_testgen_spark.pipeline.sessions import asof_join

    rng = random.Random(7)
    lrows = [(i, rng.randint(1, 5), _ts(rng.randint(0, 59),
                                        rng.choice([0, 30])))
             for i in range(60)]
    rrows = [(k, ts, float(v)) for v, (k, ts) in enumerate(
        {(rng.randint(1, 5), _ts(rng.randint(0, 59), rng.choice([0, 30])))
         for _ in range(40)})]
    left = spark.createDataFrame(
        lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        rrows, "user_id long, ts timestamp, value double")
    near = asof_join(left, right, right_cols=["value"],
                     direction="nearest")
    rows = {r["event_id"]: r for r in near.collect()}
    ref = pd.merge_asof(left.toPandas().sort_values("ts"),
                        right.toPandas().sort_values("ts"),
                        on="ts", by="user_id", direction="nearest")
    for r in ref.itertuples():
        want = None if pd.isna(r.value) else float(r.value)
        assert rows[int(r.event_id)]["value_right"] == want, r.event_id
    # gaps are non-negative distances
    assert all(r["asof_gap_us"] is None or r["asof_gap_us"] >= 0
               for r in rows.values())
    # plan audit: one Exchange per direction, zero Joins
    for d in ("backward", "forward", "nearest"):
        plan = asof_join(left, right, right_cols=["value"],
                         direction=d)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, (d, plan)
        assert "Join" not in plan, d


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: feeding the events in two
    time-ordered micro-batches emits exactly the batch sessionizer's
    CLOSED sessions (every session except each user's chronologically
    last, which stays open in state)."""
    from pyspark.sql import functions as F

    from dataops_testgen_spark.pipeline.sessions import session_stats
    from dataops_testgen_spark.streaming.monitors import (
        streaming_sessionize)

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    us = "unix_micros(cast(ts as timestamp))"
    split = events.selectExpr(f"percentile({us}, 0.5) p").first()["p"]
    src = str(tmp_path / "sess_src")
    events.filter(F.expr(us) <= split).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    events.filter(F.expr(us) > split).coalesce(1) \
        .write.mode("append").parquet(src)

    out = streaming_sessionize(
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(src))
    q = (out.writeStream.format("memory").queryName("sess_state")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {(r["user_id"], r["start_us"], r["end_us"], r["n_events"]):
           r["total_value"]
           for r in spark.sql("select * from sess_state").collect()}

    full = session_stats(events).collect()
    last_per_user = {}
    for r in full:
        cur = last_per_user.get(r["user_id"])
        if cur is None or r["session_idx"] > cur["session_idx"]:
            last_per_user[r["user_id"]] = r
    want = {}
    for r in full:
        if r is last_per_user[r["user_id"]]:
            continue
        key = (r["user_id"],
               int(r["start_ts"].timestamp() * 1_000_000),
               int(r["end_ts"].timestamp() * 1_000_000),
               r["n_events"])
        want[key] = r["total_value"]
    assert set(got) == set(want) and got
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_asof_join_fuzz_vs_merge_asof(spark):
    """Property fuzz of all three directions against pandas merge_asof:
    random keys/timestamps, NULL right payloads, duplicate left
    timestamps, and tolerance windows — one deterministic seed sweep
    (hypothesis-style without per-example Spark jobs: 6 seeded corpora,
    3 directions, 2 tolerance settings = 36 cross-checks)."""
    import random

    import pandas as pd

    from dataops_testgen_spark.pipeline.sessions import asof_join

    for seed in range(6):
        rng = random.Random(100 + seed)
        lrows = [(i, rng.randint(1, 4),
                  _ts(rng.randint(0, 59), rng.choice([0, 15, 30, 45])))
                 for i in range(40)]
        # unique (key, ts) right rows; ~1/3 NULL payloads
        rkeys = {(rng.randint(1, 4),
                  _ts(rng.randint(0, 59), rng.choice([0, 30])))
                 for _ in range(25)}
        rrows = [(k, ts,
                  None if rng.random() < 0.34 else float(rng.randint(0, 99)))
                 for k, ts in rkeys]
        left = spark.createDataFrame(
            lrows, "event_id long, user_id long, ts timestamp")
        right = spark.createDataFrame(
            rrows, "user_id long, ts timestamp, value double")
        lp = left.toPandas().sort_values("ts")
        rp = right.toPandas().sort_values("ts")
        rp["rts"] = rp["ts"]          # carry the matched right timestamp
        for direction in ("backward", "forward", "nearest"):
            for tol in (None, 10.0):
                got = {r["event_id"]: r for r in asof_join(
                    left, right, right_cols=["value"],
                    direction=direction,
                    tolerance_minutes=tol).collect()}
                ref = pd.merge_asof(
                    lp, rp, on="ts", by="user_id", direction=direction,
                    tolerance=None if tol is None
                    else pd.Timedelta(minutes=tol))
                for r in ref.itertuples():
                    want = None if pd.isna(r.value) else float(r.value)
                    g = got[int(r.event_id)]
                    assert g["value_right"] == want, (
                        seed, direction, tol, r.event_id)
                    # matched timestamp agrees too (NULL-payload rows
                    # must match on ts even when value is NULL)
                    want_ts = None if pd.isna(r.rts) else r.rts
                    got_ts = g["ts_right"]
                    if want_ts is None:
                        assert got_ts is None, (seed, direction, tol,
                                                r.event_id)
                    else:
                        assert got_ts == want_ts.to_pydatetime(), (
                            seed, direction, tol, r.event_id)


def test_parse_event_props(spark):
    """Schema-on-read over semi-structured props: declared fields lift
    to columns, undeclared keys are ignored, malformed JSON yields NULL
    fields (never a job failure), drop_corrupt filters exactly the
    rows whose non-NULL raw string failed to parse, and the plan stays
    UDF-free (a codegen'd from_json projection)."""
    from dataops_testgen_spark.pipeline.sessions import parse_event_props

    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, '{"k": 7, "extra": "x"}'),
         (3, 'not json {{{'), (4, None), (5, '{"other": 1}')],
        "event_id long, props string")
    got = {r["event_id"]: r["k"]
           for r in parse_event_props(df, schema="k INT").collect()}
    assert got == {1: 5, 2: 7, 3: None, 4: None, 5: None}
    kept = {r["event_id"] for r in
            parse_event_props(df, schema="k INT",
                              drop_corrupt=True).collect()}
    # row 3 is corrupt (raw non-null, parse null); row 4's NULL raw and
    # row 5's missing-key row both survive ({"other":1} parses fine)
    assert kept == {1, 2, 4, 5}
    # multi-field schema: both fields lift, missing ones are NULL
    multi = {r["event_id"]: (r["k"], r["tag"]) for r in parse_event_props(
        spark.createDataFrame([(1, '{"k": 2, "tag": "a"}'),
                               (2, '{"tag": "b"}')],
                              "event_id long, props string"),
        schema="k INT, tag STRING").collect()}
    assert multi == {1: (2, "a"), 2: (None, "b")}
    plan = parse_event_props(df, schema="k INT") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "from_json" in plan and "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_parse_event_props_nested_ddl(spark):
    """Arbitrary DDL schemas with commas INSIDE one field declaration
    (STRUCT<...>, DECIMAL(p,s), ARRAY<...>) lift correctly — the field
    list comes from Spark's DDL parser, not a naive comma split (driver
    ADVICE r7: the split broke every declaration after the first comma
    of a STRUCT)."""
    from decimal import Decimal

    from dataops_testgen_spark.pipeline.sessions import parse_event_props

    df = spark.createDataFrame(
        [(1, '{"s": {"a": 1, "b": 2}, "price": 12.34, "tags": ["x","y"], "k": 7}'),
         (2, '{"k": 9}')],
        "event_id long, props string")
    out = parse_event_props(
        df,
        schema="s STRUCT<a: INT, b: INT>, price DECIMAL(10,2), "
               "tags ARRAY<STRING>, k INT")
    assert [f.name for f in out.schema.fields] \
        == ["event_id", "props", "s", "price", "tags", "k"]
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["s"]["a"] == 1 and rows[1]["s"]["b"] == 2
    assert rows[1]["price"] == Decimal("12.34")
    assert rows[1]["tags"] == ["x", "y"] and rows[1]["k"] == 7
    assert rows[2]["s"] is None and rows[2]["k"] == 9


def test_retention_cohorts_hand_check(spark):
    """Hand-built cohorts: day-0 users returning on day 1/7 count toward
    their cohort's retained_d1/d7; a user active twice on one day counts
    once; later-cohort users never leak into earlier cohorts."""
    import datetime as dtm

    from dataops_testgen_spark.pipeline.sessions import retention_cohorts

    d0 = dtm.datetime(2024, 3, 1, 10, 0)

    def at(days, hour=10):
        return d0 + dtm.timedelta(days=days, hours=hour - 10)

    rows = [
        # cohort 3/1: users 1,2,3. u1 returns d1 and d7; u2 returns d1
        # twice (counts once); u3 never returns
        (1, 1, at(0)), (2, 1, at(1)), (3, 1, at(7)),
        (4, 2, at(0)), (5, 2, at(1, 9)), (6, 2, at(1, 11)),
        (7, 3, at(0)),
        # cohort 3/2: user 4 returns d7 only
        (8, 4, at(1)), (9, 4, at(8)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    got = {str(r["cohort_day"]): r
           for r in retention_cohorts(df, horizons=(1, 7)).collect()}
    c1 = got["2024-03-01"]
    assert c1["n_users"] == 3
    assert c1["retained_d1"] == 2 and c1["rate_d1"] == round(2 / 3, 9)
    assert c1["retained_d7"] == 1 and c1["rate_d7"] == round(1 / 3, 9)
    c2 = got["2024-03-02"]
    assert c2["n_users"] == 1
    assert c2["retained_d1"] == 0 and c2["retained_d7"] == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        retention_cohorts(df, horizons=())
