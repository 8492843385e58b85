"""Event sessionization: gap-based sessions over an event stream/table.

The standard event-pipeline primitive (user behavior analytics, training
on interaction traces, rate/abuse analysis): consecutive events of the
same actor belong to one session until a silence of ``gap`` or longer,
matching Structured Streaming's ``session_window`` semantics (a session
spans ``[first, last + gap)``, so an event exactly ``gap`` after the
last one opens a NEW session) — the batch and streaming views of the
same sessions agree, pinned by test.

Spark shape: ONE shuffle on the actor key; the session index is a
running sum of gap-break flags inside the per-actor window (lag +
cumulative sum — no explode, no self-join); session aggregates are a
partial-agg groupBy on (actor, session). Timestamps compare as exact
microsecond longs (``unix_micros``), so the gap test is integer math —
bit-identical in any engine (DuckDB: ``epoch_us``).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0,
               order_col: str = "event_id") -> DataFrame:
    """Attach ``session_idx`` (0-based per actor, in time order) to every
    event. A new session starts when the microsecond gap to the previous
    event is >= ``gap_minutes`` (half-open session-window semantics).
    ``order_col`` breaks exact timestamp ties deterministically; the
    session assignment itself depends only on timestamps."""
    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be > 0")
    gap_us = int(gap_minutes * 60_000_000)
    # cast handles TIMESTAMP_NTZ sources (parquet naive timestamps): the
    # session timezone is UTC (session.py), so the cast preserves the
    # wall-clock microseconds exactly
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(us, F.col(order_col))
    brk = (F.when(F.lag(us).over(w).isNull(), F.lit(0))
           .when(us - F.lag(us).over(w) >= F.lit(gap_us), F.lit(1))
           .otherwise(F.lit(0)))
    return df.withColumn("session_idx",
                         F.sum(brk).over(
                             w.rowsBetween(Window.unboundedPreceding, 0)))


def session_stats(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", value_col: str = "value",
                  gap_minutes: float = 30.0,
                  order_col: str = "event_id") -> DataFrame:
    """Per-session aggregates: (user, session_idx, n_events, start_ts,
    end_ts, duration_s, total_value). ``total_value`` folds in
    ``order_col`` order so the double sum is bit-identical across
    engines (the shared canonical-fold trick)."""
    s = sessionize(df, user_col, ts_col, gap_minutes, order_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (s.groupBy(F.col(user_col).alias("user_id"), "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("start_ts"),
                 F.max(ts_col).alias("end_ts"),
                 ((F.max(us) - F.min(us)) / F.lit(1_000_000.0))
                 .alias("duration_s"),
                 F.array_sort(F.collect_list(
                     F.struct(F.col(order_col).alias("o"),
                              F.col(value_col).alias("v")))).alias("parts"))
            .select("user_id", "session_idx", "n_events", "start_ts",
                    "end_ts", "duration_s",
                    F.aggregate("parts", F.lit(0.0),
                                lambda acc, p: acc + p["v"])
                    .alias("total_value")))


def rolling_features(df: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value",
                     order_col: str = "event_id",
                     windows_minutes: tuple = (60, 1440)) -> DataFrame:
    """Per-event trailing-window features — the standard temporal
    feature-engineering step for training on event logs (fraud/abuse/
    recommendation models): for each event, the count of the actor's
    events and the sum of ``value_col`` over each trailing window
    (inclusive [t - w, t]), plus the exact seconds since the actor's
    previous event (NULL on their first).

    Spark shape: ONE shuffle on the actor key; every feature is a frame
    aggregate over the same per-actor RANGE window keyed on exact
    microsecond longs — no self-join, no explode, and all windows share
    one sort. RANGE frames are order-independent sets, so ties need no
    tiebreak; value sums round at 5 decimals in consumers for engine
    parity (set-sum order differs only in ~1e-13).

    Adds, per w in ``windows_minutes``: ``n_{w}m`` and ``sum_{w}m``;
    plus ``secs_since_prev``.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = Window.partitionBy(user_col).orderBy(us)
    out = df
    for w in windows_minutes:
        frame = base.rangeBetween(-int(w * 60_000_000), 0)
        out = (out.withColumn(f"n_{w}m", F.count(F.lit(1)).over(frame))
               .withColumn(f"sum_{w}m", F.sum(value_col).over(frame)))
    lag_w = Window.partitionBy(user_col).orderBy(us, F.col(order_col))
    out = out.withColumn(
        "secs_since_prev",
        (us - F.lag(us).over(lag_w)) / F.lit(1_000_000.0))
    return out


def funnel(df: DataFrame, steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           within_minutes: float | None = None) -> DataFrame:
    """Ordered funnel analysis: for each actor, the FIRST time they
    completed each step strictly after completing the previous one
    (view -> click -> buy conversion, activation funnels, abuse
    escalation chains). ``within_minutes`` optionally requires the whole
    chain to fit in a window after step 1 (classic "converted within
    24h" semantics).

    Output: one row per actor that completed step 1 —
    (user, ts_step_1..ts_step_k, steps_completed), where ts_step_i is
    NULL once the chain breaks.

    Spark shape: k conditional first-timestamp aggregates over ONE
    groupBy of the (type-filtered) events — step i's condition
    references step i-1's aggregate, expressed as chained min(CASE)
    subqueries (k tiny joins on the actor key, each metadata-plane
    after the first shuffle). No window over raw events, no self-join
    of the full log.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.select(F.col(user_col).alias("user_id"),
                   F.col(type_col).alias("etype"), us.alias("us"))
    cur = (ev.filter(F.col("etype") == steps[0])
           .groupBy("user_id").agg(F.min("us").alias("us_1")))
    limit_expr = None
    if within_minutes is not None:
        limit_expr = int(within_minutes * 60_000_000)
    for i, step in enumerate(steps[1:], start=2):
        # one join carries both the previous step's time and (for the
        # completion window) step 1's — deduped to avoid self-ambiguity
        carry = list(dict.fromkeys(
            ["user_id", f"us_{i-1}"]
            + (["us_1"] if limit_expr is not None else [])))
        nxt = (ev.filter(F.col("etype") == step)
               .join(cur.select(*carry), "user_id")
               .filter(F.col("us") > F.col(f"us_{i-1}")))
        if limit_expr is not None:
            nxt = nxt.filter(
                F.col("us") <= F.col("us_1") + F.lit(limit_expr))
        nxt = nxt.groupBy("user_id").agg(F.min("us").alias(f"us_{i}"))
        cur = cur.join(nxt, "user_id", "left")
    done = sum((F.col(f"us_{i}").isNotNull().cast("int")
                for i in range(2, len(steps) + 1)),
               F.lit(1))
    ts_cols = [F.timestamp_micros(F.col(f"us_{i}")).alias(f"ts_step_{i}")
               for i in range(1, len(steps) + 1)]
    return cur.select("user_id", *ts_cols,
                      done.alias("steps_completed"))


def asof_join(left: DataFrame, right: DataFrame,
              on: str = "user_id", ts_col: str = "ts",
              right_cols: list[str] | None = None,
              tolerance_minutes: float | None = None,
              direction: str = "backward",
              suffix: str = "_right") -> DataFrame:
    """As-of join: attach to every left row the right row with the
    GREATEST timestamp <= the left row's timestamp for the same key
    (``direction="backward"``, inclusive match) — the point-in-time join
    feature stores need to avoid temporal leakage (each training example
    sees only features computed at-or-before its own time; pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics) — or the SMALLEST
    timestamp >= it (``direction="forward"``: next-outcome joins, e.g.
    each impression's next conversion), or whichever of the two is
    closer (``direction="nearest"``; equal distance prefers backward,
    pandas tie rule). ``tolerance_minutes`` nulls matches farther than
    the window (pandas ``tolerance=``). Left rows without a match keep
    NULL right columns (left-join semantics).

    Spark lacks a native as-of join; a naive theta-join on
    ``l.key = r.key AND r.ts <= l.ts`` plans a range join that explodes
    to every (left, earlier-right) pair before picking the max. This is
    instead the union-window form — ONE shuffle on the key, zero row
    expansion, the same scale shape as ``sessionize``:

    union(left tagged 1, right tagged 0) → window per key ordered by
    (ts_us, side) → ONE packed struct of (match ts, all right columns)
    forward-fills via ``last(struct, ignorenulls=True)`` over
    unbounded-preceding..current → keep the left rows and project the
    struct's fields. The struct is non-null for EVERY right row even
    when its payload fields are NULL, so a genuinely-NULL right value is
    carried as NULL rather than skipped in favor of an older row's
    value (per-column ignorenulls carries would silently leak stale
    values — the pandas/DuckDB reference returns NULL here). Right rows
    sort before left at equal timestamps, which is exactly the
    inclusive <= match (``forward`` mirrors it: left-before-right
    ordering, ``first(ignorenulls)`` over current..unbounded-following).
    Timestamps compare as exact microsecond longs. Right rows duplicated
    on (key, ts) are tie-ambiguous — pre-dedupe for full determinism
    (the driver query does).

    Output: every LEFT column, then ``<col><suffix>`` for each of
    ``right_cols`` (default: all non-key, non-ts right columns) plus
    ``<ts_col><suffix>`` (the matched right timestamp) and
    ``asof_gap_us`` (non-negative microsecond distance between left ts
    and matched ts)."""
    if tolerance_minutes is not None and tolerance_minutes <= 0:
        raise ValueError("tolerance_minutes must be > 0")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'")
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (on, ts_col)]
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # one nullable packet per row: non-null iff the row is a RIGHT row,
    # regardless of NULLs inside its payload fields
    pkt_type = StructType(
        [StructField("__rts", LongType())]
        + [StructField(f"__r_{c}", right.schema[c].dataType)
           for c in rcols])
    lhs = (left.withColumn("__side", F.lit(1))
           .withColumn("__us", us)
           .withColumn("__pkt", F.lit(None).cast(pkt_type)))
    rhs = right.select(
        F.col(on), F.lit(0).alias("__side"), us.alias("__us"),
        F.struct(us.alias("__rts"),
                 *[F.col(c).alias(f"__r_{c}") for c in rcols])
        .alias("__pkt"))
    for c in left.columns:
        if c != on:
            rhs = rhs.withColumn(c, F.lit(None).cast(
                left.schema[c].dataType))
    both = lhs.unionByName(rhs)
    # right(0) before left(1) at equal ts -> inclusive <= match
    w_back = (Window.partitionBy(on).orderBy("__us", "__side")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # left(1) before right(0) at equal ts -> inclusive >= match
    w_fwd = (Window.partitionBy(on)
             .orderBy("__us", F.col("__side").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))

    cols = []
    if direction in ("backward", "nearest"):
        cols.append(F.last("__pkt", ignorenulls=True).over(w_back)
                    .alias("__m_b"))
    if direction in ("forward", "nearest"):
        cols.append(F.first("__pkt", ignorenulls=True).over(w_fwd)
                    .alias("__m_f"))
    carried = both.select(*left.columns, "__side", "__us", *cols)
    out = carried.filter(F.col("__side") == 1)
    if direction == "backward":
        mts = F.col("__m_b")["__rts"]
        gap = F.col("__us") - mts
        mval = {c: F.col("__m_b")[f"__r_{c}"] for c in rcols}
    elif direction == "forward":
        mts = F.col("__m_f")["__rts"]
        gap = mts - F.col("__us")
        mval = {c: F.col("__m_f")[f"__r_{c}"] for c in rcols}
    else:
        # nearest: the closer of the two inclusive matches; equal
        # distance prefers the backward one (pandas merge_asof ties)
        gb = F.col("__us") - F.col("__m_b")["__rts"]
        gf = F.col("__m_f")["__rts"] - F.col("__us")
        use_b = F.col("__m_b").isNotNull() & (
            F.col("__m_f").isNull() | (gb <= gf))
        mts = F.when(use_b, F.col("__m_b")["__rts"]) \
            .otherwise(F.col("__m_f")["__rts"])
        gap = F.when(use_b, gb).otherwise(gf)
        mval = {c: F.when(use_b, F.col("__m_b")[f"__r_{c}"])
                .otherwise(F.col("__m_f")[f"__r_{c}"]) for c in rcols}
    in_window = mts.isNotNull()
    if tolerance_minutes is not None:
        in_window = in_window & (
            gap <= int(tolerance_minutes * 60_000_000))
    return out.select(
        *left.columns,
        F.when(in_window, F.timestamp_micros(mts)).alias(ts_col + suffix),
        *[F.when(in_window, mval[c]).alias(c + suffix) for c in rcols],
        F.when(in_window, gap).alias("asof_gap_us"))


def parse_event_props(df: DataFrame, props_col: str = "props",
                      schema: str = "k INT",
                      drop_corrupt: bool = False) -> DataFrame:
    """Schema-on-read for semi-structured event properties — the step
    every events lake runs before analytics: parse the JSON ``props``
    column with ``from_json`` (codegen'd Jackson parse at scan speed —
    no UDF, no shuffle) and lift the declared fields to top-level
    columns. Malformed JSON yields NULL fields (Spark's PERMISSIVE
    read) instead of failing the job; ``drop_corrupt=True`` filters
    those rows (a row is corrupt when the parse result is NULL but the
    raw string isn't).

    ``schema`` is a DDL string (``"k INT, tag STRING"``); only declared
    fields materialize — schema-on-read keeps 100 TB of ragged
    properties scannable without a migration every time producers add
    a key.

    Corrupt detection uses the parser's own corrupt-record channel
    (PERMISSIVE mode fills declared fields with NULL for malformed
    input WITHOUT nulling the struct, so a bare NULL check cannot tell
    "malformed" from "valid JSON missing the key")."""
    # Field names come from Spark's own DDL parser, not a naive comma
    # split — ``STRUCT<a: INT, b: INT>`` and ``DECIMAL(10,2)`` fields
    # carry commas inside one declaration.
    field_names = StructType.fromDDL(schema).fieldNames()
    parsed = F.from_json(
        F.col(props_col), schema + ", __corrupt STRING",
        {"columnNameOfCorruptRecord": "__corrupt"})
    out = df.withColumn("__p", parsed)
    if drop_corrupt:
        out = out.filter(F.col("__p.__corrupt").isNull())
    return out.select("*", *[F.col(f"__p.{n}") for n in field_names]) \
        .drop("__p")


def retention_cohorts(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      horizons: tuple = (1, 7)) -> DataFrame:
    """Cohort retention — the standard product-analytics rollup over an
    event log: each actor's cohort is the DATE of their first event;
    for every horizon ``k``, ``retained_d{k}`` counts cohort members
    active exactly ``k`` days after their cohort day and ``rate_d{k}``
    is that share of the cohort.

    Spark shape: ONE shuffle on the actor key (first-event groupBy; the
    distinct active-day relation reuses the same hash partitioning),
    one broadcast-able join of per-day activity back to cohorts, one
    final groupBy on cohort day (date-cardinality rows). Conditional
    horizon aggregates — no per-horizon scans, no self-join of the
    full log.

    Output: (cohort_day, n_users, retained_d{k}, rate_d{k} per k),
    rates rounded to 9 decimals (exact int/int quotients either way)."""
    if not horizons or any(h < 1 for h in horizons):
        raise ValueError("horizons must be positive day offsets")
    day = F.to_date(F.col(ts_col))
    first = df.groupBy(F.col(user_col).alias("uid")) \
        .agg(F.min(day).alias("cohort_day"))
    active = df.select(F.col(user_col).alias("uid"),
                       day.alias("active_day")).distinct()
    joined = (active.join(first, "uid")
              .withColumn("offset",
                          F.datediff("active_day", F.col("cohort_day"))))
    aggs = [F.countDistinct("uid").alias("n_users")]
    for h in horizons:
        aggs.append(F.countDistinct(
            F.when(F.col("offset") == h, F.col("uid")))
            .alias(f"retained_d{h}"))
    out = joined.groupBy("cohort_day").agg(*aggs)
    for h in horizons:
        out = out.withColumn(
            f"rate_d{h}",
            F.round(F.col(f"retained_d{h}")
                    / F.col("n_users").cast("double"), 9))
    return out
