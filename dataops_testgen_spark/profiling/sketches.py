"""Mergeable quantile sketches for partition-incremental profiling.

``merge_profiles`` (profiling/merge.py) folds per-slice profile rows into a
whole-table profile; scalar metrics merge algebraically, distinct counts
merge through DataSketches HLL — and percentiles, which the reference
computes exactly per profiling run (ref
``template/project_profiling_query.sql:150-152``), need a mergeable
quantile summary. Spark exposes no KLL/t-digest SQL aggregate (4.x ships
HLL only), so this module provides one with the properties the
incremental-profile path needs:

- **Exact below capacity.** The sketch is a sorted (value, weight) centroid
  list; duplicate values consolidate losslessly, so until a column exceeds
  ``capacity`` DISTINCT values the sketch is a lossless frequency table and
  percentile estimates equal the exact percentiles bit-for-bit (the
  interpolation reproduces Spark's ``percentile`` formula:
  ``(hi-pos)·v_lo + (pos-lo)·v_hi`` at ``pos = p·(n-1)``).
- **Bounded error above capacity.** Compression merges adjacent centroids
  into ~capacity/2 equal-weight groups (weighted-mean value), a simplified
  one-level t-digest (Dunning & Ertl 2019) with uniform (not tail-biased)
  buckets: rank error ≤ total_weight / (capacity/2) ≈ 2/capacity of the
  mass. capacity=4096 → ~0.05 % rank error, 64 KB per column.
- **Multiset merge.** ``merge`` concatenates centroid lists, re-sorts by
  value, consolidates, and compresses ONCE — the result depends only on
  the multiset of input centroids, not merge order, so per-partition
  sketches collected in whatever order the scheduler finishes them still
  merge deterministically.

100 TB shape: per-partition sketches stream through ``mapInPandas`` (fold
batch-by-batch, recompress at 4× capacity — memory per task is O(capacity)
per column, never the partition's row count), and only partitions × columns
sketch blobs ever reach the driver. The driver-side final merge is
metadata-plane by construction.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"QSK1"
_MAGIC2 = b"QSK2"


class QuantileSketch:
    """Sorted (value, weight) centroids. Immutable-ish: operations return
    new sketches. ``values`` float64 ascending, ``weights`` int64 > 0.
    ``lossless`` tracks whether compression has EVER occurred in this
    sketch's lineage: while True, the centroid list is an exact frequency
    table — percentiles are exact AND ``len(values)`` is the exact
    distinct count (merge.py uses this for an exact merged
    ``distinct_value_ct`` on numeric columns)."""

    __slots__ = ("values", "weights", "capacity", "lossless")

    def __init__(self, values: np.ndarray, weights: np.ndarray,
                 capacity: int = 4096, lossless: bool = True):
        self.values = values
        self.weights = weights
        self.capacity = capacity
        self.lossless = lossless

    # -- construction -------------------------------------------------------
    @classmethod
    def empty(cls, capacity: int = 4096) -> "QuantileSketch":
        return cls(np.empty(0), np.empty(0, dtype=np.int64), capacity)

    @classmethod
    def from_values(cls, arr, capacity: int = 4096) -> "QuantileSketch":
        a = np.asarray(arr, dtype=float)
        a = a[~np.isnan(a)]
        if not len(a):
            return cls.empty(capacity)
        vals, counts = np.unique(a, return_counts=True)  # lossless consolidation
        return cls(vals, counts.astype(np.int64), capacity)._compressed()

    # -- core ---------------------------------------------------------------
    @property
    def n(self) -> int:
        return int(self.weights.sum())

    @property
    def distinct_ct(self) -> int | None:
        """Exact distinct count — only while the sketch is lossless."""
        return len(self.values) if self.lossless else None

    def _compressed(self) -> "QuantileSketch":
        if len(self.values) <= self.capacity:
            return self
        target = max(2, self.capacity // 2)
        total = self.weights.sum()
        # equal-weight bucketing on the cumulative mass BEFORE each
        # centroid: the grouping is integer arithmetic over the centroid
        # multiset only, so merge order can't perturb it
        cum_before = np.concatenate(([0], np.cumsum(self.weights)[:-1]))
        group = (cum_before * target) // total
        # weighted mean per group, weights add
        sums = np.bincount(group, weights=self.values * self.weights)
        wsum = np.bincount(group, weights=self.weights.astype(float))
        keep = wsum > 0
        return QuantileSketch(sums[keep] / wsum[keep],
                              wsum[keep].astype(np.int64), self.capacity,
                              lossless=False)

    def merge(self, *others: "QuantileSketch") -> "QuantileSketch":
        """Multiset merge: concat → sort → consolidate → compress once.
        Order-insensitive by construction."""
        vs = [self.values] + [o.values for o in others]
        ws = [self.weights] + [o.weights for o in others]
        lossless = self.lossless and all(o.lossless for o in others)
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        if not len(v):
            return QuantileSketch.empty(self.capacity)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        # consolidate equal values (keeps the sketch exact as long as the
        # merged distinct count fits under capacity)
        boundary = np.concatenate(([True], np.diff(v) != 0))
        idx = np.cumsum(boundary) - 1
        vals = v[boundary]
        weights = np.bincount(idx, weights=w.astype(float)).astype(np.int64)
        return QuantileSketch(vals, weights, self.capacity,
                              lossless=lossless)._compressed()

    def percentile(self, p: float) -> float | None:
        """Estimate the p-quantile with Spark's exact-``percentile``
        interpolation over the weighted ranks; equals the exact percentile
        whenever no compression has occurred."""
        n = self.n
        if n == 0:
            return None
        pos = p * (n - 1)
        lo = math.floor(pos)
        hi = math.ceil(pos)
        cum = np.cumsum(self.weights)
        v_lo = float(self.values[np.searchsorted(cum, lo, side="right")])
        if lo == hi:
            return v_lo
        v_hi = float(self.values[np.searchsorted(cum, hi, side="right")])
        return (hi - pos) * v_lo + (pos - lo) * v_hi

    # -- serialization ------------------------------------------------------
    def to_bytes(self) -> bytes:
        return (_MAGIC2
                + struct.pack("<qqb", len(self.values), self.capacity,
                              1 if self.lossless else 0)
                + self.values.astype("<f8").tobytes()
                + self.weights.astype("<i8").tobytes())

    @classmethod
    def from_bytes(cls, b: bytes) -> "QuantileSketch":
        if b[:4] == _MAGIC2:
            k, capacity, lossless = struct.unpack_from("<qqb", b, 4)
            off = 4 + 17
        elif b[:4] == _MAGIC:
            # pre-flag blobs (e.g. profiles persisted by an older RunStore):
            # conservatively treat as compressed — percentile estimates
            # still work, exact distinct_ct is simply unavailable
            k, capacity = struct.unpack_from("<qq", b, 4)
            lossless = 0
            off = 4 + 16
        else:
            raise ValueError("not a QSK1/QSK2 quantile sketch")
        values = np.frombuffer(b, dtype="<f8", count=k, offset=off).copy()
        weights = np.frombuffer(b, dtype="<i8", count=k,
                                offset=off + 8 * k).copy()
        return cls(values, weights, int(capacity), lossless=bool(lossless))


def merge_sketch_blobs(blobs, capacity: int | None = None) -> QuantileSketch:
    """Merge serialized sketches (skipping NULLs) into one sketch."""
    sketches = [QuantileSketch.from_bytes(b) for b in blobs if b is not None]
    if not sketches:
        return QuantileSketch.empty(capacity or 4096)
    if capacity is not None:
        for s in sketches:
            s.capacity = capacity
    return sketches[0].merge(*sketches[1:])


class FreqSketch:
    """Bounded exact value-frequency summary for the merged top-k metrics.

    The reference's secondary profile only reports top_freq_values /
    distinct_value_hash for columns with 2–70 distinct values
    (``secondary_profiling_columns.sql:1-12``), so a bounded EXACT counter
    with capacity ≥ 70 makes the merged metrics exact-or-NULL by
    construction: a column whose distinct count stays under ``capacity``
    keeps every (value, count) pair exactly and reproduces the full-table
    top-k / distinct hash bit-for-bit, and a column that overflows has
    > capacity ≥ 70 distinct values — disqualified by the reference's own
    rule, so NULL is the *correct* answer, not an approximation. (This is
    deliberately NOT Misra-Gries: approximate heavy-hitter counts would
    silently diverge from the reference's exact strings.)

    ``max_len`` merges exactly even after overflow (it gates the ≤ 70
    length qualifier). Merge is a counter union — order-insensitive."""

    __slots__ = ("counts", "capacity", "overflowed", "max_len")

    def __init__(self, capacity: int = 256):
        self.counts: dict[str, int] = {}
        self.capacity = capacity
        self.overflowed = False
        self.max_len = 0

    def add_counts(self, items) -> None:
        for v, c in items:
            if v is None:
                continue
            self.max_len = max(self.max_len, len(v))
            if self.overflowed:
                continue
            if v in self.counts:
                self.counts[v] += c
            elif len(self.counts) < self.capacity:
                self.counts[v] = c
            else:
                self.overflowed = True
                self.counts = {}

    def merge(self, other: "FreqSketch") -> "FreqSketch":
        out = FreqSketch(self.capacity)
        out.max_len = max(self.max_len, other.max_len)
        out.overflowed = self.overflowed or other.overflowed
        if not out.overflowed:
            out.counts = dict(self.counts)
            for v, c in other.counts.items():
                if v in out.counts:
                    out.counts[v] += c
                elif len(out.counts) < out.capacity:
                    out.counts[v] = c
                else:
                    out.overflowed = True
                    out.counts = {}
                    break
        return out

    @property
    def n_distinct(self) -> int | None:
        return None if self.overflowed else len(self.counts)

    def top_k(self, k: int) -> list[tuple[str, int]] | None:
        """Top-k by (count DESC, value ASC) — the secondary profile's
        deterministic tiebreak; None once overflowed."""
        if self.overflowed:
            return None
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def distinct_hash(self) -> str | None:
        """md5 of the '|'-joined sorted distinct values — the secondary
        profile's distinct_value_hash."""
        import hashlib

        if self.overflowed:
            return None
        return hashlib.md5(
            "|".join(sorted(self.counts)).encode()).hexdigest()

    def to_bytes(self) -> bytes:
        import json as _json

        return ("FQS1" + _json.dumps(
            {"cap": self.capacity, "over": self.overflowed,
             "max_len": self.max_len,
             "counts": self.counts}, sort_keys=True)).encode()

    @classmethod
    def from_bytes(cls, b: bytes) -> "FreqSketch":
        import json as _json

        s = b.decode()
        if not s.startswith("FQS1"):
            raise ValueError("not a FQS1 frequency sketch")
        d = _json.loads(s[4:])
        out = cls(d["cap"])
        out.overflowed = d["over"]
        out.max_len = d["max_len"]
        out.counts = {k: int(v) for k, v in d["counts"].items()}
        return out


def merge_freq_blobs(blobs, capacity: int | None = None) -> FreqSketch:
    sketches = [FreqSketch.from_bytes(b) for b in blobs if b is not None]
    if not sketches:
        return FreqSketch(capacity or 256)
    acc = sketches[0]
    for s in sketches[1:]:
        acc = acc.merge(s)
    return acc


def _pattern_of(value: str) -> str:
    """Python twin of secondary.pattern_of ([a-z]→a, [A-Z]→A, [0-9]→N) —
    ASCII classes, identical in Java and Python regex."""
    import re

    return re.sub("[0-9]", "N",
                  re.sub("[A-Z]", "A", re.sub("[a-z]", "a", value)))


_STD_DELETE = str.maketrans("", "", " ',.-")
_STD_CAPACITY = 4096


def _standardize(value: str) -> str:
    """Python twin of the profiler's standardized-value expression
    ``upper(translate(c, " ',.-", ""))`` (expressions.py alpha_metrics) —
    both strip the same 5 chars then uppercase, so the distinct count of
    standardized values merges exactly."""
    return value.translate(_STD_DELETE).upper()


def _slice_groups(pdf, slice_col):
    """[(slice_key, frame)] for one Arrow batch: the whole frame under
    key None without ``slice_col``, else one pandas group per slice value
    (NULL slice keeps its own group, key None)."""
    import pandas as pd

    if slice_col is None:
        return [(None, pdf)]
    return [(None if pd.isna(k) else str(k), g)
            for k, g in pdf.groupby("__slice", dropna=False)]


def column_freq_sketches(
        df, columns: list[str], capacity: int = 256,
        std_capacity: int = _STD_CAPACITY, slice_col: str | None = None,
) -> dict:
    """One distributed pass → {column: (value_sketch, pattern_sketch,
    std_value_sketch)} for the string ``columns``. Same shape as
    column_quantile_sketches: per-partition bounded fold in mapInPandas,
    partitions × columns blobs to the driver, order-insensitive merge.
    The std sketch counts standardized values (upper + strip " ',.-")
    with a larger capacity — it only feeds a distinct COUNT
    (distinct_std_value_ct), not reference-exact strings.

    ``slice_col`` (the profiler's single-pass sliced mode): fold per
    (slice, column) inside the same ONE pass — keys become
    (slice_key_str, column); memory is slices × columns × capacity, so
    slice cardinality must stay partition-like."""
    from pyspark.sql import functions as F

    if not columns:
        return {}

    def per_partition(batches):
        import pandas as pd

        vals: dict = {}
        pats: dict = {}
        stds: dict = {}
        for pdf in batches:
            for skey, sub in _slice_groups(pdf, slice_col):
                for c in columns:
                    k = (skey, c)
                    if k not in vals:
                        vals[k] = FreqSketch(capacity)
                        pats[k] = FreqSketch(capacity)
                        stds[k] = FreqSketch(std_capacity)
                    counted = sub[c].dropna().value_counts()
                    vals[k].add_counts(
                        (str(v), int(n)) for v, n in counted.items())
                    pats[k].add_counts(
                        (_pattern_of(str(v)), int(n))
                        for v, n in counted.items())
                    stds[k].add_counts(
                        (_standardize(str(v)), int(n))
                        for v, n in counted.items())
        keys = sorted(vals, key=lambda k: (k[0] or "", k[1]))
        yield pd.DataFrame({
            "slice": [k[0] for k in keys],
            "column": [k[1] for k in keys],
            "value_sketch": [vals[k].to_bytes() for k in keys],
            "pattern_sketch": [pats[k].to_bytes() for k in keys],
            "std_value_sketch": [stds[k].to_bytes() for k in keys]})

    sel = [F.col(c).cast("string").alias(c) for c in columns]
    if slice_col is not None:
        sel = [F.col(slice_col).cast("string").alias("__slice")] + sel
    rows = (df.select(*sel)
            .mapInPandas(per_partition,
                         schema="slice string, column string, "
                                "value_sketch binary, "
                                "pattern_sketch binary, "
                                "std_value_sketch binary")
            .collect())
    keys = sorted({(r["slice"], r["column"]) for r in rows},
                  key=lambda k: (k[0] or "", k[1]))
    out = {}
    for k in keys:
        blobs = [r for r in rows
                 if (r["slice"], r["column"]) == k]
        merged = (
            merge_freq_blobs([r["value_sketch"] for r in blobs],
                             capacity).to_bytes(),
            merge_freq_blobs([r["pattern_sketch"] for r in blobs],
                             capacity).to_bytes(),
            merge_freq_blobs([r["std_value_sketch"] for r in blobs],
                             std_capacity).to_bytes())
        out[k if slice_col is not None else k[1]] = merged
    if slice_col is None:
        # empty input yields no partition rows — keep the historical
        # contract of an (empty) sketch triple per requested column
        for c in columns:
            out.setdefault(c, (FreqSketch(capacity).to_bytes(),
                               FreqSketch(capacity).to_bytes(),
                               FreqSketch(std_capacity).to_bytes()))
    return out


def column_quantile_sketches(df, columns: list[str],
                             capacity: int = 4096,
                             slice_col: str | None = None) -> dict:
    """One distributed pass → {column: serialized sketch} for the numeric
    ``columns`` of ``df``. Per-partition fold via ``mapInPandas`` (bounded
    memory: recompress at 4× capacity), then an order-insensitive driver
    merge of partitions × columns blobs (metadata-plane).

    ``slice_col`` (the profiler's single-pass sliced mode): fold per
    (slice, column) in the same ONE pass — keys become
    (slice_key_str, column)."""
    from pyspark.sql import functions as F

    if not columns:
        return {}

    def per_partition(batches):
        import pandas as pd

        accs: dict = {}
        for pdf in batches:
            for skey, sub in _slice_groups(pdf, slice_col):
                for c in columns:
                    vals = pd.to_numeric(sub[c], errors="coerce").to_numpy(
                        dtype=float, na_value=np.nan)
                    if len(vals):
                        acc = accs.get((skey, c))
                        if acc is None:
                            acc = QuantileSketch.empty(capacity * 4)
                        accs[(skey, c)] = acc.merge(
                            QuantileSketch.from_values(vals, capacity * 4))
        keys = sorted(accs, key=lambda k: (k[0] or "", k[1]))
        rows = {"slice": [], "column": [], "sketch": []}
        for k in keys:
            s = accs[k]
            s.capacity = capacity * 4  # final per-partition blob stays wide
            rows["slice"].append(k[0])
            rows["column"].append(k[1])
            rows["sketch"].append(s.to_bytes())
        yield pd.DataFrame(rows)

    sel = [F.col(c).cast("double").alias(c) for c in columns]
    if slice_col is not None:
        sel = [F.col(slice_col).cast("string").alias("__slice")] + sel
    part_rows = (df.select(*sel)
                 .mapInPandas(per_partition,
                              schema="slice string, column string, "
                                     "sketch binary")
                 .collect())
    out = {}
    keys = sorted({(r["slice"], r["column"]) for r in part_rows},
                  key=lambda k: (k[0] or "", k[1]))
    for k in keys:
        blobs = [r["sketch"] for r in part_rows
                 if (r["slice"], r["column"]) == k]
        merged = merge_sketch_blobs(blobs, capacity).to_bytes()
        out[k if slice_col is not None else k[1]] = merged
    if slice_col is None:
        for c in columns:
            out.setdefault(
                c, merge_sketch_blobs([], capacity).to_bytes())
    return out
