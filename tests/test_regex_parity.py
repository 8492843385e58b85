"""Property-based cross-engine parity fuzz for the regex-semantics helpers.

The profiling metrics are defined by regex LITERALS shared between the
Spark plan (Java regex via ``rlike``) and the DuckDB oracle (RE2 via
``regexp_matches``). The two engines' regex dialects differ at the edges
(unicode classes, anchors, possessiveness), so this fuzz feeds the same
adversarial ASCII-ish strings through BOTH engines and requires identical
match verdicts for every shared pattern — the drift class that hash
matching at sf0.01 would only catch if the fixture happened to contain a
triggering value.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataops_testgen_spark.profiling import regexes as RX

PATTERNS = {
    "is_num": RX.IS_NUM_RE,
    "quoted": RX.QUOTED_RE,
    "filled_run": RX.FILLED_RUN_RE,
    "filled_wrapped": RX.FILLED_WRAPPED_RE,
    "zero_text": RX.ZERO_TEXT_RE,
}

# adversarial alphabet: digits, signs, currency, separators, quotes,
# whitespace runs, word-list fragments, brackets
_FRAGS = st.sampled_from(
    ["0", "9", "1,234", "12,34", ".", "..", "-", "?", "x", "z", "$",
     "+", "%", " ", "  ", "\t", "'", '"', "(", ")", "[", "]", "n/a",
     "null", "unknown", "missing", "error", "3.14", ",", "a", "Z",
     "0.0", "00", ".5", "5.", "1,234,567", "$1,0", "e", "E", "-1"])
strings = st.lists(_FRAGS, min_size=0, max_size=6).map("".join)


@pytest.fixture(scope="module")
def engines(spark):
    con = duckdb.connect()
    return spark, con


@settings(max_examples=30, deadline=None)
@given(batch=st.lists(strings, min_size=1, max_size=40, unique=True))
def test_pattern_parity(engines, batch):
    spark, con = engines
    df = spark.createDataFrame([(s,) for s in batch], "s: string")
    sel = [F.col("s")]
    for name, rx in PATTERNS.items():
        sel.append(F.coalesce(F.col("s").rlike(rx), F.lit(False)).alias(name))
    got_spark = {r["s"]: tuple(bool(r[n]) for n in PATTERNS)
                 for r in df.select(*sel).collect()}
    got_duck = {}
    for s in batch:
        row = []
        for name, rx in PATTERNS.items():
            sql_rx = rx.replace("'", "''")
            v = con.execute(
                "SELECT regexp_matches(?, '" + sql_rx + "')", [s]
            ).fetchone()[0]
            row.append(bool(v))
        got_duck[s] = tuple(row)
    assert got_spark == got_duck


_WS_FRAGS = st.sampled_from(
    ["word", "Tok", "a", "bc", " ", "  ", "\t", "\n", "x,y", "7", "-",
     "end.", "Ü"])
ws_strings = st.lists(_WS_FRAGS, min_size=1, max_size=8).map("".join)


@settings(max_examples=30, deadline=None)
@given(batch=st.lists(ws_strings, min_size=1, max_size=25, unique=True))
def test_tokenization_parity(engines, batch):
    """Every shingle/tfidf/unigram/jaccard oracle assumes
    string_split_regex(trim(lower(s)), '\\s+') ≡ the engine's tokens();
    fuzz that equivalence, including unicode letters and mixed whitespace."""
    from dataops_testgen_spark.pipeline.text import tokens

    spark, con = engines
    df = spark.createDataFrame([(s,) for s in batch], "s: string")
    got_spark = {r["s"]: list(r["t"]) for r in
                 df.select("s", tokens(F.col("s")).alias("t")).collect()}
    for s in batch:
        # the blank-guard must use SQL trim (spaces only — Spark and
        # DuckDB agree), not Python strip (which also eats tabs/newlines):
        # a tab-only string tokenizes to ['', ''] in BOTH engines
        want = con.execute(
            "SELECT CASE WHEN trim(?) = '' THEN []::VARCHAR[] "
            "ELSE string_split_regex(trim(lower(?)), '\\s+') END",
            [s, s]).fetchone()[0]
        assert got_spark[s] == want, repr(s)


_DATE_FRAGS = st.sampled_from(
    ["2024-03-15", "2024-3-5", "2024-13-40", "03/15/2024", "3/5/2024",
     "31/12/2024", "15-Mar-2024", "15-mar-2024", "Mar 15 2024",
     "Mar 15, 2024", "20240315", "2024-02-30", "2024-02-29", "2023-02-29",
     "2024-03-15 10:20:30", "2024-03-15 25:00:00", "99990101", "0",
     "12345678", "hello", "", " 2024-03-15", "2024-03-15 ", "Mar 99 2024",
     "5-Mar-2024", "Mar 5 2024", "Mar 5, 2024", "2024-03-15 1:2:3",
     "00000101", "13/13/2024", "02/29/2023", "2024-00-10", "2024-01-00"])


@settings(max_examples=25, deadline=None)
@given(batch=st.lists(_DATE_FRAGS, min_size=1, max_size=20, unique=True))
def test_is_date_parity(engines, batch):
    """The IS_DATE multi-format semantics (profiling date_ct) must agree
    between Spark's try_to_timestamp chain and the oracle's try_strptime
    format list — including month-length/leap-day rejection and the
    whitespace TRIM."""
    from dataops_testgen_spark.profiling.expressions import _is_date

    spark, con = engines
    df = spark.createDataFrame([(s,) for s in batch], "s: string")
    got_spark = {r["s"]: bool(r["d"]) for r in df.select(
        "s", F.coalesce(_is_date(F.substring(F.col("s"), 1, 26)),
                        F.lit(False)).alias("d")).collect()}
    from dataops_testgen_spark.oracles import duck_is_date

    expr = duck_is_date("TRIM(substr(s, 1, 26))")
    got_duck = {}
    for s in batch:
        v = con.execute(f"SELECT {expr} FROM (SELECT ? AS s)",
                        [s]).fetchone()[0]
        got_duck[s] = bool(v)
    assert got_spark == got_duck


dates = st.dates(min_value=__import__("datetime").date(1900, 1, 1),
                 max_value=__import__("datetime").date(2100, 12, 28))


@settings(max_examples=20, deadline=None)
@given(batch=st.lists(st.tuples(dates, dates), min_size=1, max_size=30,
                      unique=True))
def test_date_arithmetic_parity(engines, batch):
    """The profile/CAT date metrics use boundary-count months and day
    diffs; both must equal DuckDB's date_diff semantics for arbitrary
    date pairs (Spark's months_between is fractional and was deliberately
    avoided — this pins the replacement)."""
    spark, con = engines
    df = spark.createDataFrame(batch, "a: date, b: date")
    months = ((F.year("a") - F.year("b")) * 12
              + (F.month("a") - F.month("b")))
    got = {(str(r["a"]), str(r["b"])): (r["m"], r["d"]) for r in
           df.select("a", "b", months.alias("m"),
                     F.datediff("a", "b").alias("d")).collect()}
    for a, b in batch:
        m, d = con.execute(
            "SELECT date_diff('month', ?::DATE, ?::DATE),"
            " date_diff('day', ?::DATE, ?::DATE)",
            [b, a, b, a]).fetchone()
        assert got[(str(a), str(b))] == (m, d), (a, b)


_TEXT_FRAGS = st.sampled_from(
    ["the", "fox", "a", "", " ", "  ", "\t", "\n", "Ü", "ß", "x'y",
     "don't", "1,2", "end.", "...", "a-b", "Mixed", "CASE", "λ", "ω"])
_texts = st.lists(_TEXT_FRAGS, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(batch=st.lists(_texts, min_size=1, max_size=20, unique=True))
def test_dsir_gram_parity(engines, batch):
    """The DSIR oracle re-derives the hashed-gram pipeline in SQL; fuzz
    that the GRAM MULTISET (unigrams + bigrams, pre-hash) is identical
    across engines — md5 agreement is then automatic. Covers mixed
    whitespace, unicode letters, and the tab-only tokenization edge."""
    from dataops_testgen_spark.pipeline.sampling import _hashed_grams

    spark, con = engines
    df = spark.createDataFrame(list(enumerate(batch)),
                               "doc_id: long, text: string")
    # _hashed_grams emits buckets; to compare the raw grams, rebuild with a
    # 1:1 "bucket" — n_buckets so large no modulo collision changes counts
    from collections import Counter

    got = Counter((r["id"], r["bucket"]) for r in
                  _hashed_grams(df, "text", "doc_id", 2**62, "p").collect())
    want = Counter()
    for i, s in enumerate(batch):
        rows = con.execute("""
            WITH t AS (SELECT CASE WHEN trim(?) = '' THEN []::VARCHAR[]
                   ELSE string_split_regex(trim(lower(?)), '\\s+') END AS toks),
            g AS (SELECT unnest(toks) AS gram FROM t
                  UNION ALL
                  SELECT toks[i] || ' ' || toks[i + 1]
                    FROM t, UNNEST(range(1, len(toks))) AS r(i))
            SELECT CAST(concat('0x', substr(md5('p' || '|' || gram), 1, 8))
                        AS UBIGINT) % ? FROM g""",
            [s, s, 2**62]).fetchall()
        for (b,) in rows:
            want[(i, int(b))] += 1
    assert got == want
