"""Mirror of the driver's t2 gate: every queries() entry must hash-match its
oracle_sql() on the same parquet tables (run here at sf0.001 for speed; the
driver uses sf0.01)."""

import importlib
import sys

import pytest

sys.path.insert(0, "/root/repo")
entry_mod = importlib.import_module("__spark_entry__")

from conftest import assert_matches_oracle

QUERY_NAMES = sorted(entry_mod.queries().keys())


def test_all_queries_have_callables():
    qs = entry_mod.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    if name not in oracles:
        assert sdf.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    assert_matches_oracle(sdf, duck, oracles[name])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 10
