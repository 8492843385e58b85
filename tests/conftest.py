import duckdb
import pytest

from dataops_testgen_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests")


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def canon(rows, ndigits=6):
    """Canonicalize result rows for order-insensitive comparison."""
    def fix(v):
        if isinstance(v, float):
            return round(v, ndigits)
        return v
    return sorted((tuple(fix(v) for v in r) for r in rows),
                  key=lambda r: [repr(v) for v in r])


def assert_matches_oracle(sdf, duck_con, sql, ndigits=6):
    """Compare a Spark DataFrame against a DuckDB query, column-name sorted,
    order-insensitive, floats rounded — mirrors the driver's t2 protocol."""
    cols = sorted(sdf.columns)
    s_rows = canon([tuple(r[c] for c in cols) for r in sdf.collect()], ndigits)
    res = duck_con.execute(sql)
    d_names = [d[0] for d in res.description]
    assert sorted(d_names) == cols, f"columns differ: spark={cols} duck={sorted(d_names)}"
    idx = [d_names.index(c) for c in cols]
    d_rows = canon([tuple(r[i] for i in idx) for r in res.fetchall()], ndigits)
    assert len(s_rows) == len(d_rows), f"row counts differ: {len(s_rows)} vs {len(d_rows)}"
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"row {i} differs:\n spark={a}\n duck ={b}"
