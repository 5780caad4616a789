"""Local mirror of the driver's correctness gate: every queries() entry
runs at sf0.01 and must match its oracle_sql() via DuckDB —
order-insensitive, rounded values, same column names."""

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_MED

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck_med():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_MED, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) >= 0 and len(out.schema) >= 2


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, duck_med, name):
    q = entrymod.queries()[name]
    sqls = entrymod.oracle_sql()
    got = _canon(q(spark, SF_MED).toPandas())
    if name not in sqls:
        assert len(got) >= 0  # rows-only check, mirrors driver fallback
        return
    exp = _canon(duck_med.execute(sqls[name]).fetchdf())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-4)
