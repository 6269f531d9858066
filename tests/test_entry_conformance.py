"""Driver-conformance rehearsal: run every ``queries()`` entry at sf0.001
and compare against its ``oracle_sql()`` in DuckDB the way the driver does
(row count + sorted-column value equality).  Rows-only entries are checked
for execution + non-empty schema."""

import shutil

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df


@pytest.fixture(scope="module", autouse=True)
def fresh_tmp(ray_session):
    shutil.rmtree("/tmp/mpr_queries/sf0.001", ignore_errors=True)
    yield


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(name, con, ray_session):
    q = entry_mod.queries()[name]
    raw = to_df(q(SF))
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(raw) >= 0 and len(raw.columns) > 0  # rows-only contract
        return
    got = normalize(raw)
    want = normalize(con.sql(oracle).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False,
                                  rtol=1e-6, atol=1e-9)


def test_entry_smoke(ray_session):
    ds = entry_mod.entry()
    df = to_df(ds)
    assert len(df) >= 0
    assert {"conv_id", "turn_idx", "text"} <= set(df.columns)
