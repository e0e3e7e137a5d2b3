"""Driver-style correctness gate replica: run every queries() entry and its
oracle_sql() side by side on sf0.001 (fast) and compare row-count, schema
(column names) and order-insensitive values."""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _con(sf_dir):
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


SF = "/root/testdata/sf0.001"


def _compare(name, ray_df, sql_df):
    a, b = _normalize(ray_df), _normalize(sql_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.allclose(av, bv, rtol=0, atol=1e-9, equal_nan=True), f"{name}.{c}"
        else:
            assert (av == bv).all() or (pd.isna(av) == pd.isna(bv)).all() and (
                av[~pd.isna(av)] == bv[~pd.isna(bv)]
            ).all(), f"{name}.{c}"


def all_query_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_vs_oracle(ray_session, name):
    import __ray_entry__ as e

    ray_df = _to_df(e.queries_full()[name](SF))
    con = _con(SF)
    sql_df = con.execute(e.oracle_sql()[name]).df()
    _compare(name, ray_df, sql_df)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    df = _to_df(ds)
    assert len(df) >= 0
    assert "event_type" in df.columns and "sink" in df.columns
