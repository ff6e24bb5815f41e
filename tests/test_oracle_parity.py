"""Driver-conformance harness: every queries() entry with an oracle_sql()
entry must match DuckDB exactly (row count, column set, values) at
sf0.001 — the local replica of the driver's sf0.01 correctness gate."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = os.environ.get("PARITY_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def run_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


ORACLE_QUERIES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    mine = normalize(to_pandas(q(SF_DIR)))
    oracle = normalize(run_oracle(sql))
    assert list(mine.columns) == list(oracle.columns), f"column mismatch: {mine.columns} vs {oracle.columns}"
    assert len(mine) == len(oracle), f"row count mismatch: {len(mine)} vs {len(oracle)}"
    for c in mine.columns:
        a, b = mine[c], oracle[c]
        if pd.api.types.is_float_dtype(a):
            ok = ((a.isna() & b.isna()) | (a == b)).all()
            if not ok:
                close = np.isclose(a.fillna(math.nan), b.fillna(math.nan), rtol=0, atol=1e-9, equal_nan=True).all()
                raise AssertionError(
                    f"float column '{c}' differs (close={close}); "
                    f"first diffs:\n{pd.DataFrame({'mine': a, 'oracle': b})[~((a.isna() & b.isna()) | (a == b))].head()}"
                )
        else:
            diff = ~((a.isna() & b.isna()) | (a == b))
            assert not diff.any(), f"column '{c}' differs:\n{pd.DataFrame({'mine': a, 'oracle': b})[diff].head()}"


NO_ORACLE = sorted(set(entrymod.queries().keys()) - set(ORACLE_QUERIES))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(name):
    out = to_pandas(entrymod.queries()[name](SF_DIR))
    assert len(out) >= 0 and len(out.columns) > 0


def test_entry_smoke():
    res = entrymod.entry()
    df = to_pandas(res)
    assert len(df) > 0
    assert "value_shift_1" in df.columns
