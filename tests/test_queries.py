"""Local replica of the driver's correctness gate: every ``queries()``
entry vs its ``oracle_sql()`` DuckDB mirror on /root/testdata/sf0.001
(the driver runs sf0.01) — row count, column names, and values after
column-name-sorted, row-sorted normalization."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name, ray_df, sql_df):
    a, b = normalize(ray_df), normalize(sql_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for c in a.columns:
        # The driver's value hash is dtype-sensitive (int64 vs float64 of the
        # same value hash differently) — mirror that here at kind granularity.
        ak, bk = a[c].dtype.kind, b[c].dtype.kind
        assert (ak == bk) or {ak, bk} <= {"i", "u"}, (
            f"{name}.{c}: dtype kind {a[c].dtype} != {b[c].dtype}"
        )
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert abs(x - y) < 1e-9, f"{name}.{c}[{i}]: {x} != {y}"
            else:
                assert x == y, f"{name}.{c}[{i}]: {x!r} != {y!r}"


ORACLES = entry_mod.oracle_sql()
ALL = entry_mod.queries()
CHECKED = sorted(set(ALL) & set(ORACLES))
ROWS_ONLY = sorted(set(ALL) - set(ORACLES))


@pytest.mark.parametrize("name", CHECKED)
def test_query_vs_oracle(ray_session, con, name):
    ray_df = to_pandas(ALL[name](SF_DIR))
    sql_df = con.execute(ORACLES[name]).fetchdf()
    compare(name, ray_df, sql_df)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    df = to_pandas(ALL[name](SF_DIR))
    assert len(df) >= 0 and len(df.columns) >= 1


def test_entry_smoke(ray_session):
    ds = entry_mod.entry()
    df = to_pandas(ds)
    assert len(df) > 0
    assert {"doc_id", "tokens", "n_tok", "source"} <= set(df.columns)
