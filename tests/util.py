"""Test helpers: normalize Ray/DuckDB results and compare them the way the
driver's correctness gate does (row count + schema + order-insensitive
values, columns aligned by sorted name)."""

from __future__ import annotations

import duckdb
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con.sql(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == bool:
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_class(dt) -> str:
    s = str(dt)
    if s.startswith(("int", "uint", "Int")):
        return "int"
    if s.startswith("float"):
        return "float"
    if "datetime" in s:
        return "datetime"
    return "object"


def assert_matches_oracle(ray_result, sql: str, sf_dir: str):
    raw_got = to_pandas(ray_result)
    raw_want = run_oracle(sql, sf_dir)
    # dtype CLASSES must match BEFORE normalization: the driver hashes
    # raw values, so an engine int64 against an oracle float64 (e.g.
    # DuckDB's SUM -> HUGEINT -> float64 promotion) hash-mismatches even
    # when the values are numerically equal — catch that here instead of
    # letting the lenient normalize mask it.
    for c in set(raw_got.columns) & set(raw_want.columns):
        gk, wk = _dtype_class(raw_got[c].dtype), _dtype_class(raw_want[c].dtype)
        assert gk == wk, (
            f"dtype class differs on {c!r}: engine {raw_got[c].dtype} vs "
            f"oracle {raw_want[c].dtype} — cast the aggregate in the SQL"
        )
    got = normalize(raw_got)
    want = normalize(raw_want)
    assert list(got.columns) == list(want.columns), (
        f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count differs: {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
