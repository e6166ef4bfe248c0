"""Strict local mirror of the driver's DuckDB-oracle comparison.

Compares a Spark DataFrame against DuckDB SQL on the same parquet tables:
row count, column names, and EXACT value equality (order-insensitive, columns
sorted by name) — stricter than any plausible hash, so passing here predicts
passing the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from brooklin_spark.io import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        # unify all numerics to float64/int64 views for comparison
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")
    return df


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    actual = _normalize(spark_df.toPandas())
    expected = _normalize(con.sql(sql).df())
    assert list(actual.columns) == list(expected.columns), (
        f"{name}: column mismatch {list(actual.columns)} vs {list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} vs {len(expected)}"
    )
    for c in actual.columns:
        a, e = actual[c].to_numpy(), expected[c].to_numpy()
        if a.dtype.kind == "f" or e.dtype.kind == "f":
            a64 = a.astype(np.float64)
            e64 = e.astype(np.float64)
            both_nan = np.isnan(a64) & np.isnan(e64)
            same = (a64 == e64) | both_nan
            if not same.all():
                bad = np.where(~same)[0][:5]
                raise AssertionError(
                    f"{name}.{c}: {int((~same).sum())} float mismatches, "
                    f"first rows {bad.tolist()}: "
                    f"spark={a64[bad].tolist()} duck={e64[bad].tolist()}"
                )
        else:
            same = pd.Series(a).fillna("\0NULL") == pd.Series(e).fillna("\0NULL")
            if not same.all():
                bad = np.where(~same.to_numpy())[0][:5]
                raise AssertionError(
                    f"{name}.{c}: {int((~same).sum())} mismatches, rows {bad.tolist()}: "
                    f"spark={a[bad].tolist()} duck={e[bad].tolist()}"
                )
