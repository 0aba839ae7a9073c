"""DuckDB oracle comparison used by tests and local iteration.

Mirrors the driver's check: run the Spark query and the oracle SQL on
the same parquet tables, compare row count, column names, and values
order-insensitively. Values are compared exactly (the query registry is
designed for bit-identical doubles via exact decimal aggregation), with
a small epsilon fallback reported separately so a near-miss is visible.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@dataclass
class CompareResult:
    name: str
    rows_spark: int
    rows_oracle: int
    columns_match: bool
    exact_match: bool
    approx_match: bool
    detail: str = ""

    @property
    def ok(self) -> bool:
        return (
            self.rows_spark == self.rows_oracle
            and self.columns_match
            and self.exact_match
        )


def _values_equal(a, b, exact: bool) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if exact:
            return a == b
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    try:
        return bool(a == b)
    except Exception:
        return str(a) == str(b)


def _frames_equal(a: pd.DataFrame, b: pd.DataFrame, exact: bool) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not _values_equal(x, y, exact):
                return False, f"col {col} row {i}: {x!r} != {y!r}"
    return True, ""


def compare_query(spark, sf_dir: str, name: str, fn, sql: str) -> CompareResult:
    sdf = fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    try:
        odf = con.execute(sql).fetch_df()
    finally:
        con.close()
    cols_match = sorted(sdf.columns) == sorted(odf.columns)
    if not cols_match:
        return CompareResult(
            name,
            len(sdf),
            len(odf),
            False,
            False,
            False,
            detail=f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}",
        )
    a, b = _canon(sdf), _canon(odf)
    exact, det = _frames_equal(a, b, exact=True)
    approx = exact
    if not exact:
        approx, det2 = _frames_equal(a, b, exact=False)
        det = det if not approx else f"approx-only: {det}"
    return CompareResult(name, len(sdf), len(odf), True, exact, approx, det)
