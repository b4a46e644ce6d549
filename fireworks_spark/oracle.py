"""DuckDB differential-oracle harness (mirrors the driver's t2 check:
row-count + schema + order-insensitive value comparison).

Used by tests; the driver runs its own equivalent against
``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import pandas as pd


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with every test table registered as a view."""
    from fireworks_spark.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by every column (order-insensitive)."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    out = out.sort_values(by=list(out.columns), na_position="first").reset_index(
        drop=True
    )
    return out


def _values_equal(a: Any, b: Any, rel_tol: float = 1e-9) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=rel_tol, abs_tol=1e-9)
    return a == b


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatches (empty == pass)."""
    sp = canonicalize(spark_df.toPandas())
    oc = canonicalize(oracle_df)
    problems: list[str] = []
    if list(sp.columns) != list(oc.columns):
        problems.append(f"columns: spark={list(sp.columns)} oracle={list(oc.columns)}")
        return problems
    if len(sp) != len(oc):
        problems.append(f"rowcount: spark={len(sp)} oracle={len(oc)}")
        return problems
    for c in sp.columns:
        sv, ov = sp[c].tolist(), oc[c].tolist()
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(sv, ov))
            if not _series_val_eq(x, y)
        ]
        if bad:
            problems.append(f"col {c}: {len(bad)} diffs, first={bad[:3]}")
    return problems


def _series_val_eq(x: Any, y: Any) -> bool:
    if isinstance(x, (list, tuple)) and isinstance(y, (list, tuple)):
        return len(x) == len(y) and all(_series_val_eq(a, b) for a, b in zip(x, y))
    if pd.isna(x) if not isinstance(x, (list, tuple)) else False:
        return (pd.isna(y) if not isinstance(y, (list, tuple)) else False) is True
    if isinstance(y, float) or isinstance(x, float):
        try:
            return _values_equal(float(x), float(y))
        except (TypeError, ValueError):
            return False
    try:
        import decimal

        if isinstance(x, decimal.Decimal) or isinstance(y, decimal.Decimal):
            return _values_equal(float(x), float(y))
    except Exception:
        pass
    return x == y
