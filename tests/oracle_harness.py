"""Mimics the driver's correctness gate: run a Spark query and its DuckDB
oracle SQL over the same parquet tables, then compare row count, column
names, and (column-name-sorted, row-sorted) values — floats with tolerance.

Modeled on the reference's sqllogictest strategy (SURVEY.md §5): engine
output vs a trusted oracle, order-insensitive unless the query sorts.
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any

import duckdb

TABLES = (
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
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    try:  # Decimal → float for cross-engine compare
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def _sort_key(row: tuple) -> tuple:
    # Floats are rounded to the comparison tolerance in the sort key so two
    # nearly-equal values can't sort into different positions (which would
    # mispair rows and fail a multiset that actually matches within tolerance).
    def k(v: Any) -> tuple:
        if isinstance(v, float) and not isinstance(v, bool):
            return (v is None, "float", f"{v:.6e}")
        return (v is None, str(type(v)), str(v))

    return tuple(k(v) for v in row)


def _values_close(a: Any, b: Any, rtol: float = 1e-6) -> bool:
    if a is None or b is None:
        return a is b
    if isinstance(a, bool) or isinstance(b, bool):
        return a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if isinstance(a, float) or isinstance(b, float):
            return math.isclose(float(a), float(b), rel_tol=rtol, abs_tol=1e-9)
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_close(x, y, rtol) for x, y in zip(a, b))
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, rtol: float = 1e-6) -> None:
    """Assert Spark result ≡ DuckDB oracle result (column-name-sorted,
    row-order-insensitive, float-tolerant)."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(row) for row in spark_df.collect()]

    rel = con.sql(sql)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"

    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    d_order = [d_cols.index(c) for c in sorted(d_cols)]
    s_sorted = sorted(
        (tuple(_norm(r[i]) for i in s_order) for r in s_rows), key=_sort_key
    )
    d_sorted = sorted(
        (tuple(_norm(r[i]) for i in d_order) for r in d_rows), key=_sort_key
    )
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        assert _values_close(sr, dr, rtol), (
            f"row {i} differs (cols {sorted(s_cols)}):\n  spark : {sr}\n  duckdb: {dr}"
        )
