"""TPC-DS sf0.1 dataset for the execution differential test.

The reference's own TPC-DS bar is planning-only (tpcds_planning.rs); the
execution test goes beyond it, so it needs data the repo can generate
hermetically: DuckDB's bundled ``tpcds`` extension (``CALL dsdgen``) is
the dsdgen port used here. sf=0.1 keeps 70 of the 99 queries non-empty
(checked at generation of this module) while staying a ~2s generate and
a few MB of parquet, cached under tests/fixtures/tpcds/.
"""

from __future__ import annotations

import os

TABLES = [
    "call_center", "catalog_page", "catalog_returns", "catalog_sales",
    "customer", "customer_address", "customer_demographics", "date_dim",
    "household_demographics", "income_band", "inventory", "item",
    "promotion", "reason", "ship_mode", "store", "store_returns",
    "store_sales", "time_dim", "warehouse", "web_page", "web_returns",
    "web_sales", "web_site",
]

_SF = 0.1


def generate(sf: float = _SF) -> str:
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "tpcds"
    )
    marker = os.path.join(out, f".done-sf{sf}")
    if os.path.exists(marker) and all(
        os.path.isfile(os.path.join(out, f"{t}.parquet")) for t in TABLES
    ):
        return out
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"LOAD tpcds; CALL dsdgen(sf={sf})")
    for t in TABLES:
        con.sql(
            f"COPY {t} TO '{os.path.join(out, t + '.parquet')}' (FORMAT parquet)"
        )
    con.close()
    with open(marker, "w") as f:
        f.write("ok\n")
    return out
