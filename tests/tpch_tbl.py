"""Regenerate the dbgen .tbl CSVs the reference's tpch slt goldens read.

The reference corpus at
/root/reference/datafusion/sqllogictest/test_files/tpch/ declares
``CREATE EXTERNAL TABLE ... LOCATION 'test_files/tpch/data/<t>.tbl'``
(create_tables.slt.part:34-72) against SF0.1 dbgen output that the repo
does not ship (its data/ dir is an empty placeholder — the Rust harness
generates it with a dbgen run).  DuckDB's bundled ``tpch`` extension is a
faithful dbgen port, so ``CALL dbgen(sf=0.1)`` reproduces the exact rows
the golden answers were computed from (verified: q1's golden aggregates
match to the cent).

dbgen's .tbl format is pipe-delimited with a TRAILING pipe on every line
— which is why every reference table schema carries a synthetic trailing
``*_rev VARCHAR`` column (create_tables.slt.part:20 documents this).  An
empty last CSV field reproduces that trailing delimiter.
"""

from __future__ import annotations

import os

_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "partsupp",
    "orders",
    "lineitem",
]

_SF = 0.1


def generate(sf: float = _SF) -> str:
    """Write tests/fixtures/tpch_tbl/<t>.tbl at ``sf`` (cached on disk)."""
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "tpch_tbl")
    marker = os.path.join(out, f".done-sf{sf}")
    if os.path.exists(marker) and all(
        os.path.isfile(os.path.join(out, f"{t}.tbl")) for t in _TABLES
    ):
        return out
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"LOAD tpch; CALL dbgen(sf={sf})")
    for t in _TABLES:
        # NULL writes as nothing -> bare trailing '|' like dbgen (an ''
        # literal would be written quoted as "")
        con.sql(
            f"COPY (SELECT *, CAST(NULL AS VARCHAR) AS _rev FROM {t}) TO "
            f"'{os.path.join(out, t + '.tbl')}' "
            "(FORMAT csv, DELIMITER '|', HEADER false)"
        )
    con.close()
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


if __name__ == "__main__":
    print(generate())
