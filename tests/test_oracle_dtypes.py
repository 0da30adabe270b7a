"""Guard against the oracle-dtype class of driver red rows.

Round-3 postmortem: DuckDB ``sum(BIGINT)`` returns HUGEINT, which
``.df()`` converts to pandas float64 — so a value-identical result
hash-mismatches the Spark side's int64 (CORRECTNESS_r03 ``agg_bits_bools``
and ``scan_arrow``). Every integer aggregate in an ORACLE string must be
cast (``CAST(sum(x) AS BIGINT)``).

This test types every registered oracle relation in DuckDB (lazily — no
execution) and fails on any HUGEINT/UHUGEINT output column, catching the
drift at pytest time before the driver sees it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_no_hugeint_oracle_columns(sf_dir):
    import __spark_entry__ as entrymod
    from tests.oracle_harness import duckdb_con

    con = duckdb_con(sf_dir)
    offenders: list[tuple[str, str, str]] = []
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)  # lazy: types come from the plan, nothing runs
        for col, typ in zip(rel.columns, rel.types):
            if str(typ).upper() in ("HUGEINT", "UHUGEINT"):
                offenders.append((name, col, str(typ)))
    assert not offenders, (
        "oracle columns that pandas will degrade to float64 "
        f"(add CAST(... AS BIGINT)): {offenders}"
    )
