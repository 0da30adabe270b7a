"""TPC-DS planning parity — mirrors the reference's planning-only gate
(datafusion/core/tests/tpcds_planning.rs): register EMPTY tables with the
reference's 24 TPC-DS schemas, then build + optimize a logical plan for
all 99 queries from core/tests/tpc-ds/*.sql. Execution is not required —
the reference's own bar is "it plans".

The schemas are parsed from the reference's test-utils/src/tpcds.rs
(schema DATA, not code); queries may hold multiple ';'-separated
statements (q14, q23, ...), each planned separately, exactly like the
reference's create_logical_plan.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TPCDS_RS = "/root/reference/test-utils/src/tpcds.rs"
_QUERY_DIR = "/root/reference/datafusion/core/tests/tpc-ds"

_ARROW_TO_DDL = {
    "Int32": "INT",
    "Int64": "BIGINT",
    "Utf8": "STRING",
    "Date32": "DATE",
}


def _tpcds_schemas() -> dict[str, str]:
    """table name → Spark DDL schema string, from the reference's Rust
    schema table."""
    text = open(_TPCDS_RS).read()
    parts = re.split(r'TableDef::new\(\s*"(\w+)"', text)
    out: dict[str, str] = {}
    for i in range(1, len(parts), 2):
        name, body = parts[i], parts[i + 1]
        fields = re.findall(
            r'Field::new\(\s*"(\w+)",\s*DataType::(\w+)'
            r"(?:\(\s*(\d+),\s*(\d+)\s*\))?",
            body,
        )
        defs = []
        for fname, ftype, p, s in fields:
            if ftype == "Decimal128":
                defs.append(f"{fname} DECIMAL({p},{s})")
            else:
                defs.append(f"{fname} {_ARROW_TO_DDL[ftype]}")
        out[name] = ", ".join(defs)
    assert len(out) == 24, f"expected 24 TPC-DS tables, parsed {len(out)}"
    return out


@pytest.fixture(scope="module")
def tpcds_ctx(spark):
    from arrow_datafusion_spark.context import SessionContext

    ctx = SessionContext(spark)
    for name, ddl in _tpcds_schemas().items():
        ctx.register_table(name, spark.createDataFrame([], ddl))
    return ctx


@pytest.mark.skipif(
    not os.path.isdir(_QUERY_DIR), reason="reference tpc-ds corpus absent"
)
@pytest.mark.parametrize("qnum", range(1, 100))
def test_tpcds_plans(tpcds_ctx, qnum):
    sql = open(os.path.join(_QUERY_DIR, f"{qnum}.sql")).read()
    for stmt in sql.split(";"):
        if not stmt.strip():
            continue
        df = tpcds_ctx.sql(stmt)
        # force full analysis + optimization (the reference's
        # state.optimize equivalent); no execution
        df._jdf.queryExecution().optimizedPlan()
