"""TPC-H q1–q22 vs DuckDB oracle at sf0.01 (the driver's t2 gate)."""

from __future__ import annotations

import pytest

from arrow_datafusion_spark.queries import tpch
from tests.oracle_harness import compare, duckdb_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(tpch.QUERIES, key=lambda n: int(n.split("q")[-1])))
def test_tpch_query(name, spark, sf_dir, con):
    df = tpch.QUERIES[name](spark, sf_dir)
    compare(df, con, tpch.ORACLE[name])
