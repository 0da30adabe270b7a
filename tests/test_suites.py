"""Oracle-compare every non-TPC-H driver entry (the TPC-H pack has its own
test module). Parametrized over the __spark_entry__ registries so a new
queries()/oracle_sql() entry is tested automatically."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare, duckdb_con  # noqa: E402

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()
_NAMES = sorted(n for n in _QUERIES if not n.startswith("tpch_"))

# Fast/full tier (tests/conftest.py): the four slowest oracle compares —
# the streaming micro-batch joins (20-43 s each: ProcessingTime trigger
# waits, not engine compute) and the 200-step recursive series (25 s) —
# carry the `slow` mark so the driver's time-budgeted default run
# completes; every other entry stays in the default tier.
_SLOW_ENTRIES = {
    "stream_join_outer",
    "stream_join_clicks_views",
    "stream_join_outer_full",
    "sql_recursive_series",
}


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ENTRIES else n
        for n in _NAMES
    ],
)
def test_entry_matches_oracle(name, spark, sf_dir, con):
    df = _QUERIES[name](spark, sf_dir)
    if name in _ORACLES:
        compare(df, con, _ORACLES[name])
    else:  # rows-only entries (non-SQL-expressible ops)
        assert df.count() >= 0
