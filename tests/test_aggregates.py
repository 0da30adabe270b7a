"""Tests for the approximate-aggregate entry (agg_approx).

The entry emits 0/1 bound-check columns (approx within its documented error
bound of the exact value, both computed in the same Spark query) plus the
exact ndv — so the driver can hash-match it against a DuckDB oracle that
emits the same exact ndv and constant-1 checks. Here we assert the checks
pass and the exact ndv agrees with an independently computed one.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arrow_datafusion_spark.queries.aggregates import AGG_APPROX_SQL, agg_approx  # noqa: E402
from arrow_datafusion_spark.session import load_tables  # noqa: E402


def test_approx_aggregates_within_bounds(spark, sf_dir):
    approx = {r["l_returnflag"]: r for r in agg_approx(spark, sf_dir).collect()}
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("nd"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        assert a["nd_exact"] == exact[flag]["nd"], (flag, a)
        assert a["nd_ok"] == 1, (flag, a)
        assert a["med_ok"] == 1, (flag, a)
        assert a["p90_ok"] == 1, (flag, a)


def test_approx_entry_matches_oracle(spark, sf_dir):
    from tests.oracle_harness import compare, duckdb_con

    compare(agg_approx(spark, sf_dir), duckdb_con(sf_dir), AGG_APPROX_SQL)
