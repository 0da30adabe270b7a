"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``arrow_datafusion_spark/``; this module only
aggregates the per-family registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H q1) on /root/testdata/sf0.001."""
    from arrow_datafusion_spark.queries import tpch

    return tpch.q1(spark, "/root/testdata/sf0.001")


def _registries() -> tuple[dict, dict]:
    from arrow_datafusion_spark.queries import (
        aggregates,
        clickbench,
        eventsuite,
        functions_suite,
        h2o,
        llm,
        pipeline,
        recursion,
        relational,
        sources,
        sqlsuite,
        tpch,
        udfs,
        windows,
    )

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    # Registration order = the driver's check order. Families that have not
    # yet earned a driver CORRECTNESS row run FIRST so a driver-side time
    # budget can't starve them; the TPC-H/ClickBench packs (driver-green in
    # round 2) run last.
    for mod in (
        windows,
        aggregates,
        relational,
        sources,
        udfs,
        llm,
        pipeline,
        eventsuite,
        recursion,
        h2o,
        functions_suite,
        sqlsuite,
        tpch,
        clickbench,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLE)
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registries()[0]


def oracle_sql() -> dict[str, str]:
    return _registries()[1]
