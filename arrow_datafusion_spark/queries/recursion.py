"""Recursive-CTE suite: the driver-side fixpoint loop
(plans/recursive.py — WorkTableExec/RecursiveQueryExec analog) against
DuckDB's native WITH RECURSIVE.

The graph is derived deterministically from the nation fixture
(src → (src*3 + 7) mod 25), giving a cyclic functional graph — UNION
(distinct) semantics must terminate on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_datafusion_spark.plans.recursive import recursive_query
from arrow_datafusion_spark.session import load_tables


def recursive_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_tables(spark, sf_dir, names=("nation",))["nation"]
    edges = nation.select(
        F.col("n_nationkey").alias("src"),
        ((F.col("n_nationkey") * 3 + 7) % 25).alias("dst"),
    )
    base = spark.createDataFrame([(0,)], "node long")

    def step(frontier: DataFrame) -> DataFrame:
        return (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
        )

    return recursive_query(base, step, distinct=True).orderBy("node")


RECURSIVE_REACH_SQL = """
WITH RECURSIVE edges AS (
  SELECT n_nationkey AS src, (n_nationkey * 3 + 7) % 25 AS dst FROM nation
),
reach(node) AS (
  SELECT CAST(0 AS BIGINT)
  UNION
  SELECT CAST(dst AS BIGINT) FROM edges JOIN reach ON src = node
)
SELECT node FROM reach ORDER BY node
"""


# --------------------------------------------------------------------------
# The same workloads through the SQL front end: SessionContext.sql parses
# WITH RECURSIVE and drives the fixpoint itself (context.py _sql_recursive),
# so the IDENTICAL statement text runs on both engines.

SQL_RECURSIVE_SERIES_SQL = """
WITH RECURSIVE t(n) AS (
  SELECT 1
  UNION ALL
  SELECT n + 1 FROM t WHERE n < 100
)
SELECT count(*) AS n_rows, CAST(sum(n) AS BIGINT) AS total FROM t
"""


def sql_recursive_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_datafusion_spark.queries.sqlsuite import _ctx

    return _ctx(spark, sf_dir).sql(SQL_RECURSIVE_SERIES_SQL)


def sql_recursive_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recursive_reach, but entered as SQL text (cte.slt recursive cases)."""
    from arrow_datafusion_spark.queries.sqlsuite import _ctx

    return _ctx(spark, sf_dir).sql(RECURSIVE_REACH_SQL)


QUERIES = {
    "recursive_reach": recursive_reach,
    "sql_recursive_series": sql_recursive_series,
    "sql_recursive_graph": sql_recursive_graph,
}
ORACLE = {
    "recursive_reach": RECURSIVE_REACH_SQL,
    "sql_recursive_series": SQL_RECURSIVE_SERIES_SQL,
    "sql_recursive_graph": RECURSIVE_REACH_SQL,
}
