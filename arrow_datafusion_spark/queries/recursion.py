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


QUERIES = {"recursive_reach": recursive_reach}
ORACLE = {"recursive_reach": RECURSIVE_REACH_SQL}
