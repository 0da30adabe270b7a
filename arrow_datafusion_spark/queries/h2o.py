"""H2O.ai db-benchmark (group-by + join) adapted suite.

The reference ships the H2O workload (runner
/root/reference/benchmarks/src/bin/h2o.rs supports both the group-by and
join variants; benchmarks/README.md "h2o benchmarks"). Its ten canonical
group-by shapes are re-expressed over the ``events`` fixture (keys of three
cardinalities: event_type ≈ id1 low-card, user_id ≈ id3 mid-card,
k_bucket ≈ id6; measure ``value`` ≈ v3):

- sum by composite key (h2o q2)            → h2o_sum_2key
- mean / median / sd by key (q4, q6)       → h2o_mean_median
- max - min per group (q7)                 → h2o_range
- two largest values per group (q8)        → h2o_top2
- squared correlation per group (q9)       → h2o_corr_r2
- count + distinct count by key (q5, q10)  → h2o_distinct

The five join-workload shapes (x ⋈ small / x ⋈ medium / left outer /
factor key / x ⋈ big) map onto the TPC-H fixture's size ladder
(lineitem ≈ x, supplier ≈ small, orders ≈ medium, customer+orders ≈ big):

- inner join small dim, agg              → h2o_join_small
- inner join medium table, agg           → h2o_join_medium
- left outer join (unmatched kept)       → h2o_join_left
- join on a low-cardinality factor key   → h2o_join_factor
- big ⋈ big fact-to-fact, agg            → h2o_join_big

Determinism (cross-engine hash gate): double sums accumulate in
DECIMAL(38,6); dispersion/correlation results round to 6 places (both
engines agree to ~1e-12 — same policy as agg_stats); window top-k breaks
ties on event_id. Each entry runs the SAME SQL text on Spark
(SessionContext.sql) and DuckDB. Join-suite scale notes: supplier/nation
sit under Spark's broadcast threshold at any realistic SF ladder step
(broadcast-hash, no fact shuffle); the fact-to-fact joins shuffle on their
keys and AQE handles skew — no hints baked into the SQL, so the same text
scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from arrow_datafusion_spark.queries.sqlsuite import _ctx

_PACK: list[tuple[str, str, str | None]] = [
    (
        "h2o_sum_2key",
        """
        SELECT event_type,
               CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) % 10 AS k_bucket,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_v,
               count(*) AS n
        FROM events
        GROUP BY event_type, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) % 10
        ORDER BY event_type, k_bucket
        """,
        None,
    ),
    (
        "h2o_mean_median",
        """
        SELECT user_id % 20 AS id_mod,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))) / count(*), 6) AS DOUBLE) AS mean_v,
               CAST(ROUND(median(value), 6) AS DOUBLE) AS median_v,
               CAST(ROUND(stddev_samp(value), 6) AS DOUBLE) AS sd_v
        FROM events
        GROUP BY user_id % 20
        ORDER BY id_mod
        """,
        None,
    ),
    (
        "h2o_range",
        """
        SELECT event_type,
               CAST(ROUND(CAST(max(value) - min(value) AS DECIMAL(38,6)), 2) AS DOUBLE) AS range_v
        FROM events
        GROUP BY event_type
        ORDER BY event_type
        """,
        None,
    ),
    (
        "h2o_top2",
        """
        SELECT event_type, value, event_id
        FROM (
            SELECT event_type, value, event_id,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id) AS rn
            FROM events
        ) t
        WHERE rn <= 2
        ORDER BY event_type, rn
        """,
        None,
    ),
    (
        "h2o_corr_r2",
        """
        SELECT event_type,
               CAST(ROUND(POW(corr(value, CAST(user_id AS DOUBLE)), 2), 6) AS DOUBLE) AS r2
        FROM events
        GROUP BY event_type
        ORDER BY event_type
        """,
        None,
    ),
    (
        "h2o_distinct",
        """
        SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) % 10 AS k_bucket,
               count(*) AS n,
               count(DISTINCT user_id) AS n_users,
               count(DISTINCT event_type) AS n_types
        FROM events
        GROUP BY CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) % 10
        ORDER BY k_bucket
        """,
        None,
    ),
    (
        "h2o_join_small",
        """
        SELECT s_nationkey,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_price,
               count(*) AS n
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
        ORDER BY s_nationkey
        """,
        None,
    ),
    (
        "h2o_join_medium",
        """
        SELECT o_orderpriority,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        None,
    ),
    (
        "h2o_join_left",
        """
        SELECT p_brand,
               count(l_partkey) AS n_lines,
               count(*) - count(p_partkey) AS n_unmatched,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_price
        FROM lineitem LEFT JOIN part
          ON l_partkey = p_partkey AND p_size < 25
        GROUP BY p_brand
        ORDER BY p_brand NULLS FIRST
        """,
        None,
    ),
    (
        "h2o_join_factor",
        """
        SELECT n_name,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_bal,
               count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
        """,
        None,
    ),
    (
        "h2o_join_big",
        """
        SELECT c_mktsegment,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """,
        None,
    ),
]


def _runner(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ctx(spark, sf_dir).sql(sql)

    return run


QUERIES = {name: _runner(sql) for name, sql, _ in _PACK}
ORACLE = {name: (oracle if oracle is not None else sql) for name, sql, oracle in _PACK}
