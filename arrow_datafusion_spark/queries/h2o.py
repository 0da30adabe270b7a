"""H2O.ai db-benchmark (group-by) adapted suite.

The reference ships the H2O group-by workload (runner
/root/reference/benchmarks/src/bin/h2o.rs; benchmarks/README.md "h2o
benchmarks"). Its ten canonical group-by shapes are re-expressed over the
``events`` fixture (keys of three cardinalities: event_type ≈ id1 low-card,
user_id ≈ id3 mid-card, k_bucket ≈ id6; measure ``value`` ≈ v3):

- sum by composite key (h2o q2)            → h2o_sum_2key
- mean / median / sd by key (q4, q6)       → h2o_mean_median
- max - min per group (q7)                 → h2o_range
- two largest values per group (q8)        → h2o_top2
- squared correlation per group (q9)       → h2o_corr_r2
- count + distinct count by key (q5, q10)  → h2o_distinct

Determinism (cross-engine hash gate): double sums accumulate in
DECIMAL(38,6); dispersion/correlation results round to 6 places (both
engines agree to ~1e-12 — same policy as agg_stats); window top-k breaks
ties on event_id. Each entry runs the SAME SQL text on Spark
(SessionContext.sql) and DuckDB.
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
]


def _runner(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ctx(spark, sf_dir).sql(sql)

    return run


QUERIES = {name: _runner(sql) for name, sql, _ in _PACK}
ORACLE = {name: (oracle if oracle is not None else sql) for name, sql, oracle in _PACK}
