"""ClickBench-adapted suite over the ``events``/``documents`` fixtures.

The reference ships the full ClickBench workload (43 analytics queries over
the ``hits`` table; /root/reference/benchmarks/queries/clickbench/queries.sql,
runner benchmarks/src/clickbench.rs). This pack re-expresses the distinctive
query *shapes* of that suite on the driver's event-log fixture (``events`` ≈
``hits``: id, timestamp, user, category, measure, JSON props):

- q0-q7   global scans: count / filtered count / distinct users / min-max ts
- q8-q17  group-by top-k with count/avg, single- and multi-key
- q18     extract(minute) bucketing
- q20-q23 LIKE substring filtering with min() sampling
- q28     regex extraction + HAVING
- q29     the wide-sum projection stress (many sums in one pass)
- q19     point lookup
- q30-q35 two-key heavy aggregation with FILTER clauses
- q36-q42 pagination (LIMIT/OFFSET) and date_trunc minute rollups

Determinism rules (cross-engine hash gate): every double SUM/AVG accumulates
in DECIMAL(38,6) on both engines (float addition order is not associative);
every LIMIT has a total-order ORDER BY (ties at the cutoff would otherwise
be engine-dependent).

Most entries run the SAME SQL text on Spark (via SessionContext.sql — the
front end the reference's clickbench runner uses) and on DuckDB; where the
dialects split, the oracle string differs and says why.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from arrow_datafusion_spark.queries.sqlsuite import _ctx

# (name, sql, oracle_sql_or_None) — None means the oracle runs the same text.
_PACK: list[tuple[str, str, str | None]] = [
    (
        "cb_overview",
        """
        SELECT count(*) AS n_hits,
               count(*) FILTER (WHERE value > 50) AS n_big,
               count(DISTINCT user_id) AS n_users,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_value,
               min(ts) AS first_ts,
               max(ts) AS last_ts
        FROM events
        """,
        None,
    ),
    (
        "cb_group_topk",
        """
        SELECT event_type,
               count(*) AS c,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))) / count(*), 4) AS DOUBLE) AS avg_value
        FROM events
        GROUP BY event_type
        ORDER BY c DESC, event_type
        LIMIT 3
        """,
        None,
    ),
    (
        "cb_user_topk",
        """
        SELECT user_id, count(*) AS c
        FROM events
        GROUP BY user_id
        ORDER BY c DESC, user_id
        LIMIT 10
        """,
        None,
    ),
    (
        "cb_minute_bucket",
        """
        SELECT user_id, CAST(extract(MINUTE FROM ts) AS INT) AS m, count(*) AS c
        FROM events
        GROUP BY user_id, CAST(extract(MINUTE FROM ts) AS INT)
        ORDER BY c DESC, user_id, m
        LIMIT 10
        """,
        None,
    ),
    (
        "cb_like_sample",
        """
        SELECT source, min(text) AS first_text, count(*) AS c
        FROM documents
        WHERE text LIKE '%the%'
        GROUP BY source
        ORDER BY c DESC, source
        LIMIT 10
        """,
        None,
    ),
    (
        "cb_regex_having",
        """
        SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) % 10 AS k_bucket,
               count(*) AS c,
               min(props) AS sample
        FROM events
        GROUP BY CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) % 10
        HAVING count(*) > 50
        ORDER BY c DESC, k_bucket
        LIMIT 25
        """,
        None,
    ),
    (
        "cb_wide_sum",
        "SELECT "
        + ", ".join(f"SUM(user_id + {i}) AS s{i}" for i in range(10))
        + " FROM events",
        # DuckDB SUM(BIGINT) widens to HUGEINT/DECIMAL; pin both to BIGINT.
        "SELECT "
        + ", ".join(f"CAST(SUM(user_id + {i}) AS BIGINT) AS s{i}" for i in range(10))
        + " FROM events",
    ),
    (
        "cb_point_lookup",
        """
        SELECT event_id, user_id, value
        FROM events
        WHERE user_id = 42 AND event_type = 'purchase'
        ORDER BY event_id
        LIMIT 20
        """,
        None,
    ),
    (
        "cb_filtered_heavy",
        """
        SELECT user_id, event_type,
               count(*) AS c,
               count(*) FILTER (WHERE value > 50) AS n_big,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_value
        FROM events
        WHERE event_type <> 'error'
        GROUP BY user_id, event_type
        ORDER BY c DESC, user_id, event_type
        LIMIT 10
        """,
        None,
    ),
    (
        "cb_pagination",
        """
        SELECT user_id, event_type, count(*) AS c
        FROM events
        WHERE event_type <> 'error'
        GROUP BY user_id, event_type
        ORDER BY c DESC, user_id, event_type
        LIMIT 10 OFFSET 20
        """,
        None,
    ),
    (
        "cb_minute_rollup",
        """
        SELECT date_trunc('minute', ts) AS m, count(*) AS pv
        FROM events
        WHERE event_type = 'click'
        GROUP BY date_trunc('minute', ts)
        ORDER BY m
        LIMIT 10 OFFSET 100
        """,
        None,
    ),
    (
        # CB q5-q7 shape: several COUNT(DISTINCT) over the full scan in one pass
        "cb_multi_distinct",
        """
        SELECT count(DISTINCT user_id) AS n_users,
               count(DISTINCT event_type) AS n_types,
               count(DISTINCT user_id % 100) AS n_user_buckets,
               count(*) AS n
        FROM events
        """,
        None,
    ),
    (
        # CB q21-q22 shape: GROUP BY a substring expression of a string column
        "cb_substring_group",
        """
        SELECT substring(props, 8, 2) AS key2,
               count(*) AS c,
               count(DISTINCT user_id) AS u
        FROM events
        WHERE props LIKE '{"k":%'
        GROUP BY substring(props, 8, 2)
        ORDER BY c DESC, key2
        LIMIT 10
        """,
        None,
    ),
    (
        # CB q35 shape: latest-N scan ordered by timestamp
        "cb_latest",
        """
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE event_type IN ('click', 'view')
        ORDER BY ts DESC, event_id
        LIMIT 10
        """,
        None,
    ),
    (
        # CB q32 shape: heavy-hitter users via HAVING on the grouped count
        "cb_heavy_users",
        """
        SELECT user_id, count(*) AS c,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_v
        FROM events
        GROUP BY user_id
        HAVING count(*) > 30
        ORDER BY c DESC, user_id
        LIMIT 20
        """,
        None,
    ),
    (
        # CB nested-aggregate shape: average per-user event count (agg of an agg)
        "cb_avg_user_rate",
        """
        SELECT count(*) AS n_users,
               CAST(ROUND(SUM(c) * 1.0 / count(*), 4) AS DOUBLE) AS avg_events_per_user,
               max(c) AS max_events
        FROM (SELECT user_id, count(*) AS c FROM events GROUP BY user_id) t
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
