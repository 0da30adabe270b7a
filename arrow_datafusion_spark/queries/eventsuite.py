"""Event-time suite over the ``events`` fixture: tumbling, sliding, and
session windows with the exact expressions the streaming pipeline uses
(F.window / F.session_window — SURVEY.md §2.10). Batch-mode here for
oracle-ability; arrow_datafusion_spark/streaming runs the same expressions
under readStream + watermark (smoke-tested in tests/test_streaming.py).

The reference has no watermark/event-time machinery (its date_bin is the
closest analog) — this surface is capability-parity-plus per the north star.
"""

from __future__ import annotations

import os
import time as _time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_datafusion_spark.session import load_tables

_DEC = "decimal(38,6)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("events",))["events"]


# --------------------------------------------------------------------------
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (groupBy(F.window(...)))."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(_DEC)), 2).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "total",
        )
    )


EVENTS_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '1970-01-01') AS w_start,
       time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '1970-01-01') + INTERVAL '1 hour' AS w_end,
       event_type, count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total
FROM events
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h width, 1h slide) — each event lands in 2 windows."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "n")
    )


EVENTS_SLIDING_SQL = """
WITH placed AS (
  SELECT time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '1970-01-01')
           - k * INTERVAL '1 hour' AS w_start
  FROM events, (SELECT unnest([0, 1]) AS k) offs
)
SELECT w_start, w_start + INTERVAL '2 hours' AS w_end, count(*) AS n
FROM placed
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap per event type
    (F.session_window — no reference analog; gaps-and-islands in the oracle)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
        )
    )


EVENTS_SESSION_SQL = """
WITH marked AS (
  SELECT event_type, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts)
), numbered AS (
  SELECT event_type, ts,
         sum(new_sess) OVER (PARTITION BY event_type ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
)
SELECT min(ts) AS w_start,
       max(ts) + INTERVAL '30 minutes' AS w_end,
       event_type, count(*) AS n
FROM numbered
GROUP BY event_type, sess_id
"""


# --------------------------------------------------------------------------
def events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click attributed to the user's most recent
    at-or-before view (operators/asof.py — union-tag + running last(),
    one shuffle on user_id). Oracle is DuckDB's native ASOF LEFT JOIN."""
    from arrow_datafusion_spark.operators.asof import asof_join

    e = _events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        "user_id",
        F.col("value").alias("view_value"),
    )
    return asof_join(
        clicks,
        views,
        keys=["user_id"],
        left_ts="ts",
        right_ts="view_ts",
        right_cols=["view_id", "view_value"],
        tiebreak="view_id",
    ).orderBy("event_id")


EVENTS_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
), views AS (
  SELECT event_id AS view_id, ts AS view_ts, user_id, value AS view_value
  FROM events WHERE event_type = 'view'
)
SELECT c.event_id, c.ts, c.user_id, v.view_id, v.view_value
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts >= v.view_ts
ORDER BY c.event_id
"""


# --------------------------------------------------------------------------
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): events inside ANY early-user activity
    window — via the bucketed equi-join rewrite (operators/rangejoin.py),
    never a nested loop. Oracle is DuckDB's plain BETWEEN join."""
    from arrow_datafusion_spark.operators.rangejoin import bucketed_range_join

    e = _events(spark, sf_dir)
    fact = e.select("event_id", F.unix_timestamp("ts").alias("ts_s"))
    iv = (
        e.filter(F.col("user_id") < 20)
        .groupBy(F.col("user_id").alias("iv_user"))
        .agg(F.unix_timestamp(F.min("ts")).alias("lo"))
        .withColumn("hi", F.col("lo") + 7200)
    )
    return (
        bucketed_range_join(fact, iv, "ts_s", "lo", "hi", bucket_width=3600)
        .select("iv_user", "event_id")
        .orderBy("iv_user", "event_id")
    )


RANGE_JOIN_BUCKETED_SQL = """
WITH f AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
iv AS (SELECT user_id AS iv_user,
              CAST(floor(epoch(min(ts))) AS BIGINT) AS lo,
              CAST(floor(epoch(min(ts))) AS BIGINT) + 7200 AS hi
       FROM events WHERE user_id < 20 GROUP BY user_id)
SELECT iv_user, event_id
FROM f JOIN iv ON ts_s BETWEEN lo AND hi
ORDER BY iv_user, event_id
"""


# --------------------------------------------------------------------------
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass producing the
    hourly aggregate AND its daily rollup via GROUPING SETS ((d,h),(d)) —
    the multi-granularity materialization a time-series store keeps per
    chunk. Same SQL text on both engines."""
    from arrow_datafusion_spark.queries.sqlsuite import _ctx

    return _ctx(spark, sf_dir).sql(HYPERTABLE_ROLLUP_SQL)


HYPERTABLE_ROLLUP_SQL = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
       date_trunc('hour', ts) AS h,
       count(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_v
FROM events
GROUP BY GROUPING SETS ((CAST(date_trunc('day', ts) AS DATE), date_trunc('hour', ts)),
                        (CAST(date_trunc('day', ts) AS DATE)))
ORDER BY d, h NULLS FIRST
"""


# --------------------------------------------------------------------------
_STREAM_SEQ = [0]


def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StreamingTableExec exercised END-TO-END for the driver: the events
    fixture replays through readStream (file-replay source) into the
    watermarked tumbling-window aggregation, drained with
    trigger(availableNow) into a memory sink — and the drained result is
    hash-compared to the oracle's batch time_bucket aggregation. Stream and
    batch MUST agree at end-of-replay; a schema/type/watermark bug shows up
    as a mismatch (exactly the r02 ts-type regression this guards)."""
    from arrow_datafusion_spark.streaming import (
        read_events_stream,
        run_available_now,
        windowed_counts,
    )

    _STREAM_SEQ[0] += 1
    name = f"drv_stream_counts_{os.getpid()}_{_STREAM_SEQ[0]}"
    stream = read_events_stream(spark, sf_dir)
    return run_available_now(windowed_counts(stream), name)


STREAM_WINDOWED_COUNTS_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '1970-01-01') AS w_start,
       time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '1970-01-01') + INTERVAL '1 hour' AS w_end,
       event_type, count(*) AS n
FROM events
GROUP BY 1, 2, 3
"""


def stream_join_clicks_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-bounded equi-join (SymmetricHashJoinExec analog,
    joins/symmetric_hash_join.rs:167) drained with availableNow and
    hash-compared to the oracle's batch interval join."""
    from arrow_datafusion_spark.streaming import (
        read_events_stream,
        run_available_now,
        stream_stream_join,
    )

    _STREAM_SEQ[0] += 1
    name = f"drv_stream_join_{os.getpid()}_{_STREAM_SEQ[0]}"
    stream = read_events_stream(spark, sf_dir)
    return run_available_now(
        stream_stream_join(stream), name, output_mode="append"
    )


STREAM_JOIN_SQL = """
SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id AS c_user
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id
 AND v.ts BETWEEN c.ts - INTERVAL '1 hour' AND c.ts
"""


def _staged_sentinel_stream(spark: SparkSession, sf_dir: str, tag: str):
    """Stage the events fixture for a DRAINED outer stream-stream join:
    the SymmetricHashJoin outer forms (symmetric_hash_join.rs
    Left/Right/Full) emit an unmatched row NULL-extended only once the
    watermark proves no future match can arrive. A drained replay
    therefore needs the watermark pushed past every real row's join bound
    before the final batch: the fixture is staged as three files — the
    real data, then two sentinel spikes (user_id −1, far-future ts, both
    event types so BOTH branch watermarks advance; the global watermark
    is their MIN) — and maxFilesPerTrigger=1 replays them as three
    micro-batches (watermarks advance at batch boundaries; evictions
    flush in the batch AFTER the advance, hence the second sentinel).
    Returns the readStream; callers filter the user_id −1 sentinels."""
    import datetime as _dt
    import tempfile

    import pyspark.sql.functions as F

    from arrow_datafusion_spark.session import load_table

    events = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "user_id", "event_id"
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    _STREAM_SEQ[0] += 1
    stage = os.path.join(
        tempfile.gettempdir(),
        f"drv_stream_{tag}_{os.getpid()}_{_STREAM_SEQ[0]}",
    )
    events.coalesce(1).write.mode("overwrite").parquet(f"{stage}/f0")
    for i, hours in enumerate((10, 11), start=1):
        spike = max_ts + _dt.timedelta(hours=hours)
        spark.createDataFrame(
            [(spike, "click", -1, -i), (spike, "view", -1, -100 - i)],
            events.schema,
        ).coalesce(1).write.mode("overwrite").parquet(f"{stage}/f{i}")
    # FileStreamSource orders batches by modification time — pin it so the
    # sentinel spikes replay AFTER the real data (a spike-first replay
    # would watermark-drop every real row as late)
    now = _time.time()
    for i in range(3):
        d = f"{stage}/f{i}"
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (now - 300 + i * 100,) * 2)
    return (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/*")
    )


def stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream join, driver-gated (VERDICT r11 #6):
    sentinel-staged drain (_staged_sentinel_stream), sentinels filtered,
    hash-compared to the batch LEFT JOIN oracle, NULL-extended rows
    included."""
    import pyspark.sql.functions as F

    from arrow_datafusion_spark.streaming import (
        run_available_now,
        stream_stream_join,
    )

    stream = _staged_sentinel_stream(spark, sf_dir, "outer")
    _STREAM_SEQ[0] += 1
    name = f"drv_stream_outer_{os.getpid()}_{_STREAM_SEQ[0]}"
    out = run_available_now(
        stream_stream_join(stream, how="left_outer"),
        name,
        output_mode="append",
    )
    return out.filter(F.col("c_user") >= 0)


def stream_join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-OUTER stream-stream join, driver-gated: both sides'
    unmatched rows are NULL-extended on watermark-proven eviction
    (symmetric_hash_join.rs JoinType::Full — need_to_produce_result_in_final
    on BOTH build sides). Same sentinel-staged drain as the left-outer
    gate; both user columns are kept so each surviving side's sentinel
    rows can be filtered, and the drained result hash-compares to the
    batch FULL JOIN oracle — click-only, view-only, and matched rows."""
    import pyspark.sql.functions as F

    from arrow_datafusion_spark.streaming import (
        run_available_now,
        stream_stream_join,
    )

    stream = _staged_sentinel_stream(spark, sf_dir, "full")
    _STREAM_SEQ[0] += 1
    name = f"drv_stream_full_{os.getpid()}_{_STREAM_SEQ[0]}"
    out = run_available_now(
        stream_stream_join(stream, how="full_outer", keep_both_users=True),
        name,
        output_mode="append",
    )
    return out.filter(
        (F.col("c_user").isNull() | (F.col("c_user") >= 0))
        & (F.col("v_user").isNull() | (F.col("v_user") >= 0))
    )


STREAM_JOIN_OUTER_SQL = """
SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id AS c_user
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id
 AND v.ts BETWEEN c.ts - INTERVAL '1 hour' AND c.ts
"""


STREAM_JOIN_OUTER_FULL_SQL = """
SELECT c.event_id AS click_id, v.event_id AS view_id,
       c.user_id AS c_user, v.user_id AS v_user
FROM (SELECT * FROM events WHERE event_type = 'click') c
FULL JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id
 AND v.ts BETWEEN c.ts - INTERVAL '1 hour' AND c.ts
"""


def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup (dropDuplicatesWithinWatermark —
    state is bounded by the watermark delay, the O(1)-state design a
    perpetual ingestion feed needs; streaming/__init__.py:131), drained
    with availableNow and hash-compared to the batch DISTINCT oracle.
    Only the dedup KEY columns are projected, so the result is the exact
    distinct-key multiset regardless of which duplicate row survived.

    The DISTINCT equivalence only holds while every duplicate of a key
    arrives before the key's state expires — if the availableNow drain
    splits the fixture into multiple micro-batches, a duplicate landing
    after the watermark passed its key would be re-emitted. The gate
    therefore widens the watermark past the fixture's full event-time
    spread (production default stays 2h), making the comparison
    batching-independent rather than relying on a single-batch drain."""
    from arrow_datafusion_spark.streaming import (
        read_events_stream,
        run_available_now,
        streaming_dedup,
    )

    _STREAM_SEQ[0] += 1
    name = f"drv_stream_dedup_{os.getpid()}_{_STREAM_SEQ[0]}"
    out = run_available_now(
        streaming_dedup(
            read_events_stream(spark, sf_dir), watermark="87600 hours"
        ),
        name,
        output_mode="append",
    )
    return out.select("user_id", "event_type", "value")


STREAM_DEDUP_SQL = """
SELECT DISTINCT user_id, event_type, value
FROM events
"""


QUERIES = {
    "events_tumbling": events_tumbling,
    "stream_windowed_counts": stream_windowed_counts,
    "stream_join_clicks_views": stream_join_clicks_views,
    "stream_join_outer": stream_join_outer,
    "stream_join_outer_full": stream_join_outer_full,
    "stream_dedup_watermark": stream_dedup_watermark,
    "range_join_bucketed": range_join_bucketed,
    "hypertable_rollup": hypertable_rollup,
    "events_sliding": events_sliding,
    "events_session": events_session,
    "events_asof": events_asof,
}
ORACLE = {
    "events_tumbling": EVENTS_TUMBLING_SQL,
    "stream_windowed_counts": STREAM_WINDOWED_COUNTS_SQL,
    "stream_join_clicks_views": STREAM_JOIN_SQL,
    "stream_join_outer": STREAM_JOIN_OUTER_SQL,
    "stream_join_outer_full": STREAM_JOIN_OUTER_FULL_SQL,
    "stream_dedup_watermark": STREAM_DEDUP_SQL,
    "range_join_bucketed": RANGE_JOIN_BUCKETED_SQL,
    "hypertable_rollup": HYPERTABLE_ROLLUP_SQL,
    "events_sliding": EVENTS_SLIDING_SQL,
    "events_session": EVENTS_SESSION_SQL,
    "events_asof": EVENTS_ASOF_SQL,
}
