"""Window-function suite (SURVEY.md §2.5): the 11 built-ins, ROWS/RANGE
frames, and aggregates-over-windows, oracle-compared to DuckDB.

Reference: built_in_window_function.rs:42-71, window_frame.rs:418,
WindowAggExec windows/window_agg_exec.rs:52; test corpus window.slt.

Determinism: ranking over a tied ORDER BY key is only row-stable for
rank/dense_rank/percent_rank/cume_dist — row_number/lag/lead/ntile and
value-functions always order by a UNIQUE key here so the oracle hash can't
depend on shuffle order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arrow_datafusion_spark.functions.window import WINDOW as W
from arrow_datafusion_spark.session import load_tables

_DEC = "decimal(38,6)"


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("orders",))["orders"]


def _customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("customer",))["customer"]


# --------------------------------------------------------------------------
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/ntile over a unique key; rank/dense_rank/percent_rank/
    cume_dist over a tied key (both partitioned by priority)."""
    o = _orders(spark, sf_dir)
    wu = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    wt = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
    return o.select(
        "o_orderkey",
        W["row_number"]().over(wu).alias("rn"),
        W["ntile"](4).over(wu).alias("quartile"),
        W["rank"]().over(wt).alias("rk"),
        W["dense_rank"]().over(wt).alias("drk"),
        F.round(W["percent_rank"]().over(wt), 9).alias("prk"),
        F.round(W["cume_dist"]().over(wt), 9).alias("cd"),
    )


WINDOW_RANK_SQL = """
SELECT o_orderkey,
       row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS rn,
       ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS quartile,
       rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate) AS rk,
       dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate) AS drk,
       round(percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate), 9) AS prk,
       round(cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate), 9) AS cd
FROM orders
"""


# --------------------------------------------------------------------------
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead (with defaults), first/last/nth value functions."""
    o = _orders(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        W["lag"](F.col("o_orderkey"), 1).over(w).alias("prev_key"),
        W["lag"](F.col("o_orderkey"), 2, -1).over(w).alias("prev2_key"),
        W["lead"](F.col("o_orderkey"), 1).over(w).alias("next_key"),
        W["first_value"](F.col("o_orderkey")).over(w).alias("first_key"),
        W["last_value"](F.col("o_orderkey")).over(wfull).alias("last_key"),
        W["nth_value"](F.col("o_orderkey"), 3).over(w).alias("third_key"),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT o_orderkey,
       lag(o_orderkey, 1) OVER w AS prev_key,
       lag(o_orderkey, 2, -1) OVER w AS prev2_key,
       lead(o_orderkey, 1) OVER w AS next_key,
       first_value(o_orderkey) OVER w AS first_key,
       last_value(o_orderkey) OVER
         (PARTITION BY o_orderpriority ORDER BY o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
       nth_value(o_orderkey, 3) OVER w AS third_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
"""


# --------------------------------------------------------------------------
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS and RANGE frames with explicit bounds (window_frame.rs:313).
    Frame sums accumulate in decimal so float addition order can't leak in."""
    c = _customer(spark, sf_dir)
    base = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
    rows21 = base.rowsBetween(-2, 1)
    range50 = base.rangeBetween(-50, 0)
    rows_unb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bal = F.col("c_acctbal").cast(_DEC)
    return c.select(
        "c_custkey",
        F.sum(bal).over(rows21).cast("double").alias("sum_rows_2p1f"),
        F.count(F.lit(1)).over(range50).alias("cnt_range_50p"),
        F.sum(bal).over(rows_unb).cast("double").alias("running_sum"),
        F.min("c_acctbal").over(rows21).alias("min_rows"),
        F.max("c_acctbal").over(range50).alias("max_range"),
    )


WINDOW_FRAMES_SQL = """
SELECT c_custkey,
       CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) OVER
         (PARTITION BY c_mktsegment ORDER BY c_custkey
          ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS sum_rows_2p1f,
       count(*) OVER
         (PARTITION BY c_mktsegment ORDER BY c_custkey
          RANGE BETWEEN 50 PRECEDING AND CURRENT ROW) AS cnt_range_50p,
       CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) OVER
         (PARTITION BY c_mktsegment ORDER BY c_custkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
       min(c_acctbal) OVER
         (PARTITION BY c_mktsegment ORDER BY c_custkey
          ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS min_rows,
       max(c_acctbal) OVER
         (PARTITION BY c_mktsegment ORDER BY c_custkey
          RANGE BETWEEN 50 PRECEDING AND CURRENT ROW) AS max_range
FROM customer
"""


# --------------------------------------------------------------------------
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS frames (window_frame.rs:418) — Spark has no GROUPS frame type
    (SURVEY.md §2.5); emulated exactly: dense_rank over the ORDER BY key maps
    peer groups to consecutive integers, so a RANGE frame over the rank IS a
    GROUPS frame over the original ordering. (DuckDB lacks GROUPS too, so the
    oracle re-states the same identity in SQL — see note below.)

    Both windows share partitioning and ordering, so Catalyst evaluates them
    in one Window exec over one sort — no extra shuffle for the emulation.
    """
    o = _orders(spark, sf_dir)
    w_rank = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
    ranked = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast(_DEC).alias("tp"),
        F.dense_rank().over(w_rank).alias("_grp"),
    )
    w_groups = (
        Window.partitionBy("o_orderpriority").orderBy("_grp").rangeBetween(-1, 0)
    )
    return ranked.select(
        "o_orderkey",
        F.sum("tp").over(w_groups).cast("double").alias("sum_groups_1p"),
        F.count(F.lit(1)).over(w_groups).alias("cnt_groups_1p"),
    )


# DuckDB also lacks GROUPS frames ("not implemented yet"), so the oracle
# states the same dense_rank→RANGE identity in SQL — an independent engine
# confirming the emulation's arithmetic, if not the GROUPS keyword itself.
WINDOW_GROUPS_FRAME_SQL = """
WITH ranked AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(o_totalprice AS DECIMAL(38,6)) AS tp,
         dense_rank() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_orderdate) AS grp
  FROM orders
)
SELECT o_orderkey,
       CAST(sum(tp) OVER w AS DOUBLE) AS sum_groups_1p,
       count(*) OVER w AS cnt_groups_1p
FROM ranked
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY grp
             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
def window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over an un-ordered window (whole-partition evaluation —
    WindowAggExec full-partition mode) + a share-of-partition ratio."""
    o = _orders(spark, sf_dir)
    wp = Window.partitionBy("o_orderpriority")
    tp = F.col("o_totalprice").cast(_DEC)
    psum = F.sum(tp).over(wp).cast("double")  # exact decimal sum → one double
    cnt = F.count(F.lit(1)).over(wp)
    return o.select(
        "o_orderkey",
        cnt.alias("n_in_prio"),
        psum.alias("prio_total"),
        F.round(psum / cnt, 4).alias("prio_avg"),
        F.round(F.col("o_totalprice") / psum, 9).alias("share"),
    )


WINDOW_AGG_SQL = """
SELECT o_orderkey,
       count(*) OVER w AS n_in_prio,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS prio_total,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)
             / count(*) OVER w, 4) AS prio_avg,
       round(o_totalprice
             / CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE), 9) AS share
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority)
"""


QUERIES = {
    "window_rank": window_rank,
    "window_lag_lead": window_lag_lead,
    "window_frames": window_frames,
    "window_groups_frame": window_groups_frame,
    "window_agg": window_agg,
}
ORACLE = {
    "window_rank": WINDOW_RANK_SQL,
    "window_lag_lead": WINDOW_LAG_LEAD_SQL,
    "window_frames": WINDOW_FRAMES_SQL,
    "window_groups_frame": WINDOW_GROUPS_FRAME_SQL,
    "window_agg": WINDOW_AGG_SQL,
}
