"""Bucketed range (interval-containment) join.

``fact.ts BETWEEN interval.lo AND interval.hi`` is a non-equi predicate:
Spark's only native plan for it is BroadcastNestedLoopJoin — every fact row
probes every interval, O(|fact|·|intervals|), a scale killer the moment the
interval side outgrows a broadcast.

The bucketed rewrite turns it into an equi-join, the standard trick from
interval/temporal databases (and the same shape Databricks' range-join
optimization produces from a hint):

1. pick a bucket width W (≈ median interval length);
2. each interval (lo, hi) is exploded to every bucket id in
   [floor(lo/W), floor(hi/W)] — short intervals land in O(1) buckets;
3. each fact row computes its single bucket id floor(ts/W);
4. equi-join on the bucket id (a plain shuffle/broadcast hash join),
   then the exact BETWEEN filter keeps true containments only.

Cost: |intervals| · avg_span/W replicated rows on the build side and a
hash join instead of a nested loop — at 100 TB the bucket id is just
another shuffle key, so AQE/skew handling applies to it like any join.

No reference analog (DataFusion plans this as NestedLoopJoinExec,
physical-plan/src/joins/nested_loop_join.rs); entry `range_join_bucketed`
is oracled by DuckDB's plain BETWEEN join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bucketed_range_join"]


def bucketed_range_join(
    fact: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of ``fact`` rows to every interval containing them.

    ``ts_col``/``lo_col``/``hi_col`` are numeric (e.g. epoch seconds);
    ``bucket_width`` is in the same unit. Output = fact columns + interval
    columns. Containment is inclusive on both ends.
    """
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    f = fact.withColumn(
        "_bucket", F.floor(F.col(ts_col) / bucket_width).cast("long")
    )
    return (
        f.join(iv, "_bucket")
        .filter(F.col(ts_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_bucket")
    )
