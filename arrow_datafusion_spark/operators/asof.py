"""As-of (time-travel) join: match each left row to the most recent right
row at-or-before its timestamp, per key.

The reference has no dedicated as-of operator — range behavior arises from
NestedLoopJoin filters or SymmetricHashJoin interval pruning
(/root/reference/datafusion/physical-plan/src/joins/symmetric_hash_join.rs:167;
SURVEY.md §2.3 "No dedicated as-of / range-join operator"). A theta join
``l.ts >= r.ts`` + argmax is quadratic per key; this implementation is the
scalable composition instead:

    union the two sides tagged → one shuffle on the key → one sort by
    (ts, side) → ``last(right_col, ignorenulls=True)`` running window.

Cost at any scale: a single hash-partition exchange + per-partition sort —
the same shape as a stream-stream as-of with keyed state. Right rows sort
BEFORE left rows at equal timestamps (side 0 < side 1), giving the standard
inclusive `l.ts >= r.ts` as-of semantics (DuckDB ASOF JOIN compatible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``right_cols`` from the
    latest ``right`` row with ``right_ts <= left_ts`` on the same ``keys``
    (nulls when no prior right row exists).

    ``tiebreak`` orders right rows that share a timestamp (latest wins);
    pass a unique right-side column to make results deterministic.
    """
    left_cols = [c for c in left.columns]
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = right.select(
        *keys, F.col(right_ts).alias("_ts"), *right_cols
    ).withColumn("_side", F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)

    order: list[Column] = [F.col("_ts"), F.col("_side")]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_m_{c}") for c in right_cols]
    )
    return matched.filter(F.col("_side") == 1).select(
        *left_cols, *[F.col(f"_m_{c}").alias(c) for c in right_cols]
    )
