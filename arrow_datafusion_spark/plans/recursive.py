"""Recursive CTE execution: driver-side fixpoint loop.

Reference: WorkTableExec (physical-plan/src/work_table.rs:97) +
RecursiveQueryExec (recursive_query.rs:57) — the working table feeds the
recursive term until it produces no new rows. Spark has no recursion
primitive, so the loop runs on the driver, but each ITERATION is a fully
distributed DataFrame job, and only the frontier (the rows added last round)
feeds the next step — the textbook semi-naive evaluation, which is also what
keeps this viable at scale (the step input is the delta, not the whole
accumulated result).

Scale notes: each iteration's frontier is localCheckpoint()ed to truncate
the lineage — without it, iteration k's plan contains k nested copies of the
step and Catalyst analysis goes quadratic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_query(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    distinct: bool = True,
    max_iterations: int = 100,
    result_partitions: int | None = 1,
) -> DataFrame:
    """Evaluate ``WITH RECURSIVE r AS (base UNION [ALL] step(r)) SELECT *``.

    ``distinct=True`` is UNION semantics (new rows deduped against
    everything seen — guarantees termination on cyclic data);
    ``distinct=False`` is UNION ALL (caller must guarantee termination).

    ``result_partitions`` bounds the accumulated result's partition count
    between iterations. Recursive working sets are usually tiny relative to
    their inputs (frontiers shrink), and without the coalesce each
    iteration's subtract scans an ever-growing union of many-partition
    frontiers — pure task-scheduling overhead. Pass None for genuinely
    large closures.
    """
    frontier = base.localCheckpoint(eager=True)
    acc = frontier
    for _ in range(max_iterations):
        nxt = step(frontier)
        if distinct:
            nxt = nxt.distinct().subtract(acc)
        if result_partitions:
            nxt = nxt.coalesce(result_partitions)
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            return acc
        acc = acc.unionAll(nxt)
        if result_partitions:
            acc = acc.coalesce(result_partitions)
        acc = acc.localCheckpoint(eager=True)
        frontier = nxt
    raise RuntimeError(f"recursive query did not converge in {max_iterations} iterations")
