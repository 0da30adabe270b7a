"""Recursive CTE execution: driver-side fixpoint loop.

Reference: WorkTableExec (physical-plan/src/work_table.rs:97) +
RecursiveQueryExec (recursive_query.rs:57) — the working table feeds the
recursive term until it produces no new rows. Spark has no recursion
primitive, so the loop runs on the driver, but each ITERATION is a fully
distributed DataFrame job, and only the frontier (the rows added last round)
feeds the next step — the textbook semi-naive evaluation, which is also what
keeps this viable at scale (the step input is the delta, not the whole
accumulated result).

Scale notes:
- Each round's materialization is localCheckpoint()ed to truncate lineage —
  without it, iteration k's plan contains k nested copies of the step and
  Catalyst analysis goes quadratic.
- Iterations are UNROLLED in batches of ``unroll``: the composed steps
  step(f), step(step(f)), ... are unioned (tagged with their depth) and
  materialized by ONE job. The fixpoint's cost at toy scale is pure
  per-job scheduling floor (~25 ms × 3 jobs × N iterations when driven one
  iteration at a time); batching divides that by the unroll factor while
  producing the exact same multiset per iteration. On huge working sets an
  unroll of 1 (the classic loop) minimizes per-batch memory; the default
  suits the common small-frontier regime.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEPTH = "__rq_depth"


def recursive_query(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    distinct: bool = True,
    max_iterations: int = 100,
    result_partitions: int | None = 1,
    unroll: int | None = None,
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
    if unroll is None:
        # Join-bearing steps (the distinct/graph-closure case) pay per-step
        # analysis + broadcast-stage rounds that grow with composition depth
        # — a smaller batch wins; narrow UNION ALL steps amortize best at
        # deeper unrolls (measured: graph closure fastest at 8, the
        # 100-iteration series at 16-25).
        unroll = 8 if distinct else 16
    unroll = max(1, unroll)
    frontier = base.localCheckpoint(eager=True)
    acc = frontier
    done = 0
    while done < max_iterations:
        k = min(unroll, max_iterations - done)
        # Compose k steps lazily; tag each composed frontier with its depth
        # so one materialized batch can serve as (a) the rows of iterations
        # done+1..done+k, (b) the next batch's starting frontier (max depth
        # slice), and (c) the emptiness probe.
        # No per-step dedup inside the batch: each distinct() is a shuffle
        # stage, and 8 of them per batch job cost more than they save. The
        # batch-end distinct-vs-acc bounds the accumulated state; within a
        # batch the frontier can transiently grow by out-degree^unroll on
        # dense cyclic graphs — callers with such graphs pass a small
        # ``unroll``.
        tagged = None
        f = frontier
        for j in range(1, k + 1):
            f = step(f)
            tf = f.withColumn(_DEPTH, F.lit(j))
            tagged = tf if tagged is None else tagged.unionAll(tf)
        if result_partitions:
            tagged = tagged.coalesce(result_partitions)
        batch = tagged.localCheckpoint(eager=True)
        done += k

        if distinct:
            new = batch.drop(_DEPTH).distinct().subtract(acc)
            if result_partitions:
                new = new.coalesce(result_partitions)
            new = new.localCheckpoint(eager=True)
            if new.isEmpty():
                return acc
            acc = acc.unionAll(new)
            if result_partitions:
                acc = acc.coalesce(result_partitions)
            # checkpoint keeps the subtract target flat for the next batch
            acc = acc.localCheckpoint(eager=True)
            frontier = new
        else:
            acc = acc.unionAll(batch.drop(_DEPTH))
            # Union-of-checkpointed-batches keeps the plan shallow (each leaf
            # is a checkpoint), but the partition count still grows by
            # result_partitions per batch — bound it here so the returned
            # frame doesn't carry batch-count × partitions empty splits.
            # (A per-batch checkpoint of acc would rewrite the whole
            # accumulated set every batch — strictly worse.)
            if result_partitions:
                acc = acc.coalesce(result_partitions)
            # step(empty) is empty, so an empty deepest slice means every
            # later iteration is empty too — fixpoint reached.
            deepest = batch.filter(F.col(_DEPTH) == k).drop(_DEPTH)
            if deepest.isEmpty():
                return acc
            frontier = deepest
    # Budget exhausted with the LAST batch still producing rows. With the
    # per-iteration loop this was unambiguous non-convergence; with batching
    # the fixpoint may have landed INSIDE that final batch (its early depths
    # yielded the last new rows). One extra probe step decides: empty next
    # delta ⇒ converged exactly at the budget, matching the unbatched loop's
    # return-at-empty-frontier behavior.
    probe = step(frontier)
    if distinct:
        probe = probe.distinct().subtract(acc)
    if probe.isEmpty():
        return acc
    raise RuntimeError(f"recursive query did not converge in {max_iterations} iterations")
