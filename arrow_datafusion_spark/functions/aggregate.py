"""Aggregate-function layer (SURVEY.md §2.4): all 38 DataFusion aggregate
functions (registry datafusion/functions-aggregate/src/lib.rs:125-161 plus the
builtin enum expr/src/aggregate_function.rs:35-44) as PySpark expressions.

Catalyst plans every one of these as partial+final hash aggregation
(AggregateExec Partial/Final, physical-plan/src/aggregates/mod.rs:241) with
map-side combine — nothing to hand-schedule.

Determinism notes (relevant for oracle hash-comparison and for stable results
under repartitioning at cluster scale):
- ordered first/last use min_by/max_by (point lookups, shuffle-order-proof)
  instead of relying on input order like a naive F.first would;
- ordered/distinct array_agg + string_agg sort their output arrays, because
  collect_list order under a shuffle is nondeterministic;
- approx_* are genuinely approximate (HyperLogLog++ / KLL vs the reference's
  HLL / t-digest): same contract, different sketch — tested by error bound,
  not exact equality.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["AGGREGATE"]


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


AGGREGATE: dict[str, Callable[..., Column]] = {
    # core (count.rs:78, sum.rs:75, average.rs:53, min_max.rs:77,876)
    "count": lambda c=None: F.count(F.lit(1)) if c is None else F.count(_c(c)),
    "count_distinct": lambda *cs: F.countDistinct(*[_c(c) for c in cs]),
    "sum": lambda c: F.sum(_c(c)),
    "avg": lambda c: F.avg(_c(c)),
    "mean": lambda c: F.avg(_c(c)),
    "min": lambda c: F.min(_c(c)),
    "max": lambda c: F.max(_c(c)),
    # exact order statistics (median.rs)
    "median": lambda c: F.median(_c(c)),
    # approximate sketches (approx_distinct.rs / hyperloglog.rs,
    # approx_median.rs, approx_percentile_cont.rs / tdigest.rs)
    # default rsd 0.00865 lands Spark's p = ceil(2·log2(1.106/rsd)) at 14 —
    # the reference's fixed 2^14-register precision (hyperloglog.rs
    # HLL_P=14); Spark's derivation constant is 1.106, not the textbook
    # 1.04, so the naive 0.008125 would over-provision p=15
    "approx_distinct": lambda c, rsd=0.00865: F.approx_count_distinct(_c(c), rsd),
    "approx_median": lambda c: F.percentile_approx(_c(c), 0.5),
    "approx_percentile_cont": lambda c, p, acc=10000: F.percentile_approx(
        _c(c), p, acc
    ),
    "approx_percentile_cont_with_weight": lambda c, w, p: _approx_pct_weighted(
        _c(c), _c(w), p
    ),
    # dispersion (stddev.rs, variance.rs)
    "stddev": lambda c: F.stddev_samp(_c(c)),
    "stddev_samp": lambda c: F.stddev_samp(_c(c)),
    "stddev_pop": lambda c: F.stddev_pop(_c(c)),
    "var": lambda c: F.var_samp(_c(c)),
    "var_samp": lambda c: F.var_samp(_c(c)),
    "var_pop": lambda c: F.var_pop(_c(c)),
    # reference alias spellings (variance.rs `aliases()`)
    "var_sample": lambda c: F.var_samp(_c(c)),
    "var_population": lambda c: F.var_pop(_c(c)),
    # bivariate (covariance.rs, correlation.rs, regr.rs)
    "covar": lambda a, b: F.covar_samp(_c(a), _c(b)),
    "covar_samp": lambda a, b: F.covar_samp(_c(a), _c(b)),
    "covar_pop": lambda a, b: F.covar_pop(_c(a), _c(b)),
    "corr": lambda a, b: _corr(_c(a), _c(b)),
    "regr_slope": lambda y, x: F.regr_slope(_c(y), _c(x)),
    "regr_intercept": lambda y, x: F.regr_intercept(_c(y), _c(x)),
    "regr_count": lambda y, x: F.regr_count(_c(y), _c(x)),
    "regr_r2": lambda y, x: F.regr_r2(_c(y), _c(x)),
    "regr_avgx": lambda y, x: F.regr_avgx(_c(y), _c(x)),
    "regr_avgy": lambda y, x: F.regr_avgy(_c(y), _c(x)),
    "regr_sxx": lambda y, x: F.regr_sxx(_c(y), _c(x)),
    "regr_syy": lambda y, x: F.regr_syy(_c(y), _c(x)),
    "regr_sxy": lambda y, x: F.regr_sxy(_c(y), _c(x)),
    # ordered first/last (first_last.rs) — min_by/max_by are order-proof
    "first_value": lambda c, order: F.min_by(_c(c), _c(order)),
    "last_value": lambda c, order: F.max_by(_c(c), _c(order)),
    # nth_value aggregate (physical-expr/src/aggregate/nth_value.rs):
    # try_element_at of the order-sorted collected list (NULL past the end)
    "nth_value": lambda c, n: F.try_element_at(
        F.array_sort(F.collect_list(_c(c))), F.lit(n)
    ),
    # string_agg (string_agg.rs) — deterministic: sorted by value
    "string_agg": lambda c, sep=",": F.concat_ws(
        sep, F.array_sort(F.collect_list(_c(c)))
    ),
    # array_agg (+DISTINCT, +ORDER BY) (physical-expr/src/aggregate/array_agg*.rs)
    # NULL elements are KEPT (array_agg.rs accumulates the raw column);
    # collect_list drops them, so collect non-null struct wrappers and unwrap
    "array_agg": lambda c: F.transform(
        F.collect_list(F.struct(_c(c).alias("__v"))), lambda s: s["__v"]
    ),
    "array_agg_ordered": lambda c: F.array_sort(F.collect_list(_c(c))),
    "array_agg_distinct": lambda c: F.array_sort(F.collect_set(_c(c))),
    # bitwise / boolean (bit_and_or_xor.rs, bool_and_or.rs)
    "bit_and": lambda c: F.bit_and(_c(c)),
    "bit_or": lambda c: F.bit_or(_c(c)),
    "bit_xor": lambda c: F.bit_xor(_c(c)),
    "bool_and": lambda c: F.bool_and(_c(c)),
    "bool_or": lambda c: F.bool_or(_c(c)),
    "every": lambda c: F.bool_and(_c(c)),
    # grouping-set indicator (grouping.rs)
    "grouping": lambda c: F.grouping(_c(c)),
}


def _corr(a: Column, b: Column) -> Column:
    """Pearson correlation with the reference's degenerate-case semantics
    (correlation.rs:161): corr is computed from POPULATION statistics, and
    zero variance on either side — including a single pair, where
    var_pop = 0 — yields 0.0, not NULL. Empty input stays NULL. The
    stddevs are taken over PAIRWISE non-null rows (both engines restrict
    corr to complete pairs). n>=2 nonzero-variance results are identical
    to Spark's corr (the (n-1)/n factors cancel in the ratio)."""
    pair = a.isNotNull() & b.isNotNull()
    return F.when(
        (F.stddev_pop(F.when(pair, a)) == 0) | (F.stddev_pop(F.when(pair, b)) == 0),
        F.lit(0.0),
    ).otherwise(F.corr(a, b))


def _approx_pct_weighted(c: Column, w: Column, p: float) -> Column:
    """approx_percentile_cont_with_weight — Spark's sketch takes no weights;
    approximate by integer-repeating each value w times (weights must be
    small positive ints, matching the reference's test usage)."""
    repeated = F.flatten(
        F.collect_list(F.array_repeat(c, F.greatest(w.cast("int"), F.lit(0))))
    )
    return F.element_at(
        F.array_sort(repeated),
        F.greatest((F.size(F.array_sort(repeated)) * p).cast("int"), F.lit(1)),
    )
