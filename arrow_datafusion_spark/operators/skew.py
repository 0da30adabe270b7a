"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one power-user, one dominant event_type)
can pin an entire groupBy/join stage on one reducer. Two classic remedies,
both expressed as pure DataFrame rewrites with UNCHANGED semantics (each
entry is oracle-checked against the plain unsalted SQL):

- **Salted two-stage aggregation**: groupBy(key, salt) partial-aggregates
  each hot key across ``n_salts`` reducers, then a second (tiny) groupBy(key)
  merges the per-salt partials. Works for any algebraic aggregate
  (sum/count/min/max — expressed here as sum/count; avg = merged sum/count).
- **Salted join**: the skewed (fact) side gets a random-ish salt in
  [0, n_salts); the small side is replicated n_salts times via an explode of
  ``sequence(0, n_salts-1)``, so the equi-join key becomes (key, salt) and a
  hot key's rows spread over n_salts reducers. Replication multiplies the
  small side by n_salts — the same trade AQE's skew-join optimization makes
  with runtime stats; this explicit form works on any Spark and composes
  with further operators.

Salt derivation is DETERMINISTIC (pmod of a row-local column, not rand()):
re-execution of a failed task must produce the same salt or shuffle
repartitioning breaks exactly-once row delivery (Spark recomputes lost
partitions from lineage).

Catalyst/AQE note: with spark.sql.adaptive.skewJoin enabled (the session
default here) Spark splits oversized shuffle blocks on its own; these
operators are for engines/pipelines that need the plan-level guarantee —
e.g. when the skew is in an aggregation (AQE skew handling only covers
sort-merge joins) or when AQE is off.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["deterministic_salt", "salted_sum_count", "salted_join"]


def deterministic_salt(col: Column, n_salts: int) -> Column:
    """A stable salt in [0, n_salts) derived from a row-local value.

    xxhash64 decorrelates the salt from the key's own hash partitioning —
    pmod(key, n) would send every row of hot key k to the same reducer
    anyway when n divides the shuffle partition count.
    """
    return F.pmod(F.xxhash64(col), F.lit(n_salts)).cast("int")


def salted_sum_count(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """groupBy(key) → sum/count, computed skew-proof in two stages.

    Stage 1 shuffles on (key, salt) — a hot key spreads over n_salts
    reducers; stage 2 merges n_salts partial rows per key (negligible).
    The value accumulates in DECIMAL(38,6) so the two-stage sum is exactly
    the one-stage sum regardless of addition order.
    """
    salt = deterministic_salt(
        F.col(salt_source if salt_source is not None else value), n_salts
    )
    partial = (
        df.select(F.col(key), F.col(value).cast("decimal(38,6)").alias("_v"), salt.alias("_salt"))
        .groupBy(key, "_salt")
        .agg(F.sum("_v").alias("_psum"), F.count(F.lit(1)).alias("_pcnt"))
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").alias("sum_value"), F.sum("_pcnt").alias("cnt")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Inner equi-join with the fact side salted and the dim side replicated.

    Output columns = fact columns + dim columns (join key deduplicated to
    the fact side). Equivalent to ``fact JOIN dim ON fact_key = dim_key``.
    """
    salt = deterministic_salt(
        F.col(salt_source if salt_source is not None else fact_key), n_salts
    )
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    joined = f.join(d, (F.col(fact_key) == F.col(dim_key)) & (f["_salt"] == d["_salt"]))
    drop_cols = [c for c in (dim_key, "_salt") if c != fact_key]
    return joined.drop(*drop_cols) if drop_cols else joined
