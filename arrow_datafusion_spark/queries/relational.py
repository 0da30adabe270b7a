"""Relational-operator suite: set operations, the full join-type matrix,
unnest/struct access, limit/offset (SURVEY.md §2.2/§2.3/§2.6/§2.7).

Reference: union.rs:89, logical_plan/builder.rs:977-1030 (INTERSECT/EXCEPT
lowering to semi/anti joins), join_type.rs:30-47 (8 join types),
unnest.rs:60, limit.rs:43; test corpus union.slt / joins.slt / unnest.slt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_datafusion_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=(name,))[name]


# --------------------------------------------------------------------------
def setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / UNION / INTERSECT [ALL] / EXCEPT [ALL] over two
    overlapping order subsets, tagged and stacked into one multiset."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")

    def tag(df: DataFrame, name: str) -> DataFrame:
        return df.select(F.lit(name).alias("op"), F.col("o_custkey"))

    return (
        tag(a.unionAll(b), "union_all")
        .unionAll(tag(a.union(b).distinct(), "union_distinct"))
        .unionAll(tag(a.intersect(b), "intersect"))
        .unionAll(tag(a.intersectAll(b), "intersect_all"))
        .unionAll(tag(a.subtract(b), "except"))
        .unionAll(tag(a.exceptAll(b), "except_all"))
    )


SETOPS_SQL = """
WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT 'union_all' AS op, o_custkey FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
UNION ALL SELECT 'union_distinct', o_custkey FROM (SELECT * FROM a UNION SELECT * FROM b)
UNION ALL SELECT 'intersect', o_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL SELECT 'intersect_all', o_custkey FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
UNION ALL SELECT 'except', o_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
UNION ALL SELECT 'except_all', o_custkey FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
"""


# --------------------------------------------------------------------------
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left / right / full outer with unmatched rows on BOTH sides (nations
    0-14 vs supplier-holding nations ≥ 10), stacked with an op tag."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 15)
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") >= 10)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    cond = F.col("n_nationkey") == F.col("s_nationkey")

    def tag(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("op"),
            F.col("n_nationkey"),
            F.col("s_nationkey"),
            F.col("n_supp"),
        )

    return (
        tag(n.join(s, cond, "left_outer"), "left")
        .unionAll(tag(n.join(s, cond, "right_outer"), "right"))
        .unionAll(tag(n.join(s, cond, "full_outer"), "full"))
        .unionAll(tag(n.join(s, cond, "inner"), "inner"))
    )


JOIN_OUTER_SQL = """
WITH n AS (SELECT n_nationkey FROM nation WHERE n_nationkey < 15),
     s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier
           WHERE s_nationkey >= 10 GROUP BY s_nationkey)
SELECT 'left' AS op, n_nationkey, s_nationkey, n_supp
FROM n LEFT JOIN s ON n_nationkey = s_nationkey
UNION ALL SELECT 'right', n_nationkey, s_nationkey, n_supp
FROM n RIGHT JOIN s ON n_nationkey = s_nationkey
UNION ALL SELECT 'full', n_nationkey, s_nationkey, n_supp
FROM n FULL JOIN s ON n_nationkey = s_nationkey
UNION ALL SELECT 'inner', n_nationkey, s_nationkey, n_supp
FROM n JOIN s ON n_nationkey = s_nationkey
"""


# --------------------------------------------------------------------------
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti plus right_semi / right_anti (expressed by
    swapping inputs, exactly how the reference lowers them —
    join_type.rs:30-47)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    cond = F.col("c_custkey") == F.col("o_custkey")

    left_semi = c.join(o, cond, "left_semi").select("c_custkey")
    left_anti = c.join(o, cond, "left_anti").select("c_custkey")
    # right_semi(c, o) ≡ left_semi(o, c): urgent orders that have a customer
    right_semi = o.join(c, cond, "left_semi").select(
        F.col("o_orderkey").alias("c_custkey")
    )
    right_anti = o.join(c, cond, "left_anti").select(
        F.col("o_orderkey").alias("c_custkey")
    )
    tag = lambda df, name: df.select(F.lit(name).alias("op"), "c_custkey")  # noqa: E731
    return (
        tag(left_semi, "left_semi")
        .unionAll(tag(left_anti, "left_anti"))
        .unionAll(tag(right_semi, "right_semi"))
        .unionAll(tag(right_anti, "right_anti"))
    )


JOIN_SEMI_ANTI_SQL = """
WITH o AS (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT 'left_semi' AS op, c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM o WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'left_anti', c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM o WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'right_semi', o_orderkey FROM o
WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
UNION ALL
SELECT 'right_anti', o_orderkey FROM o
WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
"""


# --------------------------------------------------------------------------
def join_theta_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrossJoinExec (cross_join.rs:55) and a pure theta join with no equi
    key (NestedLoopJoinExec, nested_loop_join.rs:141)."""
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    cross = r.crossJoin(n.select(F.col("n_nationkey").alias("nk"))).select(
        F.lit("cross").alias("op"), "r_regionkey", F.col("nk").alias("k2")
    )
    # pure theta: no equality — region key strictly between nation-derived bounds
    theta = r.join(
        n, (F.col("r_regionkey") * 5 < F.col("n_nationkey"))
        & (F.col("n_nationkey") <= F.col("r_regionkey") * 5 + 5),
        "inner",
    ).select(F.lit("theta").alias("op"), "r_regionkey", F.col("n_nationkey").alias("k2"))
    return cross.unionAll(theta)


JOIN_THETA_CROSS_SQL = """
SELECT 'cross' AS op, r_regionkey, n_nationkey AS k2 FROM region CROSS JOIN nation
UNION ALL
SELECT 'theta', r_regionkey, n_nationkey AS k2
FROM region JOIN nation
  ON r_regionkey * 5 < n_nationkey AND n_nationkey <= r_regionkey * 5 + 5
"""


# --------------------------------------------------------------------------
def unnest_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UnnestExec (unnest.rs:60): posexplode of an array column + struct
    field access (select(\"s.*\") shape)."""
    d = _t(spark, sf_dir, "documents")
    words3 = F.slice(F.split(F.col("text"), " "), 1, 3)
    meta = F.struct(F.col("lang").alias("lang"), F.col("n_chars").alias("nc"))
    return (
        d.select("doc_id", F.posexplode(words3).alias("pos", "word"), meta.alias("m"))
        .select(
            "doc_id",
            "pos",
            "word",
            F.col("m.lang").alias("lang"),
            F.col("m.nc").alias("nc"),
        )
    )


UNNEST_STRUCT_SQL = """
WITH t AS (SELECT doc_id, (string_split(text, ' '))[1:3] AS w3, lang, n_chars
           FROM documents)
SELECT doc_id, i - 1 AS pos, w3[CAST(i AS INT)] AS word, lang, n_chars AS nc
FROM t, (SELECT unnest(range(1, 4)) AS i) idx
WHERE i <= len(w3)
"""


# --------------------------------------------------------------------------
def unnest_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column unnest with null padding (UnnestExec's multi-list mode,
    unnest.rs:60: lists of different lengths unnest in lockstep, shorter
    ones padded with NULL): arrays_zip + explode_outer."""
    d = _t(spark, sf_dir, "documents")
    pre = d.select(
        "doc_id",
        # coalesce: NULL text must mean EMPTY list, not a NULL array —
        # arrays_zip(NULL, x) nulls the whole zip and would diverge from the
        # oracle's per-list length arithmetic on a future NULL-bearing fixture
        F.coalesce(
            F.slice(F.split(F.col("text"), " "), 1, 2),
            F.array().cast("array<string>"),
        ).alias("wa"),
        F.when(F.col("doc_id") % 3 == 0, F.array().cast("array<bigint>"))
        .otherwise(F.sequence(F.lit(1).cast("bigint"), F.col("doc_id") % 3))
        .alias("na"),
    )
    return pre.select(
        "doc_id", F.explode_outer(F.arrays_zip("wa", "na")).alias("z")
    ).select(
        "doc_id",
        F.col("z.wa").alias("word"),
        F.col("z.na").alias("num"),
    )


UNNEST_MULTI_SQL = """
WITH t AS (
  SELECT doc_id,
         coalesce((string_split(text, ' '))[1:2], []) AS wa,
         CASE WHEN doc_id % 3 = 0 THEN [] ELSE range(1, doc_id % 3 + 1) END AS na
  FROM documents
), idx AS (SELECT unnest(range(1, 3)) AS i)
SELECT doc_id,
       CASE WHEN i <= len(wa) THEN wa[CAST(i AS INT)] END AS word,
       CASE WHEN i <= len(na) THEN na[CAST(i AS INT)] END AS num
FROM t, idx
WHERE i <= greatest(len(wa), len(na), 1)
"""


# --------------------------------------------------------------------------
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalLimit + offset (limit.rs:43,267; Spark 3.4+ offset)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(25)
    )


LIMIT_OFFSET_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_orderkey LIMIT 25 OFFSET 100
"""


# --------------------------------------------------------------------------
def sort_null_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST/LAST in all four sort directions (SortExec
    SortOptions — sort.rs:85; Spark and DuckDB have OPPOSITE defaults, so
    every branch spells the placement out). The driver hash is row-order-
    insensitive, so each ordering is made observable through its LIMIT
    cutoff: which rows survive depends on where the NULLs sort."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio"),
    )

    def top(variant: str, col) -> DataFrame:
        return (
            o.orderBy(col, "o_orderkey")
            .limit(10)
            .select(F.lit(variant).alias("variant"), "o_orderkey", "prio")
        )

    p = F.col("prio")
    return (
        top("asc_nf", p.asc_nulls_first())
        .unionAll(top("asc_nl", p.asc_nulls_last()))
        .unionAll(top("desc_nf", p.desc_nulls_first()))
        .unionAll(top("desc_nl", p.desc_nulls_last()))
    )


SORT_NULL_ORDER_SQL = """
WITH o AS (
  SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS prio FROM orders
)
SELECT * FROM (SELECT 'asc_nf' AS variant, o_orderkey, prio FROM o
               ORDER BY prio ASC NULLS FIRST, o_orderkey LIMIT 10)
UNION ALL
SELECT * FROM (SELECT 'asc_nl', o_orderkey, prio FROM o
               ORDER BY prio ASC NULLS LAST, o_orderkey LIMIT 10)
UNION ALL
SELECT * FROM (SELECT 'desc_nf', o_orderkey, prio FROM o
               ORDER BY prio DESC NULLS FIRST, o_orderkey LIMIT 10)
UNION ALL
SELECT * FROM (SELECT 'desc_nl', o_orderkey, prio FROM o
               ORDER BY prio DESC NULLS LAST, o_orderkey LIMIT 10)
"""


# --------------------------------------------------------------------------
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-stage aggregation (operators/skew.py): groupBy(key,
    salt) partials then merge — oracled by the plain one-stage GROUP BY,
    proving the rewrite changes the shuffle shape, not the semantics."""
    from arrow_datafusion_spark.operators.skew import salted_sum_count

    ev = _t(spark, sf_dir, "events")
    out = salted_sum_count(ev, "event_type", "value", n_salts=8)
    return out.select(
        "event_type",
        F.round(F.col("sum_value"), 2).cast("double").alias("sum_value"),
        "cnt",
    ).orderBy("event_type")


SKEW_SALTED_AGG_SQL = """
SELECT event_type,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_value,
       count(*) AS cnt
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dim equi-join (operators/skew.py): fact side salted,
    dim side replicated per salt — oracled by the plain join."""
    from arrow_datafusion_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events")
    profile = ev.groupBy(F.col("user_id").alias("p_user")).agg(
        F.min("ts").alias("first_ts")
    )
    hot = ev.filter(F.col("value") > 99.0).select("event_id", "user_id", "value")
    return (
        salted_join(hot, profile, "user_id", "p_user", n_salts=8)
        .select("event_id", "user_id", "value", "first_ts")
        .orderBy("event_id")
    )


SKEW_SALTED_JOIN_SQL = """
SELECT e.event_id, e.user_id, e.value, p.first_ts
FROM events e
JOIN (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id) p
  ON e.user_id = p.user_id
WHERE e.value > 99.0
ORDER BY e.event_id
"""


# --------------------------------------------------------------------------
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SortMergeJoinExec exercised for RESULTS, not just plan shape: the
    merge hint forces SMJ (join_v2.rs sort-merge path) for a fact-to-fact
    orders⋈lineitem join too big to broadcast in spirit; the oracle checks
    the aggregate of the joined rows."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        orders.hint("merge")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").cast("bigint").alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


JOIN_SORTMERGE_SQL = """
SELECT o_orderpriority, count(*) AS n_lines,
       CAST(SUM(l_quantity) AS BIGINT) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES = {
    "setops": setops,
    "join_sortmerge": join_sortmerge,
    "skew_salted_agg": skew_salted_agg,
    "skew_salted_join": skew_salted_join,
    "join_outer": join_outer,
    "join_semi_anti": join_semi_anti,
    "join_theta_cross": join_theta_cross,
    "unnest_struct": unnest_struct,
    "unnest_multi": unnest_multi,
    "limit_offset": limit_offset,
    "sort_null_order": sort_null_order,
}
ORACLE = {
    "setops": SETOPS_SQL,
    "join_sortmerge": JOIN_SORTMERGE_SQL,
    "skew_salted_agg": SKEW_SALTED_AGG_SQL,
    "skew_salted_join": SKEW_SALTED_JOIN_SQL,
    "join_outer": JOIN_OUTER_SQL,
    "join_semi_anti": JOIN_SEMI_ANTI_SQL,
    "join_theta_cross": JOIN_THETA_CROSS_SQL,
    "unnest_struct": UNNEST_STRUCT_SQL,
    "unnest_multi": UNNEST_MULTI_SQL,
    "limit_offset": LIMIT_OFFSET_SQL,
    "sort_null_order": SORT_NULL_ORDER_SQL,
}
