"""Idle-box A/B harness for TPC-H query variants (VERDICT protocol).

Replicates bench.py section_tpch's measurement discipline — same session
tuning (AQE off, 8 shuffle partitions), same warmup, System.gc() between
queries, per-query sf0.001 floor measured back-to-back with the sf0.1
timing — for a handful of queries, so a candidate plan change can be
confirmed (or dismissed as box variance) before it lands in tpch.py.

Usage: python tools/ab_tpch.py q3 q10 q12 [--n 5] [--explain]
Variants are registered in _VARIANTS below; each is timed against the
current tpch.py implementation and its collected result is required to
match exactly (sorted-row comparison).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from arrow_datafusion_spark.queries import tpch  # noqa: E402


# --------------------------------------------------------------------------
# candidate variants: name -> (base_query_name, fn(spark, sf_dir) -> DataFrame)
def _q3_bcast(spark, sf_dir):
    """q5 template: broadcast the filtered c⋈o build side into lineitem."""
    customer, orders, lineitem = tpch._t(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c_o = (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_orderdate")
    )
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(F.broadcast(c_o), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(tpch._esum(tpch._rev(), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def _q3_bcast_cust(spark, sf_dir):
    """Broadcast only the filtered customer dim; shuffle o⋈l as today."""
    customer, orders, lineitem = tpch._t(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        orders.filter(F.col("o_orderdate") < cutoff)
        .join(
            F.broadcast(
                customer.filter(F.col("c_mktsegment") == "BUILDING").select(
                    "c_custkey"
                )
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .join(
            lineitem.filter(F.col("l_shipdate") > cutoff),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(tpch._esum(tpch._rev(), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def _q10_bcast(spark, sf_dir):
    """q5 template: build side = date-filtered o ⋈ c, broadcast into lineitem."""
    customer, orders, lineitem, nation = tpch._t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c_o = customer.join(F.broadcast(o), F.col("c_custkey") == F.col("o_custkey"))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(c_o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(tpch._esum(tpch._rev(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def _q12_bcast(spark, sf_dir):
    """Broadcast the projected orders build side into filtered lineitem."""
    orders, lineitem = tpch._t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate", "l_linestatus").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return tpch._sorted_small(
        li.join(F.broadcast(o), F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        ),
        "l_linestatus",
    )


def _q12_prune(spark, sf_dir):
    """Keep the shuffle join but prune both sides to the join columns."""
    orders, lineitem = tpch._t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate", "l_linestatus").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return tpch._sorted_small(
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        ),
        "l_linestatus",
    )


def _q3_semi_nohint(spark, sf_dir):
    """Left-semi on projected customer keys, NO hint — Catalyst broadcasts
    below threshold at bench scale and degrades to shuffle at cluster scale."""
    customer, orders, lineitem = tpch._t(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        orders.filter(F.col("o_orderdate") < cutoff)
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .join(
            lineitem.filter(F.col("l_shipdate") > cutoff),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(tpch._esum(tpch._rev(), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def _q10_partial_agg(spark, sf_dir):
    """Aggregate revenue per o_custkey BELOW the customer join: lineitem ⋈
    broadcast(date-filtered orders keys), group to per-customer revenue
    (small), then join customer+nation. Avoids shipping customer attrs
    through the fact join entirely."""
    customer, orders, lineitem, nation = tpch._t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(tpch._esum(tpch._rev(), "revenue"))
    )
    return (
        customer.join(per_cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def _q12_bool(spark, sf_dir):
    """Compute the priority boolean BEFORE the shuffle: the orders side of
    the join carries (int, timestamp, bool) instead of the priority string."""
    orders, lineitem = tpch._t(spark, sf_dir, "orders", "lineitem")
    o = orders.select(
        "o_orderkey",
        "o_orderdate",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("high"),
    )
    li = lineitem.select("l_orderkey", "l_shipdate", "l_linestatus").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return tpch._sorted_small(
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(F.col("high"), 1)).alias("high_line_count"),
            F.count(F.when(~F.col("high"), 1)).alias("low_line_count"),
        ),
        "l_linestatus",
    )


def _q16_predistinct(spark, sf_dir):
    """Dedup (l_partkey, l_suppkey) BEFORE the part join — reconstructs the
    reference's partsupp cardinality from the fact table, so the join and
    the countDistinct expand see |part x avg-suppliers| rows, not |lineitem|."""
    lineitem, part, supplier = tpch._t(spark, sf_dir, "lineitem", "part", "supplier")
    bad_supp = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    links = lineitem.select("l_partkey", "l_suppkey").distinct()
    return tpch._sorted_small(
        part.filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        )
        .join(links, F.col("p_partkey") == F.col("l_partkey"))
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")),
        F.desc("supplier_cnt"),
        "p_brand",
        "p_type",
        "p_size",
    )


def _q4_bcast(spark, sf_dir):
    """Hint-broadcast the 3-month orders window into the lineitem join."""
    orders, lineitem = tpch._t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    late = lineitem.select("l_orderkey", "l_shipdate").join(
        F.broadcast(o),
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
    )
    return tpch._sorted_small(
        late.groupBy("o_orderpriority").agg(
            F.countDistinct("o_orderkey").alias("order_count")
        ),
        "o_orderpriority",
    )


def _q4_preagg_max(spark, sf_dir):
    """EXISTS(l_shipdate > o_orderdate + 60d) ⇔ per-order max(l_shipdate)
    > o_orderdate + 60d: pre-aggregate lineitem to ONE (orderkey, max)
    row — map-side partial max, no countDistinct expand — then broadcast
    the 3-month orders window into the 1-row-per-order set."""
    orders, lineitem = tpch._t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    mx = (
        lineitem.select("l_orderkey", "l_shipdate")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    late = mx.join(
        F.broadcast(o),
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("max_ship") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
    )
    return tpch._sorted_small(
        late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count")),
        "o_orderpriority",
    )


def _q4_semi_preagg(spark, sf_dir):
    """Same max-per-order identity, but broadcast-SEMI-filter lineitem to
    the window's orderkeys FIRST so the pre-agg runs over ~6% of the fact
    rows instead of all of them."""
    orders, lineitem = tpch._t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    keys = F.broadcast(o.select(F.col("o_orderkey").alias("k")))
    mx = (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(keys, F.col("l_orderkey") == F.col("k"), "left_semi")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    late = mx.join(
        F.broadcast(o),
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("max_ship") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
    )
    return tpch._sorted_small(
        late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count")),
        "o_orderpriority",
    )


def _q12_shuffle_hash(spark, sf_dir):
    """SHUFFLE_HASH the orders side: Spark's default prefers sort-merge for
    large-large joins; DataFusion always partitioned-hash-joins. The hint
    skips both sort passes (scale-appropriate: hash side is per-partition)."""
    orders, lineitem = tpch._t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return tpch._sorted_small(
        orders.hint("SHUFFLE_HASH")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        ),
        "l_linestatus",
    )


def _q13_preagg(spark, sf_dir):
    """Aggregate orders per custkey BEFORE the customer join (q10 pattern):
    the shuffle carries (custkey, count) partial aggregates instead of raw
    order rows; customers with no orders get 0 via the left join."""
    customer, orders = tpch._t(spark, sf_dir, "customer", "orders")
    per_cust = (
        orders.filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    c_orders = customer.join(
        per_cust, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
    ).select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
    return tpch._sorted_small(
        c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist")),
        F.desc("custdist"),
        F.desc("c_count"),
    )


def _q4_semi_shj(spark, sf_dir):
    """LEFT-SEMI orders against the late-lineitem probe with SHUFFLE_HASH:
    the semi avoids the countDistinct expand entirely (each order counted
    once), and the hint builds the per-partition hash from the pruned
    lineitem (l_orderkey, l_shipdate) pairs."""
    orders, lineitem = tpch._t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    late = o.join(
        lineitem.select("l_orderkey", "l_shipdate").hint("SHUFFLE_HASH"),
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return tpch._sorted_small(
        late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count")),
        "o_orderpriority",
    )


def _q2_shj(spark, sf_dir):
    """SHUFFLE_HASH the distinct-links dedup join chain (the one SMJ left
    in the whole suite's static plans)."""
    from pyspark.sql import Window

    part, supplier, lineitem, nation, region = tpch._t(
        spark, sf_dir, "part", "supplier", "lineitem", "nation", "region"
    )
    eur_supp = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    p = part.filter(F.col("p_size") == 15)
    links = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .distinct()
    )
    cand = p.hint("SHUFFLE_HASH").join(
        links, F.col("p_partkey") == F.col("l_partkey")
    ).join(eur_supp.hint("SHUFFLE_HASH"), F.col("l_suppkey") == F.col("s_suppkey"))
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_acctbal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_acctbal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .distinct()
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def _q15_long(spark, sf_dir):
    """Accumulate revenue as the exact e4-scaled long (the _esum grid
    argument) instead of Decimal128; max-tie equality compares the exact
    longs, so tie-break correctness is unchanged.

    MEASURED NEUTRAL (r7 SF1 A/B, min-of-5): 0.511s vs 0.512s wall —
    q15's wall is floor/stage-count dominated (3-month lineitem slice is
    only ~200k rows at SF1; the decimal accumulator is not the
    bottleneck). NOT landed; kept registered so future rounds don't
    re-derive it."""
    from pyspark.sql import Window

    lineitem, supplier = tpch._t(spark, sf_dir, "lineitem", "supplier")
    revenue0 = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.round(tpch._rev() * 10000).cast("long")).alias("rev_e4"))
    )
    return (
        revenue0.withColumn(
            "max_rev", F.max("rev_e4").over(Window.partitionBy())
        )
        .filter(F.col("rev_e4") == F.col("max_rev"))
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.round(F.col("rev_e4") / 100.0) / 100.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def _q3_shj_orders(spark, sf_dir):
    """q12 template: SHUFFLE_HASH build from the semi-filtered orders side
    of the o⋈l join — skips both SMJ sort passes at SF1 where neither side
    fits the auto-broadcast threshold."""
    customer, orders, lineitem = tpch._t(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        orders.filter(F.col("o_orderdate") < cutoff)
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .hint("SHUFFLE_HASH")
        .join(
            lineitem.filter(F.col("l_shipdate") > cutoff),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(tpch._esum(tpch._rev(), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def _q3_shj_lineitem(spark, sf_dir):
    """SHUFFLE_HASH build from the shipdate-filtered LINEITEM side (~3% of
    lineitem survives l_shipdate > cutoff — smaller than the ~19% of orders
    surviving the date∧segment filters)."""
    customer, orders, lineitem = tpch._t(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        orders.filter(F.col("o_orderdate") < cutoff)
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .join(
            lineitem.filter(F.col("l_shipdate") > cutoff).hint("SHUFFLE_HASH"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(tpch._esum(tpch._rev(), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def _q15_scalar(spark, sf_dir):
    """Global max as a SCALAR: materialize revenue0 once (localCheckpoint —
    one job over the 3-month slice), read max() on the driver, filter by
    literal. Drops the single-partition window exchange; the reference's
    scalar-subquery plan does the same two-phase evaluation."""
    lineitem, supplier = tpch._t(spark, sf_dir, "lineitem", "supplier")
    revenue0 = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(tpch._rev().cast(tpch._DEC)).alias("total_revenue_raw"))
        .localCheckpoint(eager=True)
    )
    mx = revenue0.agg(F.max("total_revenue_raw")).first()[0]
    return (
        revenue0.filter(F.col("total_revenue_raw") == F.lit(mx))
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue_raw", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def _q15_bcast_max(spark, sf_dir):
    """Aggregate-then-broadcast-semi (VERDICT suggestion): 1-row max joined
    back cross-style; revenue0 recomputed by Catalyst on both branches —
    measures whether recompute beats the 1-partition window exchange."""
    lineitem, supplier = tpch._t(spark, sf_dir, "lineitem", "supplier")

    def rev0():
        return (
            lineitem.filter(
                (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
            )
            .groupBy(F.col("l_suppkey").alias("supplier_no"))
            .agg(F.sum(tpch._rev().cast(tpch._DEC)).alias("total_revenue_raw"))
        )

    mx = rev0().agg(F.max("total_revenue_raw").alias("max_revenue"))
    return (
        rev0()
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue_raw") == F.col("max_revenue"))
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue_raw", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def _q22_preagg(spark, sf_dir):
    """Shrink the anti-join build side to DISTINCT urgent-order custkeys
    (VERDICT suggestion): one int column, ≤|customers| rows at any SF, so
    the anti-join probe is as small as it can be."""
    customer, orders = tpch._t(spark, sf_dir, "customer", "orders")
    cntry = (F.col("c_custkey") % 10).cast("int")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(tpch._DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_acctbal")
    )
    urgent_keys = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return tpch._sorted_small(
        customer.filter(cntry.isin(1, 3, 5, 7, 9))
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_acctbal"))
        .join(urgent_keys, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(cntry.alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            tpch._esum("c_acctbal", "totacctbal"),
        ),
        "cntrycode",
    )


def _q22_anti_shj(spark, sf_dir):
    """Keep the raw urgent-orders anti-join but force SHUFFLE_HASH on it."""
    customer, orders = tpch._t(spark, sf_dir, "customer", "orders")
    cntry = (F.col("c_custkey") % 10).cast("int")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(tpch._DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_acctbal")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return tpch._sorted_small(
        customer.filter(cntry.isin(1, 3, 5, 7, 9))
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_acctbal"))
        .join(
            urgent.hint("SHUFFLE_HASH"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy(cntry.alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            tpch._esum("c_acctbal", "totacctbal"),
        ),
        "cntrycode",
    )


def _q15_coalesce(spark, sf_dir):
    """coalesce(1) the (≤|suppliers|-row) agg output before the global-max
    window: the empty-partition window then sees a 1-partition child and
    plans NO extra exchange — one shuffle total instead of two."""
    lineitem, supplier = tpch._t(spark, sf_dir, "lineitem", "supplier")
    from pyspark.sql import Window

    revenue0 = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(tpch._rev().cast(tpch._DEC)).alias("total_revenue_raw"))
        .coalesce(1)
    )
    return (
        revenue0.withColumn(
            "max_revenue", F.max("total_revenue_raw").over(Window.partitionBy())
        )
        .filter(F.col("total_revenue_raw") == F.col("max_revenue"))
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue_raw", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def _q15_long_coalesce(spark, sf_dir):
    """long_acc + coalesce1 combined: e4-scaled long accumulator (exact on
    the money grid) AND the exchange-free global-max window."""
    from pyspark.sql import Window

    lineitem, supplier = tpch._t(spark, sf_dir, "lineitem", "supplier")
    revenue0 = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.round(tpch._rev() * 10000).cast("long")).alias("rev_e4"))
        .coalesce(1)
    )
    return (
        revenue0.withColumn("max_rev", F.max("rev_e4").over(Window.partitionBy()))
        .filter(F.col("rev_e4") == F.col("max_rev"))
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.round(F.col("rev_e4") / 100.0) / 100.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_VARIANTS = {
    "q2": [("shj", _q2_shj)],
    "q15": [
        ("long_acc", _q15_long),
        ("scalar", _q15_scalar),
        ("bcast_max", _q15_bcast_max),
        ("coalesce1", _q15_coalesce),
        ("long_coal", _q15_long_coalesce),
    ],
    "q22": [("preagg", _q22_preagg), ("anti_shj", _q22_anti_shj)],
    "q3": [
        ("bcast_co", _q3_bcast),
        ("bcast_cust", _q3_bcast_cust),
        ("semi_nohint", _q3_semi_nohint),
        ("shj_orders", _q3_shj_orders),
        ("shj_lineitem", _q3_shj_lineitem),
    ],
    "q4": [("bcast_o", _q4_bcast), ("semi_shj", _q4_semi_shj),
           ("preagg_max", _q4_preagg_max), ("semi_preagg", _q4_semi_preagg)],
    "q10": [("bcast_co", _q10_bcast), ("partial_agg", _q10_partial_agg)],
    "q12": [
        ("bcast_o", _q12_bcast),
        ("prune", _q12_prune),
        ("bool", _q12_bool),
        ("shuffle_hash", _q12_shuffle_hash),
    ],
    "q13": [("preagg", _q13_preagg)],
    "q16": [("predistinct", _q16_predistinct)],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument(
        "--sf1",
        action="store_true",
        help="A/B on the .bench_layout/sf1 layout under ENGINE-default "
        "runtime (AQE on, 32 partitions) — the bench_sf1.py protocol",
    )
    ap.add_argument(
        "--sf10",
        action="store_true",
        help="A/B on the .bench_layout/sf10_layout (bench_sf1.py --sf 10 "
        "protocol) — where expand-dominated verdicts can flip vs SF1",
    )
    args = ap.parse_args()

    spark = bench._build_session()
    if args.sf10:
        lay = os.path.join(_REPO, ".bench_layout", "sf10_layout")
        args.sf1 = True  # same engine-default protocol as --sf1
    elif args.sf1:
        lay = os.path.join(_REPO, ".bench_layout", "sf1_layout")
    else:
        lay = bench._layout_dir("/root/testdata/sf0.1")
    warm = bench._layout_dir(bench._WARM_SRC)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # warmup: every contender's plan compiles + caches tables
    for q in args.queries:
        tpch.QUERIES[f"tpch_{q}"](spark, warm).collect()
        for _, fn in _VARIANTS.get(q, []):
            fn(spark, warm).collect()
    tables = (
        ["lineitem", "orders", "customer", "supplier", "part", "nation", "region"]
        if args.sf1
        else list(bench.ALL_TABLES)
    )
    for name in tables:
        spark.read.parquet(f"{lay}/{name}.parquet").count()
    if args.sf1:  # bench_sf1.py protocol: engine-default runtime
        from arrow_datafusion_spark.session import prepare

        prepare(spark)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    else:
        bench._apply_tuning(spark)

    for q in args.queries:
        cur = tpch.QUERIES[f"tpch_{q}"]
        contenders = [("current", cur)] + _VARIANTS.get(q, [])
        baseline_rows = rows(cur(spark, lay))
        print(f"== {q} ==")
        for name, fn in contenders:
            if name != "current":
                got = rows(fn(spark, lay))
                if got != baseline_rows:
                    print(f"  {name:12s} RESULT MISMATCH — disqualified")
                    continue
            if args.explain:
                fn(spark, lay).explain("formatted")
            spark._jvm.System.gc()
            floor = bench._min_of(lambda: fn(spark, warm).collect(), args.n)
            t = bench._min_of(lambda: fn(spark, lay).collect(), args.n)
            print(
                f"  {name:12s} sf0.1={t:.4f}s floor={floor:.4f}s "
                f"compute={max(0.0, t - floor):.4f}s"
            )
    spark.stop()


if __name__ == "__main__":
    main()
