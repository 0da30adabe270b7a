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


_VARIANTS = {
    "q3": [
        ("bcast_co", _q3_bcast),
        ("bcast_cust", _q3_bcast_cust),
        ("semi_nohint", _q3_semi_nohint),
    ],
    "q10": [("bcast_co", _q10_bcast), ("partial_agg", _q10_partial_agg)],
    "q12": [("bcast_o", _q12_bcast), ("prune", _q12_prune)],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args()

    spark = bench._build_session()
    lay = bench._layout_dir("/root/testdata/sf0.1")
    warm = bench._layout_dir(bench._WARM_SRC)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # warmup: every contender's plan compiles + caches tables
    for q in args.queries:
        tpch.QUERIES[f"tpch_{q}"](spark, warm).collect()
        for _, fn in _VARIANTS.get(q, []):
            fn(spark, warm).collect()
    for df in bench.load_tables(spark, lay).values():
        df.count()
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
