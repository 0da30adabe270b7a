"""Decompose the per-query fixed cost ("floor") of bench queries.

For each TPC-H query at sf0.001 (the bench's floor measurement point),
split wall-clock into:
  build   — Python-side DataFrame construction (py4j plan building)
  analyze — analysis+optimization+physical planning (executedPlan fetch)
  execute — job execution + collect on the pre-planned DataFrame

Usage: python tools/floor_probe.py [q1 q2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_datafusion_spark.session import build_spark, load_tables  # noqa: E402

WARM = "/root/testdata/sf0.001"


def main() -> None:
    from arrow_datafusion_spark.queries import tpch

    spark = build_spark(app="floor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or sorted(
        tpch.QUERIES, key=lambda n: int(n.split("q")[-1])
    )
    names = [n if n.startswith("tpch_") else f"tpch_{n}" for n in names]
    # warm codegen/caches like the bench does
    for n in names:
        tpch.QUERIES[n](spark, WARM).collect()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    print(f"{'query':10s} {'build':>8s} {'analyze':>8s} {'execute':>8s} {'total':>8s}")
    for n in names:
        fn = tpch.QUERIES[n]
        spark._jvm.System.gc()
        best = (float("inf"),) * 4
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, WARM)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.collect()
            t3 = time.perf_counter()
            tot = t3 - t0
            if tot < best[3]:
                best = (t1 - t0, t2 - t1, t3 - t2, tot)
        print(
            f"{n:10s} {best[0]:8.4f} {best[1]:8.4f} {best[2]:8.4f} {best[3]:8.4f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
