"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "tpch_total", "value": <sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": 0.1}

Comparable to BASELINE.md (reference TPC-H SF1 parquet numbers / 10).
Each query is timed end-to-end (plan + execute + collect), warm session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arrow_datafusion_spark.session import build_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:  # dir name doesn't encode a scale factor
        sf = None
    spark = build_spark(app="adf-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Scale-appropriate tuning for sub-GB inputs: ~75k rows/partition at
    # sf0.1, and static planning (file-size stats are exact here, every dim
    # broadcast decision is already right, so AQE's per-stage adaptive
    # materialization is pure overhead). At cluster scale the session
    # defaults (AQE on, adaptive coalescing/skew-split) apply instead —
    # see arrow_datafusion_spark/session.py.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    from arrow_datafusion_spark.queries import tpch

    # JVM/codegen warmup on the smallest SF so per-query numbers measure the
    # engine, not first-call class loading.
    tpch.q1(spark, "/root/testdata/sf0.001").collect()

    timings: dict[str, float] = {}
    for name in sorted(tpch.QUERIES, key=lambda n: int(n.split("q")[-1])):
        fn = tpch.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name.removeprefix("tpch_")] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "tpch_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
