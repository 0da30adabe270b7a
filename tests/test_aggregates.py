"""Error-bound tests for the approximate aggregates (no exact oracle is
possible: Spark uses HyperLogLog++/KLL where the reference uses HLL/t-digest —
same contract, different sketches)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arrow_datafusion_spark.queries.aggregates import agg_approx  # noqa: E402
from arrow_datafusion_spark.session import load_tables  # noqa: E402


def test_approx_aggregates_within_bounds(spark, sf_dir):
    approx = {r["l_returnflag"]: r for r in agg_approx(spark, sf_dir).collect()}
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd"),
            F.median("l_extendedprice").alias("med"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a["nd_parts"] - e["nd"]) / e["nd"] < 0.10, (flag, a, e)
        assert abs(a["med_price"] - e["med"]) / e["med"] < 0.05, (flag, a, e)
        assert abs(a["p90_price"] - e["p90"]) / e["p90"] < 0.05, (flag, a, e)
