"""Capture .explain("formatted") for declared queries into plans/r13/.

Usage: python tools/capture_plans.py <suffix> [name ...]
Writes plans/r13/<name>_<suffix>.txt for each entry (default: the bench's
TPC-H + pipeline names). Planning only — no query execution beyond what
an entry's builder itself runs (e.g. IVF centroid collect).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_OUT = os.path.join(_REPO, "plans", "r14")

DEFAULT = [f"tpch_q{i}" for i in range(1, 23)] + [
    "dedup_exact", "dedup_ngram", "dedup_embedding", "dedup_simhash",
    "dedup_minhash", "ann_cosine", "ann_lsh", "ann_ivf",
    "text_stats", "text_lang_fingerprint", "text_tfidf", "pipeline_pack",
    "pipeline_decontaminate", "events_asof", "dedup_components",
    "cb_v_count", "cb_v_phrase_topk",
]


def main() -> None:
    from arrow_datafusion_spark.session import build_spark

    import __spark_entry__ as entrymod

    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.path.join(_REPO, ".bench_layout", "sf0.1")
    if not os.path.isdir(sf_dir):
        sf_dir = "/root/testdata/sf0.1"
    spark = build_spark(app="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = entrymod.queries()
    os.makedirs(_OUT, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {exc}"
        with open(os.path.join(_OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "->", f"{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
