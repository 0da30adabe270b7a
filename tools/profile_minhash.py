"""Kernel-vs-exchange split for dedup_minhash at the 10x corpus
(VERDICT r9 #7): per-stage executor CPU vs shuffle time from the REST
status API, attributed to the signature stage (the pandas-UDF scan) vs
the bucket exchange. Decides whether the 0.78 wall exponent is CPU in
the Arrow kernel (md5) or exchange growth."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tools.scale_probe import _build_session, _gen, _DST  # noqa: E402


def main() -> None:
    spark = _build_session()
    if not os.path.isdir(_DST):
        _gen(spark, 10, _DST)
    from arrow_datafusion_spark.operators.dedup import minhash_near_duplicates

    docs = spark.read.parquet(os.path.join(_DST, "documents.parquet"))
    t0 = time.time()
    n = minhash_near_duplicates(docs, "doc_id", "text").count()
    wall = time.time() - t0
    app = spark.sparkContext.applicationId
    url = f"http://localhost:4049/api/v1/applications/{app}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    rows = []
    for s in stages:
        rows.append({
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:60],
            "run_s": round(s.get("executorRunTime", 0) / 1e3, 2),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
            "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "sh_fetch_wait_s": round(s.get("shuffleFetchWaitTime", 0) / 1e3, 2),
            "sh_write_time_s": round(s.get("shuffleWriteTime", 0) / 1e9, 2),
        })
    rows.sort(key=lambda r: -r["run_s"])
    print(f"pairs={n} wall={wall:.1f}s")
    total_run = sum(r["run_s"] for r in rows)
    total_cpu = sum(r["cpu_s"] for r in rows)
    total_shuf = sum(r["sh_fetch_wait_s"] + r["sh_write_time_s"] for r in rows)
    print(f"executor run {total_run:.1f}s | cpu {total_cpu:.1f}s | "
          f"shuffle io {total_shuf:.1f}s")
    for r in rows[:8]:
        print(r)
    spark.stop()


if __name__ == "__main__":
    main()
