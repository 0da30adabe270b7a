"""ClickBench verbatim suite scale probe: the 100k fixture vs a 100×
(10M-row) hits corpus.

The 43 reference statements are correctness-gated at 100k rows
(tests/test_clickbench_verbatim.py + the cb_v_* driver entries); this
probe supplies the SCALE evidence the other suites already carry
(BENCH_SCALE.md): per-statement wall at 100k and at 10M, the scaling
exponent log(t_100x/t_1x)/log(100), and the suite totals. Statements are
grouped by shape in the report — full-scan aggregates should land near
exponent 1.0 (linear in input); top-k group-bys below it (the cut
amortizes); anything >1.3 is a super-linear stage to triage.

Corpus: 10 × 1M-row chunks built by tests/hits_fixture.build_table with
per-chunk seeds (same zipf pools/plants — per-key counts scale ~100×,
the same data shape at 100× the mass), appended into ONE parquet via
ParquetWriter so the builder never holds 10M rows of 105 columns in
memory. Written once to .bench_layout/hits_100x.parquet and cached.

Usage: python tools/cb_scale_probe.py [--regen] [--n 2]
Prints a per-statement table + one JSON line; paste into BENCH_SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_QUERIES_SQL = "/root/reference/benchmarks/queries/clickbench/queries.sql"
_BIG = os.path.join(_REPO, ".bench_layout", "hits_100x.parquet")
_CHUNKS = 10
_CHUNK_ROWS = 1_000_000


def _gen_big(regen: bool) -> str:
    if os.path.exists(_BIG) and not regen:
        return _BIG
    import pyarrow.parquet as pq

    from tests import hits_fixture

    os.makedirs(os.path.dirname(_BIG), exist_ok=True)
    writer = None
    try:
        for c in range(_CHUNKS):
            t = hits_fixture.build_table(
                _CHUNK_ROWS, hits_fixture._SEED + 1000 * (c + 1)
            )
            if writer is None:
                writer = pq.ParquetWriter(_BIG, t.schema)
            writer.write_table(t, row_group_size=262_144)
            print(f"chunk {c + 1}/{_CHUNKS} written", flush=True)
    finally:
        if writer is not None:
            writer.close()
    return _BIG


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()

    big = _gen_big(args.regen)

    from arrow_datafusion_spark.context import SessionContext
    from arrow_datafusion_spark.session import build_spark
    from tests import hits_fixture

    spark = build_spark()
    from arrow_datafusion_spark.queries.clickbench_verbatim import _statements

    stmts = _statements()  # queries.sql + extended.sql — all 46

    def run_suite(path: str) -> dict[int, float]:
        ctx = SessionContext(spark)
        ctx.register_parquet("hits", path)
        spark.read.parquet(path).count()  # footer/catalog warm
        walls: dict[int, float] = {}
        for i, s in enumerate(stmts):
            best = math.inf
            for _ in range(args.n):
                t0 = time.perf_counter()
                ctx.sql(s).collect()
                best = min(best, time.perf_counter() - t0)
            walls[i] = best
        return walls

    small = run_suite(hits_fixture.generate())
    bigw = run_suite(big)

    print(f"{'q':>3s} {'t_1x_s':>8s} {'t_100x_s':>9s} {'ratio':>7s} {'exp':>5s}")
    rows = []
    for i in sorted(small):
        r = bigw[i] / small[i]
        e = math.log(r) / math.log(100)
        rows.append((i, small[i], bigw[i], r, e))
        print(f"{i:3d} {small[i]:8.3f} {bigw[i]:9.3f} {r:7.2f} {e:5.2f}")
    t1, t100 = sum(small.values()), sum(bigw.values())
    out = {
        "metric": "cb_verbatim_scale_100x",
        "total_1x_s": round(t1, 3),
        "total_100x_s": round(t100, 3),
        "suite_exponent": round(math.log(t100 / t1) / math.log(100), 3),
        "worst": sorted(
            ((f"q{i}", round(e, 2)) for i, _, _, _, e in rows),
            key=lambda kv: -kv[1],
        )[:5],
        "rows_100x": _CHUNKS * _CHUNK_ROWS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
