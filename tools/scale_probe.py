"""Pipeline-operator scale probe: sf0.1 vs a 10× corpus (VERDICT r7 #6).

The 100 TB story for the LLM-pipeline operators is design-argued in their
docstrings but was only sf0.1-measured. This probe generates a 10×
documents/embeddings corpus ONCE (deterministic transform of the sf0.1
fixtures — same duplicate-rate statistics per shard, no artificial
cross-shard near-duplicates), runs dedup_minhash / dedup_components /
ann_ivf at both scales, and records wall seconds + total shuffle
read/write bytes per run (Spark REST status API). The scaling exponent
log10(r10/r1) is the evidence: ~1.0 = linear in input, >1.3 = a
super-linear stage that needs triage.

Corpus construction (10 copies of sf0.1, copy c of 0..9):
- documents: doc_id' = doc_id + c·100000; for c>0 the text goes through a
  per-copy letter-substitution (translate with a c-rotated alphabet).
  Token lengths, word structure, and WITHIN-copy duplicate clusters are
  exactly those of the original corpus; across copies the shingle spaces
  are disjoint, so the near-dup workload scales 10× without the
  everything-matches blowup a verbatim concat would create.
- embeddings: vec_id' likewise; the vector is rotated by c positions
  (distance-preserving within a copy; cross-copy vectors decorrelate).

Usage: python tools/scale_probe.py [--regen] [--factor N] [--ops a,b]
Writes .bench_layout/docs_{N}x/ and prints one JSON line; paste the table
into BENCH_SCALE.md. Factors over 100 route through _gen_large (parity
affine cipher + mapInPandas — see its docstring); the 1000× corpus is
5M docs / 2M vectors and wants SPARK_GRAFT_DRIVER_MEM=64g (the default
16g heap OOMs with 32 concurrent local task slots on the big shuffle —
the local-mode analog of ordinary per-executor sizing, ~2 GB per slot).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_SRC = "/root/testdata/sf0.1"
_DST = os.path.join(_REPO, ".bench_layout", "docs_10x")
_OPS = (
    "dedup_minhash", "dedup_components", "ann_ivf",
    "dedup_ngram", "ann_lsh", "pipeline_decontaminate",
)


def _build_session():
    # the probe needs the REST status API for shuffle bytes — override the
    # engine default (ui disabled) via the documented extra-confs hook
    os.environ["SPARK_GRAFT_EXTRA_CONFS"] = (
        "spark.ui.enabled=true;spark.ui.port=4049"
    )
    from arrow_datafusion_spark.session import build_spark

    spark = build_spark(app="adf-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _perm(c: int) -> str:
    """Copy-c substitution alphabet. Copies 0-25 are rotations (identical
    to the original 10× probe); past 26 copies the family switches to
    AFFINE maps i -> (a*i + b) mod 26 with a coprime to 26 — two distinct
    affine maps agree on at most ONE letter, so any two copies' shingle
    spaces stay essentially disjoint (a plain rotation family would
    repeat at copy 26 and create verbatim cross-copy duplicate clusters,
    breaking the per-copy duplicate-statistics invariant)."""
    alpha = "abcdefghijklmnopqrstuvwxyz"
    coprime = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
    a, b = coprime[c // 26], c % 26
    return "".join(alpha[(a * i + b) % 26] for i in range(26))


def _gen_large(spark, factor: int, dst: str) -> None:
    """factor > 100 corpus path (the 1000× decade). Two departures from
    the when-chain generator below, both forced by scale:

    - **cipher family**: the single-affine family tops out at 312
      distinct maps (12 units × 26 shifts), so past copy 311 the cipher
      becomes POSITION-PARITY affine — even byte positions use map ``e``,
      odd positions map ``o``, with ``m = c - 312; e = m % 311;
      o = (e + 1 + m // 311) % 312``. The (e, o) pairs are pairwise
      distinct, never e == o (so no parity copy reproduces a single-map
      copy — a naive ``o = f(c // 312)`` choice collides at copies
      622/933), and injective up to factor ~96k. Any two distinct copies
      differ in at least one parity's affine map, and two distinct
      affine maps agree on ≤1 letter — multi-letter shingles stay
      essentially disjoint across all copies. Applied as a 256-entry
      numpy byte LUT: only a-z bytes are remapped, so UTF-8 multibyte
      sequences pass through untouched.
    - **plan shape**: a factor-deep CASE chain (the ≤100 path) would
      produce a 1000-branch expression tree; this path explodes the copy
      index and applies the cipher in ONE Arrow-batched mapInPandas pass.

    Embeddings: rotation by ``c % dim`` composed with a diagonal ±1 sign
    pattern from the BITS of ``c // dim`` (flip coord i iff bit i%20 of
    the block index is set) — orthogonal, so within-copy distances are
    exact, and distinct copies get distinct transforms for any factor
    up to 2^20 · dim."""
    import numpy as np

    from pyspark.sql import functions as F

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)

    def _affine_lut(idx: int) -> "np.ndarray":
        coprime = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
        a, b = coprime[idx // 26], idx % 26
        lut = np.arange(256, dtype=np.uint8)
        for i in range(26):
            lut[ord("a") + i] = ord("a") + (a * i + b) % 26
        return lut

    luts = {i: _affine_lut(i) for i in range(312)}

    def cipher_docs(batches):
        import pandas as pd

        for pdf in batches:
            out_text = []
            for t, c in zip(pdf["text"], pdf["copy"]):
                c = int(c)
                if c == 0:
                    out_text.append(t)
                    continue
                raw = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).copy()
                if c < 312:
                    raw = luts[c][raw]
                else:
                    m = c - 312
                    e, o = m % 311, (m % 311 + 1 + m // 311) % 312
                    raw[0::2] = luts[e][raw[0::2]]
                    raw[1::2] = luts[o][raw[1::2]]
                out_text.append(raw.tobytes().decode("utf-8", "replace"))
            res = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"] + pdf["copy"] * 100000,
                    "text": out_text,
                    "lang": pdf["lang"],
                    "source": pdf["source"],
                }
            )
            res["n_chars"] = res["text"].str.len().astype("int64")
            yield res

    docs = spark.read.parquet(f"{_SRC}/documents.parquet")
    copies = F.explode(F.array(*[F.lit(c) for c in range(factor)])).alias("copy")
    (
        docs.select("doc_id", "text", "lang", "source", copies)
        .repartition(max(32, factor // 8))
        .mapInPandas(
            cipher_docs,
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        .write.mode("overwrite")
        .parquet(f"{dst}/documents.parquet")
    )

    def rotate_embs(batches):
        import pandas as pd

        for pdf in batches:
            vecs = []
            for v, c in zip(pdf["embedding"], pdf["copy"]):
                c = int(c)
                a = np.asarray(v, dtype=np.float32)
                dim = len(a)
                r, p = c % dim, c // dim
                if r:
                    a = np.roll(a, -r)
                if p:
                    signs = np.array(
                        [(-1.0 if (p >> (i % 20)) & 1 else 1.0) for i in range(dim)],
                        dtype=np.float32,
                    )
                    a = a * signs
                vecs.append(a.tolist())
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"] + pdf["copy"] * 100000,
                    "embedding": vecs,
                    "label": pdf["label"],
                }
            )

    emb = spark.read.parquet(f"{_SRC}/embeddings.parquet")
    (
        emb.select("vec_id", "embedding", "label", copies)
        .repartition(max(16, factor // 16))
        .mapInPandas(rotate_embs, "vec_id bigint, embedding array<float>, label int")
        .write.mode("overwrite")
        .parquet(f"{dst}/embeddings.parquet")
    )


def _gen(spark, factor: int, dst: str) -> None:
    from pyspark.sql import functions as F

    if factor > 100:
        return _gen_large(spark, factor, dst)

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    docs = spark.read.parquet(f"{_SRC}/documents.parquet")
    copies = F.explode(
        F.array(*[F.lit(c) for c in range(factor)])
    ).alias("copy")
    d = docs.select("*", copies)
    # per-copy substitution cipher — identity for copy 0
    text = F.col("text")
    for c in range(1, factor):
        text = F.when(
            F.col("copy") == c, F.translate(F.col("text"), alpha, _perm(c))
        ).otherwise(text)
    d.select(
        (F.col("doc_id") + F.col("copy") * F.lit(100000)).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        F.length("text").alias("n_chars"),
    ).repartition(max(16, factor)).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )

    emb = spark.read.parquet(f"{_SRC}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    e = emb.select("*", copies)
    n = "size(embedding)"
    vec = F.col("embedding")
    for c in range(1, factor):
        r = c % dim
        expr = (
            f"concat(slice(embedding, {r + 1}, {n} - {r}), "
            f"slice(embedding, 1, {r}))"
            if r
            else "embedding"
        )
        if (c // dim) % 2:
            # rotations repeat past the dimension — compose with an
            # odd-coordinate sign flip (orthogonal, distance-preserving
            # within the copy; near-orthogonal across the flip boundary)
            expr = (
                f"transform({expr}, (__x, __i) -> "
                "CASE WHEN __i % 2 = 1 THEN -__x ELSE __x END)"
            )
        vec = F.when(F.col("copy") == c, F.expr(expr)).otherwise(vec)
    e.select(
        (F.col("vec_id") + F.col("copy") * F.lit(100000)).alias("vec_id"),
        vec.alias("embedding"),
        "label",
    ).repartition(max(8, factor // 2)).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet"
    )


def _shuffle_totals(port: int) -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all completed
    stages of the app so far — callers diff before/after a run."""
    try:
        base = f"http://localhost:{port}/api/v1/applications"
        apps = json.load(urllib.request.urlopen(base, timeout=5))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=5)
        )
        return (
            sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
        )
    except Exception:
        return (0, 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument(
        "--factor",
        type=int,
        default=10,
        help="corpus scale multiple (10 = the r8 probe; 100 adds a decade)",
    )
    ap.add_argument(
        "--ops", default=None, help="comma list; default = the r8 six"
    )
    args = ap.parse_args()
    dst = os.path.join(_REPO, ".bench_layout", f"docs_{args.factor}x")
    ops = args.ops.split(",") if args.ops else list(_OPS)

    spark = _build_session()
    if args.regen or not os.path.isdir(f"{dst}/documents.parquet"):
        t0 = time.perf_counter()
        _gen(spark, args.factor, dst)
        print(f"# corpus generated in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    import __spark_entry__ as entry

    queries = entry.queries()
    out: dict[str, dict] = {}
    for op in ops:
        fn = queries[op]
        rec: dict[str, dict] = {}
        for label, sf_dir in (("sf0.1", _SRC), (f"{args.factor}x", dst)):
            fn(spark, sf_dir).count()  # warm: plan compile + UDF deploy
            best, sh = None, (0, 0)
            for _ in range(args.n):
                r0, w0 = _shuffle_totals(4049)
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir).count()
                wall = time.perf_counter() - t0
                r1, w1 = _shuffle_totals(4049)
                if best is None or wall < best:
                    best, sh = wall, (r1 - r0, w1 - w0)
            rec[label] = {
                "wall_s": round(best, 3),
                "rows": rows,
                "shuffle_read_mb": round(sh[0] / 1e6, 2),
                "shuffle_write_mb": round(sh[1] / 1e6, 2),
            }
            if op == "dedup_components":
                from arrow_datafusion_spark.queries import pipeline

                rec[label]["cc_rounds"] = pipeline.LAST_CC_ROUNDS
        import math

        big = f"{args.factor}x"
        ratio = rec[big]["wall_s"] / max(rec["sf0.1"]["wall_s"], 1e-9)
        rec[f"wall_ratio_{big}"] = round(ratio, 2)
        # exponent normalized to the probe decade: log_factor(ratio)
        rec["scaling_exponent"] = round(
            math.log(max(ratio, 1e-9)) / math.log(args.factor), 2
        )
        out[op] = rec
        print(f"# {op}: {json.dumps(rec)}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "pipeline_scale_probe",
                "factor": args.factor,
                "ops": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
