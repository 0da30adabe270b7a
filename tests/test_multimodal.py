"""Deterministic tests for the multimodal plumbing (operators/multimodal.py):
fake decode → resize pool → frame sampling, with expected values computed
independently in plain Python. The decode is a stand-in (no codec libs in
this container) but the schemas, Arrow batch shapes, and 1→N row expansion
are exactly what real media processing uses.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_datafusion_spark.operators import multimodal as M  # noqa: E402

_PAYLOADS = [
    (1, bytes(range(20))),  # w = 8+20%9 = 10, h = 2
    (2, b"spark-multimodal-frame-sample-test-payload!!"),  # 44 bytes
    (3, b"x"),  # 1 byte → w=9, h=1
]


def _df(spark):
    return spark.createDataFrame(_PAYLOADS, "doc_id long, payload binary")


def test_fake_decode_shapes(spark):
    rows = {r.doc_id: r for r in M.fake_decode_image(_df(spark)).collect()}
    for doc_id, raw in _PAYLOADS:
        w = 8 + len(raw) % 9
        h = max(1, -(-len(raw) // w))
        r = rows[doc_id]
        assert (r.width, r.height) == (w, h)
        assert len(r.pixels) == w * h
        assert abs(r.pixels[0] - raw[0] / 255.0) < 1e-6


def test_resize_pooled_exact(spark):
    decoded = M.fake_decode_image(_df(spark))
    rows = {r.doc_id: r for r in M.resize_pooled(decoded, factor=2).collect()}
    # doc 1: 10x2 image of bytes 0..19 → pooled 5x1; block (r0c0) =
    # mean(0,1,10,11)/255
    r = rows[1]
    assert (r.width, r.height) == (5, 1)
    assert abs(r.pixels[0] - (0 + 1 + 10 + 11) / 4 / 255.0) < 1e-5
    # doc 3: 9x1 (single byte at pixel 0, rest zero-pad) → 5x1; block 0 is
    # mean(x/255, 0, 0-pad row) and the tail blocks are pure padding.
    r3 = rows[3]
    assert (r3.width, r3.height) == (5, 1)
    assert abs(r3.pixels[0] - (ord("x") / 255.0) / 4) < 1e-5
    assert r3.pixels[4] == 0.0


def test_sample_frames_rows_and_digests(spark):
    out = M.sample_frames(_df(spark), frame_bytes=8, stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2: 44 bytes → 6 frames of 8 (last short), stride 2 → idx 0, 2, 4
    raw = dict(_PAYLOADS)[2]
    got = sorted(by_doc[2], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in got] == [0, 2, 4]
    for r in got:
        chunk = raw[r.frame_idx * 8 : (r.frame_idx + 1) * 8]
        assert r.frame_md5 == hashlib.md5(chunk).hexdigest()
        assert r.n_bytes == len(chunk)
    # doc 3: 1 byte → 1 frame
    assert [r.frame_idx for r in by_doc[3]] == [0]
