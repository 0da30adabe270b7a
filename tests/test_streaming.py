"""Structured Streaming smoke tests: file-replay of the events fixture
through a watermarked windowed aggregation must agree with the identical
batch expression (one definition, two execution modes)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arrow_datafusion_spark.queries.eventsuite import events_tumbling  # noqa: E402
from arrow_datafusion_spark.session import load_tables  # noqa: E402
from arrow_datafusion_spark.streaming import (  # noqa: E402
    read_events_stream,
    streaming_dedup,
    run_available_now,
    stateful_type_counts,
    stream_stream_join,
    windowed_counts,
)


def test_stream_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    result = run_available_now(
        windowed_counts(stream), "stream_counts_test"
    ).collect()
    batch = events_tumbling(spark, sf_dir).select(
        "w_start", "w_end", "event_type", "n"
    ).collect()
    assert sorted(map(tuple, result)) == sorted(map(tuple, batch))
    assert len(result) > 0


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """SymmetricHashJoin analog: click⋈view time-range join, stream vs batch."""
    stream = read_events_stream(spark, sf_dir)
    got = run_available_now(
        stream_stream_join(stream), "ss_join_test", output_mode="append"
    ).collect()
    # the same join expression runs in batch mode (watermark is a no-op there)
    batch_events = load_tables(spark, sf_dir, names=("events",))["events"]
    expected = stream_stream_join(batch_events).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
    assert len(got) > 0


def test_stateful_operator(spark, sf_dir):
    """applyInPandasWithState running counts equal the batch group counts."""
    stream = read_events_stream(spark, sf_dir)
    got = run_available_now(
        stateful_type_counts(stream), "stateful_test", output_mode="update"
    )
    # in update mode the memory sink holds the latest row per key from the
    # single micro-batch — compare against batch counts
    final = {r.event_type: r.n for r in got.collect()}
    batch = load_tables(spark, sf_dir, names=("events",))["events"]
    expected = {
        r.event_type: r.n
        for r in batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert final == expected


def test_streaming_dedup_matches_batch(spark, sf_dir):
    """dropDuplicatesWithinWatermark over a full replay must keep exactly
    one row per (user_id, event_type, value) — same multiset as the batch
    dropDuplicates on a single-file replay (every duplicate arrives inside
    one watermark window)."""
    stream = streaming_dedup(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, "dedup_sink", output_mode="append")
    batch = load_tables(spark, sf_dir, names=("events",))["events"]
    expect = batch.dropDuplicates(["user_id", "event_type", "value"])
    assert got.count() == expect.count()
    g = {tuple(r) for r in got.select("user_id", "event_type", "value").collect()}
    e = {tuple(r) for r in expect.select("user_id", "event_type", "value").collect()}
    assert g == e
