"""Structured Streaming smoke tests: file-replay of the events fixture
through a watermarked windowed aggregation must agree with the identical
batch expression (one definition, two execution modes)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arrow_datafusion_spark.queries.eventsuite import events_tumbling  # noqa: E402
from arrow_datafusion_spark.streaming import (  # noqa: E402
    read_events_stream,
    run_available_now,
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
