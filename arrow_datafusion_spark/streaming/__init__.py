"""Structured Streaming surface (SURVEY.md §2.10).

The reference's streaming story is StreamTable + unbounded-safe operators
(stream.rs:296, streaming.rs:57) with NO watermark/event-time machinery;
Spark gives us the full event-time stack, so this module exposes it as
capability-parity-plus: file-replay sources, watermarked tumbling/session
aggregation, and an availableNow runner for deterministic tests.

The aggregation expressions are the SAME F.window/F.session_window used by
the batch entries in queries/eventsuite.py — one definition, two execution
modes, which is exactly the Spark-first way to get the reference's
"unbounded table" semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_datafusion_spark.session import prepare, table_path

__all__ = ["read_events_stream", "windowed_counts", "run_available_now"]

# events.parquet stores TIMESTAMP(NANOS); with nanosAsLong the stream schema
# sees a long column which we truncate to µs exactly like the batch path.
_EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-replay unbounded source over the events fixture (StreamTable
    role). maxFilesPerTrigger=1 gives multi-microbatch replay on multi-file
    inputs; the fixture is a single file, so tests see one deterministic
    batch."""
    prepare(spark)
    # FileStreamSource requires a directory or glob, not a bare file path —
    # a single-char glob on the suffix keeps the base path at the directory.
    path = table_path(sf_dir, "events")[:-1] + "[t]"
    raw = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — the canonical
    late-data-tolerant streaming aggregation."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
        )
    )


def run_available_now(
    df: DataFrame, name: str, timeout_s: int = 120, output_mode: str = "complete"
) -> DataFrame:
    """Drain the stream with trigger(availableNow) into an in-memory sink and
    return the result as a (batch) DataFrame.

    Default output mode is ``complete`` so windows the watermark hasn't
    closed yet are still visible at end-of-replay (append mode would hold
    them back — correct for production sinks, wrong for a drain-and-assert
    test)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return df.sparkSession.table(name)
