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


def test_checkpoint_restart_exactly_once_with_state_recovery(spark, tmp_path):
    """Kill-and-restart from checkpoint (VERDICT r9 #8): a watermarked
    windowed aggregation writes through a file sink with a checkpoint;
    the query is STOPPED cleanly after draining phase-1 files, new files
    arrive, and a NEW query object restarts from the same checkpoint.

    Two properties across the restart boundary:
    - exactly-once: total emitted counts equal the batch answer over the
      union of all input files (no re-emits of phase-1 work, no loss);
    - state recovery: the window that straddles both phases (10:00) must
      count rows from BOTH — if the restarted query lost its state store,
      that window would report only its phase-2 rows.

    The 13:00 spike in phase 2 advances the watermark (2h) past every
    earlier window so append mode finalizes them all."""
    import pyspark.sql.types as T

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )

    def write_file(name: str, rows: list[tuple[str, str]]) -> None:
        import datetime as dt

        df = spark.createDataFrame(
            [(dt.datetime.fromisoformat(t), e) for t, e in rows], schema
        ).coalesce(1)
        df.write.mode("overwrite").parquet(f"{src}/{name}")

    # phase 1: hours 08/09 complete, hour 10 PARTIAL (2 of 5 rows)
    write_file("f1", [("2024-01-01 08:05:00", "click")] * 3)
    write_file("f2", [("2024-01-01 09:10:00", "view")] * 4
               + [("2024-01-01 10:01:00", "click")] * 2)
    all_rows = 3 + 4 + 2

    def start_query():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        agg = windowed_counts(stream, "1 hour", "2 hours")
        return (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(spark.sparkContext.defaultParallelism))
    try:
        q1 = start_query()
        q1.awaitTermination(120)  # drains phase 1, stops (availableNow)
        assert not q1.isActive
        # phase 2: the REST of hour 10 + a 13:00 spike that pushes the
        # watermark past 11:00, closing every earlier window
        write_file("f3", [("2024-01-01 10:20:00", "click")] * 3
                   + [("2024-01-01 13:00:00", "view")] * 1)
        all_rows += 4
        q2 = start_query()  # NEW query object, same checkpoint
        q2.awaitTermination(120)
        assert not q2.isActive
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    out = spark.read.parquet(sink)
    emitted = {
        (r.w_start.isoformat(), r.event_type): r.n for r in out.collect()
    }
    # exactly-once: each closed window appears ONCE with the full count
    assert emitted[("2024-01-01T08:00:00", "click")] == 3
    assert emitted[("2024-01-01T09:00:00", "view")] == 4
    # state recovery: the straddling 10:00 window counts BOTH phases
    assert emitted[("2024-01-01T10:00:00", "click")] == 5
    # no duplicate emissions of any (window, type) pair
    assert out.count() == len(emitted)
    # nothing lost: emitted counts (closed windows) + the still-open
    # 13:00 row account for every input row
    assert sum(emitted.values()) == all_rows - 1


def test_stream_stream_join_checkpoint_restart(spark, tmp_path):
    """Kill-and-restart for the watermarked STREAM-STREAM JOIN (VERDICT
    r10 #8 — test_checkpoint_restart proved the discipline for windowed
    aggregation; a real feed needs it for join state too).

    A click joins the same user's views in the preceding hour
    (stream_stream_join — the SymmetricHashJoinExec analog). Phase 1
    delivers two views and one click, then the query STOPS cleanly
    (availableNow drain). Phase 2 restarts a NEW query object from the
    same checkpoint and delivers one more click whose only matching
    views arrived in PHASE 1.

    Two properties across the restart boundary:
    - state recovery: the phase-2 click must join the phase-1 views —
      if the restarted query lost its join state store, (c2,v1)/(c2,v2)
      would be missing;
    - exactly-once: the phase-1 pair (c1,v1) appears exactly once (no
      re-emit on restart), and no pair is duplicated."""
    import datetime as dt

    import pyspark.sql.types as T

    from arrow_datafusion_spark.streaming import stream_stream_join

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
        ]
    )

    def write_file(name: str, rows: list[tuple[str, str, int, int]]) -> None:
        df = spark.createDataFrame(
            [(dt.datetime.fromisoformat(t), e, u, i) for t, e, u, i in rows],
            schema,
        ).coalesce(1)
        df.write.mode("overwrite").parquet(f"{src}/{name}")

    # phase 1: two views, then a click that matches only v1 (10:00 is
    # within [09:30, 10:30]; v2 at 10:40 is in the click's future)
    write_file("f1", [
        ("2024-01-01 10:00:00", "view", 7, 101),   # v1
        ("2024-01-01 10:40:00", "view", 7, 102),   # v2
    ])
    write_file("f2", [("2024-01-01 10:30:00", "click", 7, 201)])  # c1

    def start_query():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        joined = stream_stream_join(stream)
        return (
            joined.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(spark.sparkContext.defaultParallelism))
    try:
        q1 = start_query()
        q1.awaitTermination(120)
        assert not q1.isActive
        phase1 = {
            (r.click_id, r.view_id) for r in spark.read.parquet(sink).collect()
        }
        assert phase1 == {(201, 101)}  # c1 joins v1 only
        # phase 2: a new click whose matching views are BOTH in phase-1
        # join state (11:00 - 1h = 10:00 ≤ v1, v2 ≤ 11:00)
        write_file("f3", [("2024-01-01 11:00:00", "click", 7, 202)])  # c2
        q2 = start_query()  # NEW query object, same checkpoint
        q2.awaitTermination(120)
        assert not q2.isActive
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    out = spark.read.parquet(sink)
    pairs = [(r.click_id, r.view_id) for r in out.collect()]
    # exactly-once: no duplicates (in particular (201,101) not re-emitted)
    assert len(pairs) == len(set(pairs))
    # state recovery: the phase-2 click found BOTH phase-1 views
    assert set(pairs) == {(201, 101), (202, 101), (202, 102)}


def test_stream_stream_left_outer_join_watermark_eviction(spark, tmp_path):
    """OUTER stream-stream join (§2.3 SymmetricHashJoin parity — the
    reference's symmetric_hash_join.rs supports Left/Right/Full): a click
    with no view in its preceding hour must be emitted NULL-extended,
    but only after the watermark proves no matching view can still
    arrive. A 23:00 spike advances the watermark past every earlier
    click's join bound so the unmatched row flushes by end of drain."""
    import datetime as dt

    import pyspark.sql.types as T

    from arrow_datafusion_spark.streaming import stream_stream_join

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    # three files → three micro-batches (maxFilesPerTrigger=1): the
    # GLOBAL watermark is the MIN across both branch watermarks (clicks
    # and views each carry one), advances at BATCH BOUNDARIES, and
    # unmatched-side rows are emitted by the batch AFTER the one whose
    # events moved it past their join bound — hence spikes on BOTH event
    # types and a trailing flush batch (the user-9 spike click never
    # matches and never becomes evictable, so it stays in state unemitted)
    batches = [
        [
            ("2024-01-01 10:00:00", "view", 7, 101),   # v1: matched by c1
            ("2024-01-01 10:30:00", "click", 7, 201),  # c1 -> (201, 101)
            ("2024-01-01 12:00:00", "click", 7, 202),  # c2: NO view in window
        ],
        [("2024-01-01 23:00:00", "view", 8, 998),      # both wms -> 21:00
         ("2024-01-01 23:00:00", "click", 9, 901)],
        [("2024-01-01 23:30:00", "view", 8, 999),      # flush batch
         ("2024-01-01 23:30:00", "click", 9, 902)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            [(dt.datetime.fromisoformat(t), e, u, i_) for t, e, u, i_ in rows],
            schema,
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(spark.sparkContext.defaultParallelism))
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        out = (
            stream_stream_join(stream, how="left_outer")
            .writeStream.format("memory")
            .queryName("ssj_outer")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        out.awaitTermination(120)
        got = {
            (r.click_id, r.view_id)
            for r in spark.sql("SELECT * FROM ssj_outer").collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    # c1 matched; c2 NULL-extended after its bound passed the watermark;
    # the user-8 views are unmatched LEFT-side-less (views are the RIGHT
    # side, so they never appear in a left_outer result)
    assert got == {(201, 101), (202, None)}
