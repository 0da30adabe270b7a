"""Avro WRITE sink — beyond the reference (file_format/avro.rs is
reader-only). Every written file must read back through this engine's own
block-parallel Avro reader (register_avro) with identical rows and Spark
DDL types, COPY-TO-directory must APPEND like the other formats, and
temporal columns must be rejected with a cast hint rather than silently
round-tripping as bare longs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ctx(spark):
    from arrow_datafusion_spark.context import SessionContext

    return SessionContext(spark.newSession())


def test_facade_write_avro_roundtrip_nested(spark, tmp_path):
    from arrow_datafusion_spark.dataframe import DataFrame as Facade

    ctx = _ctx(spark)
    src = ctx.spark.createDataFrame(
        [
            (1, "a", 1.5, True, [1, 2], {"k": 2}, (7, "x"), None),
            (2, None, -0.25, False, [], {}, (8, "y"), b"\x00\x01"),
        ],
        "id bigint, s string, d double, b boolean, arr array<int>, "
        "m map<string,int>, st struct<a: int, b: string>, bin binary",
    )
    target = str(tmp_path / "out_avro")
    Facade(src).write_avro(target)
    ctx.register_avro("back", target)
    back = ctx.table("back")
    assert back.schema == src.schema
    key = lambda r: r[0]  # noqa: E731
    got = sorted((tuple(r) for r in back.collect()), key=key)
    want = sorted((tuple(r) for r in src.collect()), key=key)
    assert got == want


def test_copy_to_avro_directory_appends(spark, sf_dir, tmp_path):
    ctx = _ctx(spark)
    ctx.register_parquet("nation", f"{sf_dir}/nation.parquet")
    target = str(tmp_path / "nation_avro")
    n1 = ctx.sql(
        f"COPY (SELECT n_nationkey, n_name FROM nation) TO '{target}' "
        "STORED AS AVRO"
    ).collect()[0][0]
    assert n1 == 25
    ctx.sql(
        f"COPY (SELECT n_nationkey, n_name FROM nation) TO '{target}' "
        "STORED AS AVRO"
    )
    ctx.register_avro("nations_back", target)
    assert ctx.table("nations_back").count() == 50  # append, like csv/json


def test_append_offset_survives_part_number_gaps(spark, tmp_path):
    # empty partitions skip their write, leaving GAPS in part numbers; the
    # append offset must be max-index+1, not the file count, or a later
    # append lands on an existing index and 'wb' destroys rows (ADVICE r9).
    # Deterministic gap: {part-00000, part-00005} (count 2, max index 5);
    # a count-based offset would map append pids 0..3 onto 2..5, and
    # part-00005 — real data — would be silently overwritten.
    from arrow_datafusion_spark.sources.avro import (
        avro_schema_of,
        write_avro,
        write_avro_partitioned,
    )

    ctx = _ctx(spark)
    target = str(tmp_path / "gap_avro")
    df1 = ctx.spark.createDataFrame([(100,)], "a bigint").coalesce(1)
    write_avro_partitioned(df1, target, mode="overwrite")
    schema = avro_schema_of(df1.schema)
    write_avro(os.path.join(target, "part-00005.avro"), schema, [(105,)])
    # append 4 rows in 4 round-robin partitions → every pid 0..3 writes
    df2 = ctx.spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "a bigint"
    ).repartition(4)
    write_avro_partitioned(df2, target, mode="append")
    ctx.register_avro("gap_back", target)
    got = sorted(r[0] for r in ctx.table("gap_back").collect())
    assert got == [1, 2, 3, 4, 100, 105]


def test_copy_to_single_avro_file(spark, sf_dir, tmp_path):
    ctx = _ctx(spark)
    ctx.register_parquet("region", f"{sf_dir}/region.parquet")
    target = str(tmp_path / "regions.avro")
    ctx.sql(f"COPY (SELECT r_regionkey, r_name FROM region) TO '{target}'")
    assert os.path.isfile(target)  # ONE container file, not a part dir
    ctx.register_avro("regions_back", target)
    got = sorted(tuple(r) for r in ctx.table("regions_back").collect())
    assert len(got) == 5 and got[0][1] == "AFRICA"
    # empty result still writes a valid header-only container
    empty = str(tmp_path / "none.avro")
    ctx.sql(
        f"COPY (SELECT r_regionkey FROM region WHERE r_regionkey < 0) "
        f"TO '{empty}'"
    )
    ctx.register_avro("empty_back", empty)
    assert ctx.table("empty_back").count() == 0


def test_insert_into_external_avro_table(spark, tmp_path):
    ctx = _ctx(spark)
    target = str(tmp_path / "ext_avro")
    ctx.sql(
        f"CREATE EXTERNAL TABLE av (a BIGINT, b VARCHAR) STORED AS AVRO "
        f"LOCATION '{target}/'"
    )
    n = ctx.sql("INSERT INTO av VALUES (1, 'x'), (2, 'y')").collect()[0][0]
    assert n == 2
    ctx.sql("INSERT INTO av VALUES (3, NULL)")
    got = sorted(tuple(r) for r in ctx.sql("SELECT * FROM av").collect())
    assert got == [(1, "x"), (2, "y"), (3, None)]


def test_avro_writer_rejects_temporal_columns(spark, sf_dir, tmp_path):
    ctx = _ctx(spark)
    ctx.register_parquet("orders", f"{sf_dir}/orders.parquet")
    with pytest.raises(Exception, match="temporal column .* cast"):
        ctx.sql(
            f"COPY (SELECT o_orderdate FROM orders LIMIT 1) "
            f"TO '{tmp_path}/t.avro'"
        ).collect()
