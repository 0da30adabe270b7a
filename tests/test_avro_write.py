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
