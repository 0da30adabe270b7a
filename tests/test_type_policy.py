"""Type-coercion policy tests (SURVEY §1.2 gaps): Time32/Time64 and
Decimal256 — reference Arrow scalar types at
/root/reference/datafusion/common/src/scalar/mod.rs:206 (Decimal256) and
:255-261 (Time32/Time64).

Policy (documented in sources/arrow_ipc.py):
- Time32/Time64, any unit → BIGINT nanoseconds since midnight (lossless).
- Decimal256 with precision ≤ 38 → Spark DECIMAL(p, s); precision > 38 →
  explicit error naming the ceiling (never silent truncation).
"""

from __future__ import annotations

import datetime
import decimal
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_ipc(path, table):
    import pyarrow.ipc as ipc

    with ipc.new_file(path, table.schema) as w:
        w.write_table(table)


def test_time_columns_coerce_to_nanos(spark, tmp_path):
    import pyarrow as pa

    from arrow_datafusion_spark.context import SessionContext

    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "t32s": pa.array(
                [datetime.time(0, 0, 1), datetime.time(1, 0, 0)], pa.time32("s")
            ),
            "t64us": pa.array(
                [datetime.time(0, 0, 0, 5), datetime.time(0, 1, 0)], pa.time64("us")
            ),
            "t64ns": pa.array([1234, 5_000_000_000], pa.time64("ns")),
        }
    )
    p = str(tmp_path / "times.arrow")
    _write_ipc(p, t)
    ctx = SessionContext(spark)
    ctx.register_arrow("times", p)
    rows = {r.id: r for r in ctx.sql("SELECT * FROM times ORDER BY id").collect()}
    assert rows[1].t32s == 1_000_000_000  # 00:00:01 → 1 s of ns
    assert rows[2].t32s == 3_600_000_000_000  # 01:00:00
    assert rows[1].t64us == 5_000  # 5 µs
    assert rows[2].t64us == 60_000_000_000  # one minute
    assert rows[1].t64ns == 1234
    assert rows[2].t64ns == 5_000_000_000
    # all three land as BIGINT
    dtypes = dict(ctx.table("times").dtypes)
    assert {dtypes["t32s"], dtypes["t64us"], dtypes["t64ns"]} == {"bigint"}


def test_unsigned_ints_widen(spark, tmp_path):
    """UInt8/16/32/64 widen to int16/int32/int64/decimal(20,0) on the scan
    path — full-range values survive (SURVEY §1.2, scalar/mod.rs:216-222)."""
    import pyarrow as pa

    from arrow_datafusion_spark.context import SessionContext

    t = pa.table(
        {
            "u8": pa.array([1, 255], pa.uint8()),
            "u16": pa.array([1, 65535], pa.uint16()),
            "u32": pa.array([1, 4294967295], pa.uint32()),
            "u64": pa.array([1, 18446744073709551615], pa.uint64()),
        }
    )
    p = str(tmp_path / "uints.arrow")
    _write_ipc(p, t)
    ctx = SessionContext(spark)
    ctx.register_arrow("uints", p)
    df = ctx.sql("SELECT * FROM uints ORDER BY u8")
    assert dict(df.dtypes) == {
        "u8": "smallint", "u16": "int", "u32": "bigint", "u64": "decimal(20,0)",
    }
    hi = df.collect()[1]
    assert hi.u8 == 255 and hi.u16 == 65535 and hi.u32 == 4294967295
    assert int(hi.u64) == 18446744073709551615


def test_decimal256_downcast_within_ceiling(spark, tmp_path):
    import pyarrow as pa

    from arrow_datafusion_spark.context import SessionContext

    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "d": pa.array(
                [decimal.Decimal("123.450"), decimal.Decimal("-7.125")],
                pa.decimal256(20, 3),
            ),
        }
    )
    p = str(tmp_path / "dec.arrow")
    _write_ipc(p, t)
    ctx = SessionContext(spark)
    ctx.register_arrow("dec20", p)
    got = {r.id: r.d for r in ctx.sql("SELECT * FROM dec20 ORDER BY id").collect()}
    assert got[1] == decimal.Decimal("123.450")
    assert got[2] == decimal.Decimal("-7.125")
    assert dict(ctx.table("dec20").dtypes)["d"] == "decimal(20,3)"


def test_decimal256_over_ceiling_rejected(spark, tmp_path):
    import pyarrow as pa

    from arrow_datafusion_spark.context import SessionContext

    t = pa.table(
        {
            "d": pa.array([decimal.Decimal("1.5")], pa.decimal256(50, 2)),
        }
    )
    p = str(tmp_path / "dec50.arrow")
    _write_ipc(p, t)
    ctx = SessionContext(spark)
    with pytest.raises(Exception, match=r"DECIMAL\(38\)|38"):
        ctx.register_arrow("dec50", p)
        ctx.sql("SELECT * FROM dec50").collect()


def test_arrow_cast_time_and_decimal256(spark, sf_dir):
    from pyspark.sql import functions as F

    from arrow_datafusion_spark.functions.scalar import SCALAR as S
    from arrow_datafusion_spark.session import load_tables

    n = load_tables(spark, sf_dir, names=("nation",))["nation"]
    row = n.filter(F.col("n_nationkey") == 3).select(
        S["arrow_cast"](F.col("n_nationkey"), "Time32(Second)").alias("t_ns"),
        S["arrow_cast"](F.col("n_nationkey"), "Decimal256(20, 2)").alias("d"),
    ).first()
    assert row.t_ns == 3_000_000_000
    assert row.d == decimal.Decimal("3.00")

    with pytest.raises(ValueError, match="DECIMAL"):
        S["arrow_cast"](F.lit(1), "Decimal256(50, 2)")


def test_timestamp_bigint_reinterpret_shapes(spark):
    """All textual spellings of a statically-typed timestamp→BIGINT cast
    lower to the reference's epoch-ns reinterpret (arrow-rs cast kernel:
    Timestamp(Nanosecond)→Int64 is a storage-value reinterpret; string
    casts default to ns — datafusion/sqllogictest joins.slt:135-150).
    Round-11 verdict probes: the LITERAL-operand shapes must not fall back
    to Spark's epoch-seconds cast (1e9× off) nor error inside arrow_cast."""
    from arrow_datafusion_spark.context import SessionContext

    ctx = SessionContext(spark)
    ns = 1577836800000000000
    cases = {
        "TIMESTAMP '2020-01-01 00:00:00'::bigint": ns,
        "CAST(TIMESTAMP '2020-01-01 00:00:00' AS BIGINT)": ns,
        "'2020-01-01 00:00:00'::timestamp::bigint": ns,
        "CAST('2020-01-01 00:00:00'::timestamp AS BIGINT)": ns,
        # a following integer-literal divisor joins the rewrite because the
        # reference's int/int division truncates (µs count here)
        "'2020-01-01 00:00:00'::timestamp::bigint / 1000": ns // 1000,
        "TIMESTAMP '2020-01-01 00:00:00'::bigint / 1000": ns // 1000,
    }
    for expr, want in cases.items():
        got = ctx.sql(f"SELECT {expr} AS v").collect()[0][0]
        assert got == want, f"{expr}: {got} != {want}"
    # INTEGRAL source (r12 spelling-consistency probe): arrow's
    # int→Timestamp(ns) cast REINTERPRETS the integer as ns, so the
    # ::timestamp::bigint round-trip is the IDENTITY for integer sources
    # — and the colon chain must agree with its pure-CAST spelling
    # (runtime typeof() branch; the pre-r12 lowering returned src×10⁹)
    spark.sql("SELECT CAST(7 AS BIGINT) AS i").createOrReplaceTempView(
        "reint_int_t"
    )
    try:
        for expr in (
            "i::timestamp::bigint",
            "CAST(CAST(i AS TIMESTAMP) AS BIGINT)",
        ):
            got = ctx.sql(f"SELECT {expr} AS v FROM reint_int_t").collect()[0][0]
            assert got == 7, f"{expr}: {got} != 7 (identity round-trip)"
    finally:
        spark.catalog.dropTempView("reint_int_t")
    # the lowered chain re-enters arrow_cast's static integral detection:
    # BIGINT ns → Timestamp(Nanosecond, None) is a reinterpret, not an
    # epoch-seconds parse (the round-11 AnalysisException probe)
    for src in (
        "'2020-01-01 00:00:00'::timestamp::bigint",
        "TIMESTAMP '2020-01-01 00:00:00'::bigint",
    ):
        got = ctx.sql(
            f"SELECT CAST(arrow_cast({src}, 'Timestamp(Nanosecond, None)')"
            " AS STRING) AS v"
        ).collect()[0][0]
        assert got == "2020-01-01 00:00:00", got


def test_named_tz_column_date_trunc_and_cast(spark):
    """Round 12: per-column named time zones (timestamps.slt #8899
    battery). arrow_cast to Timestamp(_, Some(tz)) is wall-clock-
    preserving for literal (NTZ) sources and instant-preserving for LTZ
    columns; a view-declared column zone makes date_trunc truncate
    day-and-coarser units in that zone."""
    import datetime as dt

    from arrow_datafusion_spark.context import SessionContext

    ctx = SessionContext(spark)
    # literal source: wall clock preserved into the zone → instant shifts
    row = ctx.sql(
        "SELECT CAST(arrow_cast(TIMESTAMP '2000-01-01 00:00:00', "
        "'Timestamp(Nanosecond, Some( \"+08:00\" ))') AS STRING) AS v"
    ).collect()[0][0]
    assert row == "1999-12-31 16:00:00", row  # 00:00 wall in +08 = 16:00Z
    # invalid zone raises at rewrite time like the reference's parser
    import pytest as _pytest

    with _pytest.raises(Exception, match="Invalid timezone"):
        ctx.sql(
            "SELECT arrow_cast(TIMESTAMP '2000-01-01 00:00:00', "
            "'Timestamp(Nanosecond, Some( \"+25:00\" ))')"
        )
    # zone-declared view column: month-trunc lands on the ZONE's month
    # boundary
    spark.createDataFrame(
        [(dt.datetime(2024, 10, 27, 0, 0),)], "ts timestamp"
    ).createOrReplaceTempView("tz_src_t")
    ctx.register_table("tz_src_t", spark.table("tz_src_t"))
    ctx.sql(
        "CREATE OR REPLACE VIEW tz_berlin_v AS SELECT "
        "arrow_cast(ts, 'Timestamp(Nanosecond, Some(\"Europe/Berlin\"))') "
        "AS ts FROM tz_src_t"
    )
    got = ctx.sql(
        "SELECT CAST(date_trunc('month', ts) AS STRING) AS m, "
        "CAST(date_trunc('hour', ts) AS STRING) AS h FROM tz_berlin_v"
    ).collect()[0]
    # Berlin October midnight is 2024-09-30T22:00Z; hour-trunc stays
    # instant arithmetic (unchanged)
    assert got.m == "2024-09-30 22:00:00", got
    assert got.h == "2024-10-27 00:00:00", got
    ctx.sql("DROP VIEW tz_berlin_v")
