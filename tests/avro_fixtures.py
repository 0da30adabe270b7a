"""Reconstruct the reference's Avro test fixtures.

The reference reads these files from its ``testing`` submodule
(``testing/data/avro/*.avro``), which is not checked out in this
environment. Their logical contents are fully determined by the
reference's own test expectations (sqllogictest/test_files/avro.slt and
datafusion/core/src/datasource/avro_to_arrow tests), so this module
re-materializes byte-valid Avro 1.x container files with the same rows,
schemas, and block codecs — including the snappy / bzip2 / xz / zstandard
codec variants avro.slt exercises.

Generated under tests/fixtures/avro_gen/ (gitignored); regeneration is
idempotent and cheap (<100 ms).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_datafusion_spark.sources.avro import write_avro  # noqa: E402

GEN_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "avro_gen"
)

# alltypes_plain: the canonical 8-row fixture (same logical content as
# parquet-testing's alltypes_plain.parquet): id 0..7, *_col = id%2 derived,
# date_string_col/string_col are BYTES (avro.slt casts string_col to
# varchar and expects '0'/'1').
_ALLTYPES_SCHEMA = {
    "type": "record",
    "name": "alltypes_plain",
    "fields": [
        {"name": "id", "type": ["null", "int"]},
        {"name": "bool_col", "type": ["null", "boolean"]},
        {"name": "tinyint_col", "type": ["null", "int"]},
        {"name": "smallint_col", "type": ["null", "int"]},
        {"name": "int_col", "type": ["null", "int"]},
        {"name": "bigint_col", "type": ["null", "long"]},
        {"name": "float_col", "type": ["null", "float"]},
        {"name": "double_col", "type": ["null", "double"]},
        {"name": "date_string_col", "type": ["null", "bytes"]},
        {"name": "string_col", "type": ["null", "bytes"]},
        {"name": "timestamp_col", "type": ["null", "long"]},
    ],
}


def _alltypes_rows() -> list[tuple]:
    rows = []
    for i in (4, 5, 6, 7, 2, 3, 0, 1):  # original file's row order
        half = i % 2
        rows.append(
            (
                i,
                half == 0,
                half,
                half,
                half,
                half * 10,
                half * 1.1,
                half * 10.1,
                b"03/01/09",
                str(half).encode(),
                0,
            )
        )
    return rows


_NESTED_SCHEMA = {
    "type": "record",
    "name": "nested_records",
    "fields": [
        {
            "name": "f1",
            "type": {
                "type": "record",
                "name": "f1_t",
                "fields": [
                    {"name": "f1_1", "type": "string"},
                    {"name": "f1_2", "type": "int"},
                    {
                        "name": "f1_3",
                        "type": {
                            "type": "record",
                            "name": "f1_3_t",
                            "fields": [{"name": "f1_3_1", "type": "double"}],
                        },
                    },
                ],
            },
        },
        {
            "name": "f2",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "f2_t",
                    "fields": [
                        {"name": "f2_1", "type": "boolean"},
                        {"name": "f2_2", "type": "float"},
                    ],
                },
            },
        },
        {
            "name": "f3",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "f3_t",
                    "fields": [{"name": "f3_1", "type": "string"}],
                },
            ],
        },
        {
            "name": "f4",
            "type": {
                "type": "array",
                "items": [
                    "null",
                    {
                        "type": "record",
                        "name": "f4_t",
                        "fields": [{"name": "f4_1", "type": "long"}],
                    },
                ],
            },
        },
    ],
}

_NESTED_ROWS = [
    (("aaa", 10, (3.14,)), [(True, 1.2), (True, 2.2)], ("xyz",), [(200,), None]),
    (("bbb", 20, (3.14,)), [(False, 10.2)], None, [None, (300,)]),
]

_ENUM_SCHEMA = {
    "type": "record",
    "name": "simple_enum",
    "fields": [
        {"name": "f1", "type": {"type": "enum", "name": "e1",
                                "symbols": ["a", "b", "c", "d"]}},
        {"name": "f2", "type": {"type": "enum", "name": "e2",
                                "symbols": ["e", "f", "g", "h"]}},
        {"name": "f3", "type": ["null", {"type": "enum", "name": "e3",
                                         "symbols": ["i", "j", "k"]}]},
    ],
}

_ENUM_ROWS = [("a", "g", "j"), ("b", "h", "k"), ("c", "e", None), ("d", "f", "i")]

_FIXED_SCHEMA = {
    "type": "record",
    "name": "simple_fixed",
    "fields": [
        {"name": "f1", "type": {"type": "fixed", "name": "fx1", "size": 5}},
        {"name": "f2", "type": {"type": "fixed", "name": "fx2", "size": 10}},
        {"name": "f3", "type": ["null", {"type": "fixed", "name": "fx3",
                                         "size": 6}]},
    ],
}

_FIXED_ROWS = [
    (b"abcde", b"fghijklmno", b"ABCDEF"),
    (b"12345", b"1234567890", None),
]

_SINGLE_NAN_SCHEMA = {
    "type": "record",
    "name": "single_nan",
    "fields": [{"name": "mycol", "type": ["null", "float"]}],
}


def generate(force: bool = False) -> str:
    """Materialize every fixture; returns the directory. Idempotent."""
    os.makedirs(GEN_DIR, exist_ok=True)
    done_marker = os.path.join(GEN_DIR, ".complete")
    if os.path.exists(done_marker) and not force:
        return GEN_DIR

    rows = _alltypes_rows()
    write_avro(
        os.path.join(GEN_DIR, "alltypes_plain.avro"), _ALLTYPES_SCHEMA, rows,
        codec="null",
    )
    for codec in ("snappy", "bzip2", "xz", "zstandard"):
        write_avro(
            os.path.join(GEN_DIR, f"alltypes_plain.{codec}.avro"),
            _ALLTYPES_SCHEMA, rows, codec=codec,
        )
    write_avro(
        os.path.join(GEN_DIR, "single_nan.avro"), _SINGLE_NAN_SCHEMA, [(None,)],
        codec="deflate",
    )
    write_avro(
        os.path.join(GEN_DIR, "nested_records.avro"), _NESTED_SCHEMA,
        _NESTED_ROWS, codec="deflate",
    )
    write_avro(
        os.path.join(GEN_DIR, "simple_enum.avro"), _ENUM_SCHEMA, _ENUM_ROWS,
        codec="deflate",
    )
    write_avro(
        os.path.join(GEN_DIR, "simple_fixed.avro"), _FIXED_SCHEMA, _FIXED_ROWS,
        codec="deflate",
    )
    # the multi-file table the reference harness registers from Rust
    # (two copies of alltypes_plain under one directory)
    multi = os.path.join(GEN_DIR, "alltypes_plain_multi_files")
    os.makedirs(multi, exist_ok=True)
    write_avro(os.path.join(multi, "part-0.avro"), _ALLTYPES_SCHEMA, rows,
               codec="null")
    write_avro(os.path.join(multi, "part-1.avro"), _ALLTYPES_SCHEMA, rows,
               codec="deflate")
    # parquet twin (parquet-testing submodule's alltypes_plain.parquet —
    # explain.slt:320 documents its exact Arrow schema: Int32 ids/tinies,
    # Float32/Float64, Binary string cols, Timestamp(ns)); only id and
    # string_col values are asserted by the corpus
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = [4, 5, 6, 7, 2, 3, 0, 1]
    halves = [i % 2 for i in ids]
    table = pa.table(
        {
            "id": pa.array(ids, pa.int32()),
            "bool_col": pa.array([h == 0 for h in halves], pa.bool_()),
            "tinyint_col": pa.array(halves, pa.int32()),
            "smallint_col": pa.array(halves, pa.int32()),
            "int_col": pa.array(halves, pa.int32()),
            "bigint_col": pa.array([h * 10 for h in halves], pa.int64()),
            "float_col": pa.array([h * 1.1 for h in halves], pa.float32()),
            "double_col": pa.array([h * 10.1 for h in halves], pa.float64()),
            "date_string_col": pa.array([b"03/01/09"] * 8, pa.binary()),
            "string_col": pa.array(
                [str(h).encode() for h in halves], pa.binary()
            ),
            "timestamp_col": pa.array([0] * 8, pa.timestamp("ns")),
        }
    )
    pgen = os.path.join(
        os.path.dirname(GEN_DIR), "parquet_gen"
    )
    os.makedirs(pgen, exist_ok=True)
    pq.write_table(table, os.path.join(pgen, "alltypes_plain.parquet"))
    with open(done_marker, "w") as f:
        f.write("ok")
    return GEN_DIR
