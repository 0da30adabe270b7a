"""File-format sources beyond Spark's built-ins.

`avro.py` — a self-contained Avro container-file reader exposed through the
PySpark Python Data Source API (AvroExec parity; the reference's Avro
support is likewise read-only — file_format/avro.rs has no writer).
"""
