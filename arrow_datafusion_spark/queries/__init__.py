"""Query registry: every implemented operator family exposes (a) a PySpark
DataFrame implementation `(spark, sf_dir) -> DataFrame` and (b) an ANSI-SQL
oracle string DuckDB can run on the same parquet tables. The driver (and our
tests) hash-compare the two at sf0.01."""

from __future__ import annotations
