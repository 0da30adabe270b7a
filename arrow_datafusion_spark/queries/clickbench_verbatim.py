"""ClickBench statements run AS-WRITTEN through the engine, driver-gated.

The reference ships ClickBench verbatim
(/root/reference/benchmarks/queries/clickbench/queries.sql; runner
benchmarks/src/clickbench.rs). tests/test_clickbench_verbatim.py already
differential-checks every statement against DuckDB; this module promotes
the exactly-reproducible subset into the driver registry (VERDICT r9 #6)
so CORRECTNESS_r{N}.json records them, executing the reference's OWN SQL
text unmodified through ``SessionContext.sql``.

Harness plumbing around the verbatim text (documented, value-preserving):

- **positional renames**: ClickBench leaves aggregates unaliased, and each
  engine names them differently (`count(*)` vs `count_star()`); the driver
  compare matches columns BY NAME, so both sides are renamed positionally
  to c0..cN (`df.toDF(...)` / DuckDB `AS v(c0, ...)`). Values untouched.
- **fixture**: the 100k-row full-schema hits table from
  tests/hits_fixture.py (cached parquet); the oracle reads the same file
  via ``read_parquet`` since the driver's DuckDB views cover only the sf
  tables.
- **oracle dialect**: the two mechanical substitutions DuckDB needs
  (`"x"::INT::DATE` → date arithmetic; `to_timestamp_seconds` →
  `to_timestamp::TIMESTAMP`) — same rules as the verbatim pytest, which
  documents why each exists.

Statement selection: exact-valued outputs only — counts, distincts,
min/max, string/int group keys. Excluded: the rows-only trio (q17 LIMIT
without ORDER BY, q38/q39 OFFSET into count-1 ties) and every statement
whose double-typed SUM/AVG accumulates float addition (not associative —
cross-engine hash can't gate it; the re-expressed clickbench.py pack
covers those shapes with DECIMAL accumulators).
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES_SQL = "/root/reference/benchmarks/queries/clickbench/queries.sql"

# statement index in queries.sql → output column count (for the renames)
_PICKED: dict[str, tuple[int, int]] = {
    "cb_v_count": (0, 1),
    "cb_v_count_filtered": (1, 1),
    "cb_v_distinct_users": (4, 1),
    "cb_v_distinct_phrases": (5, 1),
    "cb_v_minmax_date": (6, 2),
    "cb_v_adv_engine": (7, 2),
    "cb_v_phrase_topk": (12, 2),
    "cb_v_phrase_users_topk": (13, 2),
    "cb_v_point_lookup": (19, 1),
    "cb_v_like_count": (20, 1),
    "cb_v_phrase_order": (25, 1),
    "cb_v_url_topk": (33, 2),
    "cb_v_pageviews_url": (36, 2),
    "cb_v_pageviews_title": (37, 2),
    "cb_v_window_dims": (41, 3),
    "cb_v_minute_series": (42, 2),
}


def _statements() -> list[str]:
    with open(_QUERIES_SQL) as f:
        return [s.strip() for s in f.read().split(";") if s.strip()]


def _hits_path() -> str:
    from tests import hits_fixture

    return hits_fixture.generate()


def _duckdb_dialect(sql: str) -> str:
    """Same two substitutions as tests/test_clickbench_verbatim.py."""
    sql = re.sub(
        r'("?\w+"?)\s*::\s*INT\s*::\s*DATE',
        r"(DATE '1970-01-01' + \1::INT)",
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"\bto_timestamp_seconds\s*\(([^()]*)\)",
        r"to_timestamp(\1)::TIMESTAMP",
        sql,
        flags=re.IGNORECASE,
    )
    return sql


def _make(idx: int, ncols: int) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from arrow_datafusion_spark.context import SessionContext

        path = _hits_path()
        ctx = SessionContext(spark)
        if "hits" not in ctx._tables:
            ctx.register_parquet("hits", path)
        df = ctx.sql(_statements()[idx])  # the reference's text, unmodified
        return df.toDF(*[f"c{k}" for k in range(ncols)])

    return run


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

try:
    _AVAILABLE = os.path.exists(_QUERIES_SQL) and bool(_hits_path())
except Exception:  # tests package absent / generation failed — degrade
    _AVAILABLE = False
if _AVAILABLE:
    _ALL = _statements()
    # the oracle string needs the fixture's path, so materialize it now
    # (cached parquet — a file-exists check after the first generation);
    # __spark_entry__ drops the cb_v_* priority names when this module
    # degrades to an empty registry
    _HITS = _hits_path()
    for _name, (_idx, _n) in _PICKED.items():
        QUERIES[_name] = _make(_idx, _n)
        _body = re.sub(
            r"\bFROM\s+hits\b",
            f"FROM read_parquet('{_HITS}') AS hits",
            _duckdb_dialect(_ALL[_idx]),
            flags=re.IGNORECASE,
        )
        cols = ", ".join(f"c{k}" for k in range(_n))
        ORACLE[_name] = f"SELECT * FROM ({_body}) AS v({cols})"
