"""Property-based differential testing: random scalar expressions evaluated
by the engine (ctx.sql → Catalyst) and by DuckDB over the same table must
agree exactly.

This is the fuzz-breadth analog of the reference's 58k-line sqllogictest
corpus (SURVEY.md §5): instead of enumerating cases by hand, hypothesis
explores the expression space. The grammar is restricted to constructs
with EXACT cross-engine semantics — integer arithmetic (no division),
comparisons, boolean logic, CASE, and 1-based string functions — so any
disagreement is a real bug, never a float/locale artifact. Values stay
small enough that Spark's ANSI overflow checking can't fire.
"""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_datafusion_spark.context import SessionContext  # noqa: E402
from tests.oracle_harness import duckdb_con  # noqa: E402

# --- expression grammar (shared Spark-SQL / DuckDB subset, exact semantics)

_INT_LEAVES = ["n_nationkey", "n_regionkey", "0", "1", "2", "7", "-3"]
_STR_LEAVES = ["n_name", "'ALPHA'", "'x'"]


def _int_expr(depth: int):
    if depth <= 0:
        return st.sampled_from(_INT_LEAVES)
    sub = _int_expr(depth - 1)
    return st.one_of(
        st.sampled_from(_INT_LEAVES),
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(sub, sub).map(lambda t: f"(CASE WHEN {t[0]} > {t[1]} THEN {t[0]} ELSE {t[1]} END)"),
        _str_expr(depth - 1).map(lambda s: f"length({s})"),
        sub.map(lambda s: f"abs({s})"),
        # % is C-style (sign of dividend) in BOTH engines; abs(..)+1 guards 0
        st.tuples(sub, sub).map(lambda t: f"({t[0]} % (abs({t[1]}) + 1))"),
        st.tuples(sub, sub).map(lambda t: f"greatest({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"least({t[0]}, {t[1]})"),
    )


def _str_expr(depth: int):
    if depth <= 0:
        return st.sampled_from(_STR_LEAVES)
    sub = _str_expr(depth - 1)
    return st.one_of(
        st.sampled_from(_STR_LEAVES),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} || {t[1]})"),
        sub.map(lambda s: f"upper({s})"),
        sub.map(lambda s: f"lower({s})"),
        st.tuples(sub, st.integers(1, 4), st.integers(1, 5)).map(
            lambda t: f"substr({t[0]}, {t[1]}, {t[2]})"
        ),
        sub.map(lambda s: f"reverse({s})"),
        sub.map(lambda s: f"trim({s})"),
        st.tuples(sub, st.sampled_from(["'A'", "'_'"]), st.sampled_from(["''", "'z'"])).map(
            lambda t: f"replace({t[0]}, {t[1]}, {t[2]})"
        ),
        st.tuples(sub, st.integers(1, 8)).map(
            lambda t: f"lpad({t[0]}, {t[1]}, '.')"
        ),
        # 1-based field split — same convention in both engines; the
        # delimiter is a literal that always occurs (space after ||)
        st.tuples(sub, st.integers(1, 2)).map(
            lambda t: f"split_part(({t[0]} || ' x'), ' ', {t[1]})"
        ),
        st.tuples(sub, st.integers(1, 3)).map(lambda t: f"repeat({t[0]}, {t[1]})"),
        st.tuples(sub, st.integers(0, 4)).map(lambda t: f"left({t[0]}, {t[1]})"),
        st.tuples(sub, st.integers(0, 4)).map(lambda t: f"right({t[0]}, {t[1]})"),
        sub.map(lambda s: f"translate({s}, 'AEI', 'xy')"),
    )


# date arithmetic on a fixed anchor date — integer-exact in both engines
# (date ± int = add/subtract days in BOTH Spark and DuckDB; INTERVAL
# literals can't carry expressions in Spark, so the int form is the shared
# subset)
def _date_expr(int_sub):
    anchor = "DATE '1994-06-15'"
    return st.one_of(
        int_sub.map(lambda i: f"({anchor} + CAST((abs({i})) % 500 AS INTEGER))"),
        int_sub.map(lambda i: f"({anchor} - CAST((abs({i})) % 500 AS INTEGER))"),
    )


def _bool_expr(depth: int):
    ie = _int_expr(depth)
    base = st.tuples(ie, st.sampled_from(["<", "<=", "=", ">", ">=", "<>"]), ie).map(
        lambda t: f"({t[0]} {t[1]} {t[2]})"
    )
    if depth <= 0:
        return base
    sub = _bool_expr(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["AND", "OR"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda s: f"(NOT {s})"),
    )


@pytest.fixture(scope="module")
def ctx(spark, sf_dir):
    c = SessionContext(spark)
    c.register_parquet("nation", f"{sf_dir}/nation.parquet")
    return c


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()



# fast/full tier (tests/conftest.py): reduced derandomized prefix by default
_FULL = bool(os.environ.get("SPARK_GRAFT_FULL_TESTS"))


def _ex(full_count: int) -> int:
    return full_count if _FULL else max(full_count // 6, 10)

@settings(
    max_examples=_ex(30),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    iexpr=_int_expr(2),
    sexpr=_str_expr(2),
    pred=_bool_expr(1),
)
def test_expression_semantics_match_duckdb(ctx, con, iexpr, sexpr, pred):
    sql = (
        f"SELECT n_nationkey, {iexpr} AS iv, {sexpr} AS sv "
        f"FROM nation WHERE {pred} ORDER BY n_nationkey"
    )
    got = [tuple(r) for r in ctx.sql(sql).collect()]
    want = con.sql(sql).fetchall()
    assert got == want, sql


@settings(
    max_examples=_ex(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(dexpr=_date_expr(_int_expr(1)), iexpr=_int_expr(1))
def test_date_arithmetic_matches_duckdb(ctx, con, dexpr, iexpr):
    """Date ± INTERVAL day arithmetic, extraction, and date diffs are
    integer-exact in both engines."""
    sql = (
        f"SELECT n_nationkey, CAST({dexpr} AS DATE) AS dv, "
        f"       CAST(year({dexpr}) * 10000 + month({dexpr}) * 100 + day({dexpr}) AS BIGINT) AS ymd "
        f"FROM nation ORDER BY n_nationkey"
    )
    got = [(r[0], r[1], r[2]) for r in ctx.sql(sql).collect()]
    want = [(r[0], r[1], r[2]) for r in con.sql(sql).fetchall()]
    assert got == want, sql
