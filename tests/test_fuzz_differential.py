"""Property-based differential fuzzing: random ANSI-subset SQL, engine vs
DuckDB on the SAME text.

The slt corpus and the 190 oracle entries pin known shapes; this harness
walks the space BETWEEN them — hypothesis composes filters, arithmetic,
aggregates, GROUP BY and ORDER BY over the lineitem fixture, and every
generated statement must produce identical (sorted, float-tolerant)
results from ``SessionContext.sql`` and DuckDB. This is the net that
catches a rewrite-layer regex firing on a shape nobody hand-wrote (the
round-12 spelling-consistency lesson, generalized).

Grammar restrictions keep both engines inside shared ANSI semantics:

- no `/` (the engine implements the REFERENCE's truncating integer and
  decimal division, which legitimately differs from DuckDB's
  always-fractional `/`);
- no string LIKE on data columns (fixture text is ASCII, but collation
  edge cases are not the target here);
- aggregates restricted to sum/min/max/count over numerics (avg's result
  typing differs per engine);
- float comparison at 9 significant digits (sum order independence at
  the 6k-row fixture is well inside that tolerance).

Runs 120 deterministic examples (derandomize): ~1 min, CI-stable.
"""

from __future__ import annotations

import math
import os
import sys

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Fast/full example tiers (see tests/conftest.py): the fast tier runs a
# reduced DERANDOMIZED PREFIX of the full tier's cases (derandomize=True
# makes case k identical in both tiers), so the driver-budget default run
# still exercises every fuzzer while the full sweep stays available.
_FULL = bool(os.environ.get("SPARK_GRAFT_FULL_TESTS"))


def _ex(full_count: int) -> int:
    return full_count if _FULL else max(full_count // 6, 10)


_NUM_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_INT_COLS = ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
_STR_COLS = ("l_returnflag", "l_linestatus")

_num_col = st.sampled_from(_NUM_COLS)
_int_col = st.sampled_from(_INT_COLS)
_str_col = st.sampled_from(_STR_COLS)
_num_lit = st.sampled_from(("0.02", "0.5", "7.0", "25.0", "900.5", "17000.0"))
_int_lit = st.sampled_from(("1", "3", "7", "1000", "30000"))
_cmp = st.sampled_from(("<", "<=", ">", ">=", "=", "<>"))


@st.composite
def _num_expr(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return draw(st.one_of(_num_col, _num_lit))
    if draw(st.integers(0, 3)) == 0:
        # CASE over a predicate — exercises the rewrite layer's shield
        # and find-call walkers inside aggregate arguments
        p = draw(_predicate())
        a = draw(_num_expr(depth=0))
        b = draw(_num_expr(depth=0))
        return f"(CASE WHEN {p} THEN {a} ELSE {b} END)"
    op = draw(st.sampled_from(("+", "-", "*")))
    a = draw(_num_expr(depth=depth - 1))
    b = draw(st.one_of(_num_col, _num_lit))
    return f"({a} {op} {b})"


@st.composite
def _predicate(draw):
    kind = draw(st.integers(0, 5))
    if kind == 0:
        return f"{draw(_num_col)} {draw(_cmp)} {draw(_num_lit)}"
    if kind == 1:
        return f"{draw(_int_col)} {draw(_cmp)} {draw(_int_lit)}"
    if kind == 2:
        return f"{draw(_str_col)} = '{draw(st.sampled_from(('A', 'N', 'R', 'O', 'F')))}'"
    if kind == 3:
        a, b = sorted(
            (float(draw(_num_lit)), float(draw(_num_lit)))
        )
        return f"{draw(_num_col)} BETWEEN {a} AND {b}"
    if kind == 4:
        vals = ", ".join(
            f"'{v}'"
            for v in draw(
                st.lists(
                    st.sampled_from(("A", "N", "R", "O", "F")),
                    min_size=1,
                    max_size=3,
                    unique=True,
                )
            )
        )
        neg = "NOT " if draw(st.booleans()) else ""
        return f"{draw(_str_col)} {neg}IN ({vals})"
    a, b = draw(_predicate()), draw(_predicate())
    return f"({a} {draw(st.sampled_from(('AND', 'OR')))} {b})"


@st.composite
def _agg(draw, i):
    if draw(st.integers(0, 4)) == 0:
        return f"COUNT(DISTINCT {draw(_int_col)}) AS a{i}"
    fn = draw(st.sampled_from(("SUM", "MIN", "MAX", "COUNT")))
    return f"{fn}({draw(_num_expr())}) AS a{i}"


@st.composite
def _query(draw):
    n = draw(st.integers(1, 3))
    sel = ", ".join(draw(_agg(i)) for i in range(n))
    group = draw(st.booleans())
    where = draw(st.one_of(st.none(), _predicate()))
    q = "SELECT "
    if group:
        q += "l_returnflag, "
    q += sel + " FROM lineitem"
    if where:
        q += f" WHERE {where}"
    if group:
        q += " GROUP BY l_returnflag"
        if draw(st.booleans()):
            q += " HAVING COUNT(*) > 1"
        q += " ORDER BY l_returnflag"
    return q


def _norm(rows):
    import decimal

    out = []
    for r in rows:
        cells = []
        for v in r:
            if isinstance(v, decimal.Decimal):
                # decimal SCALE spelling differs per engine ("6.5" vs
                # "6.50"); both fuzz grammars keep values well inside
                # double precision, so 9 significant digits are exact
                v = float(v)
            if v is None:
                cells.append("NULL")
            elif isinstance(v, float):
                if math.isnan(v):
                    cells.append("NaN")
                elif v == 0:
                    cells.append("0")
                else:
                    cells.append(f"{v:.9g}")
            elif isinstance(v, int):
                cells.append(f"{v}")
            else:
                s = str(v)
                # DuckDB's date_trunc returns DATE for day-and-coarser
                # units where DataFusion (and this engine) keeps the
                # input's timestamp type — midnight timestamps compare
                # equal to their date (applied to both sides)
                if s.endswith(" 00:00:00"):
                    s = s[: -len(" 00:00:00")]
                cells.append(s)
        out.append(tuple(cells))
    return sorted(out)


@pytest.fixture(scope="module")
def harness(spark):
    import duckdb

    from arrow_datafusion_spark.context import SessionContext
    from arrow_datafusion_spark.session import load_tables

    load_tables(spark, SF_DIR, names=("lineitem", "orders"))
    ctx = SessionContext(spark)
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return ctx, con


@settings(
    max_examples=_ex(120),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_query())
def test_random_query_matches_duckdb(harness, q):
    ctx, con = harness
    got = _norm([tuple(r) for r in ctx.sql(q).collect()])
    want = _norm(con.sql(q).fetchall())
    assert got == want, f"divergence on: {q}\nspark={got[:5]}\nduck={want[:5]}"


@st.composite
def _join_query(draw):
    # two-table equi-join: exercises the alias-aware schema map (the
    # type-aware rewrites' multi-relation resolution) and join planning
    n = draw(st.integers(1, 2))
    sel = ", ".join(draw(_agg(i)) for i in range(n))
    where = draw(st.one_of(st.none(), _predicate()))
    opred = draw(
        st.sampled_from(
            (
                None,
                "o.o_orderstatus = 'F'",
                "o.o_totalprice > 50000.0",
                "o.o_orderpriority <> '1-URGENT!'",
            )
        )
    )
    q = (
        f"SELECT {sel} FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey"
    )
    conds = [c for c in (where, opred) if c]
    if conds:
        q += " WHERE " + " AND ".join(conds)
    return q


@settings(
    max_examples=_ex(60),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_join_query())
def test_random_join_matches_duckdb(harness, q):
    ctx, con = harness
    got = _norm([tuple(r) for r in ctx.sql(q).collect()])
    want = _norm(con.sql(q).fetchall())
    assert got == want, f"divergence on: {q}\nspark={got[:5]}\nduck={want[:5]}"


_TOTAL_ORDER = (
    "l_orderkey, l_linenumber, l_partkey, l_suppkey, "
    "l_quantity, l_extendedprice, l_discount, l_tax"
)


@st.composite
def _window_query(draw):
    # window functions over a TOTAL order. The synthetic fixture has
    # ~1400 duplicate (l_orderkey, l_linenumber) pairs (unlike dbgen's
    # unique PK), so the order key is the full numeric tuple — rows tied
    # on ALL of it are identical in every selected/lagged column, making
    # the output deterministic on both engines.
    fn = draw(
        st.sampled_from(
            (
                "row_number() OVER w",
                "rank() OVER w",
                "dense_rank() OVER w",
                "SUM(l_quantity) OVER w",
                "MIN(l_extendedprice) OVER w",
                "lag(l_quantity, 1) OVER w",
                "lead(l_quantity, 1) OVER w",
            )
        )
    )
    part = draw(st.booleans())
    where = draw(st.one_of(st.none(), _predicate()))
    spec = (
        ("PARTITION BY l_returnflag " if part else "")
        + f"ORDER BY {_TOTAL_ORDER}"
    )
    q = (
        f"SELECT l_orderkey, l_linenumber, l_quantity, {fn} AS w0 "
        "FROM lineitem"
        + (f" WHERE {where}" if where else "")
        + f" WINDOW w AS ({spec})"
        + f" ORDER BY {_TOTAL_ORDER}, w0 LIMIT 500"
    )
    return q


@settings(
    max_examples=_ex(60),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_window_query())
def test_random_window_matches_duckdb(harness, q):
    ctx, con = harness
    got = _norm([tuple(r) for r in ctx.sql(q).collect()])
    want = _norm(con.sql(q).fetchall())
    assert got == want, f"divergence on: {q}\nspark={got[:5]}\nduck={want[:5]}"


@st.composite
def _setop_query(draw):
    # UNION [ALL] / INTERSECT / EXCEPT between two filtered projections
    # of the same shape — exercises the set-operation lowering and
    # implicit type alignment
    cols = "l_returnflag, l_linestatus, l_linenumber"
    a = f"SELECT {cols} FROM lineitem WHERE {draw(_predicate())}"
    b = f"SELECT {cols} FROM lineitem WHERE {draw(_predicate())}"
    op = draw(
        st.sampled_from(("UNION", "UNION ALL", "INTERSECT", "EXCEPT"))
    )
    return f"{a} {op} {b}"


@settings(
    max_examples=_ex(60),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_setop_query())
def test_random_setop_matches_duckdb(harness, q):
    ctx, con = harness
    got = _norm([tuple(r) for r in ctx.sql(q).collect()])
    want = _norm(con.sql(q).fetchall())
    assert got == want, f"divergence on: {q}\nspark={got[:5]}\nduck={want[:5]}"


@st.composite
def _sort_limit_query(draw):
    # projection + total-order sort + LIMIT/OFFSET — the cut must select
    # the same row set on both engines under a genuinely total order
    where = draw(st.one_of(st.none(), _predicate()))
    lim = draw(st.integers(1, 300))
    off = draw(st.sampled_from((0, 1, 10, 100, 5000)))
    desc = draw(st.booleans())
    keys = ", ".join(
        k + (" DESC" if desc else "")
        for k in _TOTAL_ORDER.split(", ")
    )
    q = f"SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"
    if where:
        q += f" WHERE {where}"
    q += f" ORDER BY {keys} LIMIT {lim} OFFSET {off}"
    return q


@settings(
    max_examples=_ex(60),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_sort_limit_query())
def test_random_sort_limit_matches_duckdb(harness, q):
    ctx, con = harness
    got = _norm([tuple(r) for r in ctx.sql(q).collect()])
    want = _norm(con.sql(q).fetchall())
    assert got == want, f"divergence on: {q}\nspark={got[:5]}\nduck={want[:5]}"


@st.composite
def _scalar_expr(draw):
    kind = draw(st.integers(0, 6))
    if kind == 0:
        return f"date_trunc('{draw(st.sampled_from(('year', 'month', 'day', 'hour')))}', o_orderdate)"
    if kind == 1:
        return (
            "extract("
            f"{draw(st.sampled_from(('year', 'month', 'day', 'hour', 'minute')))}"
            " FROM o_orderdate)"
        )
    if kind == 2:
        return f"{draw(st.sampled_from(('upper', 'lower')))}(o_orderpriority)"
    if kind == 3:
        return "length(o_orderstatus || o_orderpriority)"
    if kind == 4:
        return f"substr(o_orderpriority, {draw(st.integers(1, 4))}, {draw(st.integers(1, 5))})"
    if kind == 5:
        return f"coalesce(nullif(o_orderstatus, '{draw(st.sampled_from(('F', 'O', 'P')))}'), 'X')"
    return f"abs(o_totalprice - {draw(_num_lit)})"


@st.composite
def _scalar_query(draw):
    n = draw(st.integers(1, 3))
    sel = ", ".join(f"{draw(_scalar_expr())} AS s{i}" for i in range(n))
    q = (
        f"SELECT o_orderkey, {sel} FROM orders"
        " ORDER BY o_orderkey, o_orderdate, o_totalprice LIMIT 300"
    )
    return q


@settings(
    max_examples=_ex(60),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_scalar_query())
def test_random_scalar_funcs_match_duckdb(harness, q):
    # datetime/string scalar functions with shared ANSI semantics,
    # projected over a total order (o_orderkey is non-unique in the
    # synthetic fixture — the full key below is)
    ctx, con = harness
    got = _norm([tuple(r) for r in ctx.sql(q).collect()])
    want = _norm(con.sql(q).fetchall())
    assert got == want, f"divergence on: {q}\nspark={got[:5]}\nduck={want[:5]}"


# ---------------------------------------------------------------------------
# r13 properties — the nets that would have caught both round-12 findings
# (bare-vs-chain timestamp casts; FROM-less paren-literal division).
# ---------------------------------------------------------------------------

_SMALL_INT = st.sampled_from(("2", "3", "7", "42", "1000"))


@st.composite
def _spelled_expr(draw, depth=2, allow_cols=True):
    """(plain, decorated): the SAME integer expression in two spellings —
    redundant parens, CAST(x AS BIGINT) vs x::bigint vs bare — one token
    apart at every leaf. Equivalent spellings must agree in VALUE (dtype
    may legally widen INT→BIGINT under an explicit cast)."""
    deco_forms = ("{0}", "({0})", "CAST({0} AS BIGINT)", "{0}::bigint",
                  "(CAST({0} AS BIGINT))", "({0}::bigint)")
    if depth == 0 or draw(st.booleans()):
        leaf = draw(
            st.one_of(_SMALL_INT, _int_col) if allow_cols else _SMALL_INT
        )
        return leaf, draw(st.sampled_from(deco_forms)).format(leaf)
    op = draw(st.sampled_from(("+", "-", "*", "/")))
    a_p, a_d = draw(_spelled_expr(depth=depth - 1, allow_cols=allow_cols))
    if op == "/":
        # nonzero literal divisor; numerator may be any shape — both
        # spellings must agree on WHETHER the truncating lowering fires
        b = draw(_SMALL_INT)
        b_d = draw(st.sampled_from(deco_forms)).format(b)
        return f"{a_p} / {b}", f"{a_d} / {b_d}"
    b_p, b_d = draw(_spelled_expr(depth=0, allow_cols=allow_cols))
    return f"({a_p} {op} {b_p})", f"({a_d} {op} {b_d})"


@settings(
    max_examples=_ex(120),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_spelling_pairs_agree_engine_vs_engine(harness, data):
    # engine-vs-engine: no DuckDB on the right side, so the grammar KEEPS
    # `/` — this property walks exactly the space where the round-12
    # probes found divergences (a redundant cast/paren changing a value)
    ctx, _ = harness
    src = data.draw(
        st.sampled_from(
            (
                "",  # FROM-less
                " FROM (VALUES (7), (3), (42)) AS tv(x)",
                f" FROM lineitem ORDER BY {_TOTAL_ORDER} LIMIT 100",
            )
        )
    )
    plain, deco = data.draw(_spelled_expr(allow_cols="lineitem" in src))
    qa = f"SELECT {plain} AS v{src}"
    qb = f"SELECT {deco} AS v{src}"
    got_a = _norm([tuple(r) for r in ctx.sql(qa).collect()])
    got_b = _norm([tuple(r) for r in ctx.sql(qb).collect()])
    assert got_a == got_b, (
        f"spelling divergence:\n  {qa}\n  {qb}\n  {got_a[:5]} != {got_b[:5]}"
    )


@st.composite
def _fromless_values_query(draw):
    """FROM-less SELECTs and inline-VALUES FROMs vs DuckDB — the shapes
    the schema-resolved rewrites historically skipped. `/` excluded (the
    engine's truncating division is the reference's semantics, not
    DuckDB's); the engine-vs-engine property above covers `/`."""
    kind = draw(st.integers(0, 2))
    if kind == 0:  # FROM-less integer/double arithmetic
        n = draw(st.integers(1, 3))
        exprs = []
        for i in range(n):
            a, b = draw(_SMALL_INT), draw(_SMALL_INT)
            op = draw(st.sampled_from(("+", "-", "*")))
            if draw(st.booleans()):
                exprs.append(f"({a} {op} {b}) AS s{i}")
            else:
                exprs.append(
                    f"(CAST({a} AS DOUBLE) {op} {b}) AS s{i}"
                )
        return "SELECT " + ", ".join(exprs)
    if kind == 1:  # FROM-less string scalars
        s = draw(st.sampled_from(("'hello'", "'Spark SQL'", "'x'")))
        fn = draw(
            st.sampled_from(
                (
                    "upper({0})", "lower({0})", "length({0})",
                    "substr({0}, 2, 3)", "reverse({0})",
                    "concat({0}, '!')", "trim('  ' || {0})",
                )
            )
        )
        return f"SELECT {fn.format(s)} AS s0"
    # inline-VALUES aggregates (+ GROUP BY over a string column)
    rows = draw(
        st.lists(
            st.tuples(
                st.sampled_from(("'a'", "'b'", "'c'")),
                st.integers(-50, 50),
                st.sampled_from(("1.5", "2.25", "4.0", "0.5")),
            ),
            min_size=2,
            max_size=5,
        )
    )
    vals = ", ".join(f"({s}, {i}, {f})" for s, i, f in rows)
    aggs = []
    for i in range(draw(st.integers(1, 2))):
        fn = draw(st.sampled_from(("SUM", "MIN", "MAX", "COUNT")))
        col = draw(st.sampled_from(("n", "f")))
        aggs.append(f"{fn}({col}) AS a{i}")
    if draw(st.booleans()):
        return (
            f"SELECT s, {', '.join(aggs)} FROM (VALUES {vals}) "
            "AS t(s, n, f) GROUP BY s ORDER BY s"
        )
    return f"SELECT {', '.join(aggs)} FROM (VALUES {vals}) AS t(s, n, f)"


@settings(
    max_examples=_ex(120),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_fromless_values_query())
def test_fromless_and_values_match_duckdb(harness, q):
    ctx, con = harness
    got = _norm([tuple(r) for r in ctx.sql(q).collect()])
    want = _norm(con.sql(q).fetchall())
    assert got == want, f"divergence on: {q}\nspark={got[:5]}\nduck={want[:5]}"
