"""Substrait consumer tests — executing the REFERENCE'S OWN artifacts.

Mirrors the reference's consumer tests
(datafusion/substrait/tests/cases/logical_plans.rs and
consumer_integration.rs), with a stronger bar where possible: the
reference asserts only PLAN TEXT for the third-party Isthmus artifacts;
here each consumed plan is EXECUTED and its rows are checked — the
Isthmus TPC-H plan differentially against DuckDB running the
semantically-equal SQL over the same parquet.

Provenance note: the artifacts under
/root/reference/datafusion/substrait/tests/testdata/ were produced by
substrait-java's Isthmus (per the corpus README) — a producer this repo
does not control, which is what makes consuming them a real interop
check. DuckDB's substrait extension would be a second producer but is
not installable in this offline sandbox (extension download requires
network); recorded here so a future networked round can add it.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TESTDATA = "/root/reference/datafusion/substrait/tests/testdata"


def _ctx(spark):
    """Hermetic per-test sub-session: these tests register fixture tables
    under names that would otherwise clobber the shared session's views
    (a 6-column `nation`, `DATA`, `FILENAME_PLACEHOLDER_0`) for every
    later test module — temp views are session-global."""
    from arrow_datafusion_spark.context import SessionContext

    return SessionContext(spark.newSession())


@pytest.mark.skipif(not os.path.isdir(_TESTDATA), reason="reference artifacts absent")
def test_tpch_q1_isthmus_plan_matches_duckdb(spark):
    """consumer_integration.rs tpch_test_1, executed: the Isthmus-produced
    TPC-H q1 plan over dbgen SF0.01 lineitem vs DuckDB running the
    equivalent SQL on the same parquet."""
    import duckdb

    from arrow_datafusion_spark.queries import substrait_suite as ss

    got = sorted(
        tuple(r)
        for r in ss.substrait_tpch_q1(spark.newSession(), "unused").collect()
    )
    want = sorted(
        tuple(r) for r in duckdb.sql(ss.SUBSTRAIT_TPCH_Q1_SQL).fetchall()
    )
    assert len(got) == 4
    for g, w in zip(got, want):
        assert g[:2] == w[:2]
        for gv, wv in zip(g[2:], w[2:]):
            assert gv == pytest.approx(wv, rel=1e-12), (g, w)


@pytest.mark.skipif(not os.path.isdir(_TESTDATA), reason="reference artifacts absent")
def test_select_not_bool_compound_signature(spark):
    """logical_plans.rs scalar_function_compound_signature, executed:
    `select not d from data` (Isthmus artifact; compound name `not:bool`).
    v39 parity: project output is the expression list only — the plan's
    emit.outputMapping is ignored exactly as consumer.rs:401 ignores it."""
    from arrow_datafusion_spark.plans.substrait import consume_plan_file

    ctx = _ctx(spark)
    ctx.register_table(
        "DATA",
        ctx.spark.createDataFrame([(True,), (False,), (None,)], "d boolean"),
    )
    out = consume_plan_file(ctx, f"{_TESTDATA}/test_plans/select_not_bool.substrait.json")
    assert out.columns == ["EXPR$0"]
    got = sorted((r[0] for r in out.collect()), key=lambda v: (v is None, v))
    assert got == [False, True, None]


@pytest.mark.skipif(not os.path.isdir(_TESTDATA), reason="reference artifacts absent")
def test_select_window_compound_signature(spark):
    """logical_plans.rs window_function_compound_signature, executed:
    sum(d) OVER (PARTITION BY part ORDER BY ord ROWS BETWEEN 1 PRECEDING
    AND UNBOUNDED FOLLOWING)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from arrow_datafusion_spark.plans.substrait import consume_plan_file

    rows = [(1, 1, 1), (2, 1, 2), (3, 1, 3), (10, 2, 1), (20, 2, 2)]
    ctx = _ctx(spark)
    df = ctx.spark.createDataFrame(rows, "d int, part int, ord int")
    ctx.register_table("DATA", df)
    out = consume_plan_file(ctx, f"{_TESTDATA}/test_plans/select_window.substrait.json")
    assert out.columns == ["LEAD_EXPR"]
    spec = (
        Window.partitionBy("part")
        .orderBy("ord")
        .rowsBetween(-1, Window.unboundedFollowing)
    )
    want = sorted(r[0] for r in df.select(F.sum("d").over(spec)).collect())
    assert sorted(r[0] for r in out.collect()) == want


@pytest.mark.skipif(not os.path.isdir(_TESTDATA), reason="reference artifacts absent")
def test_non_nullable_lists_virtual_table(spark):
    """logical_plans.rs non_nullable_lists, executed: a VirtualTable row
    holding a list literal — 'Values: (List([1, 2]))'."""
    from arrow_datafusion_spark.plans.substrait import consume_plan_file

    out = consume_plan_file(
        _ctx(spark), f"{_TESTDATA}/test_plans/non_nullable_lists.substrait.json"
    )
    assert out.columns == ["col"]
    assert [list(r[0]) for r in out.collect()] == [[1, 2]]


def test_named_table_join_plan(spark, sf_dir):
    """The hand-authored spec-shaped plan (NamedTable + join + filter +
    project + sort + fetch) must match the equivalent SQL."""
    from arrow_datafusion_spark.queries import substrait_suite as ss
    from arrow_datafusion_spark.session import load_tables

    load_tables(spark, sf_dir, names=("nation", "region"))
    got = [tuple(r) for r in ss.substrait_named_join(spark, sf_dir).collect()]
    want = [tuple(r) for r in spark.sql(ss.SUBSTRAIT_NAMED_JOIN_SQL).collect()]
    assert got == want
    assert len(got) == 5


def test_unsupported_rel_and_function_raise(spark):
    from arrow_datafusion_spark.plans.substrait import consume_plan

    with pytest.raises(NotImplementedError):
        consume_plan(
            _ctx(spark),
            {"relations": [{"root": {"names": [], "input": {"exchange": {}}}}]},
        )
    bad_fn = {
        "extensions": [
            {"extensionFunction": {"functionAnchor": 0, "name": "no_such_fn:i32"}}
        ],
        "relations": [{
            "root": {
                "names": ["x"],
                "input": {"project": {
                    "expressions": [{
                        "scalarFunction": {"functionReference": 0, "arguments": []}
                    }],
                    "input": {"read": {"namedTable": {"names": ["nation"]}}},
                }},
            },
        }],
    }
    ctx2 = _ctx(spark)
    ctx2.register_table(
        "nation", ctx2.spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    )
    with pytest.raises(NotImplementedError):
        consume_plan(ctx2, bad_fn).collect()


def test_fetch_offset_and_count(spark, sf_dir):
    """FetchRel offset/count semantics — count -1 means no limit
    (consumer.rs:453)."""
    from arrow_datafusion_spark.plans.substrait import consume_plan
    from arrow_datafusion_spark.queries.substrait_suite import _sel

    ctx = _ctx(spark)
    ctx.register_table(
        "nation", ctx.spark.read.parquet(f"{sf_dir}/nation.parquet")
    )

    def plan(offset, count):
        return {
            "relations": [{
                "root": {
                    "names": ["k"],
                    "input": {"fetch": {
                        "offset": str(offset),
                        "count": str(count),
                        "input": {"sort": {
                            "sorts": [{
                                "expr": _sel(0),
                                "direction": "SORT_DIRECTION_ASC_NULLS_LAST",
                            }],
                            "input": {"project": {
                                "expressions": [_sel(0)],
                                "input": {"read": {
                                    "namedTable": {"names": ["nation"]}}},
                            }},
                        }},
                    }},
                },
            }],
        }

    assert [r[0] for r in consume_plan(ctx, plan(3, 4)).collect()] == [3, 4, 5, 6]
    assert len(consume_plan(ctx, plan(20, -1)).collect()) == 5  # 25 nations - 20


@pytest.mark.skipif(not os.path.isdir(_TESTDATA), reason="reference artifacts absent")
def test_contains_function_compound_signature(spark):
    """function_test.rs contains_function_test, executed: the Isthmus
    artifact filters nation.b with contains:str_str and projects it as
    n_name — scalar functions resolve through the engine registry."""
    from arrow_datafusion_spark.plans.substrait import consume_plan_file

    ctx = _ctx(spark)
    rows = [(1, "ASIA", 1, 1, 1, 1), (2, "INDIA", 2, 2, 2, 2),
            (3, "GEORGIA", 3, 3, 3, 3), (4, "PERU", 4, 4, 4, 4)]
    ctx.register_table(
        "nation",
        ctx.spark.createDataFrame(rows, "a int, b string, c int, d int, e int, f int"),
    )
    out = consume_plan_file(ctx, f"{_TESTDATA}/contains_plan.substrait.json")
    assert out.columns == ["n_name"]
    assert sorted(r[0] for r in out.collect()) == ["ASIA", "GEORGIA", "INDIA"]


def test_in_predicate_subquery_filters_as_semi_join(spark, sf_dir):
    """Expression.Subquery InPredicate (consumer.rs:1235): a [NOT] IN
    subquery filter lowers to the semi/anti join DataFusion's own
    optimizer would decorrelate it to."""
    from arrow_datafusion_spark.plans.substrait import consume_plan
    from arrow_datafusion_spark.queries.substrait_suite import _fn, _sel

    ctx = _ctx(spark)
    for t in ("nation", "region"):
        ctx.register_table(t, ctx.spark.read.parquet(f"{sf_dir}/{t}.parquet"))

    def plan(negated):
        haystack = {
            "project": {
                "expressions": [_sel(0)],  # r_regionkey
                "input": {"filter": {
                    "condition": _fn(0, _sel(1), {"literal": {"string": "ASIA"}}),
                    "input": {"read": {"namedTable": {"names": ["region"]}}},
                }},
            },
        }
        in_pred = {"subquery": {"inPredicate": {
            "needles": [_sel(2)],  # n_regionkey
            "haystack": haystack,
        }}}
        cond = in_pred if not negated else {
            "scalarFunction": {
                "functionReference": 1,
                "arguments": [{"value": in_pred}],
            }
        }
        return {
            "extensions": [
                {"extensionFunction": {"functionAnchor": 0, "name": "equal:any_any"}},
                {"extensionFunction": {"functionAnchor": 1, "name": "not:bool"}},
            ],
            "relations": [{
                "root": {
                    "names": ["n_name"],
                    "input": {"project": {
                        "expressions": [_sel(1)],
                        "input": {"filter": {
                            "condition": cond,
                            "input": {"read": {
                                "namedTable": {"names": ["nation"]}}},
                        }},
                    }},
                },
            }],
        }

    sql = (
        "SELECT n_name FROM {t}nation WHERE n_regionkey {op} "
        "(SELECT r_regionkey FROM {t}region WHERE r_name = 'ASIA')"
    )
    for negated, op in ((False, "IN"), (True, "NOT IN")):
        got = sorted(r[0] for r in consume_plan(ctx, plan(negated)).collect())
        want = sorted(
            r[0]
            for r in ctx.spark.sql(
                sql.format(t="", op=op)
            ).collect()
        )
        assert got == want and got, (negated, got)
