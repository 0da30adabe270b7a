"""Substrait PRODUCER + binary wire tests.

Mirrors the reference's producer round-trip suite
(datafusion/substrait/tests/cases/roundtrip_logical_plan.rs: each plan is
produced to Substrait, consumed back, and the round-tripped plan must
execute identically) and serializer.rs (binary encode/decode). Two
directions beyond the r8 consumer:

- ``produce_plan`` lowers the engine's logical-plan interchange tree
  (plans/serde.py) to a substrait Plan; every produced plan is executed
  three ways — direct, produced->consumed (JSON), and
  produced->encoded->decoded->consumed (binary wire) — and all three must
  return identical rows AND column names.
- the binary codec is additionally validated against the reference's own
  third-party Isthmus artifacts: encode(decode) must preserve execution
  behavior on plans THIS repo's producer did not create.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_datafusion_spark.plans.serde import run_json_plan  # noqa: E402
from arrow_datafusion_spark.plans.substrait import consume_plan  # noqa: E402
from arrow_datafusion_spark.plans.substrait_producer import produce_plan  # noqa: E402
from arrow_datafusion_spark.plans.substrait_wire import (  # noqa: E402
    consume_plan_bytes,
    plan_from_bytes,
    plan_to_bytes,
)

_TESTDATA = "/root/reference/datafusion/substrait/tests/testdata"


def _ctx(spark, sf_dir, *tables):
    """Hermetic sub-session context with sf fixture tables registered."""
    from arrow_datafusion_spark.context import SessionContext

    ctx = SessionContext(spark.newSession())
    for t in tables:
        ctx.register_table(
            t, ctx.spark.read.parquet(f"{sf_dir}/{t}.parquet")
        )
    return ctx


def _assert_roundtrip(ctx, plan: dict) -> None:
    direct = run_json_plan(ctx, plan)
    want_cols, want = direct.columns, sorted(map(tuple, direct.collect()))
    sp = produce_plan(ctx, plan)
    via_json = consume_plan(ctx, sp)
    assert via_json.columns == want_cols
    assert sorted(map(tuple, via_json.collect())) == want
    via_wire = consume_plan_bytes(ctx, plan_to_bytes(sp))
    assert via_wire.columns == want_cols
    assert sorted(map(tuple, via_wire.collect())) == want


# -- producer round-trips (roundtrip_logical_plan.rs analog) -----------------


def test_roundtrip_filter_project_scalar_exprs(spark, sf_dir):
    ctx = _ctx(spark, sf_dir, "lineitem")
    _assert_roundtrip(ctx, {
        "op": "projection",
        "exprs": [
            "l_orderkey",
            "l_extendedprice * (1 - l_discount) AS rev",
            "CAST(l_quantity AS INT) AS qty",
            "CASE WHEN l_discount > 0.05 THEN 'hi' ELSE 'lo' END AS band",
            "l_linenumber IN (1, 2) AS first_two",
            "upper(l_returnflag) AS rf",
        ],
        "input": {
            "op": "filter",
            "predicate": (
                "l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
                "AND NOT l_quantity IS NULL AND -l_discount <= 0.0"
            ),
            "input": {"op": "scan", "table": "lineitem"},
        },
    })


def test_roundtrip_grouped_aggregate(spark, sf_dir):
    ctx = _ctx(spark, sf_dir, "lineitem")
    _assert_roundtrip(ctx, {
        "op": "sort",
        "by": ["sum_rev DESC", "l_returnflag"],
        "input": {
            "op": "aggregate",
            "group_by": ["l_returnflag", "l_linestatus"],
            "aggs": [
                "sum(l_extendedprice * (1 - l_discount)) AS sum_rev",
                "count(1) AS n",
                "avg(l_quantity) AS avg_qty",
                "min(l_shipdate) AS first_ship",
                "max(l_shipdate) AS last_ship",
                "count(DISTINCT l_suppkey) AS suppliers",
            ],
            "input": {"op": "scan", "table": "lineitem"},
        },
    })


def test_roundtrip_global_aggregate(spark, sf_dir):
    ctx = _ctx(spark, sf_dir, "orders")
    _assert_roundtrip(ctx, {
        "op": "aggregate",
        "group_by": [],
        "aggs": ["count(1) AS n", "sum(o_totalprice) AS total"],
        "input": {"op": "scan", "table": "orders"},
    })


@pytest.mark.parametrize("how", ["inner", "left", "left_semi"])
def test_roundtrip_join_types(spark, sf_dir, how):
    ctx = _ctx(spark, sf_dir, "nation", "region")
    _assert_roundtrip(ctx, {
        "op": "join",
        "how": how,
        "on": "n_regionkey = r_regionkey",
        "left": {"op": "scan", "table": "nation"},
        "right": {
            "op": "filter",
            "predicate": "r_name <> 'ASIA'",
            "input": {"op": "scan", "table": "region"},
        },
    })


def test_roundtrip_using_join(spark, sf_dir):
    ctx = _ctx(spark, sf_dir, "nation")
    plan = {
        "op": "join",
        "how": "inner",
        "using": ["n_regionkey"],
        "left": {"op": "scan", "table": "nation"},
        "right": {"op": "scan", "table": "nation"},
    }
    # serde's using-join COALESCES the key column; substrait JoinRel keeps
    # both sides — compare row multiset on the produced forms only
    sp = produce_plan(ctx, plan)
    a = sorted(map(tuple, consume_plan(ctx, sp).collect()))
    b = sorted(map(tuple, consume_plan_bytes(ctx, plan_to_bytes(sp)).collect()))
    assert a == b and len(a) == 125  # 25 nations, 5 per region


def test_roundtrip_sort_limit_offset(spark, sf_dir):
    ctx = _ctx(spark, sf_dir, "customer")
    _assert_roundtrip(ctx, {
        "op": "limit",
        "n": 7,
        "offset": 3,
        "input": {
            "op": "sort",
            "by": ["c_acctbal DESC", "c_custkey"],
            "input": {"op": "scan", "table": "customer"},
        },
    })


def test_roundtrip_union_all_and_values(spark, sf_dir):
    ctx = _ctx(spark, sf_dir, "region")
    _assert_roundtrip(ctx, {
        "op": "union",
        "inputs": [
            {
                "op": "projection",
                "exprs": ["r_regionkey AS k", "r_name AS name"],
                "input": {"op": "scan", "table": "region"},
            },
            {
                "op": "values",
                "rows": [[99, "ATLANTIS"], [100, "LEMURIA"]],
                "schema": "k bigint, name string",
            },
        ],
    })


def test_roundtrip_window_functions(spark, sf_dir):
    """Expression.WindowFunction emission (producer.rs WindowFunction
    arm): ranking (frameless), a running aggregate (UnspecifiedFrame with
    ORDER BY — both engines' RANGE unbounded..current default, emitted
    explicitly), and an explicit ROWS frame."""
    ctx = _ctx(spark, sf_dir, "orders")
    _assert_roundtrip(ctx, {
        "op": "projection",
        "exprs": [
            "o_custkey",
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) AS rn",
            "sum(o_totalprice) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) AS running",
            "sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY "
            "o_orderdate ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS w2",
        ],
        "input": {"op": "scan", "table": "orders"},
    })


def test_producer_rejects_unsupported_constructs(spark, sf_dir):
    ctx = _ctx(spark, sf_dir, "region")
    scan = {"op": "scan", "table": "region"}
    with pytest.raises(NotImplementedError, match="bare aggregate"):
        produce_plan(ctx, {
            "op": "aggregate", "group_by": [],
            "aggs": ["sum(r_regionkey) + 1 AS s"], "input": scan,
        })
    # a function Spark resolves but the engine registry does not carry
    # must fail at PRODUCE time, not surface as an anchor no consumer
    # can resolve
    with pytest.raises(NotImplementedError, match="unregistered function"):
        produce_plan(ctx, {
            "op": "projection", "exprs": ["xxhash64(r_name) AS x"],
            "input": scan,
        })


def test_roundtrip_in_subquery_filter(spark, sf_dir):
    # Expression.Subquery InPredicate, both directions (consumer.rs
    # subquery arms; producer emission added r10): nations in a region
    # picked by subquery, then the NOT form
    ctx = _ctx(spark, sf_dir, "nation", "region")
    sub = {
        "op": "projection",
        "exprs": ["r_regionkey"],
        "input": {
            "op": "filter",
            "predicate": "r_name = 'ASIA'",
            "input": {"op": "scan", "table": "region"},
        },
    }
    for negated in (False, True):
        _assert_roundtrip(ctx, {
            "op": "projection",
            "exprs": ["n_nationkey", "n_name"],
            "input": {
                "op": "filter",
                "in_subquery": {
                    "needle": "n_regionkey",
                    "subquery": sub,
                    "negated": negated,
                },
                "input": {"op": "scan", "table": "nation"},
            },
        })


def test_roundtrip_in_subquery_same_column_name(spark, sf_dir):
    # `x IN (SELECT x FROM u)` — the SAME column name on both join sides
    # (the common IN shape). serde must bind the needle to the probe side
    # explicitly; a bare F.expr needle is AMBIGUOUS_REFERENCE here.
    ctx = _ctx(spark, sf_dir, "nation", "region")
    sub = {
        "op": "projection",
        "exprs": ["n_regionkey"],
        "input": {
            "op": "filter",
            "predicate": "n_nationkey < 5",
            "input": {"op": "scan", "table": "nation"},
        },
    }
    for negated in (False, True):
        _assert_roundtrip(ctx, {
            "op": "projection",
            "exprs": ["n_nationkey", "n_name"],
            "input": {
                "op": "filter",
                "in_subquery": {
                    "needle": "n_regionkey",  # same name as the haystack
                    "subquery": sub,
                    "negated": negated,
                },
                "input": {"op": "scan", "table": "nation"},
            },
        })


def test_roundtrip_union_distinct_and_distinct_aggregates(spark, sf_dir):
    ctx = _ctx(spark, sf_dir, "nation", "lineitem")
    na = {"op": "scan", "table": "nation"}
    proj = {"op": "projection", "exprs": ["n_regionkey"], "input": na}
    _assert_roundtrip(
        ctx, {"op": "union", "distinct": True, "inputs": [proj, proj]}
    )
    _assert_roundtrip(ctx, {
        "op": "aggregate",
        "group_by": ["l_returnflag"],
        "aggs": [
            "count(DISTINCT l_linenumber) AS dln",
            "sum(DISTINCT l_linenumber) AS sln",
            "avg(DISTINCT CAST(l_linenumber AS DOUBLE)) AS aln",
            "min(DISTINCT l_linenumber) AS mln",
        ],
        "input": {"op": "scan", "table": "lineitem"},
    })


def test_producer_consumer_closure_battery(spark, sf_dir):
    """CLOSURE PROPERTY (VERDICT r9 #5): every construct the producer can
    emit, the consumer (JSON and wire) must read back to an identically-
    executing plan. One plan per emittable form — every _BINOP_CLASS /
    _UNARY_CLASS arm, Cast/Case/In/literal expressions, every aggregate
    in _AGG_NAMES (ALL + DISTINCT), every join type, sort directions,
    fetch with offset, both set ops, VirtualTable, window functions, and
    the InPredicate subquery. A new producer arm without a consumer
    reader fails HERE, turning the subset boundary into a checked
    invariant."""
    ctx = _ctx(spark, sf_dir, "nation", "region", "supplier")
    na = {"op": "scan", "table": "nation"}
    re_ = {"op": "scan", "table": "region"}
    plans = [
        # every binary operator arm
        {"op": "projection", "exprs": [
            "n_nationkey + 1 AS a", "n_nationkey - 1 AS b",
            "n_nationkey * 2 AS c", "CAST(n_nationkey AS DOUBLE) / 2 AS d",
            "n_nationkey % 3 AS e", "n_nationkey = 7 AS f",
            "n_nationkey < 7 AS g", "n_nationkey <= 7 AS h",
            "n_nationkey > 7 AS i", "n_nationkey >= 7 AS j",
            "n_name LIKE 'A%' AS k", "n_nationkey & 3 AS l",
            "n_nationkey | 3 AS m", "n_nationkey ^ 3 AS n",
        ], "input": na},
        # every unary arm + Cast/Case/In/literals
        {"op": "projection", "exprs": [
            "NOT (n_nationkey = 0) AS a", "-n_nationkey AS b",
            "n_name IS NULL AS c", "n_name IS NOT NULL AS d",
            "CAST(n_nationkey AS STRING) AS e",
            "CASE WHEN n_nationkey > 10 THEN 'hi' ELSE 'lo' END AS f",
            "n_nationkey IN (1, 3, 5) AS g",
            "1.5 AS h", "'x' AS i", "true AS j", "CAST(NULL AS INT) AS k",
        ], "input": na},
        # every aggregate, ALL + DISTINCT invocations
        {"op": "aggregate", "group_by": ["n_regionkey"], "aggs": [
            "sum(n_nationkey) AS s", "min(n_nationkey) AS mn",
            "max(n_nationkey) AS mx",
            "avg(CAST(n_nationkey AS DOUBLE)) AS av",
            "count(n_nationkey) AS c", "count(*) AS cs",
            "any_value(n_nationkey) AS anyv",
            "count(DISTINCT n_nationkey) AS dc",
            "sum(DISTINCT n_nationkey) AS ds",
            "avg(DISTINCT CAST(n_nationkey AS DOUBLE)) AS da",
            "min(DISTINCT n_nationkey) AS dmn",
            "max(DISTINCT n_nationkey) AS dmx",
        ], "input": na},
        # FILTERed measures (round 11 — Measure.filter; the consumer read
        # it since r8, now the producer emits it)
        {"op": "aggregate", "group_by": ["n_regionkey"], "aggs": [
            "count(1) AS all_c",
            "sum(n_nationkey) FILTER (WHERE n_nationkey > 10) AS s10",
            "count(n_name) FILTER (WHERE n_nationkey % 2 = 0) AS even_c",
        ], "input": na},
        # sorts (both directions), fetch with offset
        {"op": "limit", "n": 5, "offset": 2, "input": {
            "op": "sort", "by": ["n_regionkey DESC", "n_nationkey ASC"],
            "input": na}},
        # set ops
        {"op": "union", "inputs": [re_, re_]},
        {"op": "union", "distinct": True, "inputs": [re_, re_]},
        # VirtualTable
        {"op": "values", "rows": [[1, "a"], [2, "b"]],
         "schema": "id int, s string"},
        # window functions over a projection
        {"op": "projection", "exprs": [
            "n_nationkey",
            "row_number() OVER (PARTITION BY n_regionkey "
            "ORDER BY n_nationkey) AS rn",
            "sum(n_nationkey) OVER (PARTITION BY n_regionkey "
            "ORDER BY n_nationkey ROWS BETWEEN 1 PRECEDING AND "
            "CURRENT ROW) AS rsum",
        ], "input": na},
        # InPredicate subquery (negated form covered in its own test)
        {"op": "filter", "in_subquery": {
            "needle": "n_regionkey",
            "subquery": {"op": "projection", "exprs": ["r_regionkey"],
                         "input": re_},
        }, "input": na},
        # INTERSECT / EXCEPT set rels, set and bag semantics (round 11)
        {"op": "intersect", "inputs": [
            {"op": "projection", "exprs": ["n_regionkey"], "input": na},
            {"op": "projection", "exprs": ["r_regionkey"], "input": re_}]},
        {"op": "intersect", "all": True, "inputs": [
            {"op": "projection", "exprs": ["n_regionkey"], "input": na},
            {"op": "projection", "exprs": ["n_regionkey"], "input": na}]},
        {"op": "except", "inputs": [
            {"op": "projection", "exprs": ["n_regionkey"], "input": na},
            {"op": "projection", "exprs": ["r_regionkey"], "input": re_}]},
        {"op": "except", "all": True, "inputs": [
            {"op": "projection", "exprs": ["n_regionkey"], "input": na},
            {"op": "projection", "exprs": ["n_regionkey"],
             "input": {"op": "filter", "predicate": "n_nationkey < 5",
                       "input": na}}]},
        # SetPredicate EXISTS / NOT EXISTS (uncorrelated, round 11)
        {"op": "filter", "exists_subquery": {
            "subquery": {"op": "filter", "predicate": "r_regionkey > 3",
                         "input": re_},
        }, "input": na},
        {"op": "filter", "exists_subquery": {
            "subquery": {"op": "filter", "predicate": "r_regionkey > 99",
                         "input": re_}, "negated": True,
        }, "input": na},
        # Scalar subquery binding inside a comparison (round 11)
        {"op": "filter", "scalar_subquery": {
            "subquery": {"op": "aggregate", "group_by": [],
                         "aggs": ["avg(CAST(n_nationkey AS DOUBLE)) AS m"],
                         "input": na},
            "predicate": "CAST(n_nationkey AS DOUBLE) > __scalar__",
        }, "input": na},
        # ReadRel LocalFiles: single-file parquet scan (round 11) — the
        # consumer resolves the file's basename as a table reference, so
        # the battery registers the fixture under that name below
        {"op": "sort", "by": ["r_regionkey"], "input": {
            "op": "projection", "exprs": ["r_regionkey", "r_name"],
            "input": {"op": "scan", "parquet": f"{sf_dir}/region.parquet"}}},
    ]
    ctx.register_table(
        "region.parquet", ctx.spark.read.parquet(f"{sf_dir}/region.parquet")
    )
    # every join type the producer maps
    for how in ("inner", "left", "right", "full", "semi", "anti"):
        proj = ["n_name"] if how in ("semi", "anti") else ["n_name", "r_name"]
        plans.append({
            "op": "projection", "exprs": proj,
            "input": {"op": "join", "how": how,
                      "on": "n_regionkey = r_regionkey",
                      "left": na, "right": re_},
        })
    for p in plans:
        _assert_roundtrip(ctx, p)


def test_serialize_deserialize_file(spark, sf_dir, tmp_path):
    """serializer.rs parity: serialize writes Plan bytes and refuses to
    overwrite (File::create_new semantics); deserialize executes them."""
    from arrow_datafusion_spark.plans.substrait_wire import (
        deserialize,
        serialize,
    )

    ctx = _ctx(spark, sf_dir, "region")
    plan = {
        "op": "sort", "by": ["r_regionkey"],
        "input": {"op": "scan", "table": "region"},
    }
    target = str(tmp_path / "plan.substrait")
    serialize(ctx, plan, target)
    got = [tuple(r) for r in deserialize(ctx, target).collect()]
    want = [tuple(r) for r in run_json_plan(ctx, plan).collect()]
    assert got == want and len(got) == 5
    with pytest.raises(FileExistsError):
        serialize(ctx, plan, target)


# -- binary wire (serializer.rs analog) ---------------------------------------


def test_wire_rejects_unknown_fields_loudly():
    with pytest.raises(NotImplementedError, match="not in table"):
        plan_to_bytes({"relations": [], "futureField": 1})
    # unknown tag on decode: field 19 is not a Plan member
    bogus = bytes([19 << 3, 1])
    with pytest.raises(NotImplementedError, match="unknown field"):
        plan_from_bytes(bogus)


@pytest.mark.skipif(not os.path.isdir(_TESTDATA), reason="reference artifacts absent")
def test_wire_preserves_isthmus_tpch_q1_execution(spark):
    """encode(decode) on the reference's third-party Isthmus artifact must
    execute identically to the original JSON — the binary wire carries
    plans this repo's producer did not create."""
    from arrow_datafusion_spark.context import SessionContext
    from arrow_datafusion_spark.queries.substrait_suite import (
        _Q1_PLAN,
        _ensure_fixture,
    )

    ctx = SessionContext(spark.newSession())
    ctx.register_table(
        "FILENAME_PLACEHOLDER_0", ctx.spark.read.parquet(_ensure_fixture())
    )
    plan = json.load(open(_Q1_PLAN))
    want = sorted(map(tuple, consume_plan(ctx, plan).collect()))
    got = sorted(
        map(tuple, consume_plan_bytes(ctx, plan_to_bytes(plan)).collect())
    )
    assert got == want and len(got) == 4


@pytest.mark.skipif(not os.path.isdir(_TESTDATA), reason="reference artifacts absent")
@pytest.mark.parametrize("name,cols", [
    ("test_plans/select_not_bool.substrait.json", ["EXPR$0"]),
    ("test_plans/select_window.substrait.json", ["LEAD_EXPR"]),
    ("test_plans/non_nullable_lists.substrait.json", ["col"]),
])
def test_wire_preserves_test_plan_execution(spark, name, cols):
    from arrow_datafusion_spark.context import SessionContext

    ctx = SessionContext(spark.newSession())
    if "window" in name:
        rows = [(1, 1, 1), (2, 1, 2), (3, 1, 3), (10, 2, 1), (20, 2, 2)]
        ctx.register_table(
            "DATA", ctx.spark.createDataFrame(rows, "d int, part int, ord int")
        )
    else:
        ctx.register_table(
            "DATA",
            ctx.spark.createDataFrame([(True,), (False,), (None,)], "d boolean"),
        )
    plan = json.load(open(f"{_TESTDATA}/{name}"))

    def key(r):
        t = tuple(None if v is None else v for v in r)
        return tuple((v is None, [] if v is None else v if not isinstance(v, list) else list(v)) for v in t)

    a = consume_plan(ctx, plan)
    b = consume_plan_bytes(ctx, plan_to_bytes(plan))
    assert a.columns == b.columns == cols
    ra = [tuple(x if not isinstance(x, list) else tuple(x) for x in r) for r in a.collect()]
    rb = [tuple(x if not isinstance(x, list) else tuple(x) for x in r) for r in b.collect()]
    assert sorted(ra, key=repr) == sorted(rb, key=repr)


@pytest.mark.skipif(not os.path.isdir(_TESTDATA), reason="reference artifacts absent")
def test_wire_preserves_contains_plan_execution(spark):
    from arrow_datafusion_spark.context import SessionContext

    ctx = SessionContext(spark.newSession())
    rows = [(1, "ASIA", 1, 1, 1, 1), (2, "INDIA", 2, 2, 2, 2),
            (3, "GEORGIA", 3, 3, 3, 3), (4, "PERU", 4, 4, 4, 4)]
    ctx.register_table(
        "nation",
        ctx.spark.createDataFrame(rows, "a int, b string, c int, d int, e int, f int"),
    )
    plan = json.load(open(f"{_TESTDATA}/contains_plan.substrait.json"))
    want = sorted(r[0] for r in consume_plan(ctx, plan).collect())
    got = sorted(
        r[0] for r in consume_plan_bytes(ctx, plan_to_bytes(plan)).collect()
    )
    assert got == want == ["ASIA", "GEORGIA", "INDIA"]


def test_roundtrip_directory_parquet_scan(spark):
    """Round 12: a DIRECTORY parquet scan emits one LocalFiles item per
    file (producer.rs ListingTable LocalFiles arm) and the consumer reads
    the uris directly — full produce → binary wire → consume → execute."""
    from arrow_datafusion_spark.context import SessionContext
    from arrow_datafusion_spark.plans.substrait_producer import produce_plan
    from arrow_datafusion_spark.plans.substrait_wire import (
        consume_plan_bytes,
        plan_to_bytes,
    )
    from arrow_datafusion_spark.queries.substrait_suite import (
        _DIR_SCAN_PLAN,
        _ensure_dir_fixture,
    )

    from pyspark.sql import functions as F

    d = _ensure_dir_fixture()
    ctx = SessionContext(spark)
    plan = produce_plan(ctx, _DIR_SCAN_PLAN)
    # the ReadRel must carry BOTH part files as distinct uri items
    import json

    items = json.loads(json.dumps(plan)) if isinstance(plan, dict) else plan
    text = json.dumps(plan)
    assert text.count('"uriFile"') == 2, text[:500]
    assert "part0.parquet" in text and "part1.parquet" in text
    got = consume_plan_bytes(ctx, plan_to_bytes(plan)).collect()
    exp = (
        spark.read.parquet(d)
        .filter("n_nationkey <> 6")
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_nationkey").alias("key_sum"))
        .orderBy("n_regionkey")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_producer_empty_directory_scan_raises(spark, tmp_path):
    from arrow_datafusion_spark.context import SessionContext
    from arrow_datafusion_spark.plans.substrait_producer import produce_plan

    ctx = SessionContext(spark)
    # an empty directory must fail LOUDLY, not emit an empty listing —
    # but serde's own read fails first either way; assert a clear error
    with pytest.raises(Exception):
        produce_plan(
            ctx, {"op": "scan", "parquet": str(tmp_path / "empty_dir")}
        )
