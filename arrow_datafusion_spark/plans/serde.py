"""Logical-plan interchange: a JSON wire format executed against the engine —
the Spark-first analog of datafusion-proto's plan round-trip
(/root/reference/datafusion/proto/src/logical_plan/mod.rs: to/from-proto for
scan, projection, filter, aggregate, join, sort, limit, union, values).

A client serializes a logical plan as a JSON tree of operator nodes;
``run_json_plan`` deserializes it onto the DataFrame API so Catalyst plans
and executes it — the same division of labor as the reference, where a
deserialized plan re-enters the normal optimizer. Expressions travel as SQL
strings (parsed by ``F.expr`` — the engine's expression front end), matching
how datafusion-proto delegates expression semantics to the engine rather
than re-defining them.

Node shapes (op → fields):
    scan        {"table": name} | {"parquet"|"csv"|"json": path}
    values      {"rows": [[...], ...], "schema": "a int, b string"}
    projection  {"input": node, "exprs": ["expr AS name", ...]}
    filter      {"input": node, "predicate": "expr"}
                | {"input": node, "in_subquery":
                   {"needle": "expr", "subquery": node, "negated": bool?}}
                  (DataFusion InSubquery; lowered to the semi/anti join
                  its RewritePredicateSubquery optimizer produces)
                | {"input": node, "exists_subquery":
                   {"subquery": node, "negated": bool?}}
                  (uncorrelated [NOT] EXISTS — the semi/anti join on a
                  constant-true condition; correlated EXISTS is what the
                  reference's optimizer decorrelates BEFORE its producer
                  runs, so this surface carries only the decorrelated form)
                | {"input": node, "scalar_subquery":
                   {"subquery": node, "predicate": "expr with __scalar__"}}
                  (uncorrelated scalar subquery: the one-row subquery is
                  broadcast-cross-joined and `__scalar__` in the predicate
                  binds to its single column — DataFusion's
                  ScalarSubqueryToJoin lowering, fully distributed)
    aggregate   {"input": node, "group_by": [...], "aggs": ["agg AS name", ...]}
    join        {"left": node, "right": node, "on": "cond", "how": "inner"}
    sort        {"input": node, "by": ["col DESC", ...]}
    limit       {"input": node, "n": int, "offset": int?}
    union       {"inputs": [node, ...], "distinct": bool?}
    intersect   {"inputs": [node, ...], "all": bool?}
    except      {"inputs": [node, ...], "all": bool?}
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_json_plan(ctx, plan: dict | str) -> DataFrame:
    """Execute a JSON logical plan against a SessionContext's catalog."""
    if isinstance(plan, str):
        plan = json.loads(plan)
    return _node(ctx, plan)


def scalar_subquery_one_row(sub: DataFrame, name: str) -> DataFrame:
    """Shape a scalar subquery onto the reference's one-row contract
    (optimizer/src/scalar_subquery_to_join + physical eval: 'more than one
    row returned by a subquery used as an expression' — DataFusion raises;
    an EMPTY subquery binds NULL, not zero rows). A global aggregate always
    yields exactly one row, so the cross join below can never fan out or
    drop rows; the row-count guard rides the projection (inside the value
    expression, so column pruning can't discard it) and raises lazily at
    execution, exactly like the reference's runtime check."""
    if len(sub.columns) != 1:
        raise ValueError("scalar subquery must produce exactly one column")
    agg = sub.toDF("__v__").agg(
        F.first("__v__").alias("__v__"),
        F.count(F.lit(1)).alias("__n__"),
    )
    guard = F.assert_true(
        F.col("__n__") <= 1,
        F.lit("more than one row returned by a subquery used as an expression"),
    )
    return agg.select(
        F.when(guard.isNull(), F.col("__v__")).alias(name)
    )


def _node(ctx, n: dict) -> DataFrame:
    op = n["op"]
    if op == "scan":
        if "table" in n:
            return ctx.table(n["table"])
        if "parquet" in n:
            return ctx.read_parquet(n["parquet"])
        if "csv" in n:
            return ctx.read_csv(n["csv"])
        if "json" in n:
            return ctx.read_json(n["json"])
        raise ValueError(f"scan needs table/parquet/csv/json: {n!r}")
    if op == "values":
        return ctx.spark.createDataFrame(
            [tuple(r) for r in n["rows"]], n["schema"]
        )
    if op == "projection":
        return _node(ctx, n["input"]).selectExpr(*n["exprs"])
    if op == "filter":
        df = _node(ctx, n["input"])
        if "in_subquery" in n:
            ins = n["in_subquery"]
            hay = _node(ctx, ins["subquery"])
            how = "left_anti" if ins.get("negated") else "left_semi"
            # bind a plain-column needle to the PROBE side explicitly:
            # `x IN (SELECT x FROM u)` puts the same name on both join
            # inputs, and a bare F.expr would be AMBIGUOUS_REFERENCE
            import re as _re

            needle = ins["needle"]
            ncol = (
                df[needle]
                if _re.fullmatch(r"[A-Za-z_]\w*", needle)
                else F.expr(needle)
            )
            return df.join(hay, ncol == hay[hay.columns[0]], how)
        if "exists_subquery" in n:
            ex = n["exists_subquery"]
            sub = _node(ctx, ex["subquery"])
            how = "left_anti" if ex.get("negated") else "left_semi"
            # uncorrelated EXISTS: keep-all-or-none — the semi/anti join
            # on a constant-true condition (Catalyst folds the empty/
            # non-empty probe into the same gate the reference's
            # decorrelation produces)
            return df.join(sub, F.lit(True), how)
        if "scalar_subquery" in n:
            ss = n["scalar_subquery"]
            sub = _node(ctx, ss["subquery"])
            one = F.broadcast(scalar_subquery_one_row(sub, "__scalar__"))
            # one-row broadcast cross join (ScalarSubqueryToJoin): stays
            # distributed — no driver-side collect of the scalar
            return (
                df.crossJoin(one)
                .filter(F.expr(ss["predicate"]))
                .select(*df.columns)
            )
        return df.filter(F.expr(n["predicate"]))
    if op == "aggregate":
        df = _node(ctx, n["input"])
        aggs = [F.expr(a) for a in n["aggs"]]
        if n.get("group_by"):
            return df.groupBy(*[F.expr(g) for g in n["group_by"]]).agg(*aggs)
        return df.agg(*aggs)
    if op == "join":
        left, right = _node(ctx, n["left"]), _node(ctx, n["right"])
        how = n.get("how", "inner")
        if "on" in n:
            return left.join(right, F.expr(n["on"]), how)
        return left.join(right, n.get("using", []), how)
    if op == "sort":
        df = _node(ctx, n["input"])
        return df.orderBy(*[_sort_col(s) for s in n["by"]])
    if op == "limit":
        df = _node(ctx, n["input"])
        if n.get("offset"):
            df = df.offset(int(n["offset"]))
        return df.limit(int(n["n"]))
    if op == "union":
        dfs = [_node(ctx, i) for i in n["inputs"]]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionAll(d)
        return out.distinct() if n.get("distinct") else out
    if op in ("intersect", "except"):
        dfs = [_node(ctx, i) for i in n["inputs"]]
        out = dfs[0]
        for d in dfs[1:]:
            if op == "intersect":
                out = out.intersectAll(d) if n.get("all") else out.intersect(d)
            else:
                out = out.exceptAll(d) if n.get("all") else out.subtract(d)
        return out
    raise ValueError(f"unknown plan op {op!r}")


def _sort_col(spec: str):
    parts = spec.rsplit(None, 1)
    if len(parts) == 2 and parts[1].upper() in ("ASC", "DESC"):
        col = F.expr(parts[0])
        return col.desc() if parts[1].upper() == "DESC" else col.asc()
    return F.expr(spec)
