"""Substrait logical-plan CONSUMER (protobuf-JSON encoding) — the
cross-engine interchange surface of the reference
(/root/reference/datafusion/substrait/src/logical_plan/consumer.rs:
``from_substrait_plan`` / ``from_substrait_rel`` / ``from_substrait_rex``).

Accepts a ``substrait.proto.Plan`` in its protobuf JSON form — the encoding
the reference's own third-party artifacts use
(tests/testdata/tpch_substrait_plans/query_1.json, produced by
substrait-java's Isthmus; tests/testdata/test_plans/*.substrait.json;
consumer_integration.rs / logical_plans.rs read them with ``serde_json``)
— and executes it by building PySpark DataFrames, so Catalyst plans and
runs the query exactly as for any other entry point. No protobuf runtime
is required for the JSON form (this sandbox has none, and DuckDB's
substrait extension is not installable offline — documented in
tests/test_substrait.py); the binary wire form is out of scope until a
binary producer exists to differential-test against.

Key lookup is camelCase/snake_case tolerant: protobuf JSON permits both
and the reference artifacts MIX them (query_1.json has ``baseSchema`` and
``local_files`` in the same file).

v39 parity notes (each mirrors a consumer.rs decision, cited inline):
- ProjectRel output = ITS EXPRESSIONS ONLY and ``RelCommon.emit`` is
  ignored (consumer.rs:401-428 has no emit handling). The Isthmus-era
  artifacts assume exactly this — query_1.json's aggregate references
  project output field 0 as the first *expression*.
- FetchRel ``count`` of -1 / u64::MAX means "no limit" (consumer.rs:453).
- JoinRel passes the whole condition to the join (consumer.rs splits
  equi / non-equi for join_detailed; Spark's planner extracts equi keys
  from the condition itself — same semantics, engine-appropriate split).
- Scalar functions resolve: engine function registry first, then binary
  operators (consumer.rs name_to_op:91), then builtin expression forms
  (not/like/is_null/..., consumer.rs BuiltinExprBuilder:1906).
"""

from __future__ import annotations

import base64
import datetime
import json
import re
from decimal import Decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["consume_plan", "consume_plan_file"]


def _snake(name: str) -> str:
    return re.sub(r"([A-Z])", lambda m: "_" + m.group(1).lower(), name)


def _camel(name: str) -> str:
    return re.sub(r"_([a-z])", lambda m: m.group(1).upper(), name)


def _get(d: dict, name: str, default=None):
    """camelCase / snake_case tolerant field access (protobuf JSON allows
    either; the reference artifacts mix them)."""
    if name in d:
        return d[name]
    alt = _camel(name) if "_" in name else _snake(name)
    return d.get(alt, default)


# -- type mapping (substrait Type kind → Spark DDL type) ---------------------
# consumer.rs from_substrait_type + SURVEY §1.2 policy (u* widen, Time→ns,
# ns timestamps truncate to µs)
_TYPE_MAP = {
    "bool": "boolean",
    "i8": "tinyint",
    "i16": "smallint",
    "i32": "int",
    "i64": "bigint",
    "fp32": "float",
    "fp64": "double",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "time": "bigint",  # §1.2: Time64 → ns-since-midnight BIGINT
    "timestamp": "timestamp",
    "timestamp_tz": "timestamp",
    "uuid": "string",
    "interval_year": "interval year to month",
    "interval_day": "interval day to second",
}


def _type_to_ddl(t: dict) -> str:
    kind = next(iter(t))
    body = t[kind]
    k = _snake(kind)
    if k == "decimal":
        return f"decimal({_get(body, 'precision', 38)},{_get(body, 'scale', 0)})"
    if k in ("fixed_char", "varchar"):
        return "string"
    if k == "fixed_binary":
        return "binary"
    if k == "list":
        return f"array<{_type_to_ddl(_get(body, 'type'))}>"
    if k == "struct":
        inner = ", ".join(
            f"c{i}: {_type_to_ddl(tt)}" for i, tt in enumerate(_get(body, "types", []))
        )
        return f"struct<{inner}>"
    if k in _TYPE_MAP:
        return _TYPE_MAP[k]
    raise NotImplementedError(f"substrait type not supported: {kind}")


# -- literals ----------------------------------------------------------------


def _literal(lit: dict) -> Column:
    """consumer.rs from_substrait_literal_without_names:1543."""
    for key, val in lit.items():
        k = _snake(key)
        if k in ("nullable", "type_variation_reference"):
            continue
        if k == "boolean":
            return F.lit(bool(val))
        if k in ("i8", "i16", "i32"):
            return F.lit(int(val)).cast(_TYPE_MAP[k])
        if k == "i64":
            return F.lit(int(val)).cast("bigint")
        if k == "fp32":
            return F.lit(float(val)).cast("float")
        if k == "fp64":
            return F.lit(float(val))
        if k in ("string", "fixed_char"):
            return F.lit(str(val))
        if k == "var_char":
            return F.lit(str(_get(val, "value", "")))
        if k == "binary" or k == "fixed_binary":
            return F.lit(base64.b64decode(val))
        if k == "date":  # days since epoch
            return F.lit(datetime.date(1970, 1, 1) + datetime.timedelta(days=int(val)))
        if k == "timestamp":  # µs since epoch (naive)
            return F.timestamp_micros(F.lit(int(val)))
        if k == "decimal":
            raw = base64.b64decode(_get(val, "value", ""))
            unscaled = int.from_bytes(raw, "little", signed=True)
            scale = int(_get(val, "scale", 0))
            prec = int(_get(val, "precision", 38))
            return F.lit(Decimal(unscaled).scaleb(-scale)).cast(
                f"decimal({prec},{scale})"
            )
        if k == "interval_day_to_second":
            days = int(_get(val, "days", 0))
            secs = int(_get(val, "seconds", 0))
            micros = int(_get(val, "microseconds", 0))
            return F.expr(
                f"make_dt_interval({days}, 0, 0, {secs + micros / 1e6})"
            )
        if k == "interval_year_to_month":
            years = int(_get(val, "years", 0))
            months = int(_get(val, "months", 0))
            return F.expr(f"make_ym_interval({years}, {months})")
        if k == "null":
            return F.lit(None).cast(_type_to_ddl(val))
        if k == "list":
            return F.array(*[_literal(v) for v in _get(val, "values", [])])
    raise NotImplementedError(f"substrait literal not supported: {list(lit)}")


# -- scalar function name resolution -----------------------------------------

# consumer.rs name_to_op:91 — binary operators by substrait function name
_BINARY_OPS = {
    "equal": lambda a, b: a == b,
    "not_equal": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    "mod": lambda a, b: a % b,
    "modulus": lambda a, b: a % b,
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "bitwise_and": lambda a, b: a.bitwiseAND(b),
    "bitwise_or": lambda a, b: a.bitwiseOR(b),
    "bitwise_xor": lambda a, b: a.bitwiseXOR(b),
    "str_concat": lambda a, b: F.concat(a, b),
    "concat": lambda a, b: F.concat(a, b),
}

# consumer.rs BuiltinExprBuilder:1906 — unary/expression builtins
_BUILTINS = {
    "not": lambda a: ~a,
    "negative": lambda a: -a,
    "negate": lambda a: -a,
    "is_null": lambda a: a.isNull(),
    "is_not_null": lambda a: a.isNotNull(),
    "is_true": lambda a: a == F.lit(True),
    "is_false": lambda a: a == F.lit(False),
    "is_not_true": lambda a: ~a.eqNullSafe(F.lit(True)),
    "is_not_false": lambda a: ~a.eqNullSafe(F.lit(False)),
}

_AGG_FUNCS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "count": F.count,
    "sum0": lambda c: F.coalesce(F.sum(c), F.lit(0)),
    "any_value": F.any_value,
}

_JOIN_TYPES = {
    # consumer.rs from_substrait_jointype:864
    "JOIN_TYPE_INNER": "inner",
    "JOIN_TYPE_OUTER": "full",
    "JOIN_TYPE_LEFT": "left",
    "JOIN_TYPE_RIGHT": "right",
    "JOIN_TYPE_SEMI": "left_semi",
    "JOIN_TYPE_ANTI": "left_anti",
    "JOIN_TYPE_LEFT_SEMI": "left_semi",
    "JOIN_TYPE_LEFT_ANTI": "left_anti",
    1: "inner", 2: "full", 3: "left", 4: "right", 5: "left_semi", 6: "left_anti",
}


class _Consumer:
    def __init__(self, ctx, extensions: dict[int, str]):
        self.ctx = ctx
        self.ext = extensions
        self._n = 0

    # -- relations -----------------------------------------------------------

    def _norm(self, df: DataFrame) -> DataFrame:
        """Positionally rename to node-unique names: every downstream field
        reference is by POSITION (Substrait has no column names above the
        read), and unique names keep join outputs unambiguous."""
        self._n += 1
        return df.toDF(*[f"_s{self._n}_{i}" for i in range(len(df.columns))])

    def rel(self, rel: dict) -> DataFrame:
        for kind in rel:
            k = _snake(kind)
            fn = getattr(self, f"_rel_{k}", None)
            if fn is not None:
                return fn(rel[kind])
        raise NotImplementedError(f"substrait rel not supported: {list(rel)}")

    def _rel_read(self, node: dict) -> DataFrame:
        # consumer.rs:625 — NamedTable / VirtualTable / LocalFiles
        nt = _get(node, "named_table")
        lf = _get(node, "local_files")
        vt = _get(node, "virtual_table")
        if nt is not None:
            names = _get(nt, "names", [])
            if not names:
                raise ValueError("No table name found in NamedTable")
            df = self.ctx.table(names[-1])
        elif lf is not None:
            # LocalFiles reads. When every item's uri names a real local
            # parquet file, read the listing DIRECTLY (the reference's
            # consumer builds a ListingTable over the uris — consumer.rs
            # from_substrait_rel ReadType::LocalFiles); otherwise fall
            # back to resolving a single item's BASENAME as a registered
            # table (consumer.rs:692 extract_filename — the named-table
            # convention round-trip tests rely on).
            import os as _os

            items = _get(lf, "items", [])
            uris = [
                _get(it, "uri_file") or _get(it, "uri_path") or ""
                for it in items
            ]
            paths = [
                u[len("file://"):] if u.startswith("file://") else u
                for u in uris
            ]
            if paths and all(
                p.endswith(".parquet") and _os.path.exists(p) for p in paths
            ):
                df = self.ctx.spark.read.parquet(*paths)
            elif len(items) == 1:
                name = uris[0].rstrip("/").rsplit("/", 1)[-1]
                df = self.ctx.table(name)
            else:
                raise NotImplementedError(
                    "LocalFiles read with unreadable multi-file uris"
                )
        elif vt is not None:
            schema = self._named_struct_ddl(_get(node, "base_schema", {}))
            rows = _get(vt, "values", [])
            if not rows:
                return self._norm(self.ctx.spark.createDataFrame([], schema))
            lit_rows = [
                F.struct(*[
                    _literal(f).alias(f"c{i}")
                    for i, f in enumerate(_get(r, "fields", []))
                ])
                for r in rows
            ]
            df = (
                self.ctx.spark.range(1)
                .select(F.explode(F.array(*lit_rows)).alias("_row"))
                .select("_row.*")
            )
            names = _get(_get(node, "base_schema", {}), "names", [])
            if names and len(names) == len(df.columns):
                df = df.toDF(*names)
        else:
            raise NotImplementedError(f"Unsupported ReadType: {list(node)}")
        proj = _get(node, "projection")
        if proj is not None:
            # MaskExpression.select.struct_items — consumer.rs extract_projection:246
            items = _get(_get(proj, "select", {}), "struct_items", [])
            cols = [df.columns[int(_get(it, "field", 0))] for it in items]
            df = df.select(*cols)
        return self._norm(df)

    def _rel_filter(self, node: dict) -> DataFrame:
        df = self.rel(_get(node, "input"))
        cond = _get(node, "condition")
        sub = self._as_in_predicate(cond)
        if sub is not None:
            # Expression.Subquery InPredicate (consumer.rs:1235 → DataFusion
            # InSubquery, which its optimizer decorrelates to a semi join —
            # RewritePredicateSubquery). Spark has no IN-subquery Column
            # form, so lower directly to the semi/anti join Catalyst would
            # produce anyway.
            needle, haystack, negated = sub
            hay = self.rel(haystack)
            needle_col = self.rex(needle, df)
            how = "left_anti" if negated else "left_semi"
            return self._norm(df.join(hay, needle_col == hay[hay.columns[0]], how))
        ex = self._as_set_predicate(cond)
        if ex is not None:
            # Expression.Subquery SetPredicate PREDICATE_OP_EXISTS —
            # uncorrelated [NOT] EXISTS: the semi/anti join on a
            # constant-true condition (the decorrelated form; correlated
            # EXISTS never reaches a producer in the reference either —
            # its optimizer rewrites it to joins first)
            tuples, negated = ex
            sub = self.rel(tuples)
            how = "left_anti" if negated else "left_semi"
            from pyspark.sql import functions as F

            return self._norm(df.join(sub, F.lit(True), how))
        cond, wide, n_orig = self._lower_scalar_subqueries(cond, df)
        if wide is not None:
            return self._norm(
                wide.filter(self.rex(cond, wide)).select(*wide.columns[:n_orig])
            )
        return self._norm(df.filter(self.rex(cond, df)))

    @staticmethod
    def _as_set_predicate(e: dict):
        """(tuples_rel, negated) for a [NOT] EXISTS filter condition
        (Subquery SetPredicate, predicate_op EXISTS), else None."""
        negated = False
        for key in e or {}:
            if _snake(key) == "scalar_function":
                args = _get(e[key], "arguments", [])
                if len(args) == 1:
                    inner = _get(args[0], "value") or {}
                    if any(_snake(k) == "subquery" for k in inner):
                        negated, e = True, inner
                break
        for key in e or {}:
            if _snake(key) != "subquery":
                continue
            sp = _get(e[key], "set_predicate")
            if sp is None:
                return None  # scalar/in_predicate handled elsewhere
            pop = _get(sp, "predicate_op", "PREDICATE_OP_UNSPECIFIED")
            if str(pop) not in ("PREDICATE_OP_EXISTS", "1") and pop != 1:
                raise NotImplementedError(f"SetPredicate op {pop}")
            return _get(sp, "tuples"), negated
        return None

    def _lower_scalar_subqueries(self, cond, df):
        """Rewrite every Expression.Subquery Scalar inside ``cond`` into a
        positional reference to a column appended by broadcast-cross-
        joining the one-row subquery — DataFusion's ScalarSubqueryToJoin
        lowering, fully distributed (no driver-side collect). Returns
        (new_cond, widened_df | None, original_column_count)."""
        from pyspark.sql import functions as F

        subs: list = []

        def walk(e):
            if isinstance(e, dict):
                for key in e:
                    if _snake(key) == "subquery":
                        sc = _get(e[key], "scalar")
                        if sc is not None:
                            idx = len(df.columns) + len(subs)
                            subs.append(_get(sc, "input"))
                            return {
                                "selection": {
                                    "directReference": {
                                        "structField": {"field": idx}
                                    },
                                    "rootReference": {},
                                }
                            }
                return {k: walk(v) for k, v in e.items()}
            if isinstance(e, list):
                return [walk(v) for v in e]
            return e

        new_cond = walk(cond)
        if not subs:
            return cond, None, len(df.columns)
        wide = df
        n_orig = len(df.columns)
        from .serde import scalar_subquery_one_row

        for i, rel in enumerate(subs):
            one = self.rel(rel)
            # one-row contract + empty→NULL binding (shared with the JSON
            # plan surface; advice r11: a >1-row subquery must raise, not
            # fan out the cross join)
            wide = wide.crossJoin(
                F.broadcast(scalar_subquery_one_row(one, f"__scalar_{i}__"))
            )
        return new_cond, wide, n_orig

    @staticmethod
    def _as_in_predicate(e: dict):
        """(needle_expr, haystack_rel, negated) for a [NOT] IN-subquery
        filter condition, else None."""
        negated = False
        for key in e or {}:
            if _snake(key) == "scalar_function":
                # not(<subquery>) — resolved by shape, not anchor: the NOT
                # builtin is the only single-arg wrapper producers emit here
                args = _get(e[key], "arguments", [])
                if len(args) == 1:
                    inner = _get(args[0], "value") or {}
                    if any(_snake(k) == "subquery" for k in inner):
                        negated, e = True, inner
                break
        for key in e or {}:
            if _snake(key) != "subquery":
                continue
            ip = _get(e[key], "in_predicate")
            if ip is None:
                # another Subquery variant (set_predicate / scalar) —
                # handled by the later _rel_filter arms
                return None
            needles = _get(ip, "needles", [])
            if len(needles) != 1:
                raise ValueError(
                    "InPredicate Subquery type must have exactly one Needle expression"
                )
            return needles[0], _get(ip, "haystack"), negated
        return None

    def _rel_project(self, node: dict) -> DataFrame:
        # v39 parity: output = the expression list ONLY (consumer.rs:401)
        df = self.rel(_get(node, "input"))
        exprs = [
            self.rex(e, df).alias(f"_p{i}")
            for i, e in enumerate(_get(node, "expressions", []))
        ]
        return self._norm(df.select(*exprs))

    def _rel_aggregate(self, node: dict) -> DataFrame:
        df = self.rel(_get(node, "input"))
        groupings = _get(node, "groupings", [])
        if len(groupings) > 1:
            raise NotImplementedError(
                "multiple grouping sets not supported on this surface"
            )
        group_exprs = [
            self.rex(e, df).alias(f"_g{i}")
            for i, e in enumerate(
                _get(groupings[0], "grouping_expressions", []) if groupings else []
            )
        ]
        aggs = []
        for i, m in enumerate(_get(node, "measures", [])):
            fn = _get(m, "measure", {})
            name = self._fn_name(_get(fn, "function_reference", 0))
            distinct = str(_get(fn, "invocation", "")) == "AGGREGATION_INVOCATION_DISTINCT"
            args = [
                self.rex(_get(a, "value"), df)
                for a in _get(fn, "arguments", [])
                if _get(a, "value") is not None
            ]
            agg = self._agg_call(name, args, distinct)
            flt = _get(m, "filter")
            if flt is not None:
                # measure filter: aggregate only rows where the filter holds
                cond = self.rex(flt, df)
                agg = self._agg_call(
                    name,
                    [F.when(cond, a) for a in args] or [F.when(cond, F.lit(1))],
                    distinct,
                )
            aggs.append(agg.alias(f"_m{i}"))
        out = df.groupBy(*group_exprs).agg(*aggs) if group_exprs else df.agg(*aggs)
        return self._norm(out)

    def _agg_call(self, name: str, args: list[Column], distinct: bool) -> Column:
        if name == "count" and not args:
            args = [F.lit(1)]
        if distinct:
            if name == "count":
                return F.countDistinct(*args)
            if name == "sum":
                return F.sum_distinct(args[0])
            if name in ("min", "max", "any_value"):
                # DISTINCT is a no-op for extrema/any (producer.rs emits
                # the invocation faithfully; semantics are unchanged)
                return _AGG_FUNCS[name](*args)
            if name == "avg":
                # avg(DISTINCT x) = sum(DISTINCT x) / count(DISTINCT x)
                # (double-valued, like Spark's avg over integral input)
                return F.sum_distinct(args[0]) / F.countDistinct(args[0])
            raise NotImplementedError(f"DISTINCT {name} aggregate")
        if name not in _AGG_FUNCS:
            raise NotImplementedError(f"aggregate function not supported: {name}")
        return _AGG_FUNCS[name](*args)

    def _rel_sort(self, node: dict) -> DataFrame:
        df = self.rel(_get(node, "input"))
        return self._norm(df.orderBy(*self._sorts(_get(node, "sorts", []), df)))

    def _sorts(self, sorts: list, df: DataFrame) -> list[Column]:
        out = []
        for s in sorts:
            col = self.rex(_get(s, "expr"), df)
            d = str(_get(s, "direction", "SORT_DIRECTION_ASC_NULLS_LAST"))
            out.append(
                {
                    # consumer.rs:902-905
                    "SORT_DIRECTION_ASC_NULLS_FIRST": col.asc_nulls_first(),
                    "SORT_DIRECTION_ASC_NULLS_LAST": col.asc_nulls_last(),
                    "SORT_DIRECTION_DESC_NULLS_FIRST": col.desc_nulls_first(),
                    "SORT_DIRECTION_DESC_NULLS_LAST": col.desc_nulls_last(),
                }.get(d, col.asc_nulls_last())
            )
        return out

    def _rel_fetch(self, node: dict) -> DataFrame:
        df = self.rel(_get(node, "input"))
        offset = int(_get(node, "offset", 0))
        count = int(_get(node, "count", -1))
        if offset:
            df = df.offset(offset)
        # count of -1 / u64::MAX encodes None — consumer.rs:453
        if count >= 0 and count < (1 << 63):
            df = df.limit(count)
        return self._norm(df)

    def _rel_join(self, node: dict) -> DataFrame:
        left = self.rel(_get(node, "left"))
        right = self.rel(_get(node, "right"))
        how = _JOIN_TYPES.get(_get(node, "type", "JOIN_TYPE_INNER"))
        if how is None:
            raise NotImplementedError(f"join type {_get(node, 'type')}")
        if _get(node, "post_join_filter") is not None:
            raise NotImplementedError("JoinRel with post_join_filter")
        expr = _get(node, "expression")
        if expr is None:
            raise ValueError("JoinRel without join condition is not allowed")
        # the condition references the CONCATENATED input schema
        # (consumer.rs:585 in_join_schema)
        both = [left[c] for c in left.columns] + [right[c] for c in right.columns]
        cond = self.rex(expr, df=None, fields=both)
        return self._norm(left.join(right, cond, how))

    def _rel_cross(self, node: dict) -> DataFrame:
        left = self.rel(_get(node, "left"))
        right = self.rel(_get(node, "right"))
        return self._norm(left.crossJoin(right))

    def _rel_set(self, node: dict) -> DataFrame:
        op = _get(node, "op", "")
        inputs = [self.rel(r) for r in _get(node, "inputs", [])]
        if not inputs:
            raise ValueError("Set relation requires at least one input")
        if str(op) in ("SET_OP_UNION_ALL", "2") or op == 2:
            out = inputs[0]
            for nxt in inputs[1:]:
                out = out.unionAll(nxt.toDF(*out.columns))
            return self._norm(out)
        if str(op) in ("SET_OP_UNION_DISTINCT", "5") or op == 5:
            out = inputs[0]
            for nxt in inputs[1:]:
                out = out.unionAll(nxt.toDF(*out.columns))
            return self._norm(out.distinct())
        # MINUS/INTERSECTION arms (round 11): PRIMARY = set semantics
        # (DISTINCT), MULTISET = bag semantics (ALL) — Spark's
        # subtract/except-all and intersect/intersect-all map exactly
        if str(op) == "SET_OP_MINUS_PRIMARY" or op == 1:
            out = inputs[0]
            for nxt in inputs[1:]:
                out = out.subtract(nxt.toDF(*out.columns))
            return self._norm(out)
        if str(op) == "SET_OP_MINUS_MULTISET":
            out = inputs[0]
            for nxt in inputs[1:]:
                out = out.exceptAll(nxt.toDF(*out.columns))
            return self._norm(out)
        if str(op) == "SET_OP_INTERSECTION_PRIMARY" or op == 3:
            out = inputs[0]
            for nxt in inputs[1:]:
                out = out.intersect(nxt.toDF(*out.columns))
            return self._norm(out)
        if str(op) == "SET_OP_INTERSECTION_MULTISET" or op == 4:
            out = inputs[0]
            for nxt in inputs[1:]:
                out = out.intersectAll(nxt.toDF(*out.columns))
            return self._norm(out)
        raise NotImplementedError(f"set operation {op}")

    # -- expressions ---------------------------------------------------------

    def _fn_name(self, anchor) -> str:
        name = self.ext.get(int(anchor))
        if name is None:
            raise ValueError(f"Scalar function not found: reference = {anchor}")
        # compound signature "add:i8_i8" → "add" (consumer.rs substrait_fun_name:124)
        return name.split(":", 1)[0]

    def rex(self, e: dict, df: DataFrame | None, fields: list[Column] | None = None) -> Column:
        if fields is None:
            fields = [df[c] for c in df.columns]
        for key in e:
            k = _snake(key)
            if k == "selection":
                seg = _get(e[key], "direct_reference", {})
                sf = _get(seg, "struct_field", {})
                col = fields[int(_get(sf, "field", 0))]
                child = _get(sf, "child")
                while child is not None:
                    sf = _get(child, "struct_field", {})
                    col = col[int(_get(sf, "field", 0))]
                    child = _get(sf, "child")
                return col
            if k == "literal":
                return _literal(e[key])
            if k == "cast":
                inner = self.rex(_get(e[key], "input"), df, fields)
                return inner.cast(_type_to_ddl(_get(e[key], "type")))
            if k == "if_then":
                node = e[key]
                cond = None
                for clause in _get(node, "ifs", []):
                    c = self.rex(_get(clause, "if"), df, fields)
                    t = self.rex(_get(clause, "then"), df, fields)
                    cond = F.when(c, t) if cond is None else cond.when(c, t)
                els = _get(node, "else")
                return cond.otherwise(self.rex(els, df, fields)) if els else cond
            if k == "singular_or_list":
                v = self.rex(_get(e[key], "value"), df, fields)
                opts = [self.rex(o, df, fields) for o in _get(e[key], "options", [])]
                return v.isin(*opts)
            if k == "scalar_function":
                return self._scalar_fn(e[key], df, fields)
            if k == "window_function":
                return self._window_fn(e[key], df, fields)
        raise NotImplementedError(f"substrait expression not supported: {list(e)}")

    def _scalar_fn(self, f: dict, df, fields) -> Column:
        name = self._fn_name(_get(f, "function_reference", 0))
        args = [
            self.rex(_get(a, "value"), df, fields)
            for a in _get(f, "arguments", [])
            if _get(a, "value") is not None
        ]
        # resolution order mirrors consumer.rs:1123-1141: engine registry,
        # then binary ops, then builtins
        from arrow_datafusion_spark.functions.scalar import SCALAR

        if name == "like" and len(args) == 2:
            return F.like(args[0], args[1])
        if name == "ilike" and len(args) == 2:
            return F.ilike(args[0], args[1])
        if name in _BINARY_OPS and len(args) == 2:
            return _BINARY_OPS[name](args[0], args[1])
        if name in _BUILTINS and len(args) == 1:
            return _BUILTINS[name](args[0])
        if name == "and" or name == "or":
            out = args[0]
            for a in args[1:]:
                out = (out & a) if name == "and" else (out | a)
            return out
        if name in SCALAR:
            return SCALAR[name](*args)
        raise NotImplementedError(f"Unsupported function name: {name!r}")

    def _window_fn(self, w: dict, df, fields) -> Column:
        name = self._fn_name(_get(w, "function_reference", 0))
        args = [
            self.rex(_get(a, "value"), df, fields)
            for a in _get(w, "arguments", [])
            if _get(a, "value") is not None
        ]
        spec = Window.partitionBy(
            *[self.rex(p, df, fields) for p in _get(w, "partitions", [])]
        )
        sorts = _get(w, "sorts", [])
        if sorts:
            spec = spec.orderBy(*self._sorts(sorts, df))

        def bound(b: dict | None, default: int) -> int:
            if not b:
                return default
            if _get(b, "unbounded") is not None:
                return default
            if _get(b, "current_row") is not None:
                return Window.currentRow
            p = _get(b, "preceding")
            if p is not None:
                return -int(_get(p, "offset", 0))
            fo = _get(b, "following")
            if fo is not None:
                return int(_get(fo, "offset", 0))
            return default

        lo = bound(_get(w, "lower_bound"), Window.unboundedPreceding)
        hi = bound(_get(w, "upper_bound"), Window.unboundedFollowing)
        bounds_type = str(_get(w, "bounds_type", "BOUNDS_TYPE_ROWS"))
        named = {
            "row_number": F.row_number,
            "rank": F.rank,
            "dense_rank": F.dense_rank,
            "percent_rank": F.percent_rank,
            "cume_dist": F.cume_dist,
        }
        if name in named:
            # ranking functions take no frame — Spark rejects an explicit
            # frame specification on them (the reference's planner also
            # pins their frame internally)
            return named[name]().over(spec)
        if sorts or _get(w, "lower_bound") or _get(w, "upper_bound"):
            if bounds_type == "BOUNDS_TYPE_RANGE":
                spec = spec.rangeBetween(lo, hi)
            else:
                spec = spec.rowsBetween(lo, hi)
        if name in _AGG_FUNCS:
            return self._agg_call(name, args, False).over(spec)
        raise NotImplementedError(f"window function {name!r}")

    # -- schema helper -------------------------------------------------------

    def _named_struct_ddl(self, base_schema: dict) -> str:
        names = _get(base_schema, "names", [])
        types = _get(_get(base_schema, "struct", {}), "types", [])
        return ", ".join(
            f"{n} {_type_to_ddl(t)}" for n, t in zip(names, types)
        )


def consume_plan(ctx, plan: dict) -> DataFrame:
    """Execute a Substrait ``Plan`` (protobuf-JSON dict) against the session.

    Mirrors consumer.rs ``from_substrait_plan``:182 — registers the
    function-extension anchors, consumes the single relation tree, and
    applies the root ``names`` as output column names."""
    extensions: dict[int, str] = {}
    for ext in _get(plan, "extensions", []) or []:
        ef = _get(ext, "extension_function")
        if ef is not None:
            extensions[int(_get(ef, "function_anchor", 0))] = _get(ef, "name", "")
    relations = _get(plan, "relations", []) or []
    if len(relations) != 1:
        raise NotImplementedError(
            f"plans with {len(relations)} relation trees are not supported"
        )
    consumer = _Consumer(ctx, extensions)
    entry = relations[0]
    root = _get(entry, "root")
    if root is not None:
        df = consumer.rel(_get(root, "input"))
        names = _get(root, "names", [])
        if names and len(names) == len(df.columns):
            df = df.toDF(*names)
        return df
    rel = _get(entry, "rel")
    if rel is not None:
        return consumer.rel(rel)
    raise ValueError("PlanRel without rel or root")


def consume_plan_file(ctx, path: str) -> DataFrame:
    with open(path) as f:
        return consume_plan(ctx, json.load(f))
