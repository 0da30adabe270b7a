"""Substrait logical-plan PRODUCER (protobuf-JSON encoding) — the emit
side of the reference's interchange surface
(/root/reference/datafusion/substrait/src/logical_plan/producer.rs:
``to_substrait_plan`` / ``to_substrait_rel`` / ``to_substrait_rex``).

Input is the engine's own logical-plan interchange tree (plans/serde.py —
the analog of DataFusion's ``LogicalPlan``, with expressions as SQL
strings parsed by the engine's expression front end); output is a
``substrait.proto.Plan`` in its protobuf JSON form, the same encoding the
consumer (plans/substrait.py) reads and the reference's own third-party
artifacts use. ``plans/substrait_wire.py`` carries the same Plan to and
from the binary protobuf wire.

Division of labor mirrors producer.rs:
- every operator lowers to the v39 rel it round-trips through
  (ReadRel/NamedTable, FilterRel, ProjectRel, AggregateRel, JoinRel,
  SortRel, FetchRel, SetRel, VirtualTable for VALUES);
- field references are emitted BY POSITION against each node's output
  schema (producer.rs substrait_field_ref; Substrait has no column names
  above the read), with the join condition referencing the concatenated
  left+right schema (producer.rs:448);
- function names are registered as extension anchors
  (producer.rs register_function), emitted as plain names — the consumer
  side strips compound signatures, so both spellings interoperate;
- output column names ride on ``RelRoot.names`` (producer.rs:189).

Expression SQL strings are parsed with Spark's parser and the UNRESOLVED
Catalyst AST is converted node-by-node; anything outside the supported
subset raises ``NotImplementedError`` naming the construct (the analog of
producer.rs's ``not_impl_err!`` arms) rather than emitting a plan another
consumer would misread.
"""

from __future__ import annotations

import base64
import json
from decimal import Decimal

from pyspark.sql import DataFrame

__all__ = ["produce_plan"]

# substrait extension URI advertised for the registered functions. The
# anchors are what matter to consumers; the URI documents provenance.
_EXT_URI = (
    "https://github.com/substrait-io/substrait/blob/main/extensions/"
    "functions_all.yaml"
)

# Catalyst unresolved-AST class -> substrait canonical function name
# (inverse of the consumer's _BINARY_OPS/_BUILTINS resolution tables,
# which themselves mirror consumer.rs name_to_op:91)
_BINOP_CLASS = {
    "Add": "add",
    "Subtract": "subtract",
    "Multiply": "multiply",
    "Divide": "divide",
    "Remainder": "modulus",
    "EqualTo": "equal",
    "LessThan": "lt",
    "LessThanOrEqual": "lte",
    "GreaterThan": "gt",
    "GreaterThanOrEqual": "gte",
    "Like": "like",
    "BitwiseAnd": "bitwise_and",
    "BitwiseOr": "bitwise_or",
    "BitwiseXor": "bitwise_xor",
}
_UNARY_CLASS = {
    "Not": "not",
    "UnaryMinus": "negate",
    "IsNull": "is_null",
    "IsNotNull": "is_not_null",
}
_AGG_NAMES = {"sum", "min", "max", "avg", "count", "any_value"}

_SORT_DIR = {
    ("asc", "last"): "SORT_DIRECTION_ASC_NULLS_LAST",
    ("asc", "first"): "SORT_DIRECTION_ASC_NULLS_FIRST",
    ("desc", "last"): "SORT_DIRECTION_DESC_NULLS_LAST",
    ("desc", "first"): "SORT_DIRECTION_DESC_NULLS_FIRST",
}

_JOIN_TYPE = {
    "inner": "JOIN_TYPE_INNER",
    "full": "JOIN_TYPE_OUTER",
    "outer": "JOIN_TYPE_OUTER",
    "full_outer": "JOIN_TYPE_OUTER",
    "left": "JOIN_TYPE_LEFT",
    "left_outer": "JOIN_TYPE_LEFT",
    "right": "JOIN_TYPE_RIGHT",
    "right_outer": "JOIN_TYPE_RIGHT",
    "semi": "JOIN_TYPE_SEMI",
    "left_semi": "JOIN_TYPE_SEMI",
    "anti": "JOIN_TYPE_ANTI",
    "left_anti": "JOIN_TYPE_ANTI",
}


# -- Spark type -> substrait Type dict (producer.rs to_substrait_type) -------

_SIMPLE_TYPES = {
    "boolean": "bool",
    "tinyint": "i8",
    "smallint": "i16",
    "int": "i32",
    "integer": "i32",
    "bigint": "i64",
    "float": "fp32",
    "double": "fp64",
    "string": "string",
    "binary": "binary",
    "date": "date",
}

_NULLABLE = {"nullability": "NULLABILITY_NULLABLE"}


def _type_from_spark(dt) -> dict:
    name = dt.simpleString()
    if name in _SIMPLE_TYPES:
        return {_SIMPLE_TYPES[name]: dict(_NULLABLE)}
    if name.startswith("decimal"):
        return {
            "decimal": {
                "scale": dt.scale,
                "precision": dt.precision,
                **_NULLABLE,
            }
        }
    if name.startswith("timestamp"):
        return {"timestamp": dict(_NULLABLE)}
    if name.startswith("array"):
        return {
            "list": {"type": _type_from_spark(dt.elementType), **_NULLABLE}
        }
    if name.startswith("struct"):
        return {
            "struct": {
                "types": [_type_from_spark(f.dataType) for f in dt.fields],
                **_NULLABLE,
            }
        }
    raise NotImplementedError(f"substrait producer: unsupported type {name}")


def _named_struct(schema) -> dict:
    return {
        "names": list(schema.names),
        "struct": {
            "types": [_type_from_spark(f.dataType) for f in schema.fields],
            **_NULLABLE,
        },
    }


# -- Catalyst literal -> substrait Literal dict ------------------------------


def _literal_from_catalyst(e) -> dict:
    sql_type = e.dataType().sql()
    v = e.value()
    if v is None:
        base = sql_type.lower()
        if base.startswith("decimal"):
            t = {"decimal": {"scale": 0, "precision": 38, **_NULLABLE}}
        elif base in _SIMPLE_TYPES:
            t = {_SIMPLE_TYPES[base]: dict(_NULLABLE)}
        elif base.startswith("timestamp"):
            t = {"timestamp": dict(_NULLABLE)}
        elif base == "void":  # untyped NULL parses as void; emit string
            t = {"string": dict(_NULLABLE)}
        else:
            raise NotImplementedError(f"NULL literal of type {sql_type}")
        return {"null": t}
    if sql_type == "BOOLEAN":
        return {"boolean": bool(v)}
    if sql_type == "TINYINT":
        return {"i8": int(str(v))}
    if sql_type == "SMALLINT":
        return {"i16": int(str(v))}
    if sql_type == "INT":
        return {"i32": int(str(v))}
    if sql_type == "BIGINT":
        return {"i64": int(str(v))}
    if sql_type == "FLOAT":
        return {"fp32": float(str(v))}
    if sql_type == "DOUBLE":
        return {"fp64": float(str(v))}
    if sql_type == "STRING":
        return {"string": str(v)}
    if sql_type == "BINARY":
        return {"binary": base64.b64encode(bytes(v)).decode()}
    if sql_type == "DATE":  # Catalyst holds days-since-epoch
        return {"date": int(str(v))}
    if sql_type.startswith("TIMESTAMP"):  # Catalyst holds epoch micros
        return {"timestamp": int(str(v))}
    if sql_type.startswith("DECIMAL"):
        d = Decimal(str(v))
        scale = -d.as_tuple().exponent
        unscaled = int(d.scaleb(scale))
        prec = int(sql_type.split("(")[1].split(",")[0])
        return {
            "decimal": {
                "value": base64.b64encode(
                    unscaled.to_bytes(16, "little", signed=True)
                ).decode(),
                "precision": prec,
                "scale": max(scale, 0),
            }
        }
    raise NotImplementedError(f"substrait literal of type {sql_type}")


class _Producer:
    def __init__(self, ctx):
        self.ctx = ctx
        self._parser = ctx.spark._jsparkSession.sessionState().sqlParser()
        self.functions: dict[str, int] = {}  # name -> anchor

    # -- function registry (producer.rs register_function) -------------------

    def _anchor(self, name: str) -> int:
        if name not in self.functions:
            self.functions[name] = len(self.functions) + 1
        return self.functions[name]

    # -- expressions ----------------------------------------------------------

    def _parse(self, sql: str):
        return self._parser.parseExpression(sql)

    @staticmethod
    def _children(e) -> list:
        ch = e.children()
        return [ch.apply(i) for i in range(ch.size())]

    @staticmethod
    def _field_ref(idx: int) -> dict:
        return {
            "selection": {
                "directReference": {"structField": {"field": idx}},
                "rootReference": {},
            }
        }

    def _resolve(self, name: str, columns: list[str]) -> int:
        lowered = name.lower()
        hits = [i for i, c in enumerate(columns) if c.lower() == lowered]
        if len(hits) == 1:
            return hits[0]
        if not hits:
            raise ValueError(
                f"substrait producer: column {name!r} not in {columns}"
            )
        raise ValueError(f"substrait producer: column {name!r} is ambiguous")

    def _scalar_fn(self, name: str, args: list[dict], out_type: dict | None = None) -> dict:
        fn: dict = {
            "functionReference": self._anchor(name),
            "arguments": [{"value": a} for a in args],
        }
        if out_type is not None:
            fn["outputType"] = out_type
        return {"scalarFunction": fn}

    def rex(self, e, columns: list[str]) -> dict:
        """Catalyst unresolved expression -> substrait Expression dict
        (producer.rs to_substrait_rex)."""
        cls = e.getClass().getSimpleName()
        kids = self._children(e)
        if cls == "UnresolvedAttribute":
            if e.name() == "__scalar__" and getattr(self, "_scalar_sub", None):
                return self._scalar_sub  # scalar-subquery marker binding
            return self._field_ref(self._resolve(e.name(), columns))
        if cls == "Literal":
            return {"literal": _literal_from_catalyst(e)}
        if cls == "Alias":  # alias names ride on RelRoot.names, not the rex
            return self.rex(kids[0], columns)
        if cls in _BINOP_CLASS:
            return self._scalar_fn(
                _BINOP_CLASS[cls], [self.rex(k, columns) for k in kids]
            )
        if cls in ("And", "Or"):
            return self._scalar_fn(
                cls.lower(), [self.rex(k, columns) for k in kids]
            )
        if cls in _UNARY_CLASS:
            return self._scalar_fn(
                _UNARY_CLASS[cls], [self.rex(kids[0], columns)]
            )
        if cls == "Cast":
            from pyspark.sql.types import _parse_datatype_string

            # e.dataType() is the JVM DataType; re-parse its DDL into the
            # Python mirror the type mapper reads
            return {
                "cast": {
                    "type": _type_from_spark(
                        _parse_datatype_string(e.dataType().simpleString())
                    ),
                    "input": self.rex(kids[0], columns),
                    "failureBehavior": "FAILURE_BEHAVIOR_THROW_EXCEPTION",
                }
            }
        if cls == "In":
            return {
                "singularOrList": {
                    "value": self.rex(kids[0], columns),
                    "options": [self.rex(k, columns) for k in kids[1:]],
                }
            }
        if cls == "CaseWhen":
            # children: [cond1, val1, cond2, val2, ..., else?]
            pairs, els = kids, None
            if len(kids) % 2 == 1:
                pairs, els = kids[:-1], kids[-1]
            node = {
                "ifs": [
                    {
                        "if": self.rex(pairs[i], columns),
                        "then": self.rex(pairs[i + 1], columns),
                    }
                    for i in range(0, len(pairs), 2)
                ]
            }
            if els is not None:
                node["else"] = self.rex(els, columns)
            return {"ifThen": node}
        if cls == "WindowExpression":
            return self._window_rex(e, columns)
        if cls == "UnresolvedFunction":
            np = e.nameParts()
            name = ".".join(np.apply(i) for i in range(np.size())).lower()
            if name in _AGG_NAMES:
                raise NotImplementedError(
                    f"aggregate {name}() outside an aggregate node's "
                    "measure position (decompose the plan: aggregate "
                    "measures must be bare aggregate calls)"
                )
            from arrow_datafusion_spark.functions.scalar import SCALAR

            if name not in SCALAR:
                raise NotImplementedError(
                    f"substrait producer: unregistered function {name!r}"
                )
            return self._scalar_fn(
                name, [self.rex(k, columns) for k in kids]
            )
        raise NotImplementedError(
            f"substrait producer: unsupported expression node {cls}"
        )

    _RANKING = {"row_number", "rank", "dense_rank", "percent_rank", "cume_dist"}

    def _window_rex(self, e, columns: list[str]) -> dict:
        """Catalyst WindowExpression -> Expression.WindowFunction
        (producer.rs to_substrait_rex's WindowFunction arm)."""
        fn = e.windowFunction()
        if fn.getClass().getSimpleName() != "UnresolvedFunction":
            raise NotImplementedError(
                "substrait producer: window function node "
                f"{fn.getClass().getSimpleName()}"
            )
        np = fn.nameParts()
        name = ".".join(np.apply(i) for i in range(np.size())).lower()
        if name not in _AGG_NAMES and name not in self._RANKING:
            raise NotImplementedError(
                f"substrait producer: unsupported window function {name!r}"
            )
        if not fn.filter().isEmpty():
            # parity-correct guard, not a gap: the wire format has no
            # window-filter field, and the reference's own producer can
            # never see one — its Expr::WindowFunction carries no filter
            # member at all (producer.rs:1246 destructures fun/args/
            # partition_by/order_by/window_frame only), so a FILTERed
            # window expression cannot exist in a reference plan either
            raise NotImplementedError(
                "substrait producer: FILTER on a window function "
                "(Expression.WindowFunction has no filter field)"
            )
        spec = e.windowSpec()
        parts = spec.partitionSpec()
        orders = spec.orderSpec()
        node: dict = {
            "functionReference": self._anchor(name),
            "arguments": [
                {"value": self.rex(k, columns)} for k in self._children(fn)
            ],
            "partitions": [
                self.rex(parts.apply(i), columns) for i in range(parts.size())
            ],
            "sorts": [
                self._sort_field(orders.apply(i), columns)
                for i in range(orders.size())
            ],
            "phase": "AGGREGATION_PHASE_INITIAL_TO_RESULT",
            "invocation": "AGGREGATION_INVOCATION_ALL",
        }
        frame = spec.frameSpecification()
        fcls = frame.getClass().getSimpleName()
        if fcls == "SpecifiedWindowFrame":
            node["boundsType"] = (
                "BOUNDS_TYPE_RANGE"
                if str(frame.frameType()) == "RangeFrame"
                else "BOUNDS_TYPE_ROWS"
            )
            node["lowerBound"] = self._frame_bound(frame.lower())
            node["upperBound"] = self._frame_bound(frame.upper())
        elif name in _AGG_NAMES and orders.size():
            # UnspecifiedFrame with ORDER BY: both engines default to
            # RANGE UNBOUNDED PRECEDING .. CURRENT ROW — emit it
            # explicitly so any consumer computes the same running agg
            node["boundsType"] = "BOUNDS_TYPE_RANGE"
            node["lowerBound"] = {"unbounded": {}}
            node["upperBound"] = {"currentRow": {}}
        return {"windowFunction": node}

    def _frame_bound(self, b) -> dict:
        cls = b.getClass().getSimpleName()
        if cls == "UnboundedPreceding$" or cls == "UnboundedFollowing$":
            return {"unbounded": {}}
        if cls == "CurrentRow$":
            return {"currentRow": {}}
        if cls == "UnaryMinus":
            off = int(str(self._children(b)[0].value()))
            return {"preceding": {"offset": off}}
        if cls == "Literal":
            v = int(str(b.value()))
            if v < 0:
                return {"preceding": {"offset": -v}}
            return {"following": {"offset": v}}
        raise NotImplementedError(f"substrait producer: frame bound {cls}")

    def _sort_field(self, so, columns: list[str]) -> dict:
        d = "asc" if str(so.direction()) == "Ascending" else "desc"
        n = "first" if str(so.nullOrdering()) == "NullsFirst" else "last"
        return {
            "expr": self.rex(self._children(so)[0], columns),
            "direction": _SORT_DIR[(d, n)],
        }

    def measure(self, e, columns: list[str], out_type: dict) -> dict:
        """An aggregate expression (optionally aliased) -> AggregateRel
        Measure (producer.rs to_substrait_agg_measure)."""
        cls = e.getClass().getSimpleName()
        if cls == "Alias":
            return self.measure(self._children(e)[0], columns, out_type)
        if cls == "AggregateExpression":
            # Spark parses some aggregates (any_value) straight to a
            # resolved AggregateExpression instead of UnresolvedFunction —
            # caught by the closure battery; read the wrapped function
            fn = e.aggregateFunction()
            name = fn.prettyName().lower()
            if name not in _AGG_NAMES:
                raise NotImplementedError(
                    f"substrait producer: unsupported aggregate {name!r}"
                )
            args = [
                self.rex(k, columns)
                for k in self._children(fn)
                if "Literal" not in k.getClass().getSimpleName()
                or name != "any_value"  # drop any_value's ignoreNulls flag
            ]
            out: dict = {
                "measure": {
                    "functionReference": self._anchor(name),
                    "arguments": [{"value": a} for a in args],
                    "outputType": out_type,
                    "phase": "AGGREGATION_PHASE_INITIAL_TO_RESULT",
                    "invocation": (
                        "AGGREGATION_INVOCATION_DISTINCT"
                        if e.isDistinct()
                        else "AGGREGATION_INVOCATION_ALL"
                    ),
                }
            }
            flt = e.filter()
            if not flt.isEmpty():
                out["filter"] = self.rex(flt.get(), columns)
            return out
        if cls != "UnresolvedFunction":
            raise NotImplementedError(
                "aggregate measures must be bare aggregate calls "
                f"(got {cls}; project computed columns below or above "
                "the aggregate)"
            )
        np = e.nameParts()
        name = ".".join(np.apply(i) for i in range(np.size())).lower()
        if name not in _AGG_NAMES:
            raise NotImplementedError(
                f"substrait producer: unsupported aggregate {name!r}"
            )
        # arguments(), not children(): a FILTER clause rides children as an
        # extra trailing expression and must NOT become an argument
        jargs = e.arguments()
        args = [
            self.rex(jargs.apply(i), columns) for i in range(jargs.size())
        ]
        if name == "count" and len(args) == 1 and "literal" in args[0]:
            args = []  # count(*) / count(1) -> zero-arg COUNT
        out: dict = {
            "measure": {
                "functionReference": self._anchor(name),
                "arguments": [{"value": a} for a in args],
                "outputType": out_type,
                "phase": "AGGREGATION_PHASE_INITIAL_TO_RESULT",
                "invocation": (
                    "AGGREGATION_INVOCATION_DISTINCT"
                    if e.isDistinct()
                    else "AGGREGATION_INVOCATION_ALL"
                ),
            }
        }
        flt = e.filter()
        if not flt.isEmpty():
            # Measure.filter (round 11 — the consumer already reads it;
            # producer.rs to_substrait_agg_measure emits the same field)
            out["filter"] = self.rex(flt.get(), columns)
        return out

    # -- relations (producer.rs to_substrait_rel) -----------------------------

    def node(self, n: dict) -> tuple[dict, DataFrame]:
        """serde node -> (substrait Rel dict, the node's DataFrame).

        The DataFrame is the engine's own lowering of the same node
        (plans/serde.py) — analysis only, never executed here — used for
        name->position resolution and output types, the role LogicalPlan
        schemas play in producer.rs."""
        from arrow_datafusion_spark.plans import serde

        op = n["op"]
        df = serde._node(self.ctx, n)
        if op == "scan":
            if "table" in n:
                rel = {
                    "read": {
                        "common": {"direct": {}},
                        "baseSchema": _named_struct(df.schema),
                        "namedTable": {"names": [n["table"]]},
                    }
                }
                return rel, df
            if "parquet" in n:
                # ReadRel LocalFiles (round 11; round 12 widens to
                # DIRECTORY scans): parquet scans emit one FileOrFiles
                # item per file — uri_file + the parquet format marker,
                # the producer.rs LocalFiles arm's listing shape. A
                # directory path expands to its sorted *.parquet listing
                # (the reference's ListingTable resolution); consumers
                # that read paths get real uris, and single-file plans
                # stay resolvable by BASENAME as a table reference
                # (consumer.rs:692 extract_filename).
                import glob as _glob
                import os as _os

                path = _os.path.abspath(n["parquet"])
                files = (
                    sorted(_glob.glob(_os.path.join(path, "*.parquet")))
                    if _os.path.isdir(path)
                    else [path]
                )
                if not files:
                    raise NotImplementedError(
                        "substrait producer: directory parquet scan with "
                        "no *.parquet files"
                    )
                rel = {
                    "read": {
                        "common": {"direct": {}},
                        "baseSchema": _named_struct(df.schema),
                        "localFiles": {
                            "items": [
                                {"uriFile": f"file://{f}", "parquet": {}}
                                for f in files
                            ]
                        },
                    }
                }
                return rel, df
            raise NotImplementedError(
                "substrait producer: only catalog-table and single-file "
                "parquet scans lower to ReadRel (csv/json scans: register "
                "as tables first)"
            )
        if op == "values":
            rows = [
                {
                    "fields": [
                        _literal_from_catalyst(self._parse(_sql_lit(v)))
                        for v in row
                    ]
                }
                for row in n["rows"]
            ]
            rel = {
                "read": {
                    "common": {"direct": {}},
                    "baseSchema": _named_struct(df.schema),
                    "virtualTable": {"values": rows},
                }
            }
            return rel, df
        if op == "filter":
            child, cdf = self.node(n["input"])
            if "in_subquery" in n:
                # Expression.Subquery InPredicate — the form the consumer
                # reads at substrait.py _as_in_predicate (producer.rs emits
                # it from DataFusion's InSubquery; NOT wraps in the `not`
                # scalar, which the consumer unwraps by shape)
                ins = n["in_subquery"]
                hay_rel, _ = self.node(ins["subquery"])
                cond: dict = {
                    "subquery": {
                        "inPredicate": {
                            "needles": [
                                self.rex(
                                    self._parse(ins["needle"]), cdf.columns
                                )
                            ],
                            "haystack": hay_rel,
                        }
                    }
                }
                if ins.get("negated"):
                    cond = self._scalar_fn("not", [cond])
                return {"filter": {"input": child, "condition": cond}}, df
            if "exists_subquery" in n:
                # Expression.Subquery SetPredicate PREDICATE_OP_EXISTS —
                # the uncorrelated [NOT] EXISTS form (correlated EXISTS is
                # decorrelated by the reference's optimizer before its
                # producer runs; same division of labor here)
                ex = n["exists_subquery"]
                tup_rel, _ = self.node(ex["subquery"])
                cond = {
                    "subquery": {
                        "setPredicate": {
                            "predicateOp": "PREDICATE_OP_EXISTS",
                            "tuples": tup_rel,
                        }
                    }
                }
                if ex.get("negated"):
                    cond = self._scalar_fn("not", [cond])
                return {"filter": {"input": child, "condition": cond}}, df
            if "scalar_subquery" in n:
                # Expression.Subquery Scalar — `__scalar__` in the
                # predicate marks where the subquery's value binds; the
                # rex walk swaps the marker attribute for the Scalar
                # subquery expression
                ss = n["scalar_subquery"]
                sub_rel, _ = self.node(ss["subquery"])
                self._scalar_sub = {"subquery": {"scalar": {"input": sub_rel}}}
                try:
                    cond = self.rex(
                        self._parse(ss["predicate"]), cdf.columns
                    )
                finally:
                    self._scalar_sub = None
                return {"filter": {"input": child, "condition": cond}}, df
            cond = self.rex(self._parse(n["predicate"]), cdf.columns)
            return {"filter": {"input": child, "condition": cond}}, df
        if op == "projection":
            child, cdf = self.node(n["input"])
            exprs = [
                self.rex(self._parse(s), cdf.columns) for s in n["exprs"]
            ]
            return {"project": {"input": child, "expressions": exprs}}, df
        if op == "aggregate":
            child, cdf = self.node(n["input"])
            groups = [
                self.rex(self._parse(g), cdf.columns)
                for g in n.get("group_by", [])
            ]
            # measure output types come from the engine's analysis of the
            # aggregate itself (producer.rs reads them off the LogicalPlan)
            out_fields = df.schema.fields[len(groups) :]
            measures = [
                self.measure(
                    self._parse(a), cdf.columns, _type_from_spark(f.dataType)
                )
                for a, f in zip(n["aggs"], out_fields)
            ]
            agg: dict = {"input": child, "measures": measures}
            agg["groupings"] = (
                [{"groupingExpressions": groups}] if groups else []
            )
            return {"aggregate": agg}, df
        if op == "join":
            left, ldf = self.node(n["left"])
            right, rdf = self.node(n["right"])
            how = _JOIN_TYPE.get(n.get("how", "inner"))
            if how is None:
                raise NotImplementedError(f"join type {n.get('how')!r}")
            both = list(ldf.columns) + list(rdf.columns)
            if "on" in n:
                cond = self.rex(self._parse(n["on"]), both)
            else:
                terms = [
                    self._scalar_fn(
                        "equal",
                        [
                            self._field_ref(self._resolve(u, ldf.columns)),
                            self._field_ref(
                                len(ldf.columns)
                                + self._resolve(u, rdf.columns)
                            ),
                        ],
                    )
                    for u in n.get("using", [])
                ]
                cond = terms[0]
                for t in terms[1:]:
                    cond = self._scalar_fn("and", [cond, t])
            return {
                "join": {
                    "left": left,
                    "right": right,
                    "expression": cond,
                    "type": how,
                }
            }, df
        if op == "sort":
            child, cdf = self.node(n["input"])
            sorts = []
            for spec in n["by"]:
                parts = spec.rsplit(None, 1)
                direction = "asc"
                if len(parts) == 2 and parts[1].upper() in ("ASC", "DESC"):
                    spec, direction = parts[0], parts[1].lower()
                sorts.append(
                    {
                        "expr": self.rex(self._parse(spec), cdf.columns),
                        "direction": _SORT_DIR[(direction, "last")],
                    }
                )
            return {"sort": {"input": child, "sorts": sorts}}, df
        if op == "limit":
            child, _ = self.node(n["input"])
            fetch = {"input": child, "count": int(n["n"])}
            if n.get("offset"):
                fetch["offset"] = int(n["offset"])
            return {"fetch": fetch}, df
        if op == "union":
            inputs = [self.node(i)[0] for i in n["inputs"]]
            set_op = (
                "SET_OP_UNION_DISTINCT"
                if n.get("distinct")
                else "SET_OP_UNION_ALL"
            )
            return {"set": {"inputs": inputs, "op": set_op}}, df
        if op in ("intersect", "except"):
            # SetRel INTERSECTION/MINUS arms (substrait SetOp: PRIMARY =
            # set semantics / distinct, MULTISET = bag semantics / ALL)
            inputs = [self.node(i)[0] for i in n["inputs"]]
            set_op = {
                ("intersect", False): "SET_OP_INTERSECTION_PRIMARY",
                ("intersect", True): "SET_OP_INTERSECTION_MULTISET",
                ("except", False): "SET_OP_MINUS_PRIMARY",
                ("except", True): "SET_OP_MINUS_MULTISET",
            }[(op, bool(n.get("all")))]
            return {"set": {"inputs": inputs, "op": set_op}}, df
        raise NotImplementedError(f"substrait producer: unknown op {op!r}")


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def produce_plan(ctx, plan: dict | str) -> dict:
    """Engine logical plan (plans/serde.py JSON tree) -> Substrait ``Plan``
    protobuf-JSON dict (producer.rs ``to_substrait_plan``:167). The result
    executes through plans/substrait.py ``consume_plan`` and encodes to the
    binary wire via plans/substrait_wire.py."""
    if isinstance(plan, str):
        plan = json.loads(plan)
    p = _Producer(ctx)
    rel, df = p.node(plan)
    return {
        "version": {"minorNumber": 39, "producer": "arrow-datafusion-spark"},
        "extensionUris": [{"extensionUriAnchor": 1, "uri": _EXT_URI}],
        "extensions": [
            {
                "extensionFunction": {
                    "extensionUriReference": 1,
                    "functionAnchor": anchor,
                    "name": name,
                }
            }
            for name, anchor in sorted(
                p.functions.items(), key=lambda kv: kv[1]
            )
        ],
        "relations": [{"root": {"input": rel, "names": list(df.columns)}}],
    }
