"""Query language over the execution-results store.

The reference exposes a user-facing query language for the UI / bulk-label
path: a restricted expression string (``'A == B or C == D'``) validated
against the ruleset's stored feature names and translated into backend
filters (engine/query_language/__init__.py:12-43,
ast_clickhouse_translator.py:50-223, ast_druid_translator.py:1-185), with
query UDFs ``DidDeclareVerdict`` / ``DidAddLabel`` / ``DidRemoveLabel``
(udfs/did_declare_verdict.py:15, did_mutate_label.py:16-64).

This is the Ray-native re-expression: :func:`parse_query` compiles the same
expression grammar into BOTH

- a vectorized Arrow predicate applied via ``Dataset.map_batches`` filter
  (:func:`filter_results`) — the "execute against the store" path, and
- a DuckDB ``WHERE`` clause string (:meth:`CompiledQuery.to_sql`) — the SQL
  translator analogue, used for oracle parity and for pushing the filter
  into a warehouse holding the written Parquet, and
- warehouse-dialect translators (:meth:`CompiledQuery.to_clickhouse` →
  parameterized ClickHouse WHERE, :meth:`CompiledQuery.to_druid` → native
  Druid filter JSON), mirroring the reference's translator pair so stored
  results in either warehouse can be filtered by the same query strings.

Query UDF semantics:

- ``DidDeclareVerdict(verdict='v')`` — the turn's ``__verdicts`` list
  contains v (verdict dimension, did_declare_verdict.py:28-34).
- ``DidAddLabel(label_name='l')`` / ``DidRemoveLabel(label_name='l')`` —
  the turn *attempted* the mutation: one of its fired rules belongs to a
  trigger whose effects include that mutation (the reference filters on the
  label-mutation dimension, "does not guarantee that the label was added" —
  did_mutate_label.py:26-33).  Needs the ruleset (``spec=``) to resolve
  trigger membership at compile time.

Validation errors reuse the SML frontend's typed, positioned
:class:`~osprey_ray.sml.SmlError` machinery.
"""

from __future__ import annotations

import ast

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osprey_ray.expr import EvalContext, Expr, lit
from osprey_ray.rules import LabelAdd, LabelRemove, RuleSpec
from osprey_ray.sml import SmlError, SmlValidationError, _compile_expr, _Ctx

_QUERY_UDFS = {"DidDeclareVerdict", "DidAddLabel", "DidRemoveLabel"}


class _ListHasAny(Expr):
    """list-column ∩ constant set ≠ ∅ — vectorized membership + segment-any."""

    def __init__(self, column: str, values: tuple):
        self.column = column
        self.values = tuple(values)

    def refs(self):
        return {self.column}

    def eval_batch(self, ctx: EvalContext) -> pa.Array:
        from osprey_ray.kernels.lists import _flat_membership, _segment_any

        target = ctx.resolve(self.column)
        member, offsets, valid = _flat_membership(target, self.values)
        out = _segment_any(member, offsets)
        return pa.array(np.where(valid, out, False), pa.bool_())

    def eval_row(self, rctx) -> bool:
        v = rctx.resolve(self.column)
        return bool(v) and any(x in self.values for x in v)


def _sql_quote(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if v is None:
        return "NULL"
    return repr(v)


def _to_sql(node: ast.expr, ctx: _Ctx, spec: RuleSpec | None) -> str:
    """DuckDB WHERE-clause rendering of the same restricted grammar — the
    ClickHouse/Druid translator analogue."""
    if isinstance(node, ast.Constant):
        return _sql_quote(node.value)
    if isinstance(node, (ast.List, ast.Tuple)):
        return "(" + ", ".join(_sql_quote(e.value) for e in node.elts if isinstance(e, ast.Constant)) + ")"
    if isinstance(node, ast.Name):
        return f'"{node.id}"'
    if isinstance(node, ast.BoolOp):
        op = " AND " if isinstance(node.op, ast.And) else " OR "
        return "(" + op.join(_to_sql(v, ctx, spec) for v in node.values) + ")"
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
        return f"(NOT {_to_sql(node.operand, ctx, spec)})"
    if isinstance(node, ast.Compare) and len(node.ops) == 1:
        l = _to_sql(node.left, ctx, spec)
        r = _to_sql(node.comparators[0], ctx, spec)
        opmap = {
            ast.Eq: "=", ast.NotEq: "<>", ast.Lt: "<", ast.LtE: "<=",
            ast.Gt: ">", ast.GtE: ">=", ast.In: "IN", ast.NotIn: "NOT IN",
        }
        op = opmap.get(type(node.ops[0]))
        if op is None:
            ctx.err(node, "invalid-op", "unsupported comparison in query")
            return "FALSE"
        if op in ("IN", "NOT IN"):
            # mirror the engine path exactly (sml._compile_expr): a literal
            # list renders as SQL IN; a str-typed right side is Python
            # substring semantics → contains(); a list-typed column is
            # membership → list_contains(); anything else is a typed error
            # rather than silently-divergent SQL (round-3 advice)
            neg = op == "NOT IN"
            rnode = node.comparators[0]
            if isinstance(rnode, (ast.List, ast.Tuple)):
                return f"({l} {op} {r})"
            rt = None
            if isinstance(rnode, ast.Name):
                rt = ctx.types.get(rnode.id) or ctx.input_columns.get(rnode.id)
            if rt == "str":
                if not (isinstance(node.left, ast.Constant) and isinstance(node.left.value, str)):
                    ctx.err(node, "type-error", "'in <string>' needs a string literal on the left")
                    return "FALSE"
                e = f"contains({r}, {_sql_quote(node.left.value)})"
                return f"(NOT {e})" if neg else e
            if rt == "list":
                e = f"COALESCE(list_contains({r}, {l}), FALSE)"
                return f"(NOT {e})" if neg else e
            ctx.err(
                node, "invalid-op",
                "unsupported 'in' right side for SQL translation "
                "(need a literal list, a string column, or a list column)",
            )
            return "FALSE"
        if op == "=" and isinstance(node.comparators[0], ast.Constant) and node.comparators[0].value is None:
            return f"({l} IS NULL)"
        if op == "<>" and isinstance(node.comparators[0], ast.Constant) and node.comparators[0].value is None:
            return f"({l} IS NOT NULL)"
        # null-tolerant equality, matching the engine's == semantics
        if op == "=":
            return f"({l} IS NOT DISTINCT FROM {r})"
        if op == "<>":
            return f"({l} IS DISTINCT FROM {r})"
        return f"({l} {op} {r})"
    if isinstance(node, ast.BinOp):
        from osprey_ray.sml import _BIN

        op = _BIN.get(type(node.op))
        if op in ("+", "-", "*", "/"):
            return f"({_to_sql(node.left, ctx, spec)} {op} {_to_sql(node.right, ctx, spec)})"
        ctx.err(node, "invalid-op", f"operator {op!r} not supported in query SQL")
        return "FALSE"
    if isinstance(node, ast.Call) and isinstance(node.func, ast.Name) and node.func.id in _QUERY_UDFS:
        kw = {k.arg: k.value.value for k in node.keywords if isinstance(k.value, ast.Constant)}
        if node.func.id == "DidDeclareVerdict":
            return f"list_contains(\"__verdicts\", {_sql_quote(kw.get('verdict', ''))})"
        rules = _mutation_rules(ctx, node, spec)
        lst = ", ".join(_sql_quote(r) for r in sorted(rules))
        return f'list_has_any("__rules_fired", [{lst}])'
    if isinstance(node, ast.Call) and isinstance(node.func, ast.Name) and node.func.id == "RegexMatch":
        # the reference's query-only RegexMatch UDF (query_language/udfs/
        # regex_match.py:17) — engine side evaluates the kernel; SQL side
        # renders DuckDB's RE2 regexp_matches (same engine as Arrow's)
        tgt = None
        pat = None
        ci = True
        for k in node.keywords:
            if k.arg in ("s", "target") and isinstance(k.value, ast.Name):
                tgt = f'"{k.value.id}"'
            elif k.arg == "pattern" and isinstance(k.value, ast.Constant):
                pat = k.value.value
            elif k.arg == "case_insensitive" and isinstance(k.value, ast.Constant):
                ci = bool(k.value.value)
        if tgt is None or pat is None:
            ctx.err(node, "invalid-call", "RegexMatch requires s=<name>, pattern='…'")
            return "FALSE"
        flag = ", 'i'" if ci else ""
        return f"regexp_matches({tgt}, {_sql_quote(pat)}{flag})"
    ctx.err(node, "invalid-expr", "unsupported query syntax")
    return "FALSE"


def _mutation_rules(ctx: _Ctx, node: ast.Call, spec: RuleSpec | None) -> set[str]:
    kw = {k.arg: k.value.value for k in node.keywords if isinstance(k.value, ast.Constant)}
    label = kw.get("label_name")
    if label is None:
        ctx.err(node, "invalid-call", f"{node.func.id} requires label_name='…'")  # type: ignore[union-attr]
        return set()
    if spec is None:
        ctx.err(node, "invalid-call", f"{node.func.id} requires the ruleset (spec=) to resolve triggers")  # type: ignore[union-attr]
        return set()
    want = LabelAdd if node.func.id == "DidAddLabel" else LabelRemove  # type: ignore[union-attr]
    rules: set[str] = set()
    for trg in spec.triggers:
        if any(isinstance(ef, want) and ef.label == label for ef in trg.then):
            rules.update(trg.rules_any)
    return rules


def _node_value(node: ast.expr):
    """Literal value of a node (ast_druid_translator.py get_ast_node_value:
    unary minus folds into negative numbers, lists recurse)."""
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, (ast.List, ast.Tuple)):
        return [_node_value(e) for e in node.elts]
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        v = _node_value(node.operand)
        if isinstance(v, (int, float)):
            return -v
    raise _Untranslatable(node, "node has no known value attribute")


class _Untranslatable(Exception):
    """A construct the target dialect cannot express — surfaced as the
    reference's ClickhouseTransformException / DruidQueryTransformException."""

    def __init__(self, node: ast.AST, why: str):
        self.node = node
        self.why = why
        super().__init__(why)


def _comparison_parts(node: ast.Compare) -> tuple[str, object]:
    """(dimension, value) of a column-vs-literal comparison
    (ast_druid_translator.py get_comparison_dimension/value)."""
    left, right = node.left, node.comparators[0]
    if isinstance(left, ast.Name):
        return left.id, _node_value(right)
    if isinstance(right, ast.Name):
        return right.id, _node_value(left)
    raise _Untranslatable(node, "binary comparison must contain at least one column")


class _ClickhouseTranslator:
    """Osprey-query AST → parameterized ClickHouse WHERE clause
    (ast_clickhouse_translator.py:50-223).  Returns
    ``{'sql': str, 'params': dict}`` with ``{param_N: Type}`` placeholders."""

    _CH_TYPES = {bool: "Int64", int: "Int64", float: "Float64", str: "String"}

    def __init__(self, columns: dict[str, str], spec: RuleSpec | None):
        self.columns = columns
        self.spec = spec
        self.params: dict[str, object] = {}
        self._n = 0

    def _param(self, val) -> str:
        name = f"param_{self._n}"
        self._n += 1
        if isinstance(val, bool):
            self.params[name] = int(val)
        else:
            self.params[name] = val
        t = "Array(String)" if isinstance(val, list) else self._CH_TYPES.get(type(val), "String")
        return f"{{{name}: {t}}}"

    def translate(self, node: ast.expr) -> str:
        if isinstance(node, ast.BoolOp):
            op = " AND " if isinstance(node.op, ast.And) else " OR "
            return "(" + op.join(self.translate(v) for v in node.values) + ")"
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
            return f"NOT ({self.translate(node.operand)})"
        if isinstance(node, ast.Compare) and len(node.ops) == 1:
            return self._compare(node)
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
            return self._call(node)
        raise _Untranslatable(node, "unknown AST expression")

    def _compare(self, node: ast.Compare) -> str:
        op = node.ops[0]
        left, right = node.left, node.comparators[0]
        if isinstance(left, ast.Name) and isinstance(right, ast.Name):
            if isinstance(op, ast.Eq):
                return f"{left.id} = {right.id}"
            if isinstance(op, ast.NotEq):
                return f"{left.id} != {right.id}"
            raise _Untranslatable(
                node, "when comparing two features, only the `==` and `!=` operators are supported"
            )
        dim, val = _comparison_parts(node)
        if val is None:
            if isinstance(op, ast.Eq):
                return f"{dim} IS NULL"
            if isinstance(op, ast.NotEq):
                return f"{dim} IS NOT NULL"
            raise _Untranslatable(node, "NULL comparisons only support `==` and `!=` operators")
        if isinstance(op, ast.Eq):
            return f"{dim} = {self._param(val)}"
        if isinstance(op, ast.NotEq):
            return f"{dim} != {self._param(val)}"
        if isinstance(op, ast.In):
            return self._in(node, dim, val)
        if isinstance(op, ast.NotIn):
            return f"NOT ({self._in(node, dim, val)})"
        sym = {ast.Lt: "<", ast.LtE: "<=", ast.Gt: ">", ast.GtE: ">="}.get(type(op))
        if sym is None:
            raise _Untranslatable(node, "unknown binary comparator")
        return f"{dim} {sym} {self._param(val)}"

    def _in(self, node: ast.Compare, dim: str, val) -> str:
        # `'x' in TextCol` → substring LIKE; `'x' in ListCol` → has();
        # `Col in [...]` → IN — the dimension/value swap means the column
        # is always `dim` here (ast_clickhouse_translator.py:186-206)
        if isinstance(val, str):
            if self.columns.get(dim) == "list":
                return f"has({dim}, {self._param(val)})"
            return f"LOWER({dim}) LIKE LOWER({self._param('%' + val + '%')})"
        if isinstance(val, list):
            if not val:
                return "FALSE"
            return f"{dim} IN {self._param(val)}"
        raise _Untranslatable(node, 'invalid "IN" comparison value type, must be string or list')

    def _call(self, node: ast.Call) -> str:
        name = node.func.id  # type: ignore[union-attr]
        kw = {k.arg: k.value.value for k in node.keywords if isinstance(k.value, ast.Constant)}
        if name == "DidDeclareVerdict":
            return f"has(__verdicts, {self._param(kw.get('verdict', ''))})"
        if name in ("DidAddLabel", "DidRemoveLabel"):
            ctx = _Ctx(file="<query>", input_columns=self.columns)
            rules = sorted(_mutation_rules(ctx, node, self.spec))
            if ctx.errors:
                raise _Untranslatable(node, ctx.errors[0].message)
            return f"hasAny(__rules_fired, {self._param(rules)})"
        if name == "RegexMatch":
            dim, pat, ci = _regex_args(node)
            return f"match({dim}, {self._param(('(?i)' if ci else '') + pat)})"
        raise _Untranslatable(node, f"UDF {name!r} is not a query UDF")


def _regex_args(node: ast.Call) -> tuple[str, str, bool]:
    tgt = pat = None
    ci = True
    for k in node.keywords:
        if k.arg in ("s", "target", "item") and isinstance(k.value, ast.Name):
            tgt = k.value.id
        elif k.arg in ("pattern", "regex") and isinstance(k.value, ast.Constant):
            pat = k.value.value
        elif k.arg == "case_insensitive" and isinstance(k.value, ast.Constant):
            ci = bool(k.value.value)
    if tgt is None or pat is None:
        raise _Untranslatable(node, "RegexMatch requires s=<name>, pattern='…'")
    return tgt, pat, ci


class _DruidTranslator:
    """Osprey-query AST → native Druid filter JSON
    (ast_druid_translator.py:18-185)."""

    def __init__(self, columns: dict[str, str], spec: RuleSpec | None):
        self.columns = columns
        self.spec = spec

    def translate(self, node: ast.expr) -> dict:
        if isinstance(node, ast.BoolOp):
            kind = "and" if isinstance(node.op, ast.And) else "or"
            return {"type": kind, "fields": [self.translate(v) for v in node.values]}
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
            return {"type": "not", "field": self.translate(node.operand)}
        if isinstance(node, ast.Compare) and len(node.ops) == 1:
            return self._compare(node)
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
            return self._call(node)
        raise _Untranslatable(node, "unknown AST expression")

    def _compare(self, node: ast.Compare) -> dict:
        op = node.ops[0]
        left, right = node.left, node.comparators[0]
        if isinstance(left, ast.Name) and isinstance(right, ast.Name):
            cc = {"type": "columnComparison", "dimensions": [left.id, right.id]}
            if isinstance(op, ast.Eq):
                return cc
            if isinstance(op, ast.NotEq):
                return {"type": "not", "field": cc}
            raise _Untranslatable(
                node, "when comparing two features, only the `==` and `!=` operators are supported"
            )
        dim, val = _comparison_parts(node)
        if isinstance(op, ast.Eq):
            return {"type": "selector", "dimension": dim, "value": val}
        if isinstance(op, ast.NotEq):
            return {"type": "not", "field": {"type": "selector", "dimension": dim, "value": val}}
        if isinstance(op, ast.In):
            return self._in(node, dim, val)
        if isinstance(op, ast.NotIn):
            return {"type": "not", "field": self._in(node, dim, val)}
        bound = {"type": "bound", "dimension": dim, "ordering": self._ordering(val)}
        if isinstance(op, ast.Lt):
            bound.update(upper=val, upperStrict=True)
        elif isinstance(op, ast.LtE):
            bound.update(upper=val)
        elif isinstance(op, ast.Gt):
            bound.update(lower=val, lowerStrict=True)
        elif isinstance(op, ast.GtE):
            bound.update(lower=val)
        else:
            raise _Untranslatable(node, "unknown binary comparator")
        # range filters need an explicit not-null guard (translator:86-96)
        return {
            "type": "and",
            "fields": [
                {"type": "not", "field": {"type": "selector", "dimension": dim, "value": None}},
                bound,
            ],
        }

    @staticmethod
    def _ordering(val) -> str:
        if isinstance(val, bool):
            raise _Untranslatable(ast.Constant(val), f"cannot compare a {type(val).__name__}")
        if isinstance(val, (int, float)):
            return "numeric"
        if isinstance(val, str):
            return "lexicographic"
        raise _Untranslatable(ast.Constant(val), f"cannot compare a {type(val).__name__}")

    def _in(self, node: ast.Compare, dim: str, val) -> dict:
        if isinstance(val, str):
            return {
                "type": "search",
                "dimension": dim,
                "query": {"type": "insensitive_contains", "value": val},
            }
        if isinstance(val, list):
            return {"type": "in", "dimension": dim, "values": val}
        raise _Untranslatable(node, 'invalid "in" comparison value type, must be string or list')

    def _call(self, node: ast.Call) -> dict:
        name = node.func.id  # type: ignore[union-attr]
        kw = {k.arg: k.value.value for k in node.keywords if isinstance(k.value, ast.Constant)}
        if name == "DidDeclareVerdict":
            # did_declare_verdict.py:28-34 arrayContainsElement on the
            # verdict dimension — ours is the __verdicts list column
            return {
                "type": "arrayContainsElement",
                "column": "__verdicts",
                "elementMatchType": "STRING",
                "elementMatchValue": kw.get("verdict", ""),
            }
        if name in ("DidAddLabel", "DidRemoveLabel"):
            ctx = _Ctx(file="<query>", input_columns=self.columns)
            rules = sorted(_mutation_rules(ctx, node, self.spec))
            if ctx.errors:
                raise _Untranslatable(node, ctx.errors[0].message)
            fields = [
                {
                    "type": "arrayContainsElement",
                    "column": "__rules_fired",
                    "elementMatchType": "STRING",
                    "elementMatchValue": r,
                }
                for r in rules
            ]
            if not fields:
                return {"type": "false"}
            return fields[0] if len(fields) == 1 else {"type": "or", "fields": fields}
        if name == "RegexMatch":
            dim, pat, _ci = _regex_args(node)
            return {"type": "regex", "dimension": dim, "pattern": pat}
        raise _Untranslatable(node, f"UDF {name!r} is not a query UDF")


class CompiledQuery:
    def __init__(self, expr: Expr, sql: str, text: str,
                 tree: ast.expr | None = None,
                 columns: dict[str, str] | None = None,
                 spec: RuleSpec | None = None):
        self.expr = expr
        self._sql = sql
        self.text = text
        self._tree = tree
        self._columns = columns or {}
        self._spec = spec

    def to_sql(self) -> str:
        """DuckDB WHERE clause — the SQL-translator surface."""
        return self._sql

    def _translate(self, translator_cls):
        if self._tree is None:
            raise SmlValidationError(
                [SmlError("<query>", 0, 0, "untranslatable", "query AST not retained")]
            )
        tr = translator_cls(self._columns, self._spec)
        try:
            return tr, tr.translate(self._tree)
        except _Untranslatable as e:
            raise SmlValidationError(
                [SmlError("<query>", getattr(e.node, "lineno", 0),
                          getattr(e.node, "col_offset", 0), "untranslatable", e.why)]
            )

    def to_clickhouse(self) -> dict:
        """Parameterized ClickHouse WHERE clause —
        ``{'sql': str, 'params': {...}}`` with ``{param_N: Type}``
        placeholders (ast_clickhouse_translator.py transform())."""
        tr, sql = self._translate(_ClickhouseTranslator)
        return {"sql": sql, "params": tr.params}

    def to_druid(self) -> dict:
        """Native Druid filter — ``{'filter': {...}}``
        (ast_druid_translator.py transform())."""
        _tr, filt = self._translate(_DruidTranslator)
        return {"filter": filt}

    def mask(self, tbl: pa.Table) -> pa.Array:
        from osprey_ray.expr import _as_array, _bool_operand

        ctx = EvalContext(tbl)
        return _bool_operand(_as_array(self.expr.eval_batch(ctx), ctx.n))


def parse_query(
    text: str,
    columns: dict[str, str],
    spec: RuleSpec | None = None,
) -> CompiledQuery:
    """Compile a query string against the results schema ``columns``
    (name → static type, e.g. from the ruleset's feature/rule names).
    Raises :class:`SmlValidationError` with positioned typed errors."""
    try:
        tree = ast.parse(text, mode="eval")
    except SyntaxError as e:
        raise SmlValidationError(
            [SmlError("<query>", e.lineno or 0, e.offset or 0, "syntax-error", e.msg)]
        )
    ctx = _Ctx(file="<query>", input_columns=dict(columns))

    # rewrite query-UDF calls into _ListHasAny nodes, then compile the rest
    # through the shared SML expression compiler
    def compile_node(node: ast.expr) -> Expr:
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name) and node.func.id in _QUERY_UDFS:
            kw = {k.arg: k.value.value for k in node.keywords if isinstance(k.value, ast.Constant)}
            if node.func.id == "DidDeclareVerdict":
                if "verdict" not in kw:
                    ctx.err(node, "invalid-call", "DidDeclareVerdict requires verdict='…'")
                    return lit(False)
                if "__verdicts" not in ctx.input_columns:
                    ctx.err(node, "unknown-name", "results have no __verdicts column")
                return _ListHasAny("__verdicts", (kw["verdict"],))
            rules = _mutation_rules(ctx, node, spec)
            if "__rules_fired" not in ctx.input_columns:
                ctx.err(node, "unknown-name", "results have no __rules_fired column")
            return _ListHasAny("__rules_fired", tuple(sorted(rules)))
        if isinstance(node, ast.BoolOp):
            from osprey_ray.expr import BoolOp

            return BoolOp(
                "and" if isinstance(node.op, ast.And) else "or",
                [compile_node(v) for v in node.values],
            )
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
            from osprey_ray.expr import Not

            return Not(compile_node(node.operand))
        e, t = _compile_expr(ctx, node)
        return e

    expr = compile_node(tree.body)
    sql = _to_sql(tree.body, ctx, spec)
    if ctx.errors:
        raise SmlValidationError(ctx.errors)
    return CompiledQuery(expr, sql, text, tree=tree.body,
                         columns=dict(columns), spec=spec)


def result_columns(spec: RuleSpec) -> dict[str, str]:
    """name → static type of the execution-results table for ``spec`` —
    what the reference's UniqueStoredNames + post-execution types provide
    to query validation (query_language/__init__.py:22-31)."""
    from osprey_ray.rules import propagate_secret_taint
    from osprey_ray.sml import _STATEFUL_TYPES

    # only the key columns survive stage 1 (the wide input columns are
    # projected away before the exchange — stages/stateless.py KEY_COLS)
    cols: dict[str, str] = {"conv_id": "str", "turn_idx": "int", "ts": "timestamp"}
    tainted = propagate_secret_taint(spec.features)
    for f in spec.features:
        if f.extracted and f.name not in tainted:
            cols[f.name] = "Any"
    for s in spec.stateful:
        for n in ([f"{s.name}__id", f"{s.name}__count"] if type(s).__name__ == "SessionWindow" else [s.name]):
            cols[n] = _STATEFUL_TYPES.get(type(s).__name__, "int")
    for r in spec.rules:
        cols[r.name] = "bool"
    if spec.triggers:
        cols["__verdicts"] = "list"
        cols["__rules_fired"] = "list"
    return cols


def filter_results(ds, query: CompiledQuery):
    """Apply a compiled query to a results Dataset (or Table) — vectorized
    batch filter, streaming-safe."""

    def f(t: pa.Table) -> pa.Table:
        return t.filter(query.mask(t))

    if isinstance(ds, pa.Table):
        return f(ds)
    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Paginated scan + capped export (reference UI scan surface:
# worker/ui_api/osprey/views/events.py — paginated event scan with offset
# manifests and a MAX_CSV_ROWS=100_000 export cap, views/events.py:38)
# ---------------------------------------------------------------------------

MAX_EXPORT_ROWS = 100_000  # the reference's MAX_CSV_ROWS


def scan_page(
    ds,
    page_size: int = 1000,
    after: tuple[int, int] | None = None,
    query: "CompiledQuery | None" = None,
):
    """One page of a stable-ordered scan over an events-shaped Dataset
    (``ts``, ``event_id`` columns), ordered by ``(ts, event_id)``.

    The reference paginates with row offsets; at 100 TB an OFFSET scan
    re-reads every page before the one requested, so this is the keyset
    re-expression: ``after`` is the (ts_us, event_id) of the previous
    page's last row, each batch keeps only rows past it (and at most
    ``page_size`` of them — a per-batch partial top-k), and the driver
    merges the ≤ page_size × n_batches survivors.  Returns
    ``(page_table, next_after)`` where ``next_after`` is ``None`` on the
    final page.
    """

    def part(t: pa.Table) -> pa.Table:
        if query is not None:
            t = t.filter(query.mask(t))
        ts = t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = t.append_column("__ts_us", ts)
        if after is not None:
            a_ts, a_id = after
            keep = pc.or_(
                pc.greater(ts, a_ts),
                pc.and_(pc.equal(ts, a_ts), pc.greater(t["event_id"], a_id)),
            )
            t = t.filter(keep)
        return t.sort_by([("__ts_us", "ascending"), ("event_id", "ascending")]).slice(
            0, page_size
        )

    parts = ds.map_batches(part, batch_format="pyarrow").to_arrow_refs()
    import pyarrow as _pa
    import ray as _ray

    merged = _pa.concat_tables([t for t in _ray.get(parts)], promote_options="default")
    merged = merged.sort_by(
        [("__ts_us", "ascending"), ("event_id", "ascending")]
    ).slice(0, page_size)
    nxt = None
    if merged.num_rows == page_size:
        nxt = (
            merged["__ts_us"][-1].as_py(),
            merged["event_id"][-1].as_py(),
        )
    return merged.drop_columns(["__ts_us"]), nxt


def export_rows(ds, path: str, max_rows: int = MAX_EXPORT_ROWS) -> int:
    """Bounded export — refuses (like the reference's MAX_CSV_ROWS cap)
    rather than silently truncating or OOMing the driver.  Counts first
    (streaming), then writes Parquet.  Returns the row count."""
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"export of {n} rows exceeds the {max_rows}-row cap; "
            "narrow the query or page with scan_page()"
        )
    ds.write_parquet(path)
    return n
