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
  into a warehouse holding the written Parquet.

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


class CompiledQuery:
    def __init__(self, expr: Expr, sql: str, text: str):
        self.expr = expr
        self._sql = sql
        self.text = text

    def to_sql(self) -> str:
        """DuckDB WHERE clause — the SQL-translator surface."""
        return self._sql

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
    return CompiledQuery(expr, sql, text)


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
