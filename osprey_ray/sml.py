"""SML-style rules-file frontend: restricted-Python text → :class:`RuleSpec`.

The reference's whole user surface is SML — Python-shaped rule files parsed
into an AST and statically validated with positioned, typed errors
(/root/reference/osprey_worker/src/osprey/engine/ast/grammar.py:188-877,
engine/ast_validator/validators/validate_static_types.py:33-80).  This
module is that surface for the Ray engine: a user can bring a ruleset over
as text instead of authoring Python dataclasses.

Supported statements (the reference's grammar subset that maps onto this
engine):

- ``Name = <expr>`` / ``Name: <type> = <expr>`` — feature assignment; the
  optional annotation (``str``, ``int``, ``float``, ``bool``, ``list``,
  ``Optional[T]``, ``Entity[T]``, ``Secret[T]``, ``Union[A, B, ...]``,
  ``ExtractSecret[T]``, ``ExtractLiteral[T]``) is checked against the
  inferred expression type.  ``Secret[...]`` marks the feature secret
  (never extracted; taint propagates — rules.py); ``ExtractSecret[...]``
  launders the taint (the value extracts, dependents are clean);
  ``ExtractLiteral[...]`` forces extraction of constant assignments, which
  are otherwise filtered from the output (grammar.py:354-394).  UDFs with a
  dynamic return type (JsonData, Coalesce, …) must be assigned with an
  annotation (validate_dynamic_calls_have_annotated_rvalue.py).
- ``Name = Rule(when_all=[...], description='…')``
- ``WhenRules(rules_any=[RuleA, ...], then=[effects…])`` with effects
  ``DeclareVerdict('v')``, ``LabelAdd('label', expires_after=3600)``,
  ``LabelRemove('label')``.
- Stateful declarations: ``Name = IncrementWindow(when=…, window_seconds=…)``,
  ``TumblingCount``, ``SessionWindow``, ``SequenceMatch``, ``WindowCount``,
  ``KvCache``, ``HasLabel`` — this engine's §2.4 stateful families.
- ``Import(rules=['models/base.sml'])`` — static include with duplicate
  checking (stdlib/udfs/import_.py:17-82).
- ``Require(rule='rules/x.sml', require_if=<expr>)`` — gated sub-ruleset
  (stdlib/udfs/require.py:14-58 → :meth:`RuleSpec.gated`).

Expressions: literals, f-strings, names, ``and/or/not``, arithmetic /
comparison operators, ``in`` / ``not in`` (inferred: substring test when the
right side is a string, membership when it is a list), and keyword-only
kernel calls (the reference's UDF call convention — positional arguments are
a validation error, matching ``ArgumentsBase``).

Errors are collected (not fail-fast) and raised as
:class:`SmlValidationError` with ``(file, line, col, kind, message)`` per
entry — the analogue of the reference's ``ValidationError`` rendering.
"""

from __future__ import annotations

import ast
import os
from dataclasses import dataclass, field

from osprey_ray.expr import BinOp, BoolOp, Cmp, Expr, Fmt, IsNull, Neg, Not, col, fn, lit
from osprey_ray.kernels import list_kernels
from osprey_ray.rules import (
    AbsenceAlert,
    DeclareVerdict,
    Feature,
    FollowedBy,
    HasLabel,
    IncrementWindow,
    KvCache,
    LabelAdd,
    LabelRemove,
    Rule,
    RuleSpec,
    SequenceMatch,
    SessionWindow,
    TumblingCount,
    WhenRules,
    WindowCount,
)

# column types of the transcript input (BASELINE.json input_hint)
DEFAULT_INPUT_COLUMNS: dict[str, str] = {
    "conv_id": "str",
    "turn_idx": "int",
    "role": "str",
    "text": "str",
    "tool": "str",
    "ts": "timestamp",
}

# reference-name → engine-kernel aliases (example_plugins use the String*
# prefix for case kernels)
KERNEL_ALIASES = {
    "StringToLower": "ToLower",
    "StringToUpper": "ToUpper",
    "StringReplace": "Replace",
    "StringStrip": "Strip",
    "ExtractDomains": "StringExtractDomains",
    "ExtractURLs": "StringExtractURLs",
}

# static return types for type inference (subset — unknown kernels are Any)
_KERNEL_TYPES: dict[str, str] = {
    "StringLength": "int", "ToLower": "str", "ToUpper": "str", "Strip": "str",
    "LStrip": "str", "RStrip": "str", "Replace": "str", "Join": "str",
    "Split": "list", "Tokenize": "list", "StringExtractDomains": "list",
    "StringExtractURLs": "list", "ExtractListDomains": "list",
    "ExtractEmoji": "list", "ListSort": "list", "ConcatStringLists": "list",
    "StringContains": "bool", "CheckCensorized": "bool", "RegexMatch": "bool",
    "StartsWith": "bool", "EndsWith": "bool", "ListContains": "bool",
    "RegexListContains": "bool", "CensorizedListContains": "bool",
    "ListLength": "int", "ListContainsCount": "int", "SubstrCount": "int",
    "HashMd5": "str", "HashSha1": "str", "HashSha256": "str", "HashSha512": "str",
    "Base64Encode": "str", "Base64Decode": "str", "EmailDomain": "str",
    "EmailSubdomain": "str", "EmailLocalPart": "str", "DomainTld": "str",
    "RootDomain": "str", "IpNetwork": "str", "PhonePrefix": "str",
    "PhoneCountry": "str", "ExtractCookie": "str", "ForceString": "str",
    "RegexExtract": "str", "SimpleListContains": "str", "DidFromUri": "str",
    "LinksFromFacets": "list", "MentionsFromFacets": "list", "TagsFromFacets": "list",
    "RandomBool": "bool", "RandomInt": "int", "ExperimentBucket": "int",
    "TimeSince": "float", "GetTimestampBucket": "int", "GetSnowflakeBucket": "int",
    "StringClean": "str", "Entity": "str", "GetActionName": "str",
}

# kernels with a dynamic return type (JsonData, EntityJson, Coalesce, …):
# calling one requires an annotated assignment, like the reference's
# UdfBase.has_dynamic_result() enforcement
_DYNAMIC_KERNELS = frozenset(k for k in list_kernels() if k not in _KERNEL_TYPES)

_STATEFUL = {
    "IncrementWindow": IncrementWindow,
    "TumblingCount": TumblingCount,
    "SessionWindow": SessionWindow,
    "SequenceMatch": SequenceMatch,
    "WindowCount": WindowCount,
    "KvCache": KvCache,
    "HasLabel": HasLabel,
}
_STATEFUL_TYPES = {
    "IncrementWindow": "int", "TumblingCount": "int", "WindowCount": "int",
    "SequenceMatch": "bool", "HasLabel": "bool", "KvCache": "Any",
}

_EFFECTS = {"DeclareVerdict", "LabelAdd", "LabelRemove"}

# stream-emission patterns: declared like stateful features but they route
# to RuleSpec.absences / RuleSpec.follows (they emit STREAM rows, never a
# per-turn column, so the bound name is the pattern name, not a feature)
_STREAMS = {"AbsenceAlert": AbsenceAlert, "FollowedBy": FollowedBy}


@dataclass(frozen=True)
class SmlError:
    file: str
    line: int
    col: int
    kind: str
    message: str

    def __str__(self) -> str:  # reference-style rendering
        return f"{self.file}:{self.line}:{self.col}: {self.kind}: {self.message}"


class SmlValidationError(Exception):
    def __init__(self, errors: list[SmlError]):
        self.errors = errors
        super().__init__("\n".join(str(e) for e in errors))


@dataclass
class _Ctx:
    file: str
    input_columns: dict[str, str]
    errors: list[SmlError] = field(default_factory=list)
    # name → inferred type ('str' 'int' 'float' 'bool' 'list' 'timestamp' 'Any')
    types: dict[str, str] = field(default_factory=dict)
    features: list[Feature] = field(default_factory=list)
    stateful: list = field(default_factory=list)
    rules: list[Rule] = field(default_factory=list)
    triggers: list[WhenRules] = field(default_factory=list)
    rule_names: set[str] = field(default_factory=set)
    absences: list = field(default_factory=list)
    follows: list = field(default_factory=list)

    def err(self, node: ast.AST, kind: str, message: str) -> None:
        self.errors.append(
            SmlError(self.file, getattr(node, "lineno", 0), getattr(node, "col_offset", 0), kind, message)
        )


_ANNOT_BASES = {"str", "int", "float", "bool", "list", "None", "Any"}
_ANNOT_WRAPPERS = {"Optional", "Entity", "Secret", "List", "Union",
                   "ExtractSecret", "ExtractLiteral"}


@dataclass
class _Annot:
    """Parsed annotation (grammar.py:816-877 Annotation /
    AnnotationWithVariants + Annotations enum).  ``types`` holds the
    acceptable variant set — a single base for simple annotations, several
    for ``Union[...]``."""

    types: tuple[str, ...] = ("Any",)
    secret: bool = False
    extract_secret: bool = False
    extract_literal: bool = False

    def accepts(self, t: str) -> bool:
        if t == "Any" or "Any" in self.types:
            return True
        # int literals satisfy float annotations (InstanceTypeChecker's
        # is_int_for_float, udf/rvalue_type_checker.py:88-91)
        return t in self.types or (t == "int" and "float" in self.types)

    def display(self) -> str:
        return self.types[0] if len(self.types) == 1 else f"Union[{', '.join(self.types)}]"


def _annot_base(ctx: _Ctx, node: ast.expr) -> str:
    """A single simple type name inside a wrapper; errors → 'Any'."""
    if isinstance(node, ast.Name) and node.id in _ANNOT_BASES:
        return node.id
    if isinstance(node, ast.Constant) and node.value is None:
        return "None"
    ctx.err(node, "unknown-type", "expected simple type in annotation")
    return "Any"


def _parse_annotation(ctx: _Ctx, node: ast.expr) -> _Annot:
    """Unknown annotations are typed errors (the reference's
    AnnotationConversionError surface, udf/rvalue_type_checker.py:115-210)."""
    if isinstance(node, ast.Name):
        if node.id in _ANNOT_BASES:
            return _Annot(types=(node.id,))
        ctx.err(node, "unknown-type", f"unknown annotation {node.id!r}")
        return _Annot()
    if isinstance(node, ast.Subscript) and isinstance(node.value, ast.Name):
        w = node.value.id
        if w not in _ANNOT_WRAPPERS:
            ctx.err(node, "unknown-type", f"unknown annotation wrapper {w!r}")
            return _Annot()
        if w == "List":
            return _Annot(types=("list",))
        if w == "Union":
            elts = node.slice.elts if isinstance(node.slice, ast.Tuple) else [node.slice]
            if len(elts) == 1:
                # UnionTypeChecker.parse: one-item unions are rejected with
                # a hint to use the bare type
                ctx.err(
                    node, "invalid-annotation",
                    "a `Union` of one item should be represented as the item by itself",
                )
                return _Annot(types=(_annot_base(ctx, elts[0]),))
            seen: dict[str, ast.expr] = {}
            variants = []
            for el in elts:
                base = _annot_base(ctx, el)
                if base in seen:
                    ctx.err(el, "invalid-annotation",
                            f"duplicated type `{base}` seen in `Union[...]`")
                    continue
                seen[base] = el
                variants.append(base)
            return _Annot(types=tuple(variants))
        inner = _parse_annotation(ctx, node.slice)
        if w == "Optional":
            return _Annot(types=tuple(dict.fromkeys(inner.types + ("None",))))
        if w == "Secret":
            return _Annot(types=inner.types, secret=True)
        if w == "ExtractSecret":
            return _Annot(types=inner.types, extract_secret=True)
        if w == "ExtractLiteral":
            return _Annot(types=inner.types, extract_literal=True)
        return _Annot(types=inner.types)  # Entity[T] → T
    ctx.err(node, "unknown-type", "unsupported annotation form")
    return _Annot()


_BIN = {
    ast.Add: "+", ast.Sub: "-", ast.Mult: "*", ast.Div: "/", ast.FloorDiv: "//",
    ast.Mod: "%", ast.Pow: "**", ast.LShift: "<<", ast.RShift: ">>",
    ast.BitAnd: "&", ast.BitOr: "|", ast.BitXor: "^",
}
_CMP = {
    ast.Eq: "==", ast.NotEq: "!=", ast.Lt: "<", ast.LtE: "<=",
    ast.Gt: ">", ast.GtE: ">=",
}
_NUM = {"int", "float"}


def _compile_expr(ctx: _Ctx, node: ast.expr) -> tuple[Expr, str]:
    """→ (Expr, inferred type)."""
    if isinstance(node, ast.Constant):
        v = node.value
        t = {str: "str", bool: "bool", int: "int", float: "float", type(None): "Any"}.get(type(v), "Any")
        return lit(v), t
    if isinstance(node, (ast.List, ast.Tuple)):
        vals = []
        for el in node.elts:
            if not isinstance(el, ast.Constant):
                ctx.err(el, "invalid-literal", "list literals may contain only constants")
                return lit(None), "Any"
            vals.append(el.value)
        return lit(vals), "list"
    if isinstance(node, ast.JoinedStr):
        template = []
        for v in node.values:
            if isinstance(v, ast.Constant):
                template.append(str(v.value))
            elif isinstance(v, ast.FormattedValue) and isinstance(v.value, ast.Name):
                _require_name(ctx, v.value)
                template.append("{" + v.value.id + "}")
            else:
                ctx.err(v, "invalid-fstring", "f-string fields must be bare names")
        return Fmt("".join(template)), "str"
    if isinstance(node, ast.Name):
        t = _require_name(ctx, node)
        return col(node.id), t
    if isinstance(node, ast.BoolOp):
        sub = [_compile_expr(ctx, v)[0] for v in node.values]
        return BoolOp("and" if isinstance(node.op, ast.And) else "or", sub), "bool"
    if isinstance(node, ast.UnaryOp):
        sub, t = _compile_expr(ctx, node.operand)
        if isinstance(node.op, ast.Not):
            return Not(sub), "bool"
        if isinstance(node.op, ast.USub):
            if t not in _NUM and t != "Any":
                ctx.err(node, "type-error", f"unary - on {t}")
            return Neg(sub), t
        ctx.err(node, "invalid-op", "unsupported unary operator")
        return lit(None), "Any"
    if isinstance(node, ast.BinOp):
        op = _BIN.get(type(node.op))
        if op is None:
            ctx.err(node, "invalid-op", "unsupported binary operator")
            return lit(None), "Any"
        le, lt = _compile_expr(ctx, node.left)
        re_, rt = _compile_expr(ctx, node.right)
        if op == "+" and "str" in (lt, rt):
            if {lt, rt} <= {"str", "Any"}:
                return BinOp("+", le, re_), "str"
            ctx.err(node, "type-error", f"cannot add {lt} and {rt}")
            return lit(None), "Any"
        for side in (lt, rt):
            if side not in _NUM and side != "Any":
                ctx.err(node, "type-error", f"arithmetic {op!r} on {side}")
                return lit(None), "Any"
        out = "float" if (op == "/" or "float" in (lt, rt)) else ("int" if "Any" not in (lt, rt) else "Any")
        return BinOp(op, le, re_), out
    if isinstance(node, ast.Compare):
        if len(node.ops) != 1:
            ctx.err(node, "invalid-op", "chained comparisons are not supported")
            return lit(None), "Any"
        le, lt = _compile_expr(ctx, node.left)
        re_, rt = _compile_expr(ctx, node.comparators[0])
        op = node.ops[0]
        if isinstance(op, (ast.In, ast.NotIn)):
            neg = isinstance(op, ast.NotIn)
            if rt == "str":
                # Python substring semantics, case-sensitive
                if not isinstance(node.left, ast.Constant) or not isinstance(node.left.value, str):
                    ctx.err(node, "type-error", "'in <string>' needs a string literal on the left")
                    return lit(None), "Any"
                e = fn(
                    "StringContains", target=re_,
                    substring=node.left.value, case_insensitive=False,
                )
                return (Not(e) if neg else e), "bool"
            e = Cmp("not in" if neg else "in", le, re_)
            return e, "bool"
        sym = _CMP.get(type(op))
        if sym is None:
            ctx.err(node, "invalid-op", "unsupported comparison")
            return lit(None), "Any"
        if sym in ("==", "!=") and isinstance(node.comparators[0], ast.Constant) \
                and node.comparators[0].value is None:
            e = IsNull(le)
            return (Not(e) if sym == "!=" else e), "bool"
        if sym in ("<", "<=", ">", ">=") and "str" in (lt, rt) and {lt, rt} - {"str", "Any"}:
            ctx.err(node, "type-error", f"ordered comparison between {lt} and {rt}")
        return Cmp(sym, le, re_), "bool"
    if isinstance(node, ast.Call):
        return _compile_call(ctx, node)
    ctx.err(node, "invalid-expr", f"unsupported syntax: {ast.dump(node)[:60]}")
    return lit(None), "Any"


def _require_name(ctx: _Ctx, node: ast.Name) -> str:
    name = node.id
    if name in ctx.types:
        return ctx.types[name]
    if name in ctx.input_columns:
        return ctx.input_columns[name]
    if name in ctx.rule_names:
        return "bool"
    ctx.err(node, "unknown-name", f"unknown feature or column {name!r}")
    return "Any"


def _kwargs_only(ctx: _Ctx, node: ast.Call, what: str) -> dict[str, ast.expr] | None:
    if node.args:
        ctx.err(node, "positional-args", f"{what} takes keyword arguments only")
        return None
    out = {}
    for kw in node.keywords:
        if kw.arg is None:
            ctx.err(node, "positional-args", f"{what}: **kwargs not allowed")
            return None
        out[kw.arg] = kw.value
    return out


def _const_kwargs(ctx: _Ctx, kwargs: dict[str, ast.expr], what: str) -> dict | None:
    out = {}
    for k, v in kwargs.items():
        if isinstance(v, ast.Constant):
            out[k] = v.value
        elif isinstance(v, (ast.List, ast.Tuple)) and all(isinstance(e, ast.Constant) for e in v.elts):
            out[k] = tuple(e.value for e in v.elts)
        else:
            ctx.err(v, "invalid-literal", f"{what}.{k} must be a constant")
            return None
    return out


def _compile_call(ctx: _Ctx, node: ast.Call) -> tuple[Expr, str]:
    if not isinstance(node.func, ast.Name):
        ctx.err(node, "invalid-call", "only plain-name calls are supported")
        return lit(None), "Any"
    name = KERNEL_ALIASES.get(node.func.id, node.func.id)
    if name not in list_kernels():
        ctx.err(node, "unknown-udf", f"unknown UDF {node.func.id!r}")
        return lit(None), "Any"
    kwargs = _kwargs_only(ctx, node, name)
    if kwargs is None:
        return lit(None), "Any"
    compiled = {}
    for k, v in kwargs.items():
        if isinstance(v, ast.Constant):
            compiled[k] = v.value
        elif isinstance(v, (ast.List, ast.Tuple)) and all(isinstance(e, ast.Constant) for e in v.elts):
            compiled[k] = tuple(e.value for e in v.elts)
        else:
            compiled[k], _ = _compile_expr(ctx, v)
    # common alias: the reference names the string argument 's'
    if "s" in compiled and "target" not in compiled:
        compiled["target"] = compiled.pop("s")
    return fn(name, **compiled), _KERNEL_TYPES.get(name, "Any")


def _compile_effect(ctx: _Ctx, node: ast.expr):
    if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)):
        ctx.err(node, "invalid-effect", "effects must be effect calls")
        return None
    name = node.func.id
    if name not in _EFFECTS:
        ctx.err(node, "invalid-effect", f"unknown effect {name!r} (expected one of {sorted(_EFFECTS)})")
        return None
    args = [a.value for a in node.args if isinstance(a, ast.Constant)]
    if len(args) != len(node.args):
        ctx.err(node, "invalid-literal", f"{name} arguments must be constants")
        return None
    kwargs = {k.arg: k.value.value for k in node.keywords if isinstance(k.value, ast.Constant)}
    if len(kwargs) != len(node.keywords):
        ctx.err(node, "invalid-literal", f"{name} arguments must be constants")
        return None
    try:
        return {"DeclareVerdict": DeclareVerdict, "LabelAdd": LabelAdd, "LabelRemove": LabelRemove}[name](*args, **kwargs)
    except TypeError as e:
        ctx.err(node, "invalid-effect", f"{name}: {e}")
        return None


def _compile_stateful(ctx: _Ctx, name: str, node: ast.Call):
    cls_name = node.func.id  # type: ignore[union-attr]
    cls = _STATEFUL[cls_name]
    kwargs = _kwargs_only(ctx, node, cls_name)
    if kwargs is None:
        return
    built = {}
    for k, v in kwargs.items():
        if k in ("when", "first", "second", "set_when", "value"):
            built[k], _ = _compile_expr(ctx, v)
        elif isinstance(v, ast.Constant):
            built[k] = v.value
        else:
            ctx.err(v, "invalid-literal", f"{cls_name}.{k} must be a constant")
            return
    try:
        sf = cls(name, **built)
    except TypeError as e:
        ctx.err(node, "invalid-stateful", f"{cls_name}: {e}")
        return
    ctx.stateful.append(sf)
    if cls is SessionWindow:
        ctx.types[f"{name}__id"] = "int"
        ctx.types[f"{name}__count"] = "int"
        ctx.types[name] = "Any"  # the bare name is not a column, but keep known
    else:
        ctx.types[name] = _STATEFUL_TYPES[cls_name]


def _compile_stream(ctx: _Ctx, name: str, node: ast.Call):
    """AbsenceAlert / FollowedBy declarations: first/second are compiled
    bool Exprs, window_seconds a positive constant; the bound name becomes
    the pattern name on the emission stream (not a column — reading it in
    a later expression is an unknown-name error, which is the point)."""
    cls_name = node.func.id  # type: ignore[union-attr]
    cls = _STREAMS[cls_name]
    kwargs = _kwargs_only(ctx, node, cls_name)
    if kwargs is None:
        return
    built = {}
    for k, v in kwargs.items():
        if k in ("first", "second"):
            e, t = _compile_expr(ctx, v)
            if t not in ("bool", "Any"):
                ctx.err(v, "type-error",
                        f"{cls_name}.{k} has type {t}, expected bool")
            built[k] = e
        elif isinstance(v, ast.Constant):
            built[k] = v.value
        else:
            ctx.err(v, "invalid-literal", f"{cls_name}.{k} must be a constant")
            return
    try:
        pat = cls(name, **built)
    except TypeError as e:
        ctx.err(node, "invalid-stream-pattern", f"{cls_name}: {e}")
        return
    (ctx.absences if cls is AbsenceAlert else ctx.follows).append(pat)


def _handle_statement(ctx: _Ctx, st: ast.stmt, root: str, seen_files: set[str]) -> None:
    # Import(...) / Require(...) / WhenRules(...) as expression statements
    if isinstance(st, ast.Expr) and isinstance(st.value, ast.Call) and isinstance(st.value.func, ast.Name):
        call = st.value
        fname = call.func.id
        if fname == "Import":
            kwargs = _kwargs_only(ctx, call, "Import")
            if kwargs is None or "rules" not in kwargs:
                ctx.err(call, "invalid-import", "Import requires rules=[...]")
                return
            consts = _const_kwargs(ctx, {"rules": kwargs["rules"]}, "Import")
            if consts is None:
                return
            for rel in consts["rules"]:
                _load_into(ctx, os.path.join(root, rel), root, seen_files)
            return
        if fname == "Require":
            kwargs = _kwargs_only(ctx, call, "Require")
            if kwargs is None or "rule" not in kwargs or not isinstance(kwargs["rule"], ast.Constant):
                ctx.err(call, "invalid-require", "Require requires rule='path'")
                return
            gate = None
            if "require_if" in kwargs:
                gate, _ = _compile_expr(ctx, kwargs["require_if"])
            sub_ctx = _Ctx(file=kwargs["rule"].value, input_columns=ctx.input_columns)
            sub_ctx.types = dict(ctx.types)
            sub_ctx.rule_names = set(ctx.rule_names)
            _load_into(sub_ctx, os.path.join(root, kwargs["rule"].value), root, seen_files)
            ctx.errors.extend(sub_ctx.errors)
            sub = RuleSpec(sub_ctx.features, sub_ctx.stateful, sub_ctx.rules, sub_ctx.triggers,
                           absences=sub_ctx.absences, follows=sub_ctx.follows)
            if gate is not None:
                sub = sub.gated(gate)
            ctx.features += sub.features
            ctx.stateful += sub.stateful
            ctx.rules += sub.rules
            ctx.triggers += sub.triggers
            ctx.absences += sub.absences
            ctx.follows += sub.follows
            ctx.rule_names |= {r.name for r in sub.rules}
            ctx.types.update(sub_ctx.types)
            return
        if fname == "WhenRules":
            kwargs = _kwargs_only(ctx, call, "WhenRules")
            if kwargs is None:
                return
            rules_any, then = [], []
            rl = kwargs.get("rules_any")
            if not isinstance(rl, (ast.List, ast.Tuple)):
                ctx.err(call, "invalid-trigger", "WhenRules requires rules_any=[...]")
                return
            for el in rl.elts:
                if isinstance(el, ast.Name):
                    if el.id not in ctx.rule_names:
                        ctx.err(el, "unknown-rule", f"trigger references unknown rule {el.id!r}")
                    rules_any.append(el.id)
                else:
                    ctx.err(el, "invalid-trigger", "rules_any entries must be rule names")
            tl = kwargs.get("then")
            if not isinstance(tl, (ast.List, ast.Tuple)):
                ctx.err(call, "invalid-trigger", "WhenRules requires then=[...]")
                return
            for el in tl.elts:
                ef = _compile_effect(ctx, el)
                if ef is not None:
                    then.append(ef)
            ctx.triggers.append(WhenRules(rules_any, then))
            return
        ctx.err(call, "invalid-statement", f"unexpected top-level call {fname!r}")
        return

    if isinstance(st, (ast.Assign, ast.AnnAssign)):
        if isinstance(st, ast.Assign):
            if len(st.targets) != 1 or not isinstance(st.targets[0], ast.Name):
                ctx.err(st, "invalid-assign", "assignment target must be a single name")
                return
            name = st.targets[0].id
            annot = None
            value = st.value
        else:
            if not isinstance(st.target, ast.Name) or st.value is None:
                ctx.err(st, "invalid-assign", "annotated assignment must bind a name")
                return
            name = st.target.id
            annot = _parse_annotation(ctx, st.annotation)
            value = st.value

        if name in ctx.types or name in ctx.rule_names:
            ctx.err(st, "duplicate-name", f"duplicate definition of {name!r}")
            return

        # Rule(...)
        if isinstance(value, ast.Call) and isinstance(value.func, ast.Name) and value.func.id == "Rule":
            kwargs = _kwargs_only(ctx, value, "Rule")
            if kwargs is None:
                return
            wa = kwargs.get("when_all")
            if not isinstance(wa, (ast.List, ast.Tuple)):
                ctx.err(value, "invalid-rule", "Rule requires when_all=[...]")
                return
            conjuncts = []
            for el in wa.elts:
                e, t = _compile_expr(ctx, el)
                if t not in ("bool", "Any"):
                    ctx.err(el, "type-error", f"rule conjunct has type {t}, expected bool")
                conjuncts.append(e)
            desc = ""
            if "description" in kwargs and isinstance(kwargs["description"], ast.Constant):
                desc = kwargs["description"].value
            ctx.rules.append(Rule(name, conjuncts, desc))
            ctx.rule_names.add(name)
            return

        # stateful declaration
        if isinstance(value, ast.Call) and isinstance(value.func, ast.Name) and value.func.id in _STATEFUL:
            _compile_stateful(ctx, name, value)
            return

        # stream-emission pattern declaration (absence timers / pair joins)
        if isinstance(value, ast.Call) and isinstance(value.func, ast.Name) and value.func.id in _STREAMS:
            _compile_stream(ctx, name, value)
            return

        # plain feature — dynamic-return UDF calls must carry an annotation
        # (ValidateDynamicCallsHaveAnnotatedRValue,
        # ast_validator/validators/validate_dynamic_calls_have_annotated_rvalue.py:33-60)
        if (
            annot is None
            and isinstance(value, ast.Call)
            and isinstance(value.func, ast.Name)
            and KERNEL_ALIASES.get(value.func.id, value.func.id) in _DYNAMIC_KERNELS
        ):
            ctx.err(
                value, "must-annotate",
                f"`{value.func.id}(...)` returns a dynamic result, and thus "
                f"must be assigned to a variable with a type annotation",
            )
        e, t = _compile_expr(ctx, value)
        if annot is not None and not annot.accepts(t):
            ctx.err(st, "type-error",
                    f"{name}: annotated {annot.display()} but expression is {t}")
        ctx.features.append(Feature(
            name, e,
            secret=annot.secret if annot else False,
            extract_literal=annot.extract_literal if annot else False,
            extract_secret=annot.extract_secret if annot else False,
        ))
        if annot is not None and len(annot.types) == 1 and annot.types[0] != "Any":
            ctx.types[name] = annot.types[0]
        else:
            ctx.types[name] = t
        return

    ctx.err(st, "invalid-statement", f"unsupported statement {type(st).__name__}")


def _load_into(ctx: _Ctx, path: str, root: str, seen_files: set[str]) -> None:
    ap = os.path.abspath(path)
    # includes are restricted to the ruleset tree, like the reference's
    # import machinery — '../..' or absolute escapes are typed errors, not
    # arbitrary file reads (round-3 advice; error text echoes positions)
    if os.path.commonpath([os.path.abspath(root), ap]) != os.path.abspath(root):
        ctx.errors.append(
            SmlError(path, 0, 0, "invalid-import",
                     f"import path escapes the ruleset root: {path!r}")
        )
        return
    if ap in seen_files:
        return  # static include, idempotent (import_.py duplicate guard)
    seen_files.add(ap)
    try:
        with open(path) as f:
            text = f.read()
    except OSError as e:
        ctx.errors.append(SmlError(path, 0, 0, "missing-file", str(e)))
        return
    prev = ctx.file
    ctx.file = os.path.relpath(path, root)
    _parse_into(ctx, text, root, seen_files)
    ctx.file = prev


def _parse_into(ctx: _Ctx, text: str, root: str, seen_files: set[str]) -> None:
    import warnings

    try:
        with warnings.catch_warnings():
            # regex literals in rules ('\\s', '\\.') are not Python escapes
            warnings.simplefilter("ignore", SyntaxWarning)
            tree = ast.parse(text)
    except SyntaxError as e:
        ctx.errors.append(SmlError(ctx.file, e.lineno or 0, e.offset or 0, "syntax-error", e.msg))
        return
    for st in tree.body:
        _handle_statement(ctx, st, root, seen_files)


def parse_sml(
    text: str,
    name: str = "<sml>",
    input_columns: dict[str, str] | None = None,
    root: str = ".",
) -> RuleSpec:
    """Parse SML text into a validated RuleSpec; raises SmlValidationError
    listing every error with file:line:col positions."""
    ctx = _Ctx(file=name, input_columns=input_columns or DEFAULT_INPUT_COLUMNS)
    _parse_into(ctx, text, root, set())
    if ctx.errors:
        raise SmlValidationError(ctx.errors)
    spec = RuleSpec(ctx.features, ctx.stateful, ctx.rules, ctx.triggers,
                    absences=ctx.absences, follows=ctx.follows)
    try:
        spec.validate()
    except ValueError as e:
        raise SmlValidationError([SmlError(name, 0, 0, "invalid-spec", str(e))])
    return spec


def load_sml(path: str, input_columns: dict[str, str] | None = None) -> RuleSpec:
    """Load a root SML file (Imports/Requires resolved relative to its
    directory) into a validated RuleSpec."""
    root = os.path.dirname(os.path.abspath(path))
    ctx = _Ctx(file=os.path.basename(path), input_columns=input_columns or DEFAULT_INPUT_COLUMNS)
    _load_into(ctx, path, root, set())
    if ctx.errors:
        raise SmlValidationError(ctx.errors)
    spec = RuleSpec(ctx.features, ctx.stateful, ctx.rules, ctx.triggers,
                    absences=ctx.absences, follows=ctx.follows)
    try:
        spec.validate()
    except ValueError as e:
        raise SmlValidationError([SmlError(path, 0, 0, "invalid-spec", str(e))])
    return spec
