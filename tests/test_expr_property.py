"""Property-based batch↔row parity for the expression DSL.

SURVEY §7 calls null/failure-semantics parity the #1 correctness trap; this
generates random well-typed expression trees over nullable int/str/bool
columns and requires the vectorized Arrow evaluation to agree with the
row-at-a-time oracle evaluation on every row.
"""

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from osprey_ray.expr import (
    BoolOp,
    EvalContext,
    ExprError,
    RowContext,
    col,
    lit,
)

INT_COLS = ["i1", "i2"]
STR_COLS = ["s1", "s2"]


def int_expr(depth: int):
    base = st.one_of(
        st.sampled_from([col(c) for c in INT_COLS]),
        st.integers(-50, 50).map(lit),
    )
    if depth <= 0:
        return base
    sub = st.deferred(lambda: int_expr(depth - 1))
    return st.one_of(
        base,
        st.tuples(st.sampled_from(["+", "-", "*"]), sub, sub).map(
            lambda t: {"+": lambda a, b: a + b, "-": lambda a, b: a - b, "*": lambda a, b: a * b}[t[0]](t[1], t[2])
        ),
        sub.map(lambda e: -e),
    )


def bool_expr(depth: int):
    ints = int_expr(max(depth - 1, 0))
    strs = st.sampled_from([col(c) for c in STR_COLS])
    base = st.one_of(
        st.tuples(st.sampled_from(["==", "!=", "<", "<=", ">", ">="]), ints, ints).map(
            lambda t: {
                "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
                "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
                ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
            }[t[0]](t[1], t[2])
        ),
        st.tuples(strs, st.lists(st.one_of(st.sampled_from(["a", "bb", "c d"]), st.none()), min_size=1, max_size=4)).map(
            lambda t: t[0].in_(t[1])
        ),
        st.tuples(strs, strs).map(lambda t: t[0] == t[1]),
    )
    if depth <= 0:
        return base
    sub = st.deferred(lambda: bool_expr(depth - 1))
    return st.one_of(
        base,
        st.lists(sub, min_size=2, max_size=3).map(lambda es: BoolOp("and", es)),
        st.lists(sub, min_size=2, max_size=3).map(lambda es: BoolOp("or", es)),
        sub.map(lambda e: ~e),
    )


ROWS = st.lists(
    st.fixed_dictionaries(
        {
            "i1": st.one_of(st.none(), st.integers(-50, 50)),
            "i2": st.one_of(st.none(), st.integers(-50, 50)),
            "s1": st.one_of(st.none(), st.sampled_from(["a", "bb", "c d", ""])),
            "s2": st.one_of(st.none(), st.sampled_from(["a", "bb", "c d", ""])),
        }
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=300, deadline=None)
@given(expr=bool_expr(2), rows=ROWS)
def test_bool_expr_batch_row_parity(expr, rows):
    tbl = pa.table(
        {
            "i1": pa.array([r["i1"] for r in rows], pa.int64()),
            "i2": pa.array([r["i2"] for r in rows], pa.int64()),
            "s1": pa.array([r["s1"] for r in rows], pa.string()),
            "s2": pa.array([r["s2"] for r in rows], pa.string()),
        }
    )
    batch = expr.eval_batch(EvalContext(tbl))
    batch_vals = batch.to_pylist() if hasattr(batch, "to_pylist") else [batch.as_py()] * len(rows)
    if len(batch_vals) == 1 and len(rows) > 1:
        batch_vals = batch_vals * len(rows)
    for r, bv in zip(rows, batch_vals):
        try:
            rv = expr.eval_row(RowContext(row=dict(r)))
        except ExprError:
            rv = None
        assert bv == rv, f"{r} -> batch {bv!r} vs row {rv!r}"


@settings(max_examples=200, deadline=None)
@given(expr=int_expr(2), rows=ROWS)
def test_int_expr_batch_row_parity(expr, rows):
    tbl = pa.table(
        {
            "i1": pa.array([r["i1"] for r in rows], pa.int64()),
            "i2": pa.array([r["i2"] for r in rows], pa.int64()),
            "s1": pa.array([r["s1"] for r in rows], pa.string()),
            "s2": pa.array([r["s2"] for r in rows], pa.string()),
        }
    )
    batch = expr.eval_batch(EvalContext(tbl))
    batch_vals = batch.to_pylist() if hasattr(batch, "to_pylist") else [batch.as_py()] * len(rows)
    if len(batch_vals) == 1 and len(rows) > 1:
        batch_vals = batch_vals * len(rows)
    for r, bv in zip(rows, batch_vals):
        try:
            rv = expr.eval_row(RowContext(row=dict(r)))
        except ExprError:
            rv = None
        assert bv == rv, f"{r} -> batch {bv!r} vs row {rv!r}"
