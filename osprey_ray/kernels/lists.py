"""List kernels.

Analogues of /root/reference/osprey_worker/src/osprey/engine/stdlib/udfs/
list_length.py:11-17, list_read.py:14-25, list_sort.py:12-18 and the
example-plugin wordlist family (example_plugins/src/udfs/list.py:18-387).
``ListContains`` is the reference's broadcast join of a small static
wordlist — the word set is a compile-time constant shipped inside the plan
(the Ray-side "broadcast small side"), membership is computed on the
flattened child array with ``pc.is_in`` then segment-reduced back to rows
with numpy (no per-row Python in the hot path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osprey_ray.expr import ExprError
from osprey_ray.kernels import kernel


@kernel("ListLength")
class ListLength:
    @staticmethod
    def batch(ctx, target):
        return pc.list_value_length(target)

    @staticmethod
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return len(target)


@kernel("ListRead")
class ListRead:
    """Element at index; out-of-bounds is an *expected* failure → null
    (list_read.py:14-25)."""

    @staticmethod
    def batch(ctx, target, index=0):
        lengths = pc.fill_null(pc.list_value_length(target), 0).to_numpy(zero_copy_only=False)
        ok = lengths > index if index >= 0 else lengths >= -index
        # pc.list_element raises on OOB → guard: replace short lists with null
        safe = pc.if_else(pa.array(ok), target, pa.nulls(ctx.n, target.type))
        if not ok.any():
            return pa.nulls(ctx.n, target.type.value_type)
        return pc.list_element(safe, index)

    @staticmethod
    def row(rctx, target, index=0):
        if target is None:
            raise ExprError("None")
        try:
            return target[index]
        except IndexError:
            raise ExprError("index OOB")


@kernel("ListSort")
class ListSort:
    @staticmethod
    def batch(ctx, target, descending=False):
        out = [
            None if v is None else sorted((x for x in v if x is not None), reverse=descending)
            for v in target.to_pylist()
        ]
        return pa.array(out, target.type)

    @staticmethod
    def row(rctx, target, descending=False):
        if target is None:
            raise ExprError("None")
        return sorted((x for x in target if x is not None), reverse=descending)


def _segment_any(flat_bool: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row any() over a flattened list column given offsets."""
    cums = np.concatenate([[0], np.cumsum(flat_bool.astype(np.int64))])
    per_row = cums[offsets[1:]] - cums[offsets[:-1]]
    return per_row > 0


def _segment_count(flat_bool: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    cums = np.concatenate([[0], np.cumsum(flat_bool.astype(np.int64))])
    return cums[offsets[1:]] - cums[offsets[:-1]]


def _flat_membership(target: pa.Array, values) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    arr = target.combine_chunks() if isinstance(target, pa.ChunkedArray) else target
    # normalize offsets to start at 0 for the flattened values
    offsets = np.asarray(arr.offsets)
    flat = arr.flatten()
    offsets = offsets - offsets[0]
    member = pc.fill_null(pc.is_in(flat, value_set=pa.array(list(values), pa.string())), False)
    valid = pc.fill_null(arr.is_valid(), False).to_numpy(zero_copy_only=False)
    return member.to_numpy(zero_copy_only=False), offsets, valid


@kernel("ListContains")
class ListContains:
    """Any token of the list column present in the constant word set
    (example_plugins/src/udfs/list.py ListContains/SimpleListContains)."""

    @staticmethod
    def batch(ctx, target, values):
        member, offsets, valid = _flat_membership(target, values)
        out = _segment_any(member, offsets)
        return pa.array(out, pa.bool_(), mask=~valid)

    @staticmethod
    def row(rctx, target, values):
        if target is None:
            raise ExprError("None")
        vs = set(values)
        return any(t in vs for t in target if t is not None)


@kernel("ListContainsCount")
class ListContainsCount:
    @staticmethod
    def batch(ctx, target, values):
        member, offsets, valid = _flat_membership(target, values)
        out = _segment_count(member, offsets)
        return pa.array(out, pa.int64(), mask=~valid)

    @staticmethod
    def row(rctx, target, values):
        if target is None:
            raise ExprError("None")
        vs = set(values)
        return sum(1 for t in target if t in vs)


@kernel("RegexListContains")
class RegexListContains:
    """Any token matches any of the constant regexes
    (example_plugins/src/udfs/list.py RegexListContains)."""

    @staticmethod
    def batch(ctx, target, patterns):
        import re

        rx = re.compile("|".join(f"(?:{p})" for p in patterns))
        out = []
        for lst in target.to_pylist():
            if lst is None:
                out.append(None)
            else:
                out.append(any(rx.search(t) is not None for t in lst if t is not None))
        return pa.array(out, pa.bool_())

    @staticmethod
    def row(rctx, target, patterns):
        import re

        if target is None:
            raise ExprError("None")
        rx = re.compile("|".join(f"(?:{p})" for p in patterns))
        return any(rx.search(t) is not None for t in target if t is not None)


@kernel("ConcatStringLists")
class ConcatStringLists:
    @staticmethod
    def batch(ctx, left, right):
        lv, rv = left.to_pylist(), right.to_pylist()
        out = [
            None if (a is None and b is None) else (a or []) + (b or [])
            for a, b in zip(lv, rv)
        ]
        return pa.array(out, pa.list_(pa.string()))

    @staticmethod
    def row(rctx, left, right):
        if left is None and right is None:
            return None
        return (left or []) + (right or [])
