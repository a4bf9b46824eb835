"""Vectorized UDF kernel registry.

This is the analogue of the reference's UDF registry
(/root/reference/osprey_worker/src/osprey/engine/udf/registry.py:11-23) and
stdlib UDF pack (engine/stdlib/udfs/*, example_plugins/src/udfs/*): each
kernel has a vectorized ``batch`` implementation (Arrow arrays in → Arrow
array out) and a scalar ``row`` implementation used by the golden-test
oracle interpreter.  Registration mirrors the pluggy ``register_udfs`` hook
(worker/adaptor/plugin_manager.py:47-69): users add kernels with
``@kernel('Name')`` on a class exposing ``batch``/``row`` staticmethods, or
``register_rowwise`` for scalar-only UDFs (auto-vectorized).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import pyarrow as pa

from osprey_ray.expr import ExprError


@dataclass
class Kernel:
    name: str
    batch: Callable[..., pa.Array]
    row: Callable[..., Any]


_REGISTRY: dict[str, Kernel] = {}


def kernel(name: str):
    """Class decorator: register ``cls.batch`` / ``cls.row`` under name."""

    def deco(cls):
        _REGISTRY[name] = Kernel(name, cls.batch, cls.row)
        return cls

    return deco


def get_kernel(name: str) -> Kernel:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown kernel {name!r}; known: {sorted(_REGISTRY)}")


def list_kernels() -> list[str]:
    return sorted(_REGISTRY)


def rowwise_batch(row_fn: Callable[..., Any], out_type: pa.DataType | None = None):
    """Auto-vectorize a scalar kernel: map over the batch with the
    reference's failure semantics (ExprError = expected → quiet null,
    cf. ExpectedUdfException engine/executor/execution_context.py:112-135;
    any other exception → null + __error_count)."""

    def batch(ctx, **kw):
        arrays = {k: v for k, v in kw.items() if isinstance(v, (pa.Array, pa.ChunkedArray))}
        consts = {k: v for k, v in kw.items() if k not in arrays}
        n = ctx.n
        cols = {k: a.to_pylist() for k, a in arrays.items()}
        out = []
        err = np.zeros(n, dtype=bool)
        for i in range(n):
            row_kw = {k: cols[k][i] for k in cols}
            row_kw.update(consts)
            try:
                out.append(row_fn(None, **row_kw))
            except ExprError:
                out.append(None)
            except Exception:
                out.append(None)
                err[i] = True
        if err.any():
            ctx.add_errors(err)
        return pa.array(out, out_type)

    return batch


def register_rowwise(name: str, row_fn: Callable[..., Any], out_type: pa.DataType | None = None):
    _REGISTRY[name] = Kernel(name, rowwise_batch(row_fn, out_type), row_fn)


# import kernel packs (registration side effects)
from osprey_ray.kernels import strings  # noqa: E402,F401
from osprey_ray.kernels import timeops  # noqa: E402,F401
from osprey_ray.kernels import lists  # noqa: E402,F401
from osprey_ray.kernels import net  # noqa: E402,F401
from osprey_ray.kernels import misc  # noqa: E402,F401
from osprey_ray.kernels import jsonpath  # noqa: E402,F401
from osprey_ray.kernels import extra  # noqa: E402,F401
from osprey_ray.kernels import facets  # noqa: E402,F401
