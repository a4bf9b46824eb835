"""JSON payload access.

Analogue of /root/reference/osprey_worker/src/osprey/engine/stdlib/udfs/
json_data.py:31-58 (+ json_utils.py:46-81): dotted-path access into a JSON
sidecar column with ``required`` / ``coerce_type`` semantics.  In the
columnar engine most payload access is a plain column reference; this kernel
covers the genuinely dynamic case (e.g. the ``props`` JSON column of the
``events`` table).
"""

from __future__ import annotations

import json

import pyarrow as pa

from osprey_ray.expr import ExprError
from osprey_ray.kernels import kernel


def _walk(obj, parts: list[str]):
    for p in parts:
        if isinstance(obj, dict):
            if p not in obj:
                raise KeyError(p)
            obj = obj[p]
        elif isinstance(obj, list):
            obj = obj[int(p)]
        else:
            raise KeyError(p)
    return obj


def _parse_path(path: str) -> list[str]:
    path = path.lstrip("$").lstrip(".")
    return [p for p in path.replace("[", ".").replace("]", "").split(".") if p]


def _coerce(v, coerce_type: str | None):
    if coerce_type is None or v is None:
        return v
    if coerce_type == "str":
        return str(v)
    if coerce_type == "int":
        return int(v)
    if coerce_type == "float":
        return float(v)
    if coerce_type == "bool":
        return bool(v)
    raise ValueError(f"bad coerce_type {coerce_type}")


_OUT_TYPES = {
    "str": pa.string(),
    "int": pa.int64(),
    "float": pa.float64(),
    "bool": pa.bool_(),
}


@kernel("JsonData")
class JsonData:
    """JsonData(target=col('props'), path='$.a.b', required=True,
    coerce_type=None|'str'|'int'|'float'|'bool')."""

    @staticmethod
    def batch(ctx, target, path, required=True, coerce_type=None):
        import numpy as np

        parts = _parse_path(path)
        out = []
        err = np.zeros(ctx.n, dtype=bool)
        for i, v in enumerate(target.to_pylist()):
            if v is None:
                out.append(None)
                if required:
                    err[i] = True
                continue
            try:
                obj = json.loads(v) if isinstance(v, str) else v
                out.append(_coerce(_walk(obj, parts), coerce_type))
            except (KeyError, IndexError, TypeError):
                out.append(None)
                if required:
                    err[i] = True
            except (json.JSONDecodeError, ValueError):
                out.append(None)
                err[i] = True
        if err.any():
            ctx.add_errors(err)
        return pa.array(out, _OUT_TYPES.get(coerce_type))

    @staticmethod
    def row(rctx, target, path, required=True, coerce_type=None):
        if target is None:
            if required:
                rctx.errors += 1
                raise ExprError("missing payload")
            return None
        try:
            obj = json.loads(target) if isinstance(target, str) else target
            return _coerce(_walk(obj, _parse_path(path)), coerce_type)
        except (KeyError, IndexError, TypeError):
            if required:
                rctx.errors += 1
                raise ExprError("missing path")
            return None
        except (json.JSONDecodeError, ValueError):
            rctx.errors += 1
            raise ExprError("bad json")
