"""User-defined AGGREGATE (UDAF) plugin surface.

The scalar-UDF registry (``@kernel``) covers the reference's per-event
UDF surface; this module completes the extension story with MERGEABLE
user aggregates — the contract every distributed aggregate in this repo
follows internally (HLL, Bloom, Misra-Gries, KMV, count-min, the
combiner pre-aggregates), exposed as a user API:

* ``partial(values) -> dict[str, float|int]`` — vectorized over one
  key-group's values within one batch; returns the named state fields.
* ``merge(state_table) -> dict[str, float|int]`` — vectorized over the
  partial-state rows of one key; must be associative+commutative (the
  engine is free to merge in any grouping/order — that is what makes
  the aggregate shuffle-safe at any partition count).
* ``final(state) -> float`` — finishing transform on the merged state.

``run_udaf`` drives any registered UDAF through the standard two-level
shape: per-batch Arrow ``group_by`` partials (one state row per key per
batch — the combiner bound: shuffled bytes scale with keys×batches,
never rows) then ONE keyed exchange merging states per key.  Mirrors
the pluggy ``register_udfs`` hook registration style
(worker/adaptor/plugin_manager.py:47-69)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class Udaf:
    name: str
    partial: Callable[[np.ndarray], dict[str, Any]]
    merge: Callable[[pa.Table], dict[str, Any]]
    final: Callable[[dict[str, Any]], float]
    state_fields: tuple[str, ...]


_AGG_REGISTRY: dict[str, Udaf] = {}


def udaf(name: str, state_fields: tuple[str, ...]):
    """Class decorator: register ``cls.partial`` / ``cls.merge`` /
    ``cls.final`` under ``name``."""

    def deco(cls):
        _AGG_REGISTRY[name] = Udaf(
            name, cls.partial, cls.merge, cls.final, tuple(state_fields)
        )
        return cls

    return deco


def get_udaf(name: str) -> Udaf:
    try:
        return _AGG_REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown udaf {name!r}; known: {sorted(_AGG_REGISTRY)}")


def list_udafs() -> list[str]:
    return sorted(_AGG_REGISTRY)


@udaf("geomean", ("sum_ln", "n"))
class GeoMean:
    """Geometric mean of positive values: state = (Σ ln x, n)."""

    @staticmethod
    def partial(v: np.ndarray) -> dict[str, Any]:
        v = v[v > 0]
        return {"sum_ln": float(np.log(v).sum()), "n": int(len(v))}

    @staticmethod
    def merge(t: pa.Table) -> dict[str, Any]:
        return {
            "sum_ln": float(pc.sum(t["sum_ln"]).as_py() or 0.0),
            "n": int(pc.sum(t["n"]).as_py() or 0),
        }

    @staticmethod
    def final(s: dict[str, Any]) -> float:
        return float(np.exp(s["sum_ln"] / s["n"])) if s["n"] else float("nan")


@udaf("span", ("lo", "hi"))
class Span:
    """max - min (trivially mergeable demo)."""

    @staticmethod
    def partial(v: np.ndarray) -> dict[str, Any]:
        return {"lo": float(v.min()), "hi": float(v.max())}

    @staticmethod
    def merge(t: pa.Table) -> dict[str, Any]:
        return {
            "lo": float(pc.min(t["lo"]).as_py()),
            "hi": float(pc.max(t["hi"]).as_py()),
        }

    @staticmethod
    def final(s: dict[str, Any]) -> float:
        return s["hi"] - s["lo"]


def run_udaf(ds, key: str, col: str, names: list[str]):
    """Drive the named UDAFs over ``ds`` grouped by ``key``: per-batch
    per-key partial states (vectorized slice loop over the few in-batch
    key groups), one groupby exchange, per-key merge+final.  Returns a
    Dataset of (key, <name>...) rows."""
    aggs = [get_udaf(n) for n in names]

    def partials(t: pa.Table) -> pa.Table:
        k = t[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = pc.array_sort_indices(k)
        k_np = np.asarray(k.take(order).to_numpy(zero_copy_only=False))
        v = v[order.to_numpy()]
        starts = np.concatenate(
            [[0], np.nonzero(k_np[1:] != k_np[:-1])[0] + 1]
        ) if len(k_np) else np.array([], dtype=np.int64)
        ends = np.append(starts[1:], len(k_np))
        rows: dict[str, list] = {key: []}
        for a in aggs:
            for f in a.state_fields:
                rows[f"{a.name}__{f}"] = []
        for s, e in zip(starts, ends):
            rows[key].append(k_np[s])
            seg = v[s:e]
            for a in aggs:
                st = a.partial(seg)
                for f in a.state_fields:
                    rows[f"{a.name}__{f}"].append(st[f])
        return pa.table(rows)

    def merge_group(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {key: [t[key][0].as_py()]}
        for a in aggs:
            st_tbl = pa.table(
                {f: t[f"{a.name}__{f}"] for f in a.state_fields}
            ).rename_columns(list(a.state_fields))
            out[a.name] = [a.final(a.merge(st_tbl))]
        return pa.table(out)

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(key)
        .map_groups(merge_group, batch_format="pyarrow")
    )
