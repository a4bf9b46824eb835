"""Watermark-driven CEP absence timers (``rules.AbsenceAlert``).

A turn matching ``first`` arms an event-time timer at ``ts + W``; a later
turn of the same conversation matching ``second`` with ``ts in (a, a+W]``
disarms it; timers whose deadline the watermark has passed fire one alert
row on the absence stream.  The reference expresses this pattern with a
timed label that the B-rule removes before expiry
(/root/reference/osprey_worker/src/osprey/engine/language_types/labels.py:17-66
``expires_after`` + remove effects, applied in output_sink.py:284-330); here
the timer is a first-class engine emission like the window-aggregate stream.

Correctness argument for the per-slice protocol (shard calls
:func:`track_slice` on every watermark-released, ``(conv, turn, ts)``-sorted
slice, then :func:`emit_due`):

- a disarming B released in a LATER epoch than its A is checked then — the
  A is still pending because its deadline ``a+W >= b > watermark_at_arm``;
- a B released in an EARLIER epoch than its A cannot disarm anything the A
  arms: released rows have ``ts <= watermark`` and later epochs only
  release ``ts > watermark``, so ``b_ts < a_ts`` — outside ``(a, a+W]``;
- emission waits for ``watermark >= a + W``: any future row has
  ``ts > watermark >= a+W``, so no future B can disarm an emitted alert.
Hence alerts are exactly the batch answer, independent of epoch cuts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osprey_ray.expr import EvalContext, _as_array, _bool_operand
from osprey_ray.stages.stateful import _conv_codes

ALERT_SCHEMA = pa.schema(
    [
        ("pattern", pa.string()),
        ("conv_id", pa.string()),
        ("first_ts", pa.timestamp("us")),
        ("deadline", pa.timestamp("us")),
    ]
)


def absence_masks(tbl: pa.Table, absences: list) -> dict[str, tuple]:
    """(arm, disarm) boolean masks per pattern.  The streaming path reads
    the hidden ``__sf_ab__*`` columns stage 1 precomputed (so raw input
    columns never need to survive the stateless stage); on a raw table
    (batch twin / tests) the predicates are evaluated here — two vectorized
    Expr evaluations per pattern, zero row loops.  Failed/null predicate
    rows collapse to False (rule semantics)."""

    def _np(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.to_numpy(zero_copy_only=False).astype(bool)

    out = {}
    ctx = None
    for ab in absences:
        ca, cb = f"__sf_ab__{ab.name}__a", f"__sf_ab__{ab.name}__b"
        if ca in tbl.column_names and cb in tbl.column_names:
            out[ab.name] = (_np(tbl[ca]), _np(tbl[cb]))
        else:
            if ctx is None:
                ctx = EvalContext(tbl)
            a = _bool_operand(_as_array(ab.first.eval_batch(ctx), ctx.n))
            b = _bool_operand(_as_array(ab.second.eval_batch(ctx), ctx.n))
            out[ab.name] = (_np(a), _np(b))
    return out


def track_slice(pending: dict, tbl: pa.Table, absences: list) -> None:
    """Arm / disarm timers from one released slice.  ``pending`` maps
    ``(pattern, conv_id) -> sorted int64 array of armed first-ts``; entries
    empty out when disarmed and are dropped.  Python touches one entry per
    (pattern, conversation-in-slice), never per row; within an entry the
    arm/disarm logic is vectorized searchsorted."""
    if tbl.num_rows == 0 or not absences:
        return
    codes, dictionary = _conv_codes(tbl)
    names = dictionary.to_pylist()
    ts = tbl["ts"].cast(pa.int64()).to_numpy()
    change = np.empty(len(codes), dtype=bool)
    change[0] = True
    change[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(codes))
    masks = absence_masks(tbl, absences)
    for ab in absences:
        amask, bmask = masks[ab.name]
        W = np.int64(ab.window_seconds * 1e6)
        for s, e in zip(starts, ends):
            a_ts = ts[s:e][amask[s:e]]
            b_new = ts[s:e][bmask[s:e]]
            if not len(a_ts) and not len(b_new):
                continue
            cid = names[codes[s]]
            key = (ab.name, cid)
            prev = pending.get(key)
            cand = (
                np.sort(np.concatenate([prev, a_ts]))
                if prev is not None
                else np.sort(a_ts)
            )
            if len(b_new) and len(cand):
                b_sorted = np.sort(b_new)
                lo = np.searchsorted(b_sorted, cand, side="right")
                hi = np.searchsorted(b_sorted, cand + W, side="right")
                cand = cand[hi == lo]  # keep timers no released B disarms
            if len(cand):
                pending[key] = cand
            elif prev is not None:
                del pending[key]


def emit_due_specs(pending: dict, absences: list, watermark_us: int) -> pa.Table | None:
    """Pop and emit every armed timer with ``first_ts + W <= watermark``.
    O(open (pattern, conv) entries) per call; emitted rows sort by
    (pattern, conv, first_ts) so each epoch's file is byte-deterministic."""
    by_name = {ab.name: np.int64(ab.window_seconds * 1e6) for ab in absences}
    out_p: list[str] = []
    out_c: list[str] = []
    out_a: list[int] = []
    for key in list(pending):
        name, cid = key
        W = by_name.get(name)
        if W is None:
            continue
        arr = pending[key]
        due = arr + W <= watermark_us
        if not due.any():
            continue
        for a in arr[due].tolist():
            out_p.append(name)
            out_c.append(cid)
            out_a.append(int(a))
        rest = arr[~due]
        if len(rest):
            pending[key] = rest
        else:
            del pending[key]
    if not out_p:
        return None
    order = sorted(range(len(out_p)), key=lambda i: (out_p[i], out_c[i], out_a[i]))
    dl = {n: int(w) for n, w in by_name.items()}
    return pa.table(
        {
            "pattern": pa.array([out_p[i] for i in order], pa.string()),
            "conv_id": pa.array([out_c[i] for i in order], pa.string()),
            "first_ts": pa.array(
                [out_a[i] for i in order], pa.int64()
            ).cast(pa.timestamp("us")),
            "deadline": pa.array(
                [out_a[i] + dl[out_p[i]] for i in order], pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )


def absence_stream_batch(tbl: pa.Table, absences: list) -> pa.Table:
    """Batch twin: the full alert stream a bounded input produces after the
    end-of-input flush (watermark -> +inf) — one pass of the identical
    arm/disarm math over the whole (sorted, deduped) table.  Used as the
    golden reference for the streaming emission and by batch pipelines."""
    from osprey_ray.stages.stateful import sort_and_dedup

    pending: dict = {}
    tbl = sort_and_dedup(tbl, {})
    track_slice(pending, tbl, absences)
    out = emit_due_specs(pending, absences, np.iinfo(np.int64).max)
    return out if out is not None else ALERT_SCHEMA.empty_table()
