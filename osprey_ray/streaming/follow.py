"""Watermark-correct CEP pair emission (``rules.FollowedBy``) — the
windowed stream-stream join stream.

A turn matching ``second`` (B) pairs with every EARLIER same-conversation
turn matching ``first`` (A) with ``b_ts in (a_ts, a_ts + W]``; each pair
is one row on the pairs stream, emitted at the B turn's release.  The
positive complement of the absence stream (streaming/absence.py): absence
emits "A with no B", this emits every (A, B).

Correctness argument for the per-slice protocol (shard calls
:func:`track_slice_pairs` on every watermark-released,
``(conv, turn, ts)``-sorted slice):

- any A that can pair with a released B has ``a_ts < b_ts <= watermark``,
  so the A was released in this slice or an earlier one — it is either in
  the slice or in the carried arm state;
- the carried state evicts A once ``a_ts + W <= watermark``: every future
  released row has ``ts > watermark >= a_ts + W``, outside the window, so
  eviction never loses a pair — state is bounded by W × arrival rate;
- a B released in an EARLIER epoch than its A cannot pair: released rows
  have ``ts <= watermark`` and later epochs only release
  ``ts > watermark``, so ``b_ts < a_ts`` — outside ``(a, a+W]``.
Hence the emitted pair multiset equals the batch interval join,
independent of epoch cuts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osprey_ray.expr import EvalContext, _as_array, _bool_operand
from osprey_ray.stages.stateful import _conv_codes

PAIR_SCHEMA = pa.schema(
    [
        ("pattern", pa.string()),
        ("conv_id", pa.string()),
        ("first_ts", pa.timestamp("us")),
        ("second_ts", pa.timestamp("us")),
    ]
)


def follow_masks(tbl: pa.Table, follows: list) -> dict[str, tuple]:
    """(first, second) boolean masks per pattern — same hidden-column
    contract as absence_masks (``__sf_fb__*`` precomputed by stage 1;
    vectorized Expr fallback on raw tables)."""

    def _np(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.to_numpy(zero_copy_only=False).astype(bool)

    out = {}
    ctx = None
    for fb in follows:
        ca, cb = f"__sf_fb__{fb.name}__a", f"__sf_fb__{fb.name}__b"
        if ca in tbl.column_names and cb in tbl.column_names:
            out[fb.name] = (_np(tbl[ca]), _np(tbl[cb]))
        else:
            if ctx is None:
                ctx = EvalContext(tbl)
            a = _bool_operand(_as_array(fb.first.eval_batch(ctx), ctx.n))
            b = _bool_operand(_as_array(fb.second.eval_batch(ctx), ctx.n))
            out[fb.name] = (_np(a), _np(b))
    return out


def _pairs_for(a_sorted: np.ndarray, b_ts: np.ndarray, W: np.int64):
    """All (a, b) with ``a in [b - W, b)`` — vectorized range gather
    (searchsorted bounds → arange-difference index build, no per-B loop
    beyond numpy)."""
    lo = np.searchsorted(a_sorted, b_ts - W, side="left")
    hi = np.searchsorted(a_sorted, b_ts, side="left")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return None, None
    off = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(total, dtype=np.int64) - np.repeat(off, counts) + np.repeat(lo, counts)
    return a_sorted[pos], np.repeat(b_ts, counts)


def track_slice_pairs(
    pending: dict, tbl: pa.Table, follows: list, watermark_us: int
) -> pa.Table | None:
    """Emit this slice's pairs and advance the carried arm state.
    ``pending`` maps ``(pattern, conv_id) -> sorted int64 array of armed
    A-ts``.  Python touches one entry per (pattern, conversation-in-slice)
    plus the eviction sweep; all pair math is searchsorted/gather.
    Returns the slice's pair rows sorted by (pattern, conv, a, b) so each
    epoch's file is byte-deterministic."""
    rows: list[tuple] = []
    if tbl.num_rows and follows:
        codes, dictionary = _conv_codes(tbl)
        names = dictionary.to_pylist()
        ts = tbl["ts"].cast(pa.int64()).to_numpy()
        change = np.empty(len(codes), dtype=bool)
        change[0] = True
        change[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(codes))
        masks = follow_masks(tbl, follows)
        for fb in follows:
            amask, bmask = masks[fb.name]
            W = np.int64(fb.window_seconds * 1e6)
            for s, e in zip(starts, ends):
                a_new = ts[s:e][amask[s:e]]
                b_new = ts[s:e][bmask[s:e]]
                if not len(a_new) and not len(b_new):
                    continue
                cid = names[codes[s]]
                key = (fb.name, cid)
                prev = pending.get(key)
                cand = (
                    np.sort(np.concatenate([prev, a_new]))
                    if prev is not None and len(a_new)
                    else (np.sort(a_new) if prev is None else prev)
                )
                if len(b_new) and len(cand):
                    fa, sb = _pairs_for(cand, np.sort(b_new), W)
                    if fa is not None:
                        rows.extend(
                            (fb.name, cid, int(x), int(y))
                            for x, y in zip(fa, sb)
                        )
                if len(cand):
                    pending[key] = cand
    # eviction sweep: drop armed A's no future release can pair with
    # (entries for patterns no longer in the spec — hot-swap — drop whole)
    wmap = {fb.name: np.int64(fb.window_seconds * 1e6) for fb in follows}
    for key in list(pending):
        fbW = wmap.get(key[0])
        keep = (
            pending[key][pending[key] + fbW > watermark_us]
            if fbW is not None
            else ()
        )
        if len(keep):
            pending[key] = keep
        else:
            del pending[key]
    if not rows:
        return None
    rows.sort()
    return pa.table(
        {
            "pattern": pa.array([r[0] for r in rows], pa.string()),
            "conv_id": pa.array([r[1] for r in rows], pa.string()),
            "first_ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "second_ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        }
    )
