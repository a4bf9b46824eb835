"""Stage 2: keyed stateful evaluation (windows, CEP, labels, joins).

This is the engine's only stateful stage (SURVEY §7 step 5): input rows are
hash-partitioned by ``conv_id`` and evaluated in strict
``(conv_id, turn_idx, ts)`` order within each partition.  Window math has
two implementations sharing one semantics: a fully-global vectorized fast
path for fresh batch runs (``persist=False`` — constant number of
whole-array numpy ops, zero per-conversation Python) and a per-conversation
loop that handles carried state for the streaming epochs.  The label
subsystem — whose read-your-writes ordering is inherently sequential (a
turn's LabelAdd is visible to later turns but not itself, mirroring
write-after-classify in
/root/reference/osprey_worker/src/osprey/worker/sinks/sink/output_sink.py:156-350)
— walks only mutation-candidate rows, external events and expiry points,
reconstructing HasLabel columns vectorized from a change log.

The same :func:`eval_released` core serves both execution modes:

- batch: fresh state per partition, one call (watermark = +inf);
- streaming: a persistent shard actor carries ``states`` / ``label_store``
  across micro-batch epochs and calls this on each watermark-released,
  ordered slice of rows.

State carried per conversation (``states[conv_id]``):

- ``w:<name>``  — sorted int64 ts of counted events in a sliding window
  (the Redis-ZSET analogue, example_plugins/src/udfs/cache.py:161-207);
- ``t:<name>``  — (current tumbling bucket, running count);
- ``s:<name>``  — (last_ts, session_id, count_in_session);
- ``q:<name>``  — sorted int32 turn_idx of CEP first-step matches;
- ``last_turn`` — highest processed turn_idx (cross-epoch dedup guard);
- ``lev``       — consumed prefix of the external label-event stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osprey_ray.expr import EvalContext, RowContext, ExprError, _as_array, _bool_operand
from osprey_ray.rules import (
    DeclareVerdict,
    HasLabel,
    IncrementWindow,
    KvCache,
    LabelAdd,
    LabelRemove,
    RuleSpec,
    SequenceMatch,
    SessionWindow,
    TumblingCount,
    TumblingDistinct,
    TumblingMax,
    TumblingSum,
    WindowCount,
)
from osprey_ray.stages.stateless import RulePlan, split_rules
from osprey_ray.state.labels import LabelStore

NEG_INF = np.iinfo(np.int64).min


class _LazyRow:
    """Dict-like view of one row of an Arrow table, materializing cells only
    on access — the sparse label walk touches few rows and fewer columns, so
    eagerly converting every column per candidate row would waste work."""

    __slots__ = ("_tbl", "_i", "_names")

    def __init__(self, tbl: pa.Table, i: int) -> None:
        self._tbl = tbl
        self._i = i
        self._names = None

    def __contains__(self, name: str) -> bool:
        if self._names is None:
            self._names = set(self._tbl.column_names)
        return name in self._names

    def __getitem__(self, name: str):
        return self._tbl.column(name)[self._i].as_py()


def _conv_codes(tbl: pa.Table) -> tuple[np.ndarray, pa.Array]:
    """Dictionary-encode conv_id → (int codes, dictionary array).  The
    grouping key never round-trips through Python strings.  Accepts a
    column that is already dictionary-encoded (the exchange ships conv_id
    dict-encoded to cut object-store bytes)."""
    col = tbl["conv_id"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_dictionary(col.type):
        enc = col
    else:
        enc = col.dictionary_encode()
    return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64), enc.dictionary


def sort_and_dedup(tbl: pa.Table, states: dict) -> pa.Table:
    """Order by (conv_id, turn_idx, ts) and exact-dedup on (conv_id,
    turn_idx) keep-first (SURVEY §2.8 — the at-least-once duplicate guard;
    the reference relies on idempotent keyed sinks,
    worker/lib/storage/stored_execution_result.py:182-193).  Also drops rows
    at or below a conversation's already-processed ``last_turn`` (cross-epoch
    duplicates / too-late re-orderings in streaming mode).

    Grouping uses dictionary codes (first-appearance order) + numpy lexsort
    — deterministic for a deterministic input row order, and conversations
    are mutually independent so inter-conversation order never affects
    results."""
    if tbl.num_rows == 0:
        return tbl
    codes, dictionary = _conv_codes(tbl)
    turn = tbl["turn_idx"].to_numpy()
    ts = tbl["ts"].cast(pa.int64()).to_numpy()
    order = np.lexsort((ts, turn, codes))
    codes = codes[order]
    turn = turn[order]
    tbl = tbl.take(pa.array(order))
    n = len(codes)
    keep = np.ones(n, dtype=bool)
    same_conv = codes[1:] == codes[:-1]
    keep[1:] = ~(same_conv & (turn[1:] == turn[:-1]))
    if states:
        # drop rows already processed in earlier epochs
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = ~same_conv
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            st = states.get(dictionary[codes[s]].as_py())
            if st and "last_turn" in st:
                keep[s:e] &= turn[s:e] > st["last_turn"]
    if keep.all():
        return tbl
    return tbl.filter(pa.array(keep))


def _running_segment_count(flag: np.ndarray, new_seg: np.ndarray, carry: int) -> np.ndarray:
    """Running count of ``flag`` within segments delimited by ``new_seg``
    (True = segment starts at that row); ``carry`` seeds the first segment
    when ``new_seg[0]`` is False."""
    n = len(flag)
    cs = np.cumsum(flag.astype(np.int64))
    seg_start = np.where(new_seg, np.arange(n), -1)
    seg_start = np.maximum.accumulate(seg_start)
    base = np.where(
        seg_start >= 0,
        cs[np.maximum(seg_start, 0)] - flag[np.maximum(seg_start, 0)],
        0,
    )
    out = cs - base
    out[seg_start < 0] += carry
    return out



def _running_segment_max(vals: np.ndarray, new_seg: np.ndarray, carry: int) -> np.ndarray:
    """Running max of non-negative int64 ``vals`` within segments delimited
    by ``new_seg`` (True = segment starts at that row); ``carry`` seeds the
    first segment when ``new_seg[0]`` is False.

    Vectorized via the offset trick: add ``seg_id * (max(vals)+1)`` so a
    plain ``np.maximum.accumulate`` can never leak a value across a segment
    boundary (later segments sit strictly higher), then subtract the offset
    back out.  Falls back to a pandas groupby cummax when the composite
    would overflow int64 (astronomical segment counts x value range)."""
    n = len(vals)
    if n == 0:
        return vals.astype(np.int64)
    v = vals.astype(np.int64)
    seg = np.cumsum(new_seg.astype(np.int64))
    off = int(v.max()) + 1
    if int(seg[-1]) * off + off < np.iinfo(np.int64).max:
        r = v + seg * np.int64(off)
        out = np.maximum.accumulate(r) - seg * np.int64(off)
    else:  # pragma: no cover - overflow-safe fallback
        import pandas as pd

        out = pd.Series(v).groupby(seg).cummax().to_numpy()
    if carry and not new_seg[0]:
        first = seg == seg[0]
        out[first] = np.maximum(out[first], carry)
    return out


def _eval_windows_global(
    spec: RuleSpec,
    sf_pred: dict,
    sf_vals: dict,
    ts: np.ndarray,
    turn: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    change: np.ndarray,
    n: int,
) -> None:
    """Batch fast path: every window/session/sequence/KV feature computed in
    a constant number of whole-array numpy ops — zero per-conversation
    Python.  Sliding windows use composite offsets (each conversation's
    timeline shifted into a disjoint range wider than the window) so ONE
    global searchsorted respects conversation boundaries.  Only valid when
    no conversation carries state from a previous epoch (fresh batch run —
    the streaming path keeps the per-conversation carry loop)."""
    G = len(starts)
    lens = ends - starts
    gidx = np.repeat(np.arange(G), lens)
    rep_starts = np.repeat(starts, lens)
    conv_min = ts[starts]
    span = ts[ends - 1] - conv_min
    turn64 = turn.astype(np.int64)

    for sf in spec.stateful:
        if isinstance(sf, (IncrementWindow, WindowCount)):
            if isinstance(sf, IncrementWindow):
                w_us = np.int64(sf.window_seconds * 1e6)
                f = sf_pred[sf.name]
                cap = sf.max_events_cap
                incl_self = True
            else:
                w_us = np.int64(sf.window_seconds * 1e6)
                f = sf_pred[sf.source]
                cap = next(
                    x.max_events_cap
                    for x in spec.stateful
                    if isinstance(x, IncrementWindow) and x.name == sf.source
                )
                incl_self = False
            base = np.zeros(G, dtype=np.int64)
            if G > 1:
                base[1:] = np.cumsum(span[:-1] + 2 * w_us + 2)
            tp = ts - conv_min[gidx] + base[gidx]
            flag_tp = tp[f]
            fl = f.astype(np.int64)
            added = np.cumsum(fl)
            if not incl_self:
                added = added - fl
            lo = np.searchsorted(flag_tp, tp - w_us, side="right")
            sf_vals[sf.name] = np.minimum(added - lo, cap)
        elif isinstance(sf, (TumblingCount, TumblingSum, TumblingMax, TumblingDistinct)):
            b_us = np.int64(sf.bucket_seconds * 1e6)
            bucket = ts // b_us
            new_seg = change.copy()
            new_seg[1:] |= bucket[1:] != bucket[:-1]
            if isinstance(sf, TumblingMax):
                sf_vals[sf.name] = _running_segment_max(sf_pred[sf.name], new_seg, 0)
            elif isinstance(sf, TumblingDistinct):
                # first-occurrence flags precomputed for exactly this
                # (conv, bucket) segmentation; running count, capped
                sf_vals[sf.name] = np.minimum(
                    _running_segment_count(
                        sf_pred[sf.name + "__first"].astype(np.int64), new_seg, 0
                    ),
                    sf.max_distinct_cap,
                )
            else:
                sf_vals[sf.name] = _running_segment_count(sf_pred[sf.name], new_seg, 0)
        elif isinstance(sf, SessionWindow):
            g_us = np.int64(sf.gap_seconds * 1e6)
            prev = np.empty(n, dtype=np.int64)
            prev[0] = ts[0]
            prev[1:] = ts[:-1]
            brk = (~change) & ((ts - prev) > g_us)
            cs = np.cumsum(brk.astype(np.int64))
            sf_vals[f"{sf.name}__id"] = cs - cs[rep_starts]
            sf_vals[f"{sf.name}__count"] = _running_segment_count(
                np.ones(n, dtype=np.int64), change | brk, 0
            )
        elif isinstance(sf, SequenceMatch):
            a = sf_pred[sf.name]
            b = sf_pred[sf.name + "_b"]
            span_t = turn64[ends - 1] - turn64[starts]
            base = np.zeros(G, dtype=np.int64)
            if G > 1:
                base[1:] = np.cumsum(span_t[:-1] + 2 * sf.within_turns + 2)
            tp = turn64 - turn64[starts][gidx] + base[gidx]
            all_first = tp[a]
            added_excl = np.cumsum(a.astype(np.int64)) - a.astype(np.int64)
            lo = np.searchsorted(all_first, tp - sf.within_turns, side="left")
            sf_vals[sf.name] = b & (added_excl > lo)
        elif isinstance(sf, KvCache):
            setm = sf_pred[sf.name]
            set_pos = np.flatnonzero(setm)
            if len(set_pos):
                last = np.searchsorted(set_pos, np.arange(n), side="left") - 1
                src = np.where(last >= 0, set_pos[np.maximum(last, 0)], -1)
                valid = (src >= 0) & (src >= rep_starts)  # same conversation
                if sf.ttl_seconds is not None:
                    ttl_us = np.int64(sf.ttl_seconds * 1e6)
                    set_ts = np.where(valid, ts[np.maximum(src, 0)], 0)
                    valid &= (set_ts + ttl_us) > ts
                sf_vals[sf.name] = np.where(valid, src, -1)
        # HasLabel handled by the label pass


def eval_released(
    tbl: pa.Table,
    spec: RuleSpec,
    rule_plans: list[RulePlan],
    states: dict,
    label_store: LabelStore,
    label_events: dict[str, list] | None = None,
    persist: bool = True,
    global_windows: bool = False,
) -> tuple[pa.Table, list[tuple]]:
    """Evaluate ordered, deduped rows; mutates ``states``/``label_store``.

    ``persist=False`` (batch mode, fresh state): window math runs on the
    fully-global vectorized fast path and per-conversation carry state is
    never written — the streaming path uses ``persist=True``.

    Returns (execution-results table, applied label mutations
    [(conv_id, ts_us, label, status)]).
    """
    label_events = label_events or {}
    n = tbl.num_rows
    sf_names = spec.stateful_names()
    hl_feats = [s for s in spec.stateful if isinstance(s, HasLabel)]
    out_schema_cols = _output_columns(tbl, spec)
    if n == 0:
        return _empty_output(tbl, spec), []

    codes, dictionary = _conv_codes(tbl)
    turn = tbl["turn_idx"].to_numpy()
    ts = tbl["ts"].cast(pa.int64()).to_numpy()

    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    # conversation ids only where group-level state needs the string key
    group_cids = [dictionary[codes[s]].as_py() for s in starts]

    # ---- vectorized stateful features (per conversation slice) ----------
    sf_vals: dict[str, np.ndarray] = {}
    for sf in spec.stateful:
        if isinstance(sf, SessionWindow):
            sf_vals[f"{sf.name}__id"] = np.zeros(n, dtype=np.int64)
            sf_vals[f"{sf.name}__count"] = np.zeros(n, dtype=np.int64)
        elif isinstance(
            sf, (IncrementWindow, TumblingCount, TumblingSum, TumblingMax, TumblingDistinct)
        ):
            sf_vals[sf.name] = np.zeros(n, dtype=np.int64)
        elif isinstance(sf, SequenceMatch):
            sf_vals[sf.name] = np.zeros(n, dtype=bool)
        elif isinstance(sf, WindowCount):
            sf_vals[sf.name] = np.zeros(n, dtype=np.int64)
        elif isinstance(sf, KvCache):
            # index into this batch's value column (-1 = null/carried)
            sf_vals[sf.name] = np.full(n, -1, dtype=np.int64)
        elif isinstance(sf, HasLabel):
            default = sf.status == "removed" and sf.manual != "yes"
            sf_vals[sf.name] = np.full(n, default, dtype=bool)

    sf_pred: dict[str, np.ndarray] = {}
    sf_dict: dict[str, list] = {}
    kv_carried: dict[str, list[tuple[int, object]]] = {}
    for sf in spec.stateful:
        if isinstance(sf, TumblingDistinct):
            # dictionary-encode the string value column once per batch:
            # codes (int64, -1 = null) + the dictionary strings for carry
            # sets, plus a vectorized within-(conv,bucket)-segment
            # first-occurrence flag (hash-based pandas duplicated on a
            # composite seg*K+code key, O(n)) — the carry walk only has to
            # ADJUST the first segment of each conversation slice
            import pandas as pd

            col0 = tbl[f"__sf_{sf.name}"].combine_chunks()
            enc = col0 if pa.types.is_dictionary(col0.type) else pc.dictionary_encode(col0)
            codes_d = pc.fill_null(enc.indices.cast(pa.int64()), -1).to_numpy(
                zero_copy_only=False
            )
            sf_pred[sf.name] = codes_d
            sf_dict[sf.name] = enc.dictionary.to_pylist()
            b_us = np.int64(sf.bucket_seconds * 1e6)
            bkt = ts // b_us
            nsg = change.copy()
            nsg[1:] |= bkt[1:] != bkt[:-1]
            seg = np.cumsum(nsg.astype(np.int64)) - 1
            K = np.int64(len(sf_dict[sf.name]) + 2)
            dup = pd.Series(seg * K + codes_d).duplicated().to_numpy()
            sf_pred[sf.name + "__first"] = (~dup) & (codes_d >= 0)
        elif isinstance(sf, (TumblingSum, TumblingMax)):
            # int64 weights (stage 1 already clamped nulls/negatives to 0)
            sf_pred[sf.name] = (
                pc.fill_null(tbl[f"__sf_{sf.name}"], 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        elif isinstance(sf, (IncrementWindow, TumblingCount, KvCache)):
            sf_pred[sf.name] = (
                pc.fill_null(tbl[f"__sf_{sf.name}"], False).to_numpy(zero_copy_only=False)
            )
            if isinstance(sf, KvCache):
                kv_carried[sf.name] = []
        elif isinstance(sf, SequenceMatch):
            sf_pred[sf.name] = (
                pc.fill_null(tbl[f"__sf_{sf.name}"], False).to_numpy(zero_copy_only=False)
            )
            sf_pred[sf.name + "_b"] = (
                pc.fill_null(tbl[f"__sf_{sf.name}_b"], False).to_numpy(zero_copy_only=False)
            )

    # The global path eliminates per-conversation Python but materializes
    # large composite-offset intermediates; measured on this box it wins at
    # low parallelism and loses ~25% at 16+ cores (memory-bandwidth-bound),
    # so the cache-friendly per-conversation path is the default and the
    # global one stays available (and parity-tested) via global_windows.
    fast = global_windows and (not persist) and not states
    if fast:
        _eval_windows_global(spec, sf_pred, sf_vals, ts, turn, starts, ends, change, n)
    for gi, (s, e) in enumerate(zip(starts, ends) if not fast else ()):
        cid = group_cids[gi]
        st = states.setdefault(cid, {})
        t = ts[s:e]
        for sf in spec.stateful:
            if isinstance(sf, IncrementWindow):
                w_us = np.int64(sf.window_seconds * 1e6)
                flag = sf_pred[sf.name][s:e]
                buf = st.get(f"w:{sf.name}")
                if buf is None:
                    buf = np.empty(0, dtype=np.int64)
                all_flag = np.concatenate([buf, t[flag]])
                # events added up to each row: cumsum includes self when
                # flagged; for unflagged rows it equals the count before them
                added = len(buf) + np.cumsum(flag.astype(np.int64))
                lo = np.searchsorted(all_flag, t - w_us, side="right")
                cnt = added - lo
                sf_vals[sf.name][s:e] = np.minimum(cnt, sf.max_events_cap)
                # evict: outside the window AND cap stored events at the
                # newest max_events_cap (the reference's zremrangebyrank
                # bound, cache.py:199-201) so hot keys can't grow state
                keep_from = np.searchsorted(all_flag, t[-1] - w_us, side="right")
                st[f"w:{sf.name}"] = all_flag[keep_from:][-sf.max_events_cap :]
            elif isinstance(sf, (TumblingCount, TumblingSum, TumblingMax)):
                b_us = np.int64(sf.bucket_seconds * 1e6)
                flag = sf_pred[sf.name][s:e]
                bucket = t // b_us
                last_bucket, last_count = st.get(f"t:{sf.name}", (None, 0))
                new_seg = np.empty(len(t), dtype=bool)
                new_seg[0] = last_bucket is None or bucket[0] != last_bucket
                new_seg[1:] = bucket[1:] != bucket[:-1]
                if isinstance(sf, TumblingMax):
                    cnt = _running_segment_max(flag, new_seg, last_count)
                else:
                    cnt = _running_segment_count(flag, new_seg, last_count)
                sf_vals[sf.name][s:e] = cnt
                st[f"t:{sf.name}"] = (bucket[-1], int(cnt[-1]))
            elif isinstance(sf, TumblingDistinct):
                b_us = np.int64(sf.bucket_seconds * 1e6)
                codes_sl = sf_pred[sf.name][s:e]
                first = sf_pred[sf.name + "__first"][s:e]
                bucket = t // b_us
                carry = st.get(f"t:{sf.name}")
                last_bucket, last_count, seen = (
                    carry if carry is not None else (None, 0, frozenset())
                )
                new_seg = np.empty(len(t), dtype=bool)
                new_seg[0] = last_bucket is None or bucket[0] != last_bucket
                new_seg[1:] = bucket[1:] != bucket[:-1]
                cap = sf.max_distinct_cap
                cont = not new_seg[0]
                if cont and seen:
                    # the carried bucket continues with an exact seen-set:
                    # unmark first-flags already in it (bounded by the
                    # distinct values of ONE bucket's opening segment)
                    first = first.copy()
                    dstrs = sf_dict[sf.name]
                    seg_brk = np.flatnonzero(new_seg[1:])
                    seg_end = int(seg_brk[0]) + 1 if len(seg_brk) else len(t)
                    for i in np.flatnonzero(first[:seg_end]):
                        if dstrs[codes_sl[i]] in seen:
                            first[i] = False
                cnt = np.minimum(
                    _running_segment_count(
                        first.astype(np.int64), new_seg, last_count if cont else 0
                    ),
                    cap,
                )
                sf_vals[sf.name][s:e] = cnt
                final_cnt = int(cnt[-1])
                if final_cnt >= cap:
                    new_seen = None  # saturated: count pinned, set dropped
                else:
                    nz = np.flatnonzero(new_seg)
                    ls = int(nz[-1]) if len(nz) else 0
                    cs = codes_sl[ls:]
                    u = np.unique(cs[cs >= 0])
                    dstrs = sf_dict[sf.name]
                    new_seen = frozenset(dstrs[int(c)] for c in u)
                    if ls == 0 and cont and seen:
                        new_seen = frozenset(new_seen | seen)
                st[f"t:{sf.name}"] = (int(bucket[-1]), final_cnt, new_seen)
            elif isinstance(sf, SessionWindow):
                g_us = np.int64(sf.gap_seconds * 1e6)
                last_ts, sid0, scnt0 = st.get(f"s:{sf.name}", (None, 0, 0))
                prev = np.empty(len(t), dtype=np.int64)
                prev[0] = last_ts if last_ts is not None else t[0]
                prev[1:] = t[:-1]
                new_seg = (t - prev) > g_us
                if last_ts is None:
                    new_seg[0] = False
                sid = sid0 + np.cumsum(new_seg.astype(np.int64))
                cnt = _running_segment_count(
                    np.ones(len(t), dtype=np.int64), new_seg, scnt0
                )
                sf_vals[f"{sf.name}__id"][s:e] = sid
                sf_vals[f"{sf.name}__count"][s:e] = cnt
                st[f"s:{sf.name}"] = (int(t[-1]), int(sid[-1]), int(cnt[-1]))
            elif isinstance(sf, WindowCount):
                # declared before its source window (validated) → the source
                # buffer still reflects prior turns only
                w_us = np.int64(sf.window_seconds * 1e6)
                flag = sf_pred[sf.source][s:e]
                buf = st.get(f"w:{sf.source}")
                if buf is None:
                    buf = np.empty(0, dtype=np.int64)
                all_flag = np.concatenate([buf, t[flag]])
                fl = flag.astype(np.int64)
                added_excl = len(buf) + np.cumsum(fl) - fl
                lo = np.searchsorted(all_flag, t - w_us, side="right")
                src_cap = next(
                    x.max_events_cap
                    for x in spec.stateful
                    if isinstance(x, IncrementWindow) and x.name == sf.source
                )
                sf_vals[sf.name][s:e] = np.minimum(added_excl - lo, src_cap)
            elif isinstance(sf, KvCache):
                setm = sf_pred[sf.name][s:e]
                m_len = e - s
                set_pos = np.flatnonzero(setm)
                last = np.searchsorted(set_pos, np.arange(m_len), side="left") - 1
                if len(set_pos):
                    src = np.where(last >= 0, set_pos[np.maximum(last, 0)], -1)
                else:
                    src = np.full(m_len, -1, dtype=np.int64)
                valid = src >= 0
                if sf.ttl_seconds is not None:
                    ttl_us = np.int64(sf.ttl_seconds * 1e6)
                    set_ts = np.where(valid, t[np.maximum(src, 0)], 0)
                    valid &= (set_ts + ttl_us) > t
                sf_vals[sf.name][s:e] = np.where(valid, src + s, -1)
                carried = st.get(f"k:{sf.name}")
                if carried is not None:
                    cmask = last < 0
                    if sf.ttl_seconds is not None:
                        cmask &= (carried[0] + np.int64(sf.ttl_seconds * 1e6)) > t
                    for r in np.flatnonzero(cmask):
                        kv_carried[sf.name].append((s + int(r), carried[1]))
                if len(set_pos):
                    vcol = tbl[f"__sfv_{sf.name}"]
                    if isinstance(vcol, pa.ChunkedArray):
                        vcol = vcol.combine_chunks()
                    j = int(set_pos[-1])
                    st[f"k:{sf.name}"] = (int(t[j]), vcol[s + j].as_py())
            elif isinstance(sf, SequenceMatch):
                a = sf_pred[sf.name][s:e]
                b = sf_pred[sf.name + "_b"][s:e]
                tr = turn[s:e]
                buf = st.get(f"q:{sf.name}")
                if buf is None:
                    buf = np.empty(0, dtype=np.int64)
                all_first = np.concatenate([buf, tr[a]])
                added_excl = len(buf) + np.cumsum(a.astype(np.int64)) - a.astype(np.int64)
                lo = np.searchsorted(all_first, tr - sf.within_turns, side="left")
                sf_vals[sf.name][s:e] = b & (added_excl > lo)
                keep_from = np.searchsorted(
                    all_first, tr[-1] - sf.within_turns, side="left"
                )
                st[f"q:{sf.name}"] = all_first[keep_from:]
        st["last_turn"] = int(turn[e - 1])

    # ---- materialize KvCache value columns (index → value + carried) ----
    kv_arrays: dict[str, pa.Array] = {}
    for sf in spec.stateful:
        if isinstance(sf, KvCache):
            vcol = tbl[f"__sfv_{sf.name}"]
            if isinstance(vcol, pa.ChunkedArray):
                vcol = vcol.combine_chunks()
            idx = sf_vals[sf.name]
            take_idx = pa.array(np.where(idx >= 0, idx, 0), pa.int64())
            vals = pc.if_else(
                pa.array(idx >= 0), vcol.take(take_idx), pa.nulls(n, vcol.type)
            )
            carried = kv_carried.get(sf.name)
            if carried:
                py = vals.to_pylist()
                for r, v in carried:
                    py[r] = v
                vals = pa.array(py, vcol.type)
            kv_arrays[sf.name] = vals

    # ---- augmented table + non-label rule values ------------------------
    aug_cols = {name: tbl[name] for name in tbl.column_names}
    for name, arr in sf_vals.items():
        aug_cols[name] = kv_arrays[name] if name in kv_arrays else pa.array(arr)
    aug = pa.table(aug_cols)
    ctx = EvalContext(aug)

    rule_vals: dict[str, np.ndarray] = {}
    for rp in rule_plans:
        val = pc.fill_null(aug[f"__rulepre_{rp.name}"], False).to_numpy(zero_copy_only=False).copy()
        for conj in rp.stateful_nonlabel:
            cv = _bool_operand(_as_array(conj.eval_batch(ctx), n)).to_numpy(zero_copy_only=False)
            val &= cv
        rule_vals[rp.name] = val

    # ---- label subsystem (sequential, only for active conversations) ----
    label_triggers = [
        trg for trg in spec.triggers if any(isinstance(ef, (LabelAdd, LabelRemove)) for ef in trg.then)
    ]
    label_rule_plans = [rp for rp in rule_plans if rp.label]
    mutations: list[tuple] = []

    if hl_feats or label_triggers:
        # Sparse label pass.  Python only touches *interesting* positions:
        # rows where a label-mutating trigger could fire (pre-label rule
        # value true), external label events, and reason-expiry points.
        # Every state transition is recorded in a per-conversation change
        # log; HasLabel feature columns are reconstructed vectorized from
        # the log afterwards, so a conversation with no label activity
        # costs nothing and a 100k-turn conversation with 3 mutations
        # costs 3 iterations, not 100k.
        import heapq

        plan_map = {rp.name: rp for rp in rule_plans}
        trig_pre = np.zeros(n, dtype=bool)
        for trg in label_triggers:
            for rn in trg.rules_any:
                trig_pre |= rule_vals[rn]
        INF = 1 << 62

        for gi, (s, e) in enumerate(zip(starts, ends)):
            cid = group_cids[gi]
            evs = label_events.get(cid)
            st = states.setdefault(cid, {})
            ei = st.get("lev", 0)
            has_events = evs is not None and ei < len(evs)
            has_state = cid in label_store.data
            # pending delayed self-mutations (delay_action_by) behave like
            # external label events scheduled at ts_eff; they live in the
            # per-conversation state so streaming checkpoints carry them
            dl = st.get("delayed")
            cand = np.flatnonzero(trig_pre[s:e])
            if not has_events and not has_state and len(cand) == 0 and not dl:
                continue
            t_slice = ts[s:e]
            m = e - s
            changes: list[tuple[int, tuple]] = []
            expiry_heap: list[int] = []

            def hl_tuple(now_us: int) -> tuple:
                return tuple(
                    label_store.has_label(cid, h.label, now_us, h.status, h.manual)
                    for h in hl_feats
                )

            def note_expiry(expires_us) -> None:
                if expires_us is not None:
                    pos = int(np.searchsorted(t_slice, expires_us, side="left"))
                    if pos < m:
                        heapq.heappush(expiry_heap, pos)

            if has_state:
                changes.append((0, hl_tuple(int(t_slice[0]))))
                for stt in label_store.data.get(cid, {}).values():
                    for _, exp in stt.reasons:
                        note_expiry(exp)

            ci = 0
            while True:
                if has_events and ei < len(evs):
                    ev_pos = int(np.searchsorted(t_slice, evs[ei][0], side="left"))
                    if ev_pos >= m:
                        ev_pos = INF  # belongs to a future epoch's rows
                else:
                    ev_pos = INF
                dl = st.get("delayed")
                if dl:
                    dl_pos = int(np.searchsorted(t_slice, dl[0][0], side="left"))
                    if dl_pos >= m:
                        dl_pos = INF  # takes effect past this slice's rows
                else:
                    dl_pos = INF
                exp_pos = expiry_heap[0] if expiry_heap else INF
                cand_pos = int(cand[ci]) if ci < len(cand) else INF
                nxt = min(ev_pos, exp_pos, dl_pos, cand_pos)
                if nxt == INF:
                    break
                if ev_pos == nxt:
                    ts_e, lbl, status, exp = evs[ei]
                    label_store.apply(cid, lbl, status, ts_e, exp)
                    note_expiry(exp)
                    ei += 1
                    changes.append((ev_pos, hl_tuple(int(t_slice[ev_pos]))))
                    continue
                if exp_pos == nxt:
                    heapq.heappop(expiry_heap)
                    changes.append((exp_pos, hl_tuple(int(t_slice[exp_pos]))))
                    continue
                if dl_pos == nxt:
                    # delayed self-mutation reaches its effective instant
                    tsf, _, lbl, status, exp, reason = heapq.heappop(dl)
                    if label_store.apply(cid, lbl, status, tsf, exp):
                        mutations.append((cid, tsf, lbl, status, reason))
                        note_expiry(exp)
                    changes.append((dl_pos, hl_tuple(int(t_slice[dl_pos]))))
                    continue
                # candidate row: evaluate label-gated conjuncts + fire effects
                i_loc = cand_pos
                ci += 1
                i = s + i_loc
                t_i = int(t_slice[i_loc])
                hl_now = {h.name: v for h, v in zip(hl_feats, hl_tuple(t_i))}
                row_rule_memo: dict[str, bool] = {}

                def rule_true_at(rn: str) -> bool:
                    """This rule's value on row i, label conjuncts included —
                    full augmented row, so a conjunct mixing a HasLabel
                    feature with ordinary columns/features resolves instead
                    of failing; HasLabel values override with the walk's
                    current (not vectorized-default) state.  Memoized per
                    row (dependent_rule may re-check a trigger rule)."""
                    got = row_rule_memo.get(rn)
                    if got is not None:
                        return got
                    ok = bool(rule_vals[rn][i])
                    rp = plan_map[rn]
                    if ok and rp.label:
                        rctx = RowContext(row=_LazyRow(aug, i), features=hl_now)
                        for conj in rp.label:
                            try:
                                v = conj.eval_row(rctx)
                            except ExprError:
                                v = None
                            if not v:
                                ok = False
                                break
                    row_rule_memo[rn] = ok
                    return ok

                muts: list[tuple] = []
                for trg in label_triggers:
                    fired = [rn for rn in trg.rules_any if rule_true_at(rn)]
                    if not fired:
                        continue
                    for ef in trg.then:
                        if not isinstance(ef, (LabelAdd, LabelRemove)):
                            continue
                        # suppressed: computed but never applied — the
                        # dry-run escape hatch (output_sink.py:129-131)
                        if ef.suppressed:
                            continue
                        # dependent_rule gate (output_sink.py:135-137); the
                        # dependent rule joins the recorded reason set
                        dep = ef.dependent_rule
                        if dep is not None and not rule_true_at(dep):
                            continue
                        reason = ",".join(
                            sorted(set(fired) | ({dep} if dep else set()))
                        )
                        if isinstance(ef, LabelAdd):
                            status = "added"
                            exp = (
                                t_i + int(ef.expires_after * 1e6)
                                if ef.expires_after is not None
                                else None
                            )
                        else:
                            status, exp = "removed", None
                        delay = ef.delay_action_by
                        if delay is not None and delay > 0:
                            # takes effect at ts_eff, like an external label
                            # event — queued in per-conversation state (so
                            # checkpoints carry it), applied when the walk
                            # reaches the first turn at/after ts_eff
                            dlq = st.setdefault("delayed", [])
                            seq = st.get("dseq", 0)
                            st["dseq"] = seq + 1
                            heapq.heappush(
                                dlq,
                                (t_i + int(delay * 1e6), seq, ef.label, status, exp, reason),
                            )
                        else:
                            muts.append((ef.label, status, exp, reason))
                if muts:
                    applied = label_store.apply_conflicting(
                        cid, [(l, s, x) for l, s, x, _ in muts], t_i
                    )
                    for lbl, status in applied:
                        reason = next(
                            r for l, s, _, r in muts if l == lbl and s == status
                        )
                        mutations.append((cid, t_i, lbl, status, reason))
                        # expiry of the mutation that actually won — keyed by
                        # (label, status), not label alone, so a losing
                        # conflicting mutation's expiry is never picked up
                        note_expiry(
                            next(
                                (x for l, s, x, _ in muts if l == lbl and s == status),
                                None,
                            )
                        )
                    if i_loc + 1 < m:
                        changes.append((i_loc + 1, hl_tuple(int(t_slice[i_loc + 1]))))
            st["lev"] = ei

            # reconstruct HasLabel columns from the change log (fill between
            # consecutive change positions; rows before the first change keep
            # the vectorized default)
            if changes:
                positions = [p for p, _ in changes] + [m]
                # walk order is nondecreasing in position; same-position
                # entries fill an empty range so the later one wins
                for k, (p, tup) in enumerate(changes):
                    nxt_p = positions[k + 1]
                    if nxt_p <= p:
                        continue
                    for f_idx, h in enumerate(hl_feats):
                        sf_vals[h.name][s + p : s + nxt_p] = tup[f_idx]

    # label-gated rule values, vectorized over the exact HasLabel columns
    # (identical to what the sparse walk used at firing time)
    if label_rule_plans:
        hl_cols = dict(aug_cols)
        for hl in hl_feats:
            hl_cols[hl.name] = pa.array(sf_vals[hl.name])
        hctx = EvalContext(pa.table(hl_cols))
        for rp in label_rule_plans:
            for conj in rp.label:
                cv = _bool_operand(_as_array(conj.eval_batch(hctx), n)).to_numpy(
                    zero_copy_only=False
                )
                rule_vals[rp.name] &= cv

    # ---- triggers → verdicts --------------------------------------------
    # sparse: only fired rows materialize Python sets
    verdict_sets: dict[int, set] = {}
    fired_rules: dict[int, set] = {}
    for trg in spec.triggers:
        fired = np.zeros(n, dtype=bool)
        for rn in trg.rules_any:
            fired |= rule_vals[rn]
        if not fired.any():
            continue
        verdicts = [ef.verdict for ef in trg.then if isinstance(ef, DeclareVerdict)]
        for i in np.flatnonzero(fired):
            i = int(i)
            verdict_sets.setdefault(i, set()).update(verdicts)
            fr = fired_rules.setdefault(i, set())
            for rn in trg.rules_any:
                if rule_vals[rn][i]:
                    fr.add(rn)

    # ---- assemble output -------------------------------------------------
    # (conv_id travels the exchange dictionary-encoded; outputs decode back
    # to plain string so sinks/consumers see the declared schema)
    out: dict[str, pa.Array] = {}
    for name in out_schema_cols:
        if name in tbl.column_names:
            col_out = tbl[name]
            if pa.types.is_dictionary(
                col_out.type if not isinstance(col_out, pa.ChunkedArray) else col_out.type
            ):
                col_out = col_out.cast(pa.string())
            out[name] = col_out
    for sf in spec.stateful:
        if isinstance(sf, SessionWindow):
            out[f"{sf.name}__id"] = pa.array(sf_vals[f"{sf.name}__id"])
            out[f"{sf.name}__count"] = pa.array(sf_vals[f"{sf.name}__count"])
        elif isinstance(sf, KvCache):
            out[sf.name] = kv_arrays[sf.name]
        else:
            out[sf.name] = pa.array(sf_vals[sf.name])
    for r in spec.rules:
        out[r.name] = pa.array(rule_vals[r.name])
    if spec.triggers:
        empty: list[str] = []
        out["__verdicts"] = pa.array(
            [sorted(verdict_sets[i]) if i in verdict_sets else empty for i in range(n)],
            pa.list_(pa.string()),
        )
        out["__rules_fired"] = pa.array(
            [sorted(fired_rules[i]) if i in fired_rules else empty for i in range(n)],
            pa.list_(pa.string()),
        )
    out["__error_count"] = tbl["__error_count"]
    return pa.table(out), mutations


def _output_columns(tbl: pa.Table, spec: RuleSpec) -> list[str]:
    hidden = {c for c in tbl.column_names if c.startswith("__sf_") or c.startswith("__rulepre_")}
    return [c for c in tbl.column_names if c not in hidden and c != "__error_count"]


def _empty_output(tbl: pa.Table, spec: RuleSpec) -> pa.Table:
    out: dict[str, pa.Array] = {}
    for name in _output_columns(tbl, spec):
        out[name] = tbl[name]
    for sf in spec.stateful:
        if isinstance(sf, SessionWindow):
            out[f"{sf.name}__id"] = pa.array([], pa.int64())
            out[f"{sf.name}__count"] = pa.array([], pa.int64())
        elif isinstance(
            sf,
            (IncrementWindow, TumblingCount, TumblingSum, TumblingMax, TumblingDistinct, WindowCount),
        ):
            out[sf.name] = pa.array([], pa.int64())
        elif isinstance(sf, KvCache):
            vt = tbl.schema.field(f"__sfv_{sf.name}").type
            out[sf.name] = pa.array([], vt)
        else:
            out[sf.name] = pa.array([], pa.bool_())
    for r in spec.rules:
        out[r.name] = pa.array([], pa.bool_())
    if spec.triggers:
        out["__verdicts"] = pa.array([], pa.list_(pa.string()))
        out["__rules_fired"] = pa.array([], pa.list_(pa.string()))
    out["__error_count"] = tbl["__error_count"]
    return pa.table(out)


class StatefulPartitionEval:
    """Per-partition evaluator for the *batch* pipeline: fresh state, one
    shot (``groupby('__part').map_groups(StatefulPartitionEval(spec, ...))``).
    The streaming shard actor (osprey_ray.streaming.shard) reuses
    :func:`eval_released` with carried state instead."""

    def __init__(self, spec: RuleSpec, label_events: dict[str, list] | None = None):
        self.spec = spec
        self.rule_plans = split_rules(spec)
        self.label_events = label_events or {}
        self.__name__ = "StatefulPartitionEval"  # map_groups wants a named fn

    def __call__(self, tbl: pa.Table) -> pa.Table:
        states: dict = {}
        store = LabelStore()
        tbl = sort_and_dedup(tbl, states)
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        out, _ = eval_released(
            tbl, self.spec, self.rule_plans, states, store, self.label_events,
            persist=False,
        )
        return out
