"""Stage 2: keyed stateful evaluation (windows, CEP, labels, joins).

This is the engine's only stateful stage (SURVEY §7 step 5): input rows are
hash-partitioned by ``conv_id`` and evaluated in strict
``(conv_id, turn_idx, ts)`` order within each partition.  All window math is
vectorized numpy over per-conversation slices (no per-turn Python in the
common path); only the label subsystem — whose read-your-writes ordering is
inherently sequential (a turn's LabelAdd is visible to later turns but not
itself, mirroring write-after-classify in
/root/reference/osprey_worker/src/osprey/worker/sinks/sink/output_sink.py:156-350)
— falls back to a per-turn loop, and only for conversations with label
activity.

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
    LabelAdd,
    LabelRemove,
    RuleSpec,
    SequenceMatch,
    SessionWindow,
    TumblingCount,
)
from osprey_ray.stages.stateless import KEY_COLS, RulePlan, split_rules
from osprey_ray.state.labels import LabelStore

NEG_INF = np.iinfo(np.int64).min


def sort_and_dedup(tbl: pa.Table, states: dict) -> pa.Table:
    """Order by (conv_id, turn_idx, ts) and exact-dedup on (conv_id,
    turn_idx) keep-first (SURVEY §2.8 — the at-least-once duplicate guard;
    the reference relies on idempotent keyed sinks,
    worker/lib/storage/stored_execution_result.py:182-193).  Also drops rows
    at or below a conversation's already-processed ``last_turn`` (cross-epoch
    duplicates / too-late re-orderings in streaming mode)."""
    if tbl.num_rows == 0:
        return tbl
    tbl = tbl.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"), ("ts", "ascending")]
    )
    conv = np.asarray(tbl["conv_id"].to_pylist(), dtype=object)
    turn = tbl["turn_idx"].to_numpy()
    n = len(conv)
    keep = np.ones(n, dtype=bool)
    same_conv = conv[1:] == conv[:-1]
    keep[1:] = ~(same_conv & (turn[1:] == turn[:-1]))
    if states:
        # drop rows already processed in earlier epochs
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = ~same_conv
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            st = states.get(conv[s])
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


def eval_released(
    tbl: pa.Table,
    spec: RuleSpec,
    rule_plans: list[RulePlan],
    states: dict,
    label_store: LabelStore,
    label_events: dict[str, list] | None = None,
) -> tuple[pa.Table, list[tuple]]:
    """Evaluate ordered, deduped rows; mutates ``states``/``label_store``.

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

    conv = np.asarray(tbl["conv_id"].to_pylist(), dtype=object)
    turn = tbl["turn_idx"].to_numpy()
    ts = tbl["ts"].cast(pa.int64()).to_numpy()

    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = conv[1:] != conv[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)

    # ---- vectorized stateful features (per conversation slice) ----------
    sf_vals: dict[str, np.ndarray] = {}
    for sf in spec.stateful:
        if isinstance(sf, SessionWindow):
            sf_vals[f"{sf.name}__id"] = np.zeros(n, dtype=np.int64)
            sf_vals[f"{sf.name}__count"] = np.zeros(n, dtype=np.int64)
        elif isinstance(sf, (IncrementWindow, TumblingCount)):
            sf_vals[sf.name] = np.zeros(n, dtype=np.int64)
        elif isinstance(sf, SequenceMatch):
            sf_vals[sf.name] = np.zeros(n, dtype=bool)
        elif isinstance(sf, HasLabel):
            default = sf.status == "removed" and sf.manual != "yes"
            sf_vals[sf.name] = np.full(n, default, dtype=bool)

    sf_pred: dict[str, np.ndarray] = {}
    for sf in spec.stateful:
        if isinstance(sf, (IncrementWindow, TumblingCount)):
            sf_pred[sf.name] = (
                pc.fill_null(tbl[f"__sf_{sf.name}"], False).to_numpy(zero_copy_only=False)
            )
        elif isinstance(sf, SequenceMatch):
            sf_pred[sf.name] = (
                pc.fill_null(tbl[f"__sf_{sf.name}"], False).to_numpy(zero_copy_only=False)
            )
            sf_pred[sf.name + "_b"] = (
                pc.fill_null(tbl[f"__sf_{sf.name}_b"], False).to_numpy(zero_copy_only=False)
            )

    for s, e in zip(starts, ends):
        cid = conv[s]
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
                keep_from = np.searchsorted(all_flag, t[-1] - w_us, side="right")
                st[f"w:{sf.name}"] = all_flag[keep_from:]
            elif isinstance(sf, TumblingCount):
                b_us = np.int64(sf.bucket_seconds * 1e6)
                flag = sf_pred[sf.name][s:e]
                bucket = t // b_us
                last_bucket, last_count = st.get(f"t:{sf.name}", (None, 0))
                new_seg = np.empty(len(t), dtype=bool)
                new_seg[0] = last_bucket is None or bucket[0] != last_bucket
                new_seg[1:] = bucket[1:] != bucket[:-1]
                cnt = _running_segment_count(flag, new_seg, last_count)
                sf_vals[sf.name][s:e] = cnt
                st[f"t:{sf.name}"] = (bucket[-1], int(cnt[-1]))
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

    # ---- augmented table + non-label rule values ------------------------
    aug_cols = {name: tbl[name] for name in tbl.column_names}
    for name, arr in sf_vals.items():
        aug_cols[name] = pa.array(arr)
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

    active = np.zeros(len(starts), dtype=bool)
    if hl_feats or label_triggers:
        for gi, (s, e) in enumerate(zip(starts, ends)):
            cid = conv[s]
            if cid in label_events or cid in label_store.data:
                active[gi] = True
                continue
            for trg in label_triggers:
                if any(rule_vals[rn][s:e].any() for rn in trg.rules_any):
                    active[gi] = True
                    break
            if not active[gi] and label_rule_plans:
                # a label-gated rule could flip only if labels exist → inactive
                pass
        for gi in np.flatnonzero(active):
            s, e = starts[gi], ends[gi]
            cid = conv[s]
            st = states[cid]
            evs = label_events.get(cid, [])
            ei = st.get("lev", 0)
            for i in range(s, e):
                t_i = int(ts[i])
                while ei < len(evs) and evs[ei][0] <= t_i:
                    _, lbl, status, exp = evs[ei]
                    label_store.apply(cid, lbl, status, evs[ei][0], exp)
                    ei += 1
                # reads: state as of turn start
                hl_now: dict[str, bool] = {}
                for hl in hl_feats:
                    v = label_store.has_label(cid, hl.label, t_i, hl.status, hl.manual)
                    sf_vals[hl.name][i] = v
                    hl_now[hl.name] = v
                for rp in label_rule_plans:
                    if not rule_vals[rp.name][i]:
                        continue
                    rctx = RowContext(row={}, features=dict(hl_now))
                    ok = True
                    for conj in rp.label:
                        try:
                            v = conj.eval_row(rctx)
                        except ExprError:
                            v = None
                        if not v:
                            ok = False
                            break
                    rule_vals[rp.name][i] = ok
                # effects: collected across triggers, applied after the turn
                muts: list[tuple] = []
                for trg in label_triggers:
                    if any(rule_vals[rn][i] for rn in trg.rules_any):
                        for ef in trg.then:
                            if isinstance(ef, LabelAdd):
                                exp = (
                                    t_i + int(ef.expires_after * 1e6)
                                    if ef.expires_after is not None
                                    else None
                                )
                                muts.append((ef.label, "added", exp))
                            elif isinstance(ef, LabelRemove):
                                muts.append((ef.label, "removed", None))
                if muts:
                    applied = label_store.apply_conflicting(cid, muts, t_i)
                    for lbl, status in applied:
                        mutations.append((cid, t_i, lbl, status))
            st["lev"] = ei

    # label-gated rules in *inactive* conversations see the default HasLabel
    # values (filled vectorized above) — apply their label conjuncts there
    if label_rule_plans:
        inactive_rows = np.ones(n, dtype=bool)
        for gi in np.flatnonzero(active):
            inactive_rows[starts[gi] : ends[gi]] = False
        if inactive_rows.any():
            hl_cols = dict(aug_cols)
            for hl in hl_feats:
                hl_cols[hl.name] = pa.array(sf_vals[hl.name])
            hctx = EvalContext(pa.table(hl_cols))
            for rp in label_rule_plans:
                for conj in rp.label:
                    cv = _bool_operand(_as_array(conj.eval_batch(hctx), n)).to_numpy(
                        zero_copy_only=False
                    )
                    rule_vals[rp.name] &= np.where(inactive_rows, cv, True)

    # ---- triggers → verdicts --------------------------------------------
    verdict_sets: list[set] = [set() for _ in range(n)] if spec.triggers else []
    fired_rules: list[set] = [set() for _ in range(n)] if spec.triggers else []
    any_fired = np.zeros(n, dtype=bool)
    for trg in spec.triggers:
        fired = np.zeros(n, dtype=bool)
        for rn in trg.rules_any:
            fired |= rule_vals[rn]
        if not fired.any():
            continue
        any_fired |= fired
        verdicts = [ef.verdict for ef in trg.then if isinstance(ef, DeclareVerdict)]
        idxs = np.flatnonzero(fired)
        for i in idxs:
            for v in verdicts:
                verdict_sets[i].add(v)
            for rn in trg.rules_any:
                if rule_vals[rn][i]:
                    fired_rules[i].add(rn)

    # ---- assemble output -------------------------------------------------
    out: dict[str, pa.Array] = {}
    for name in out_schema_cols:
        if name in tbl.column_names:
            out[name] = tbl[name]
    for sf in spec.stateful:
        if isinstance(sf, SessionWindow):
            out[f"{sf.name}__id"] = pa.array(sf_vals[f"{sf.name}__id"])
            out[f"{sf.name}__count"] = pa.array(sf_vals[f"{sf.name}__count"])
        else:
            out[sf.name] = pa.array(sf_vals[sf.name])
    for r in spec.rules:
        out[r.name] = pa.array(rule_vals[r.name])
    if spec.triggers:
        out["__verdicts"] = pa.array(
            [sorted(vs) for vs in verdict_sets], pa.list_(pa.string())
        )
        out["__rules_fired"] = pa.array(
            [sorted(fr) for fr in fired_rules], pa.list_(pa.string())
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
        elif isinstance(sf, (IncrementWindow, TumblingCount)):
            out[sf.name] = pa.array([], pa.int64())
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
            tbl, self.spec, self.rule_plans, states, store, self.label_events
        )
        return out
