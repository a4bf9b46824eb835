"""Row-at-a-time oracle interpreter for golden tests.

Mirrors the reference's per-event execution loop
(/root/reference/osprey_worker/src/osprey/worker/sinks/sink/rules_sink.py:121-177
→ executor.execute per action): iterate turns one at a time in strict
``(conv_id, turn_idx, ts)`` order, keep window/sequence state in plain
Python buffers (the Redis-ZSET / label-service analogues), apply effects
after each turn.  Entirely independent of the vectorized numpy window math
in ``stages/stateful.py`` — the golden tests require byte-equality between
the two, also after kill+resume (SURVEY §5).

Only the ``LabelStore`` semantic core is shared with the pipeline (its
semantics are unit-tested against the reference's documented behavior
separately); everything else here is a second implementation.
"""

from __future__ import annotations

import bisect
import heapq
from typing import Any

import pyarrow as pa

from osprey_ray.expr import ExprError, RowContext
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
from osprey_ray.state.labels import LabelStore


def _truthy(v: Any) -> bool:
    return bool(v)


class OracleEngine:
    def __init__(self, spec: RuleSpec, label_events: dict[str, list] | None = None):
        spec.validate()
        self.spec = spec
        self.label_events = label_events or {}
        self.conv_state: dict[str, dict] = {}
        self.labels = LabelStore()

    # -- per-turn stateful features ---------------------------------------

    def _stateful(self, cid: str, turn_idx: int, ts_us: int, rctx: RowContext) -> None:
        st = self.conv_state.setdefault(cid, {})
        spec = self.spec
        # external label events up to and including this ts
        evs = self.label_events.get(cid, [])
        ei = st.setdefault("lev", 0)
        while ei < len(evs) and evs[ei][0] <= ts_us:
            _, lbl, status, exp = evs[ei]
            self.labels.apply(cid, lbl, status, evs[ei][0], exp)
            ei += 1
        st["lev"] = ei
        # delayed self-mutations whose effective instant has arrived —
        # applied after external events at the same observing turn, matching
        # the engine walk's branch order (ev → delayed)
        dl = st.get("delayed")
        while dl and dl[0][0] <= ts_us:
            tsf, _, lbl, status, exp, _reason = heapq.heappop(dl)
            self.labels.apply(cid, lbl, status, tsf, exp)

        for sf in spec.stateful:
            if isinstance(sf, IncrementWindow):
                buf = st.setdefault(f"w:{sf.name}", [])
                try:
                    flagged = _truthy(sf.when.eval_row(rctx))
                except ExprError:
                    flagged = False
                if flagged:
                    buf.append(ts_us)
                    if len(buf) > sf.max_events_cap:
                        del buf[: len(buf) - sf.max_events_cap]
                w_us = int(sf.window_seconds * 1e6)
                lo = bisect.bisect_right(buf, ts_us - w_us)
                rctx.features[sf.name] = min(len(buf) - lo, sf.max_events_cap)
            elif isinstance(sf, TumblingCount):
                b_us = int(sf.bucket_seconds * 1e6)
                bucket = ts_us // b_us
                last_bucket, cnt = st.get(f"t:{sf.name}", (None, 0))
                if bucket != last_bucket:
                    cnt = 0
                try:
                    flagged = _truthy(sf.when.eval_row(rctx))
                except ExprError:
                    flagged = False
                if flagged:
                    cnt += 1
                st[f"t:{sf.name}"] = (bucket, cnt)
                rctx.features[sf.name] = cnt
            elif isinstance(sf, TumblingSum):
                b_us = int(sf.bucket_seconds * 1e6)
                bucket = ts_us // b_us
                last_bucket, sm = st.get(f"t:{sf.name}", (None, 0))
                if bucket != last_bucket:
                    sm = 0
                try:
                    v = sf.value.eval_row(rctx)
                except ExprError:
                    v = None
                if v is not None:
                    # match stage-1 semantics: int64 cast, negatives → 0
                    sm += max(int(v), 0)
                st[f"t:{sf.name}"] = (bucket, sm)
                rctx.features[sf.name] = sm
            elif isinstance(sf, TumblingMax):
                b_us = int(sf.bucket_seconds * 1e6)
                bucket = ts_us // b_us
                last_bucket, mx = st.get(f"t:{sf.name}", (None, 0))
                if bucket != last_bucket:
                    mx = 0
                try:
                    v = sf.value.eval_row(rctx)
                except ExprError:
                    v = None
                if v is not None:
                    # match stage-1 semantics: int64 cast, negatives -> 0
                    mx = max(mx, max(int(v), 0))
                st[f"t:{sf.name}"] = (bucket, mx)
                rctx.features[sf.name] = mx
            elif isinstance(sf, TumblingDistinct):
                b_us = int(sf.bucket_seconds * 1e6)
                bucket = ts_us // b_us
                last_bucket, dcnt, seen = st.get(
                    f"t:{sf.name}", (None, 0, frozenset())
                )
                if bucket != last_bucket:
                    dcnt, seen = 0, frozenset()
                try:
                    v = sf.value.eval_row(rctx)
                except ExprError:
                    v = None
                cap = sf.max_distinct_cap
                if v is not None and seen is not None and dcnt < cap:
                    # match stage-1 string-cast semantics (Arrow casts
                    # bools to "true"/"false"); use string value exprs to
                    # avoid float-format parity edges
                    if isinstance(v, bool):
                        sv = "true" if v else "false"
                    elif isinstance(v, str):
                        sv = v
                    else:
                        sv = str(v)
                    if sv not in seen:
                        seen = frozenset(seen | {sv})
                        dcnt += 1
                        if dcnt >= cap:
                            seen = None  # saturated: count pinned at cap
                st[f"t:{sf.name}"] = (bucket, dcnt, seen)
                rctx.features[sf.name] = dcnt
            elif isinstance(sf, SessionWindow):
                g_us = int(sf.gap_seconds * 1e6)
                last_ts, sid, cnt = st.get(f"s:{sf.name}", (None, 0, 0))
                if last_ts is not None and ts_us - last_ts > g_us:
                    sid += 1
                    cnt = 0
                cnt += 1
                st[f"s:{sf.name}"] = (ts_us, sid, cnt)
                rctx.features[f"{sf.name}__id"] = sid
                rctx.features[f"{sf.name}__count"] = cnt
            elif isinstance(sf, SequenceMatch):
                buf = st.setdefault(f"q:{sf.name}", [])
                try:
                    is_second = _truthy(sf.second.eval_row(rctx))
                except ExprError:
                    is_second = False
                match = is_second and any(
                    turn_idx - sf.within_turns <= tj < turn_idx for tj in buf
                )
                rctx.features[sf.name] = match
                try:
                    is_first = _truthy(sf.first.eval_row(rctx))
                except ExprError:
                    is_first = False
                if is_first:
                    buf.append(turn_idx)
                    while buf and buf[0] < turn_idx - sf.within_turns:
                        buf.pop(0)
            elif isinstance(sf, WindowCount):
                # declared before its source window → buffer holds prior
                # turns only at this point; clamped by the source's cap
                buf = st.setdefault(f"w:{sf.source}", [])
                w_us = int(sf.window_seconds * 1e6)
                lo = bisect.bisect_right(buf, ts_us - w_us)
                src_cap = next(
                    x.max_events_cap
                    for x in self.spec.stateful
                    if isinstance(x, IncrementWindow) and x.name == sf.source
                )
                rctx.features[sf.name] = min(len(buf) - lo, src_cap)
            elif isinstance(sf, KvCache):
                cur = st.get(f"k:{sf.name}")
                val = None
                if cur is not None:
                    set_ts, v = cur
                    if sf.ttl_seconds is None or set_ts + int(sf.ttl_seconds * 1e6) > ts_us:
                        val = v
                rctx.features[sf.name] = val
                try:
                    do_set = _truthy(sf.set_when.eval_row(rctx))
                except ExprError:
                    do_set = False
                if do_set:
                    try:
                        new_v = sf.value.eval_row(rctx)
                    except ExprError:
                        new_v = None
                    st[f"k:{sf.name}"] = (ts_us, new_v)
            elif isinstance(sf, HasLabel):
                rctx.features[sf.name] = self.labels.has_label(
                    cid, sf.label, ts_us, sf.status, sf.manual
                )

    # -- main loop ----------------------------------------------------------

    def run(self, rows: list[dict]) -> list[dict]:
        """rows must already be in (conv_id, turn_idx, ts) order and deduped;
        returns one result dict per turn."""
        from osprey_ray.rules import extracted_names

        spec = self.spec
        extract = extracted_names(spec.features)
        out = []
        for row in rows:
            cid = row["conv_id"]
            ts_us = _ts_us(row["ts"])
            rctx = RowContext(row=row)
            # stateless features, declared order
            for f in spec.features:
                try:
                    rctx.features[f.name] = f.expr.eval_row(rctx)
                except ExprError:
                    rctx.features[f.name] = None
            self._stateful(cid, row["turn_idx"], ts_us, rctx)
            # rules
            rule_vals: dict[str, bool] = {}
            for r in spec.rules:
                vals = []
                for conj in r.when_all:
                    try:
                        vals.append(conj.eval_row(rctx))
                    except ExprError:
                        vals.append(None)
                rule_vals[r.name] = all(vals)
                rctx.features[r.name] = rule_vals[r.name]
            # triggers → verdicts + effects (applied after the turn)
            verdicts: set = set()
            fired_rules: set = set()
            muts: list[tuple] = []
            for trg in spec.triggers:
                passing = [rn for rn in trg.rules_any if rule_vals.get(rn)]
                if not passing:
                    continue
                fired_rules.update(passing)
                for ef in trg.then:
                    if isinstance(ef, DeclareVerdict):
                        verdicts.add(ef.verdict)
                        continue
                    if not isinstance(ef, (LabelAdd, LabelRemove)):
                        continue
                    if ef.suppressed:
                        continue  # computed but never applied
                    dep = ef.dependent_rule
                    if dep is not None and not rule_vals.get(dep):
                        continue  # dependent rule gate
                    if isinstance(ef, LabelAdd):
                        status = "added"
                        exp = (
                            ts_us + int(ef.expires_after * 1e6)
                            if ef.expires_after is not None
                            else None
                        )
                    else:
                        status, exp = "removed", None
                    delay = ef.delay_action_by
                    if delay is not None and delay > 0:
                        st = self.conv_state.setdefault(cid, {})
                        dlq = st.setdefault("delayed", [])
                        seq = st.get("dseq", 0)
                        st["dseq"] = seq + 1
                        reason = ",".join(sorted(set(passing) | ({dep} if dep else set())))
                        heapq.heappush(
                            dlq, (ts_us + int(delay * 1e6), seq, ef.label, status, exp, reason)
                        )
                    else:
                        muts.append((ef.label, status, exp))
            if muts:
                self.labels.apply_conflicting(cid, muts, ts_us)

            res = {k: row[k] for k in ("conv_id", "turn_idx", "ts")}
            for f in spec.features:
                if f.name in extract:
                    res[f.name] = rctx.features[f.name]
            for name in spec.stateful_names():
                res[name] = rctx.features[name]
            for r in spec.rules:
                res[r.name] = rule_vals[r.name]
            if spec.triggers:
                res["__verdicts"] = sorted(verdicts)
                res["__rules_fired"] = sorted(fired_rules)
            res["__error_count"] = rctx.errors
            out.append(res)
        return out


def _ts_us(v: Any) -> int:
    import datetime

    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        epoch = datetime.datetime(1970, 1, 1)
        return int((v - epoch).total_seconds() * 1e6)
    return int(v)


def oracle_results(
    transcripts: pa.Table,
    spec: RuleSpec,
    label_events: dict[str, list] | None = None,
) -> list[dict]:
    """Sort + dedup the table the way the pipeline does, then interpret."""
    tbl = transcripts.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"), ("ts", "ascending")]
    )
    rows = tbl.to_pylist()
    seen: set = set()
    deduped = []
    for r in rows:
        key = (r["conv_id"], r["turn_idx"])
        if key in seen:
            continue
        seen.add(key)
        deduped.append(r)
    return OracleEngine(spec, label_events).run(deduped)
