"""Hot-conversation salting for the batch exchange.

BASELINE.json's north_star requires "hash-partitioned by conv_id with
explicit salting for hot conversations".  Whole-key routing serializes a
whale conversation onto one partition evaluator; this module splits a hot
conversation into contiguous turn-index blocks (``blk = turn_idx //
block_turns``), routes each ``(conv, blk)`` to its own partition, and still
produces output byte-equal to unsalted evaluation:

1. **Phase A (parallel)** — each hot partition sorts/dedups its blocks and
   computes a tiny per-block *boundary summary*: the sliding-window event
   tail, tumbling-bucket partials, session-boundary gap facts, the CEP
   first-match tail, and the last KV write.  Exactly the state the streaming
   engine carries between epochs (stages/stateful.py eval_released
   ``persist=True``), derived without evaluating rules.
2. **Scan (driver, cheap)** — per conversation, summaries merge in block
   order into the carry-state each block starts from.  One tiny dict per
   block; associative per feature family (counts/windows/sessions/CEP
   compose; SURVEY §2.9 notes window merges are associative).
3. **Phase B (parallel)** — every block evaluates concurrently through the
   SAME ``eval_released(persist=True)`` carry path streaming uses per epoch,
   seeded with its merged incoming state.

Label-dependent specs are rejected: read-your-writes label feedback is
inherently sequential per conversation (the reference's per-event executor
has the same ordering dependency, worker/sinks/sink/rules_sink.py:121-177),
so label rulesets keep whole-conversation routing.

Hot-conversation *detection* is a performance heuristic, not a correctness
decision — salted and unsalted evaluation agree for every conversation
(golden-tested) — so ``detect_hot_convs`` may use per-file lower-bound
filtering without affecting results.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osprey_ray.rules import (
    HasLabel,
    IncrementWindow,
    KvCache,
    RuleSpec,
    SequenceMatch,
    SessionWindow,
    TumblingCount,
    TumblingDistinct,
    TumblingMax,
    TumblingSum,
    WindowCount,
)
from osprey_ray.stages.stateful import _conv_codes, eval_released, sort_and_dedup
from osprey_ray.stages.stateless import compile_stateless, split_rules
from osprey_ray.state.labels import LabelStore


def _flag(tbl: pa.Table, col: str) -> np.ndarray:
    return pc.fill_null(tbl[col], False).to_numpy(zero_copy_only=False)


def summarize_block(tbl: pa.Table, spec: RuleSpec) -> dict:
    """Boundary summary of one sorted, deduped single-conversation block.

    Cheap and rule-free: only the ``__sf_`` predicate columns stage 1 already
    computed are touched.  The summary is everything ``merge_state`` needs to
    extend a prefix carry-state across this block."""
    ts = tbl["ts"].cast(pa.int64()).to_numpy()
    turn = tbl["turn_idx"].to_numpy().astype(np.int64)
    summ: dict = {
        "last_turn": int(turn[-1]),
        "first_ts": int(ts[0]),
        "last_ts": int(ts[-1]),
    }
    for sf in spec.stateful:
        if isinstance(sf, IncrementWindow):
            w_us = np.int64(sf.window_seconds * 1e6)
            evs = ts[_flag(tbl, f"__sf_{sf.name}")]
            keep_from = np.searchsorted(evs, ts[-1] - w_us, side="right")
            summ[f"w:{sf.name}"] = evs[keep_from:][-sf.max_events_cap :]
        elif isinstance(sf, (TumblingCount, TumblingSum, TumblingMax)):
            # shared segment-partial shape for the whole tumbling family:
            # (first_bucket, reduce(first_seg), last_bucket,
            #  reduce(last_seg), single_segment?) where reduce is count/sum
            # (merged by +) or max (merged by max) — all three are exact
            # under block splits because within a bucket the per-turn value
            # is a running reduction of per-row contributions
            b_us = np.int64(sf.bucket_seconds * 1e6)
            if isinstance(sf, TumblingCount):
                vals = _flag(tbl, f"__sf_{sf.name}").astype(np.int64)
            else:
                # stage 1 already clamped nulls/negatives to 0 (int64)
                vals = (
                    pc.fill_null(tbl[f"__sf_{sf.name}"], 0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
            reduce = np.max if isinstance(sf, TumblingMax) else np.sum
            bucket = ts // b_us
            new_seg = np.empty(len(ts), dtype=bool)
            new_seg[0] = True
            new_seg[1:] = bucket[1:] != bucket[:-1]
            seg = np.cumsum(new_seg) - 1
            nseg = int(seg[-1]) + 1
            cnt_first = int(reduce(vals[seg == 0]))
            cnt_last = cnt_first if nseg == 1 else int(reduce(vals[seg == nseg - 1]))
            summ[f"t:{sf.name}"] = (int(bucket[0]), cnt_first, int(bucket[-1]), cnt_last, nseg == 1)
        elif isinstance(sf, TumblingDistinct):
            # distinct variant of the tumbling segment-partial: the partial
            # is the exact SET of values in the boundary segments (bounded
            # by one bucket's distinct count; merge unions, then drops the
            # set once the cap saturates — split-invariant because a
            # saturated count can never move again)
            b_us = np.int64(sf.bucket_seconds * 1e6)
            col0 = tbl[f"__sf_{sf.name}"].combine_chunks()
            enc = col0 if pa.types.is_dictionary(col0.type) else pc.dictionary_encode(col0)
            codes = pc.fill_null(enc.indices.cast(pa.int64()), -1).to_numpy(
                zero_copy_only=False
            )
            dstrs = enc.dictionary.to_pylist()
            bucket = ts // b_us
            new_seg = np.empty(len(ts), dtype=bool)
            new_seg[0] = True
            new_seg[1:] = bucket[1:] != bucket[:-1]
            seg = np.cumsum(new_seg) - 1
            nseg = int(seg[-1]) + 1

            def _seg_set(mask, codes=codes, dstrs=dstrs):
                cs = codes[mask]
                u = np.unique(cs[cs >= 0])
                return frozenset(dstrs[int(c)] for c in u)

            set_first = _seg_set(seg == 0)
            set_last = set_first if nseg == 1 else _seg_set(seg == nseg - 1)
            summ[f"t:{sf.name}"] = (
                int(bucket[0]), set_first, int(bucket[-1]), set_last, nseg == 1,
            )
        elif isinstance(sf, SessionWindow):
            g_us = np.int64(sf.gap_seconds * 1e6)
            gaps = np.diff(ts) > g_us
            internal = int(gaps.sum())
            tail = len(ts) - (int(np.flatnonzero(gaps)[-1]) + 1) if internal else len(ts)
            summ[f"s:{sf.name}"] = (internal, tail)
        elif isinstance(sf, SequenceMatch):
            firsts = turn[_flag(tbl, f"__sf_{sf.name}")]
            keep_from = np.searchsorted(firsts, turn[-1] - sf.within_turns, side="left")
            summ[f"q:{sf.name}"] = firsts[keep_from:]
        elif isinstance(sf, KvCache):
            pos = np.flatnonzero(_flag(tbl, f"__sf_{sf.name}"))
            if len(pos):
                vcol = tbl[f"__sfv_{sf.name}"]
                if isinstance(vcol, pa.ChunkedArray):
                    vcol = vcol.combine_chunks()
                j = int(pos[-1])
                summ[f"k:{sf.name}"] = (int(ts[j]), vcol[j].as_py())
            else:
                summ[f"k:{sf.name}"] = None
        elif isinstance(sf, WindowCount):
            pass  # reads its source IncrementWindow's buffer
        elif isinstance(sf, HasLabel):
            raise ValueError("label features are not saltable (sequential per conv)")
    return summ


def merge_state(prev: dict | None, summ: dict, spec: RuleSpec) -> dict:
    """Carry-state after (prefix → this block), in the exact format
    ``eval_released(persist=True)`` reads/writes (stateful.py:336-446)."""
    p = prev or {}
    out: dict = {}
    for sf in spec.stateful:
        if isinstance(sf, IncrementWindow):
            w_us = np.int64(sf.window_seconds * 1e6)
            pbuf = p.get(f"w:{sf.name}", np.empty(0, dtype=np.int64))
            keep = pbuf[pbuf > summ["last_ts"] - w_us]
            out[f"w:{sf.name}"] = np.concatenate(
                [keep, summ[f"w:{sf.name}"]]
            ).astype(np.int64)[-sf.max_events_cap :]
        elif isinstance(sf, (TumblingCount, TumblingSum, TumblingMax)):
            fb, cf, lb, cl, single = summ[f"t:{sf.name}"]
            pv = p.get(f"t:{sf.name}")
            if pv is not None and single and pv[0] == fb:
                merged = (
                    max(int(pv[1]), cl)
                    if isinstance(sf, TumblingMax)
                    else int(pv[1]) + cl
                )
                out[f"t:{sf.name}"] = (lb, merged)
            else:
                out[f"t:{sf.name}"] = (lb, cl)
        elif isinstance(sf, TumblingDistinct):
            fb, s_f, lb, s_l, single = summ[f"t:{sf.name}"]
            pv = p.get(f"t:{sf.name}")  # (bucket, count, seen|None)
            cap = sf.max_distinct_cap
            if pv is not None and single and pv[0] == fb:
                if pv[2] is None:  # already saturated — pinned at cap
                    out[f"t:{sf.name}"] = (lb, cap, None)
                else:
                    u = frozenset(pv[2] | s_l)
                    c = min(len(u), cap)
                    out[f"t:{sf.name}"] = (lb, c, None if c >= cap else u)
            else:
                c = min(len(s_l), cap)
                out[f"t:{sf.name}"] = (lb, c, None if c >= cap else s_l)
        elif isinstance(sf, SessionWindow):
            internal, tail = summ[f"s:{sf.name}"]
            g_us = np.int64(sf.gap_seconds * 1e6)
            pv = p.get(f"s:{sf.name}")
            if pv is None:
                sid, cnt = internal, tail
            else:
                last_ts_p, sid_p, cnt_p = pv
                boundary = (summ["first_ts"] - last_ts_p) > g_us
                sid = sid_p + (1 if boundary else 0) + internal
                cnt = tail + (cnt_p if (internal == 0 and not boundary) else 0)
            out[f"s:{sf.name}"] = (summ["last_ts"], int(sid), int(cnt))
        elif isinstance(sf, SequenceMatch):
            pbuf = p.get(f"q:{sf.name}", np.empty(0, dtype=np.int64))
            keep = pbuf[pbuf >= summ["last_turn"] - sf.within_turns]
            out[f"q:{sf.name}"] = np.concatenate([keep, summ[f"q:{sf.name}"]]).astype(np.int64)
        elif isinstance(sf, KvCache):
            k = summ[f"k:{sf.name}"]
            prev_k = p.get(f"k:{sf.name}")
            out[f"k:{sf.name}"] = k if k is not None else prev_k
        elif isinstance(sf, WindowCount):
            pass
    # drop None KV entries so eval's st.get(...) semantics match an absent key
    out = {k: v for k, v in out.items() if v is not None}
    out["last_turn"] = summ["last_turn"]
    return out


def detect_hot_convs(parquet_files: list[str], threshold: int) -> list[str]:
    """Distributed approximate hot-conversation detection: per-file value
    counts, locally filtered to convs with count ≥ threshold/(2·n_files)
    (a conversation with ≥ threshold total rows must clear that bar in some
    file), merged on the driver.  Heuristic by design — see module doc."""
    import ray

    @ray.remote
    def counts(path: str, bar: int) -> dict:
        import pyarrow.parquet as pq

        col = pq.read_table(path, columns=["conv_id"])["conv_id"].combine_chunks()
        enc = col.dictionary_encode()
        c = np.bincount(
            enc.indices.to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary),
        )
        names = enc.dictionary.to_pylist()
        return {names[i]: int(c[i]) for i in np.flatnonzero(c >= bar)}

    bar = max(1, threshold // max(1, 2 * len(parquet_files)))
    merged: dict = {}
    for d in ray.get([counts.remote(p, bar) for p in parquet_files]):
        for k, v in d.items():
            merged[k] = merged.get(k, 0) + v
    return [k for k, v in merged.items() if v >= threshold]


def run_batch_salted(
    parquet_files: list[str],
    spec: RuleSpec,
    num_partitions: int = 64,
    block_turns: int = 65_536,
    hot_convs: list[str] | None = None,
    hot_threshold: int = 250_000,
) -> pa.Table:
    """Salted batch evaluation: cold conversations follow the normal
    hash-exchange path; hot conversations evaluate block-parallel with the
    summary-scan carry protocol.  Output is byte-equal to
    ``run_batch_exchange`` (tested) — salting is purely a skew/latency fix.
    """
    import ray

    if spec.uses_labels():
        raise ValueError(
            "run_batch_salted requires a label-free spec; label feedback is "
            "sequential per conversation — use run_batch/run_batch_exchange"
        )
    stage1 = compile_stateless(spec)
    rule_plans = split_rules(spec)
    if hot_convs is None:
        hot_convs = detect_hot_convs(parquet_files, hot_threshold)
    hot = frozenset(hot_convs)
    P = num_partitions

    @ray.remote
    def route(path: str, row_groups, stage1, hot, P: int, B: int):
        """Stage 1 + salted routing: cold rows → crc32(conv) % P;
        hot rows → P + crc32(f'{conv}#{blk}') % P.

        Takes a row-group range, not a whole file: the batch layout is
        conv-hash-partitioned, so a whale conversation concentrates in ONE
        file — whole-file read tasks would serialize its stage-1 text
        kernels on one core, dominating the wall no matter how well stage 2
        is salted."""
        import pyarrow.parquet as pq

        if row_groups is None:
            tbl = pq.read_table(path)
        else:
            tbl = pq.ParquetFile(path).read_row_groups(list(row_groups))
        if "_arrival_us" in tbl.column_names:
            tbl = tbl.drop_columns(["_arrival_us"])
        t1 = stage1(tbl)
        col = t1["conv_id"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col.dictionary_encode()
        names = enc.dictionary.to_pylist()
        dict_cold = np.array([zlib.crc32(c.encode()) % P for c in names], dtype=np.int64)
        dict_hot = np.array([c in hot for c in names], dtype=bool)
        idx = enc.indices.to_numpy(zero_copy_only=False)
        parts = dict_cold[idx]
        is_hot = dict_hot[idx]
        if is_hot.any():
            blk = t1["turn_idx"].to_numpy().astype(np.int64) // B
            # crc32 only per UNIQUE (conv, blk) pair — never per row
            combo = idx[is_hot].astype(np.int64) * (1 << 32) + blk[is_hot]
            uniq, inv = np.unique(combo, return_inverse=True)
            uniq_parts = np.array(
                [
                    zlib.crc32(f"{names[int(u >> 32)]}#{int(u & 0xFFFFFFFF)}".encode()) % P
                    for u in uniq
                ],
                dtype=np.int64,
            )
            parts[is_hot] = P + uniq_parts[inv]
        ci = t1.schema.get_field_index("conv_id")
        t1 = t1.set_column(ci, "conv_id", enc)
        # one stable argsort + contiguous slices: O(n log n), not O(P·n)
        order = np.argsort(parts, kind="stable")
        t1 = t1.take(pa.array(order))
        bounds = np.searchsorted(parts[order], np.arange(2 * P + 1))
        return [
            t1.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p]))
            for p in range(2 * P)
        ]

    def _resolve(tables):
        # refs nested inside a list arg are not auto-resolved by Ray
        refs = [t for t in tables if isinstance(t, ray.ObjectRef)]
        if refs:
            fetched = iter(ray.get(refs))
            tables = [next(fetched) if isinstance(t, ray.ObjectRef) else t for t in tables]
        return tables

    @ray.remote
    def eval_cold(tables, spec, rule_plans):
        tables = _resolve(tables)
        live = [t for t in tables if t.num_rows]
        if not live:
            return None
        tbl = pa.concat_tables(live, promote_options="default")
        states: dict = {}
        tbl = sort_and_dedup(tbl, states)
        out, _ = eval_released(tbl, spec, rule_plans, states, LabelStore(), {}, persist=False)
        return out

    @ray.remote
    def hot_phase_a(tables, spec, B: int):
        """Sort/dedup this hot partition, slice per (conv, blk), return
        [(conv, blk, summary, block_table_ref)]."""
        tables = _resolve(tables)
        live = [t for t in tables if t.num_rows]
        if not live:
            return []
        tbl = sort_and_dedup(pa.concat_tables(live, promote_options="default"), {})
        codes, dictionary = _conv_codes(tbl)
        turn = tbl["turn_idx"].to_numpy().astype(np.int64)
        blk = turn // B
        change = np.empty(len(codes), dtype=bool)
        change[0] = True
        change[1:] = (codes[1:] != codes[:-1]) | (blk[1:] != blk[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(codes))
        out = []
        import ray as _ray

        for s, e in zip(starts, ends):
            sub = tbl.slice(s, e - s).combine_chunks()
            summ = summarize_block(sub, spec)
            out.append(
                (dictionary[codes[s]].as_py(), int(blk[s]), summ, _ray.put(sub))
            )
        return out

    @ray.remote
    def hot_phase_b(block_tbl, spec, rule_plans, conv: str, state: dict):
        states = {conv: state} if state else {}
        out, _ = eval_released(
            block_tbl, spec, rule_plans, states, LabelStore(), {}, persist=True
        )
        return out

    # one route task per bounded row-group chunk (~512k rows), so a whale
    # file's stage-1 work parallelizes instead of pinning one core
    import pyarrow.parquet as pq

    chunks: list[tuple[str, list[int] | None]] = []
    target_rows = 524_288
    for f in parquet_files:
        md = pq.ParquetFile(f).metadata
        groups: list[int] = []
        rows = 0
        for g in range(md.num_row_groups):
            groups.append(g)
            rows += md.row_group(g).num_rows
            if rows >= target_rows:
                chunks.append((f, groups))
                groups, rows = [], 0
        if groups:
            chunks.append((f, groups))
    reads = [
        route.options(num_returns=2 * P).remote(f, rg, stage1, hot, P, block_turns)
        for f, rg in chunks
    ]
    cold = [
        eval_cold.remote([r[p] for r in reads], spec, rule_plans) for p in range(P)
    ]
    hot_a = [
        hot_phase_a.remote([r[P + p] for r in reads], spec, block_turns)
        for p in range(P)
    ]
    infos = [item for part in ray.get(hot_a) for item in part]

    by_conv: dict[str, list] = {}
    for conv, blk, summ, ref in infos:
        by_conv.setdefault(conv, []).append((blk, summ, ref))
    hot_b = []
    for conv, blocks in by_conv.items():
        blocks.sort(key=lambda x: x[0])
        state: dict | None = None
        for blk, summ, ref in blocks:
            hot_b.append(hot_phase_b.remote(ref, spec, rule_plans, conv, state or {}))
            state = merge_state(state, summ, spec)

    outs = [o for o in ray.get(cold + hot_b) if o is not None and o.num_rows]
    if not outs:
        return pa.table({})
    return pa.concat_tables(outs, promote_options="default")
