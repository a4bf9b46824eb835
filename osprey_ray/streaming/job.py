"""StreamingJob — micro-batch epoch driver with exactly-once sink + resume.

The streaming analogue of the reference's Kafka → coordinator → worker loop
(/root/reference SURVEY §3.1), re-expressed for a replayable Parquet log:

- the input is an ordered list of segment files (the "Kafka log"; offsets =
  file indices — kafka.rs:112-116 manual-commit semantics become manifest
  commits);
- per epoch: read+stateless-eval+route tasks fan the rows out to P
  persistent :class:`StateShard` actors (the hash-ring analogue,
  worker/lib/etcd/ring.py, with crc32(conv_id) % P);
- the event-time watermark advances as ``max(seen ts) - allowed_lateness``,
  monotonically; shards release and evaluate rows ≤ watermark in order;
- after all shards finish an epoch, the driver atomically commits
  ``manifest/epoch-{e}.json`` — {epoch, input file offsets, watermark,
  per-partition output files, state snapshot paths, metrics}.  An epoch is
  *visible* iff its manifest exists: readers that honor manifests get
  exactly-once output even though shard writes are merely idempotent;
- checkpoint = per-shard state snapshot referenced by the manifest; resume
  finds the last committed manifest, restores shard snapshots, and
  continues from the next uncommitted epoch (replaying epochs since the
  last snapshot in no-write recovery mode when snapshots are sparser than
  manifests).

Determinism: outputs depend only on (input files, epoch boundaries,
allowed_lateness) — never wall clock — so a killed+resumed run produces
bit-identical verdict rows (tested in tests/test_streaming.py).
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from osprey_ray.rules import RuleSpec
from osprey_ray.stages.stateless import StatelessStage, compile_stateless
from osprey_ray.streaming.shard import StateShard

I64_MIN = np.iinfo(np.int64).min


@ray.remote
def _read_route(
    chunks: list,
    stage1: StatelessStage,
    num_parts: int,
):
    """Read segment chunks — each a plain path or a ``(path, row_groups)``
    pair (sub-file offsets: the reference commits per-message Kafka offsets,
    kafka.rs:112-116; row-group ranges are the Parquet-native equivalent) —
    run the stateless stage, split by crc32(conv_id) %% P.
    Returns [table_p0, ..., table_p{P-1}, max_ts]."""
    import pyarrow.parquet as pq

    tables = []
    for c in chunks:
        path, rgs = c if isinstance(c, (tuple, list)) else (c, None)
        if rgs is None:
            tables.append(pq.read_table(path))
        else:
            tables.append(pq.ParquetFile(path).read_row_groups(list(rgs)))
    tbl = pa.concat_tables(tables, promote_options="default")
    if "_arrival_us" in tbl.column_names:
        tbl = tbl.drop_columns(["_arrival_us"])
    t1 = stage1(tbl)
    # dictionary-encode conv_id once: crc32 only over unique ids (route),
    # and the encoded column ships through the exchange (~25% fewer
    # object-store bytes — the key dominates the narrow post-stage-1 rows)
    col = t1["conv_id"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    dict_parts = np.array(
        [zlib.crc32(c.encode()) % num_parts for c in enc.dictionary.to_pylist()],
        dtype=np.int32,
    )
    parts = dict_parts[enc.indices.to_numpy(zero_copy_only=False)]
    max_ts = pc.max(t1["ts"].cast(pa.int64())).as_py() if t1.num_rows else I64_MIN
    ci = t1.schema.get_field_index("conv_id")
    t1 = t1.set_column(ci, "conv_id", enc)
    out = []
    parts_arr = pa.array(parts)
    for p in range(num_parts):
        out.append(t1.filter(pc.equal(parts_arr, p)))
    return out + [max_ts]


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)


class StreamingJob:
    def __init__(
        self,
        spec: RuleSpec,
        segment_files: list[str],
        out_dir: str,
        label_events: dict[str, list] | None = None,
        num_shards: int = 8,
        files_per_epoch: int = 2,
        files_per_read_task: int = 1,
        allowed_lateness_s: float = 1000.0,
        checkpoint_interval: int = 1,
        pending_spill_rows: int = 500_000,
        rows_per_epoch: int | None = None,
        salt_block_rows: int | None = None,
        spec_updates: dict[int, RuleSpec] | None = None,
    ):
        self.spec = spec
        self.segment_files = list(segment_files)
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "manifest")
        self.ckpt_dir = os.path.join(out_dir, "checkpoint")
        self.data_dir = os.path.join(out_dir, "data")
        for d in (self.manifest_dir, self.ckpt_dir, self.data_dir):
            os.makedirs(d, exist_ok=True)
        self.label_events = label_events or {}
        self.P = num_shards
        self.files_per_epoch = files_per_epoch
        self.files_per_read_task = files_per_read_task
        # sub-file epoch planning: when set, epoch boundaries fall at Parquet
        # row-group boundaries (~rows_per_epoch rows each) instead of whole
        # files, and manifests record (file, row-group range) lineage — a
        # crash mid-way through a large segment replays only the committed
        # row groups, not the whole file
        self.rows_per_epoch = rows_per_epoch
        # streaming hot-conversation salting (label-free specs only): a
        # released slice holding > salt_block_rows rows of one conversation
        # evaluates block-parallel inside the owning shard
        self.salt_block_rows = salt_block_rows
        self.lateness_us = int(allowed_lateness_s * 1e6)
        self.checkpoint_interval = checkpoint_interval
        self.pending_spill_rows = pending_spill_rows
        self.stage1 = compile_stateless(spec)
        # ruleset hot-reload schedule (the reference's etcd-watch live swap,
        # worker/lib/osprey_engine.py:127-149, made deterministic/replayable:
        # epoch → new RuleSpec, applied at that epoch's boundary BEFORE its
        # rows are read).  Every manifest records the content hash of the
        # spec that produced it (engine/ast/sources.py:99-118 identity), and
        # resume validates the hash of the effective spec against the last
        # committed manifest.
        self.spec_updates = dict(spec_updates or {})
        self._cur_hash = spec.content_hash()
        self.shards: list | None = None
        self.metrics: list[dict] = []

    # -- epoch planning ----------------------------------------------------

    def epochs(self) -> list[list]:
        """Epoch plan: a list of chunks per epoch, each chunk
        ``(path, row_group_ids | None)``."""
        fs = self.segment_files
        if self.rows_per_epoch is None:
            k = self.files_per_epoch
            return [
                [(f, None) for f in fs[i : i + k]] for i in range(0, len(fs), k)
            ]
        import pyarrow.parquet as pq

        epochs: list[list] = []
        cur: list = []
        cur_rows = 0
        for f in fs:
            md = pq.ParquetFile(f).metadata
            groups: list[int] = []
            for g in range(md.num_row_groups):
                groups.append(g)
                cur_rows += md.row_group(g).num_rows
                if cur_rows >= self.rows_per_epoch:
                    cur.append((f, groups))
                    epochs.append(cur)
                    cur, groups, cur_rows = [], [], 0
            if groups:
                cur.append((f, groups))
        if cur:
            epochs.append(cur)
        return epochs

    def _manifest_path(self, epoch: int) -> str:
        return os.path.join(self.manifest_dir, f"epoch-{epoch:05d}.json")

    def last_committed_epoch(self) -> int:
        last = -1
        for name in os.listdir(self.manifest_dir):
            if name.startswith("epoch-") and name.endswith(".json"):
                last = max(last, int(name[6:-5]))
        return last

    # -- shard lifecycle ---------------------------------------------------

    def _start_shards(self) -> None:
        # pre-partition the label-event side input the same way as the turns
        per_shard: list[dict] = [{} for _ in range(self.P)]
        for cid, evs in self.label_events.items():
            per_shard[zlib.crc32(cid.encode()) % self.P][cid] = evs
        self.shards = [
            StateShard.remote(
                self.spec, p, self.data_dir, per_shard[p],
                pending_spill_rows=self.pending_spill_rows,
                salt_block_rows=self.salt_block_rows,
            )
            for p in range(self.P)
        ]

    # -- main loop ---------------------------------------------------------

    def run(self, stop_after_epoch: int | None = None, resume: bool = False) -> list[dict]:
        """Process epochs (optionally stopping early to simulate a crash);
        with ``resume=True`` continue a previous run from its checkpoint.
        Returns per-epoch metrics."""
        if self.shards is None:
            self._start_shards()
        epochs = self.epochs()
        start_epoch = 0
        watermark = I64_MIN
        recover_until = -1

        if resume:
            last = self.last_committed_epoch()
            if last >= 0:
                manifest = json.load(open(self._manifest_path(last)))
                # the committed lineage names the ruleset that produced it;
                # continuing under a different one would silently mix outputs
                want_hash = manifest.get("ruleset_hash")
                eff = self.spec
                for ue in sorted(self.spec_updates):
                    if ue <= last:
                        eff = self.spec_updates[ue]
                if want_hash is not None and eff.content_hash() != want_hash:
                    raise ValueError(
                        f"resume ruleset mismatch: manifest epoch {last} was "
                        f"committed under ruleset {want_hash}, but the "
                        f"effective spec hashes to {eff.content_hash()}"
                    )
                watermark = int(manifest["watermark"])
                snap_epoch = manifest.get("last_snapshot_epoch", -1)
                if snap_epoch >= 0:
                    snap_paths = json.load(open(self._manifest_path(snap_epoch)))["snapshots"]
                    ray.get(
                        [s.restore.remote(p) for s, p in zip(self.shards, snap_paths)]
                    )
                    snap_manifest = json.load(open(self._manifest_path(snap_epoch)))
                    watermark = int(snap_manifest["watermark"])
                recover_until = last
                start_epoch = snap_epoch + 1
                # shards were constructed with the base spec; re-apply the
                # latest swap at or before the restored snapshot (later
                # swaps re-apply in-loop during replay, as they did live)
                pre = [ue for ue in sorted(self.spec_updates) if ue <= snap_epoch]
                if pre:
                    self._apply_spec(self.spec_updates[pre[-1]])

        def _launch_reads(files: list[str]) -> list:
            chunks = [
                files[i : i + self.files_per_read_task]
                for i in range(0, len(files), self.files_per_read_task)
            ]
            return [
                _read_route.options(num_returns=self.P + 1).remote(c, self.stage1, self.P)
                for c in chunks
            ]

        # Pipelined epoch loop: epoch e+1's reads launch while e processes,
        # and e+1's shard calls are SUBMITTED before e's results are
        # gathered — Ray actors execute queued calls FIFO, so per-shard
        # ordering (process e → snapshot e → process e+1) is preserved while
        # fast shards run ahead of slow ones.  Manifests still commit
        # strictly in epoch order (the exactly-once gate is unchanged).
        prefetched: dict[int, list] = {}
        in_flight: list[tuple] = []  # (e, files, watermark, stats_refs, snap_refs, recovery, hash, t0)

        def _drain_one() -> None:
            e_, files_, wm_, stats_refs, snap_refs, recovery_, rhash_, t0_ = in_flight.pop(0)
            stats = ray.get(stats_refs)
            snapshots = ray.get(snap_refs) if snap_refs is not None else None
            self.metrics.append(
                self._commit(e_, files_, wm_, stats, snapshots, recovery_, t0_, rhash_)
            )

        for e in range(start_epoch, len(epochs)):
            if stop_after_epoch is not None and e > stop_after_epoch:
                break
            if e in self.spec_updates:
                self._apply_spec(self.spec_updates[e])
            t0 = time.perf_counter()
            files = epochs[e]
            recovery = e <= recover_until
            read_refs = prefetched.pop(e, None) or _launch_reads(files)
            if (
                e + 1 < len(epochs)
                and (stop_after_epoch is None or e + 1 <= stop_after_epoch)
                # a scheduled swap at e+1 must recompile stage1 before that
                # epoch's reads launch — skip the prefetch, launch in-loop
                and e + 1 not in self.spec_updates
            ):
                prefetched[e + 1] = _launch_reads(epochs[e + 1])
            # the watermark needs this epoch's max event ts before dispatch
            max_ts = max(ray.get([r[self.P] for r in read_refs]), default=I64_MIN)
            watermark = max(watermark, max_ts - self.lateness_us)
            stats_refs = [
                self.shards[p].process.remote(
                    e, [r[p] for r in read_refs], watermark, not recovery
                )
                for p in range(self.P)
            ]
            do_snap = (e % self.checkpoint_interval) == (self.checkpoint_interval - 1)
            snap_refs = (
                [s.snapshot.remote(self.ckpt_dir, e) for s in self.shards]
                if do_snap and not recovery
                else None
            )
            in_flight.append((e, files, watermark, stats_refs, snap_refs, recovery, self._cur_hash, t0))
            while len(in_flight) > 1:  # one epoch of lookahead
                _drain_one()
        while in_flight:
            _drain_one()
        return self.metrics

    def _apply_spec(self, spec: RuleSpec) -> None:
        """Swap the compiled ruleset at an epoch boundary: recompile the
        stateless stage for subsequent read tasks and push the new spec to
        every shard (actor FIFO ordering lands the swap between epochs)."""
        spec.validate()
        self.spec = spec
        self.stage1 = compile_stateless(spec)
        self._cur_hash = spec.content_hash()
        if self.shards is not None:
            ray.get(
                [s.update_spec.remote(spec, self.salt_block_rows) for s in self.shards]
            )

    def finalize(self) -> dict:
        """Flush all pending rows (watermark → +inf) as a final epoch —
        the bounded-stream end-of-input barrier."""
        e = len(self.epochs())
        t0 = time.perf_counter()
        stats = ray.get(
            [
                self.shards[p].process.remote(e, [], np.iinfo(np.int64).max, True)
                for p in range(self.P)
            ]
        )
        snapshots = ray.get([s.snapshot.remote(self.ckpt_dir, e) for s in self.shards])
        m = self._commit(e, [], int(np.iinfo(np.int64).max), stats, snapshots, False, t0, self._cur_hash)
        self.metrics.append(m)
        return m

    def _commit(self, e, files, watermark, stats, snapshots, recovery, t0, ruleset_hash=None) -> dict:
        released = sum(s["released"] for s in stats)
        # end-to-end watermark lag: newest event seen vs the frontier up to
        # which results are final — bounded by allowed_lateness by
        # construction; growth beyond it means the engine is falling behind
        lag_s = None
        if I64_MIN < watermark < np.iinfo(np.int64).max:
            # = allowed lateness (event-time bound) + this epoch's processing
            # wall time (how long finalization trailed the data)
            lag_s = round(self.lateness_us / 1e6 + (time.perf_counter() - t0), 3)
        metrics = {
            "epoch": e,
            "input_files": files,
            "watermark": int(watermark),
            "watermark_lag_s": lag_s,
            "released_rows": released,
            "fired_rows": sum(s["fired"] for s in stats),
            "late_dropped": sum(s["late_dropped"] for s in stats),
            "pending_rows": sum(s["pending"] for s in stats),
            "pending_spilled_rows": sum(s.get("pending_spilled_rows", 0) for s in stats),
            "wall_s": round(time.perf_counter() - t0, 4),
            "recovery": recovery,
        }
        if not recovery:
            last_snap = e if snapshots else self._last_snapshot_epoch(e)
            snap_paths = [s["path"] for s in snapshots] if snapshots else None
            consumed = [
                p for s in (snapshots or []) for p in s.get("consumed_spills", [])
            ]
            manifest = dict(
                metrics,
                outputs=[s["file"] for s in stats],
                label_outputs=[s.get("labels_file") for s in stats],
                window_outputs=[s.get("windows_file") for s in stats],
                open_windows=sum(s.get("open_windows", 0) for s in stats),
                snapshots=snap_paths,
                gc_spills=consumed,
                last_snapshot_epoch=last_snap,
                ruleset_hash=ruleset_hash or self._cur_hash,
            )
            _atomic_write_json(self._manifest_path(e), manifest)
            # the manifest naming these snapshots is now the committed
            # recovery point — spill files consumed before them are
            # unreachable from any future resume; GC them here (post-commit),
            # never shard-side (see StateShard.snapshot)
            for p in consumed:
                try:
                    os.remove(p)
                except OSError:
                    pass
        return metrics

    def _last_snapshot_epoch(self, before: int) -> int:
        for e in range(before - 1, -1, -1):
            p = self._manifest_path(e)
            if os.path.exists(p):
                m = json.load(open(p))
                if m.get("snapshots"):
                    return e
        return -1

    # -- results -----------------------------------------------------------

    def output_files(self) -> list[str]:
        """Committed output files, manifest order (exactly-once read path)."""
        out = []
        for e in range(self.last_committed_epoch() + 1):
            p = self._manifest_path(e)
            if os.path.exists(p):
                for f in json.load(open(p))["outputs"]:
                    if f:
                        out.append(os.path.join(self.data_dir, f))
        return out

    def window_stream_table(self) -> pa.Table:
        """Committed window-aggregate emissions (one row per closed
        tumbling bucket / session), manifest order."""
        import pyarrow.parquet as pq

        files = []
        for e in range(self.last_committed_epoch() + 1):
            p = self._manifest_path(e)
            if os.path.exists(p):
                for f in json.load(open(p)).get("window_outputs", []):
                    if f:
                        files.append(os.path.join(self.data_dir, f))
        if not files:
            return pa.table({})
        tbl = pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")
        return tbl.sort_by(
            [("window", "ascending"), ("conv_id", "ascending"), ("start", "ascending")]
        )

    def results_table(self) -> pa.Table:
        import pyarrow.parquet as pq

        files = self.output_files()
        if not files:
            return pa.table({})
        tbl = pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")
        return tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
