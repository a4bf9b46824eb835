"""External effect emission: the Ozone/atproto label-sink shape for the
epoch model.

Reference parity: ``OzoneLabelSink``
(example_plugins/src/output_sinks/ozone_label_sink.py:13-71) pushes each
result's label effects to an external moderation service
(``OzoneClient.add_or_remove_label``) and LOGS-AND-DROPS on failure;
``MultiOutputSink`` (osprey_worker/src/osprey/worker/sinks/sink/
output_sink.py:46-89) gives per-sink error isolation.  This module
re-expresses that surface with the delivery guarantee the per-event
original lacks:

- :class:`EffectClient` — the external-service protocol (the
  ``add_or_remove_label`` shape, batched).  The service call must be
  idempotent on ``(conv_id, ts, label, status)`` — true of the reference
  client, whose label application is a state upsert.
- :class:`EffectPump` — walks the job's committed label-mutation stream
  (the exactly-once ``labels`` output) epoch by epoch, pushes batches,
  and persists an emission cursor ONLY after a push succeeds.  A crash
  between push and cursor re-pushes that epoch on the next pump —
  at-least-once delivery, which the idempotency key upgrades to
  exactly-once external state.  Transient failures retry with bounded
  attempts; a batch that exhausts retries goes to a dead-letter parquet
  and the cursor advances (``on_failure='dead_letter'``, the
  MultiOutputSink isolation policy) or halts the pump with the cursor
  unmoved (``on_failure='halt'``).
- :class:`MockEffectService` — deterministic in-memory service for
  tests/examples: idempotent apply, scriptable transient/permanent
  failures.

Scale note: label mutations are sparse relative to turns (one row per
fired labelling rule), so the pump reads them on the driver; it is a
post-commit side channel, never on the epoch critical path.  Run one
pump per job output directory; the cursor file makes it restartable and
safe to re-run from cron.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


class EffectClient:
    """External effect service protocol (reference OzoneClient shape,
    ozone_client usage at ozone_label_sink.py:40-49, batched)."""

    def apply_labels(self, rows: list[dict]) -> None:
        """Apply a batch of label mutations ``{conv_id, ts, label, status,
        reason}``.  MUST be idempotent on (conv_id, ts, label, status).
        Raise on failure; the pump handles retry/dead-letter."""
        raise NotImplementedError


class EffectPump:
    """Resumable at-least-once emitter from a :class:`StreamingJob`'s
    committed ``labels`` stream to an :class:`EffectClient` (see module
    docstring)."""

    def __init__(
        self,
        job,
        client: EffectClient,
        state_dir: str,
        batch_size: int = 1_000,
        max_retries: int = 3,
        backoff_s: float = 0.0,
        on_failure: str = "dead_letter",
    ):
        if on_failure not in ("dead_letter", "halt"):
            raise ValueError("on_failure must be 'dead_letter' or 'halt'")
        self.job = job
        self.client = client
        self.state_dir = state_dir
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.on_failure = on_failure
        os.makedirs(state_dir, exist_ok=True)

    # -- cursor ------------------------------------------------------------

    def _cursor_path(self) -> str:
        return os.path.join(self.state_dir, "effects-cursor.json")

    def cursor(self) -> int:
        """First epoch NOT yet emitted (0 = nothing emitted)."""
        p = self._cursor_path()
        if not os.path.exists(p):
            return 0
        return int(json.load(open(p))["next_epoch"])

    def _advance(self, next_epoch: int) -> None:
        tmp = self._cursor_path() + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"next_epoch": next_epoch}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._cursor_path())

    # -- emission ----------------------------------------------------------

    def _epoch_rows(self, e: int) -> list[dict]:
        p = self.job._manifest_path(e)
        if not os.path.exists(p):
            return []
        rows: list[dict] = []
        for f in json.load(open(p)).get("label_outputs") or []:
            if f:
                rows.extend(
                    pq.read_table(os.path.join(self.job.data_dir, f)).to_pylist()
                )
        return rows

    def _push(self, rows: list[dict]) -> bool:
        """True if applied; False after exhausting retries."""
        for attempt in range(self.max_retries):
            try:
                self.client.apply_labels(rows)
                return True
            except Exception:
                if attempt + 1 < self.max_retries and self.backoff_s:
                    time.sleep(self.backoff_s * (2**attempt))
        return False

    def _dead_letter(self, e: int, rows: list[dict]) -> str:
        path = os.path.join(self.state_dir, f"dead-letter-e{e:05d}.parquet")
        schema = self.job._stream_schema("labels")
        pq.write_table(
            pa.Table.from_pylist(rows, schema=schema), path + ".tmp"
        )
        os.replace(path + ".tmp", path)
        return path

    def pump(self) -> dict:
        """Emit every committed-but-unemitted epoch's label mutations.
        Returns ``{epochs_emitted, rows_emitted, rows_dead_lettered,
        dead_letter_files}``."""
        stats = {
            "epochs_emitted": 0,
            "rows_emitted": 0,
            "rows_dead_lettered": 0,
            "dead_letter_files": [],
        }
        last = self.job.last_committed_epoch()
        for e in range(self.cursor(), last + 1):
            rows = self._epoch_rows(e)
            failed: list[dict] = []
            for i in range(0, len(rows), self.batch_size):
                batch = rows[i : i + self.batch_size]
                if self._push(batch):
                    stats["rows_emitted"] += len(batch)
                else:
                    failed.extend(batch)
            if failed:
                if self.on_failure == "halt":
                    # cursor unmoved: the next pump() retries this epoch
                    # from scratch (idempotent service, so the batches
                    # that DID land are harmless re-pushes)
                    raise RuntimeError(
                        f"effect emission failed for epoch {e} "
                        f"({len(failed)} rows) after {self.max_retries} attempts"
                    )
                stats["dead_letter_files"].append(self._dead_letter(e, failed))
                stats["rows_dead_lettered"] += len(failed)
            # cursor strictly AFTER the external push (and any dead-letter
            # file) is durable — crash before this line re-emits epoch e
            self._advance(e + 1)
            stats["epochs_emitted"] += 1
        return stats


class MockEffectService(EffectClient):
    """Idempotent in-memory effect service for tests/examples: ``applied``
    holds the external state keyed by (conv_id, ts, label, status);
    ``fail_next(n)`` scripts n transient failures; ``fail_always=True``
    makes every call fail (the permanent-outage case)."""

    def __init__(self):
        self.applied: dict[tuple, dict] = {}
        self.calls = 0
        self.failures_left = 0
        self.fail_always = False

    def fail_next(self, n: int) -> None:
        self.failures_left = n

    def apply_labels(self, rows: list[dict]) -> None:
        self.calls += 1
        if self.fail_always:
            raise ConnectionError("effect service unavailable")
        if self.failures_left > 0:
            self.failures_left -= 1
            raise ConnectionError("transient effect service error")
        for r in rows:
            key = (str(r["conv_id"]), r["ts"], r["label"], r["status"])
            self.applied[key] = r
