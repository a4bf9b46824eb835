"""PubSub-shaped input stream: pull/ack over a non-replayable broker.

Reference parity: ``PubSubOspreyActionInputStream``
(osprey_worker/src/osprey/worker/sinks/sink/input_stream.py:123-206) —
``subscriber.pull(max_messages)``, per-message ack AFTER processing, and
the KMS envelope decrypt applied when ``attributes['encrypted'] ==
'true'`` (input_stream.py:152-160).  The reference gets at-least-once
from this protocol; this module upgrades it to exactly-once for the
epoch model with two standard moves:

1. **Journal-then-process** — PubSub cannot replay an offset range, so
   :class:`PubSubStream` makes its own replayable log: every polled
   epoch's raw messages are written (atomic rename) to a journal file
   BEFORE the epoch is processed.  Offsets are journal sequence numbers;
   ``replay(start, end)`` reads the journal, so resume is bit-identical
   no matter what the broker redelivers.  Messages are journaled
   as-received (ciphertext stays ciphertext — the key never touches
   disk); decryption happens on the read side of the journal.
2. **Message-id dedupe window** — the broker redelivers on ack-deadline
   expiry (crash between manifest commit and ack) and may duplicate
   even acked messages (PubSub's documented at-least-once delivery).
   The connector keeps a ``message_id -> epoch`` map of the last
   ``dedupe_window_epochs`` epochs, persisted in each manifest via
   ``state()``/``restore_state()``, so a resumed run filters every
   redelivery of an already-committed message and immediately acks it.
   The window must cover the broker's duplicate-delivery horizon
   (epochs, not wall time — size it so ``window × rows_per_epoch``
   spans the subscription's max redelivery lag).

Ack protocol (same ordering as :class:`~osprey_ray.streaming.source.
KafkaStream`): the job calls ``commit(end)`` only after the epoch's
manifest is durable, and ``commit`` acks exactly the ack-ids leased for
that epoch's messages — so the subscription's acked set never runs
ahead of the exactly-once sink.

Scale note: like every connector on this seam, one ``PubSubStream``
polls on the driver per subscription; the journal directory should live
on storage shared with the checkpoint dir (it is part of the run's
recovery state).  ``gc_journal(below_seq)`` drops journal files no
resume can need — call it with the last snapshot-covered epoch's seq,
the same discipline as ``StreamingJob.gc_checkpoints()``.
"""

from __future__ import annotations

import base64
import json
import os

import pyarrow as pa

from osprey_ray.streaming.source import EpochBatch, InputStream, KafkaStream


class ReceivedMessage:
    """One pulled message: broker-assigned ``message_id`` (stable across
    redeliveries), per-lease ``ack_id``, payload bytes, attributes."""

    __slots__ = ("ack_id", "message_id", "data", "attributes")

    def __init__(self, ack_id: str, message_id: str, data: bytes, attributes=None):
        self.ack_id = ack_id
        self.message_id = message_id
        self.data = data
        self.attributes = attributes or {}


class PubSubLikeSubscriber:
    """The protocol :class:`PubSubStream` drives — the minimal subset of
    a PubSub subscriber client (reference pull at input_stream.py:130-137,
    ack via the acking context).  Implement over a real client, or use
    :class:`MockPubSub`."""

    def pull(self, max_messages: int) -> list:
        """-> [ReceivedMessage, ...]; empty when the backlog is dry."""
        raise NotImplementedError

    def ack(self, ack_ids: list) -> None:
        raise NotImplementedError


class PubSubStream(InputStream):
    """Exactly-once epoch source over a :class:`PubSubLikeSubscriber`
    (see module docstring for the journal + dedupe design).

    ``decrypt(data, attributes) -> bytes`` mirrors the reference's KMS
    envelope hook: it is applied on the journal's read side to messages
    whose ``attributes['encrypted'] == 'true'``
    (input_stream.py:152-160); plaintext messages pass through.
    """

    def __init__(
        self,
        subscriber: PubSubLikeSubscriber,
        journal_dir: str,
        rows_per_epoch: int = 10_000,
        max_pulls_per_epoch: int = 64,
        dedupe_window_epochs: int = 8,
        decrypt=None,
    ):
        self.subscriber = subscriber
        self.journal_dir = journal_dir
        self.rows_per_epoch = rows_per_epoch
        self.max_pulls_per_epoch = max_pulls_per_epoch
        self.dedupe_window_epochs = dedupe_window_epochs
        self.decrypt = decrypt
        os.makedirs(journal_dir, exist_ok=True)
        self._seq = 0
        self._seen: dict[str, int] = {}  # message_id -> journal seq
        self._pending_acks: dict[int, list] = {}  # seq -> leased ack_ids
        self._committed_through = 0  # seqs < this have durable manifests

    # -- journal -----------------------------------------------------------

    def _journal_path(self, seq: int) -> str:
        return os.path.join(self.journal_dir, f"journal-{seq:06d}.jsonl")

    def _write_journal(self, seq: int, msgs: list) -> str:
        """Durable journal BEFORE processing: JSONL of as-received payloads
        (base64 — ciphertext-safe), atomic rename like the sink's parquet."""
        path = self._journal_path(seq)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for m in msgs:
                f.write(json.dumps({
                    "id": m.message_id,
                    "d": base64.b64encode(m.data).decode("ascii"),
                    "a": m.attributes,
                }) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return path

    def _decode_journal(self, seq: int) -> tuple[pa.Table, int]:
        path = self._journal_path(seq)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"journal file for committed epoch seq {seq} is missing "
                f"({path}) — was gc_journal() called past the recovery "
                "point, or the journal dir not shared with the checkpoints?"
            )
        payloads = []
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                data = base64.b64decode(rec["d"])
                if self.decrypt is not None and rec.get("a", {}).get("encrypted") == "true":
                    data = self.decrypt(data, rec["a"])
                payloads.append(data)
        return KafkaStream._decode(payloads), len(payloads)

    # -- InputStream -------------------------------------------------------

    def poll_epoch(self) -> EpochBatch | None:
        fresh: list[ReceivedMessage] = []
        fresh_ids: set[str] = set()
        dup_acks: list = []
        pulls = 0
        while len(fresh) < self.rows_per_epoch and pulls < self.max_pulls_per_epoch:
            got = self.subscriber.pull(self.rows_per_epoch - len(fresh))
            pulls += 1
            if not got:
                break
            for m in got:
                seen_seq = self._seen.get(m.message_id)
                if seen_seq is not None or m.message_id in fresh_ids:
                    # Redelivery of an already-polled message.  Ack ONLY if
                    # its epoch's manifest committed — acking a dup of an
                    # in-flight epoch would mark the message done before
                    # the sink is durable (lost on crash).  Uncommitted
                    # dups are dropped unacked; the broker redelivers them
                    # again after the epoch commits, and that later dup
                    # takes this ack branch.
                    if seen_seq is not None and seen_seq < self._committed_through:
                        dup_acks.append(m.ack_id)
                else:
                    fresh.append(m)
                    fresh_ids.add(m.message_id)
            if dup_acks:
                # ack dups BEFORE the next pull — an unacked dup's lease
                # expires and the broker re-serves it, crowding fresh
                # backlog out of every subsequent pull
                self.subscriber.ack(dup_acks)
                dup_acks = []
        if not fresh:
            return None
        seq = self._seq
        path = self._write_journal(seq, fresh)
        for m in fresh:
            self._seen[m.message_id] = seq
        floor = seq - self.dedupe_window_epochs
        if floor > 0:
            self._seen = {k: v for k, v in self._seen.items() if v >= floor}
        self._pending_acks[seq] = [m.ack_id for m in fresh]
        self._seq = seq + 1
        table, n = self._decode_journal(seq)
        return EpochBatch(
            [table], [seq], [seq + 1],
            [f"pubsub://{os.path.basename(path)}#rows={n}"],
        )

    def replay(self, start, end) -> EpochBatch:
        tables = []
        n_total = 0
        for seq in range(start[0], end[0]):
            t, n = self._decode_journal(seq)
            tables.append(t)
            n_total += n
        if not tables:
            raise ValueError(f"empty replay range [{start}, {end})")
        return EpochBatch(
            [pa.concat_tables(tables)], list(start), list(end),
            [f"pubsub://journal-{s:06d}.jsonl" for s in range(start[0], end[0])],
        )

    def seek(self, offsets) -> None:
        # a stale journal file at/after this seq (crash before its manifest
        # committed) is an orphan; the next poll_epoch overwrites it via
        # the atomic rename, so no cleanup pass is needed.  The job only
        # seeks to a committed manifest's end, so everything below is
        # ack-eligible on redelivery.
        self._seq = int(offsets[0])
        self._committed_through = max(self._committed_through, self._seq)

    def commit(self, offsets) -> None:
        end = int(offsets[0])
        for seq in [s for s in self._pending_acks if s < end]:
            self.subscriber.ack(self._pending_acks.pop(seq))
        self._committed_through = max(self._committed_through, end)

    def state(self):
        return {"seen": dict(self._seen)}

    def restore_state(self, state) -> None:
        if state:
            self._seen = {str(k): int(v) for k, v in state.get("seen", {}).items()}

    def gc_journal(self, below_seq: int) -> list[str]:
        """Delete journal files strictly below ``below_seq`` (pass the
        first seq a resume could replay — epochs at or below the last
        snapshot never replay).  Returns the removed paths."""
        removed = []
        for name in sorted(os.listdir(self.journal_dir)):
            if not (name.startswith("journal-") and name.endswith(".jsonl")):
                continue
            seq = int(name[len("journal-"):-len(".jsonl")])
            if seq < below_seq:
                p = os.path.join(self.journal_dir, name)
                os.remove(p)
                removed.append(p)
        return removed


class MockPubSub(PubSubLikeSubscriber):
    """In-memory single-subscription broker for tests/examples, with the
    delivery semantics that make PubSub interesting: per-lease ack ids,
    ack-deadline expiry measured in pull calls (deterministic — no wall
    clock), redelivery of expired leases BEFORE new backlog, and a
    ``redeliver_acked`` test hook for the documented at-least-once case
    where even an acked message shows up again.  Subscription state lives
    on this object (broker-side), so a "restarted" consumer resumes the
    same subscription like a real client would."""

    def __init__(self, ack_deadline_pulls: int = 4):
        self.messages: list[tuple[str, bytes, dict]] = []  # (id, data, attrs)
        self.ack_deadline_pulls = ack_deadline_pulls
        self.acked: set[int] = set()  # message indexes
        self.outstanding: dict[int, tuple[str, int]] = {}  # idx -> (ack_id, expire_tick)
        self.requeue: list[int] = []  # test-hook duplicate deliveries
        self.cursor = 0  # next undelivered backlog index
        self.tick = 0
        self._ack_counter = 0
        self._ack_to_idx: dict[str, int] = {}

    # -- producer side -----------------------------------------------------

    def publish(self, data: bytes, attributes: dict | None = None) -> str:
        mid = f"m{len(self.messages)}"
        self.messages.append((mid, data, dict(attributes or {})))
        return mid

    def publish_events(self, rows: list[dict], attributes: dict | None = None) -> None:
        """Producer helper: one JSON message per event dict, topic order
        = list order (PubSub has no partitions — ordering comes from the
        publisher)."""
        for r in rows:
            self.publish(json.dumps(r).encode(), attributes)

    # -- subscriber side ---------------------------------------------------

    def _lease(self, idx: int) -> ReceivedMessage:
        self._ack_counter += 1
        ack_id = f"a{self._ack_counter}"
        self.outstanding[idx] = (ack_id, self.tick + self.ack_deadline_pulls)
        self._ack_to_idx[ack_id] = idx
        mid, data, attrs = self.messages[idx]
        return ReceivedMessage(ack_id, mid, data, attrs)

    def pull(self, max_messages: int) -> list:
        self.tick += 1
        out: list[ReceivedMessage] = []
        # duplicate deliveries of acked messages (test hook) come first
        while self.requeue and len(out) < max_messages:
            out.append(self._lease(self.requeue.pop(0)))
        # then expired leases (ascending index = original publish order)
        for idx in sorted(self.outstanding):
            if len(out) >= max_messages:
                break
            ack_id, expire = self.outstanding[idx]
            if idx not in self.acked and expire <= self.tick:
                out.append(self._lease(idx))
        # then fresh backlog
        while self.cursor < len(self.messages) and len(out) < max_messages:
            out.append(self._lease(self.cursor))
            self.cursor += 1
        return out

    def ack(self, ack_ids: list) -> None:
        for a in ack_ids:
            idx = self._ack_to_idx.get(a)
            if idx is None:
                continue
            self.acked.add(idx)
            self.outstanding.pop(idx, None)

    # -- test hooks --------------------------------------------------------

    def redeliver_acked(self, message_ids: list[str]) -> None:
        """Queue duplicate deliveries of already-ACKED messages — PubSub's
        documented at-least-once behavior the dedupe window exists for."""
        by_id = {mid: i for i, (mid, _, _) in enumerate(self.messages)}
        for mid in message_ids:
            idx = by_id[mid]
            assert idx in self.acked, f"{mid} is not acked"
            self.requeue.append(idx)

    def unacked_count(self) -> int:
        return len(self.messages) - len(self.acked)
