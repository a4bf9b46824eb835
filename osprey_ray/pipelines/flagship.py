"""Flagship pipeline: the full rules/CEP engine over transcript Parquet.

Batch ("bounded stream") execution plan, Ray-Data-first (SURVEY §3 "Ray
lifecycle"):

    read_parquet → map_batches(StatelessStage)        # vectorized kernels
               → map_batches(assign __part)           # hash(conv_id) % P
               → groupby('__part').map_groups(StatefulPartitionEval)
                                                      # ordered keyed state
               → verdict / execution-result rows

The one shuffle is the ``groupby('__part')`` exchange; the wide ``text``
column is projected away by stage 1 before it, so only narrow feature
columns move.  ``num_partitions`` bounds per-task state size — at cluster
scale set it to a small multiple of total cores.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray.data

from osprey_ray.expr import col, lit, or_
from osprey_ray.rules import (
    DeclareVerdict,
    Feature,
    HasLabel,
    IncrementWindow,
    LabelAdd,
    Rule,
    RuleSpec,
    SequenceMatch,
    SessionWindow,
    TumblingCount,
    WhenRules,
)
from osprey_ray.stages.stateless import compile_stateless
from osprey_ray.stages.stateful import StatefulPartitionEval
from osprey_ray.expr import fn


def flagship_spec() -> RuleSpec:
    """The golden rule corpus (FIXTURES.md F3): one of every kernel family.

    Mirrors the *shape* of /root/reference/example_rules (e.g.
    post_contains_hello.sml) and the reference's velocity/escalation
    patterns — not a copy of any ruleset."""
    return RuleSpec(
        features=[
            Feature("ContainsHello", fn("StringContains", target=col("text"), substring="hello", word=True)),
            Feature("IsSpamText", fn("CheckCensorized", target=col("text"), words=("free money",))),
            Feature("_domains", fn("StringExtractDomains", target=col("text"))),
            Feature("HasSpamDomain", fn("ListContains", target=col("_domains"), values=("spam.example", "shady.test"))),
            Feature("TextLen", fn("StringLength", target=col("text"))),
            Feature("IsExec", col("tool") == "exec"),
            Feature("IsMail", col("tool") == "mail"),
            Feature("_suspicious", or_(col("IsSpamText"), col("HasSpamDomain"))),
        ],
        stateful=[
            IncrementWindow("FlagCount5m", when=col("_suspicious"), window_seconds=300),
            TumblingCount("TurnsThisHour", when=lit(True), bucket_seconds=3600),
            SessionWindow("sess", gap_seconds=1800),
            SequenceMatch("ToolAbuse", first=col("IsExec"), second=col("IsMail"), within_turns=3),
            HasLabel("HasSpamLabel", label="spam_suspect", status="added"),
        ],
        rules=[
            Rule("RuleHello", [col("ContainsHello")], "turn says hello"),
            Rule("RuleSpam", [col("_suspicious")], "spammy content"),
            Rule("RuleVelocity", [col("FlagCount5m") >= 3], "3+ flagged turns in 5 minutes"),
            Rule("RuleToolAbuse", [col("ToolAbuse")], "exec followed by mail within 3 turns"),
            Rule("RuleEscalate", [col("_suspicious"), col("HasSpamLabel")], "spam from labeled conversation"),
            Rule("RuleLongSession", [col("sess__count") >= 50], "50+ turns in one session"),
        ],
        triggers=[
            WhenRules(["RuleSpam"], [DeclareVerdict("flag_spam"), LabelAdd("spam_suspect", expires_after=3600)]),
            WhenRules(["RuleVelocity", "RuleToolAbuse"], [DeclareVerdict("escalate")]),
            WhenRules(["RuleEscalate"], [DeclareVerdict("ban")]),
            WhenRules(["RuleHello"], [DeclareVerdict("greet")]),
        ],
    )


class AssignPartition:
    """Add ``__part = crc32(conv_id) % P`` (stable across processes — never
    Python ``hash``).  Salting hot conversations would append a sub-key
    here; the stateful stage's window state is associative only for counts,
    so we keep whole conversations together and rely on P ≫ cores for
    balance (SURVEY §4 skew row)."""

    def __init__(self, num_partitions: int):
        self.p = num_partitions

    def __call__(self, tbl: pa.Table) -> pa.Table:
        conv = tbl["conv_id"].to_pylist()
        uniq: dict[str, int] = {}
        out = np.empty(len(conv), dtype=np.int32)
        for i, c in enumerate(conv):
            h = uniq.get(c)
            if h is None:
                h = zlib.crc32(c.encode()) % self.p
                uniq[c] = h
            out[i] = h
        return tbl.append_column("__part", pa.array(out))


def label_events_map(tbl: pa.Table | None) -> dict[str, list]:
    """label_events parquet table → {conv_id: [(ts_us, label, status,
    expires_us)]} sorted by ts — the broadcast small side of the
    stream-stream join."""
    if tbl is None:
        return {}
    out: dict[str, list] = {}
    ts = tbl["ts"].cast(pa.int64()).to_pylist()
    exp = tbl["expires_at"].cast(pa.int64()).to_pylist()
    for cid, t, lbl, status, e in zip(
        tbl["conv_id"].to_pylist(), ts, tbl["label"].to_pylist(),
        tbl["status"].to_pylist(), exp,
    ):
        out.setdefault(cid, []).append((t, lbl, status, e))
    for v in out.values():
        v.sort()
    return out


def run_batch(
    transcripts: "ray.data.Dataset",
    spec: RuleSpec | None = None,
    label_events: dict[str, list] | None = None,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Execute the ruleset over a Dataset of transcript turns; returns the
    execution-results Dataset (one row per deduped turn: features, rule
    booleans, ``__verdicts``, ``__error_count``)."""
    spec = spec or flagship_spec()
    stage1 = compile_stateless(spec)
    ds = transcripts.map_batches(stage1, batch_format="pyarrow")
    ds = ds.map_batches(AssignPartition(num_partitions), batch_format="pyarrow")
    return ds.groupby("__part").map_groups(
        StatefulPartitionEval(spec, label_events), batch_format="pyarrow"
    )


def verdict_stream(results: "ray.data.Dataset") -> "ray.data.Dataset":
    """Filter the execution results down to fired turns (the verdict sink
    stream, FIXTURES.md F4)."""
    import pyarrow.compute as pc

    def _f(tbl: pa.Table) -> pa.Table:
        return tbl.filter(pc.greater(pc.list_value_length(tbl["__verdicts"]), 0))

    return results.map_batches(_f, batch_format="pyarrow")
