"""External effect emission (the Ozone/atproto label-sink shape):
EffectPump over the committed label-mutation stream → EffectClient.

Reference parity: ozone_label_sink.py:13-71 (per-result push, idempotent
label application), output_sink.py:46-89 (per-sink failure isolation).
The guarantee under test: at-least-once delivery + idempotent service =
exactly-once external state, across crashes of the pump itself."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from osprey_ray.datagen import ensure_dataset
from osprey_ray.expr import col, fn
from osprey_ray.rules import (
    DeclareVerdict,
    Feature,
    HasLabel,
    LabelAdd,
    Rule,
    RuleSpec,
    WhenRules,
)
from osprey_ray.streaming import EffectPump, MockEffectService, StreamingJob


def _label_spec() -> RuleSpec:
    spec = RuleSpec(
        features=[
            Feature(
                "IsSpamText",
                fn("CheckCensorized", target=col("text"), words=("free money",)),
            ),
        ],
        stateful=[HasLabel("HasMark", label="mark", status="added")],
        rules=[
            Rule("RuleSeed", [col("IsSpamText")]),
            Rule("RuleSaw", [col("HasMark")]),
        ],
        triggers=[
            WhenRules(["RuleSeed"], [LabelAdd("mark")]),
            WhenRules(["RuleSaw"], [DeclareVerdict("saw_mark")]),
        ],
    )
    spec.validate()
    return spec


@pytest.fixture(scope="module")
def labeled_run(ray_session, tmp_path_factory):
    d = ensure_dataset(6000, seed=42, root="/tmp/osprey_test_stream")
    segs = sorted(glob.glob(os.path.join(d, "stream", "seg-*.parquet")))
    out = str(tmp_path_factory.mktemp("effects") / "run")
    job = StreamingJob(_label_spec(), segs, out, {}, num_shards=4, files_per_epoch=2)
    job.run()
    job.finalize()
    want_rows = job.committed_dataset("labels").take_all()
    assert len(want_rows) > 0, "fixture produced no label mutations"
    return job, want_rows


def _keys(rows):
    return {(str(r["conv_id"]), r["ts"], r["label"], r["status"]) for r in rows}


def test_pump_emits_all_committed_mutations(labeled_run, tmp_path):
    job, want = labeled_run
    svc = MockEffectService()
    pump = EffectPump(job, svc, str(tmp_path / "state"))
    stats = pump.pump()
    assert stats["rows_emitted"] == len(want)
    assert stats["rows_dead_lettered"] == 0
    assert _keys(svc.applied.values()) == _keys(want)
    assert pump.cursor() == job.last_committed_epoch() + 1
    # idempotent re-pump: cursor says done, zero service calls
    calls = svc.calls
    again = pump.pump()
    assert again["epochs_emitted"] == 0 and svc.calls == calls


def test_pump_retries_transient_failures(labeled_run, tmp_path):
    job, want = labeled_run
    svc = MockEffectService()
    svc.fail_next(2)
    pump = EffectPump(job, svc, str(tmp_path / "state"), max_retries=3)
    stats = pump.pump()
    assert stats["rows_emitted"] == len(want)
    assert stats["rows_dead_lettered"] == 0
    assert _keys(svc.applied.values()) == _keys(want)


def test_pump_crash_between_push_and_cursor(labeled_run, tmp_path):
    """At-least-once: a crash after the external push but before the
    cursor write re-emits that epoch — and the idempotent service ends
    in the identical state."""
    job, want = labeled_run
    svc = MockEffectService()
    state = str(tmp_path / "state")
    pump = EffectPump(job, svc, state)

    boom = RuntimeError("crash before cursor")
    real_advance = pump._advance
    calls = {"n": 0}

    def crashy(next_epoch):
        calls["n"] += 1
        if calls["n"] == 2:  # die after the second epoch's push
            raise boom
        real_advance(next_epoch)

    pump._advance = crashy
    with pytest.raises(RuntimeError, match="crash before cursor"):
        pump.pump()
    emitted_so_far = dict(svc.applied)
    assert pump.cursor() == 1  # only epoch 0's cursor landed

    # restart: fresh pump object, same service — epoch 1 re-pushes
    pump2 = EffectPump(job, svc, state)
    stats = pump2.pump()
    assert stats["epochs_emitted"] == job.last_committed_epoch()  # 1..last
    assert _keys(svc.applied.values()) == _keys(want)
    # re-pushed rows overwrote identically (upsert), nothing duplicated
    assert len(svc.applied) == len(_keys(want))
    assert set(emitted_so_far) <= set(svc.applied)


def test_pump_dead_letter_and_halt(labeled_run, tmp_path):
    job, want = labeled_run
    # dead_letter: outage drains every epoch to parquet, cursor advances
    svc = MockEffectService()
    svc.fail_always = True
    pump = EffectPump(job, svc, str(tmp_path / "dl"), max_retries=2)
    stats = pump.pump()
    assert stats["rows_emitted"] == 0
    assert stats["rows_dead_lettered"] == len(want)
    assert pump.cursor() == job.last_committed_epoch() + 1
    dl_rows = []
    for p in stats["dead_letter_files"]:
        dl_rows.extend(pq.read_table(p).to_pylist())
    assert _keys(dl_rows) == _keys(want)

    # halt: pump raises on the FIRST failing epoch, cursor unmoved —
    # recovery after the outage resumes from the start and loses nothing
    svc2 = MockEffectService()
    svc2.fail_always = True
    pump2 = EffectPump(job, svc2, str(tmp_path / "halt"), max_retries=2,
                       on_failure="halt")
    with pytest.raises(RuntimeError, match="effect emission failed"):
        pump2.pump()
    # cursor stopped AT the first epoch that actually has label rows
    # (label-free epochs ahead of it emit vacuously and advance)
    assert pump2.cursor() <= job.last_committed_epoch()
    svc2.fail_always = False
    stats2 = pump2.pump()
    assert stats2["rows_emitted"] == len(want)
    assert _keys(svc2.applied.values()) == _keys(want)


def test_union_by_name_type_conflict_errors(ray_session, tmp_path):
    """Schema evolution that CHANGES a column's type (not allowed — only
    additions are) errors loudly instead of coercing silently."""
    import pyarrow as pa
    import ray.data as rd

    from osprey_ray.io import union_datasets_by_name

    a = rd.from_arrow(pa.table({"x": pa.array([1, 2], pa.int64())}))
    b = rd.from_arrow(pa.table({"x": pa.array(["a"], pa.string())}))
    with pytest.raises(TypeError, match="schema evolution conflict"):
        union_datasets_by_name(
            [(a, pa.schema([("x", pa.int64())])), (b, pa.schema([("x", pa.string())]))]
        )
