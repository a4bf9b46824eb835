"""Golden tests: vectorized Ray pipeline ≡ row-at-a-time oracle, byte-equal
under stable (conv_id, turn_idx) ordering (SURVEY §5, FIXTURES.md F3)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osprey_ray.datagen import generate_label_events, generate_transcripts
from osprey_ray.oracle import oracle_results
from osprey_ray.pipelines.flagship import (
    flagship_spec,
    label_events_map,
    run_batch,
)
from osprey_ray.stages.stateless import compile_stateless
from osprey_ray.stages.stateful import StatefulPartitionEval


def _norm(v):
    if isinstance(v, np.ndarray):
        return list(v)
    if isinstance(v, np.generic):
        return v.item()
    return v


def assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    assert len(got) == len(want)
    for k in want.columns:
        assert k in got.columns, f"missing column {k}"
        g = [_norm(x) for x in got[k].tolist()]
        w = [_norm(x) for x in want[k].tolist()]
        bad = [i for i, (x, y) in enumerate(zip(g, w)) if x != y]
        assert not bad, f"column {k}: {len(bad)} mismatches, first at {bad[0]}: {g[bad[0]]!r} != {w[bad[0]]!r}"


@pytest.fixture(scope="module")
def small_data():
    tbl = generate_transcripts(3000, seed=42)
    lab = generate_label_events(tbl, 42)
    return tbl.drop_columns(["_arrival_us"]), label_events_map(lab)


def test_local_pipeline_matches_oracle(small_data):
    """Single-process (no Ray) stage1+stage2 vs oracle."""
    clean, lmap = small_data
    spec = flagship_spec()
    t1 = compile_stateless(spec)(clean)
    out = StatefulPartitionEval(spec, lmap)(t1)
    got = (
        out.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(oracle_results(clean, spec, lmap))
    assert_frames_equal(got, want)


def test_ray_pipeline_matches_oracle(small_data, ray_session):
    """Full Ray Data pipeline (multi-block, multi-partition shuffle)."""
    import ray.data as rd

    clean, lmap = small_data
    spec = flagship_spec()
    ds = rd.from_arrow(clean).repartition(7)
    res = run_batch(ds, spec, lmap, num_partitions=5)
    got = (
        res.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    want = pd.DataFrame(oracle_results(clean, spec, lmap))
    assert_frames_equal(got, want)


def test_dedup_and_determinism(small_data):
    clean, lmap = small_data
    spec = flagship_spec()
    t1 = compile_stateless(spec)(clean)
    out1 = StatefulPartitionEval(spec, lmap)(t1)
    out2 = StatefulPartitionEval(spec, lmap)(t1)
    assert out1.equals(out2)
    # dedup removed the planted ~1% duplicates
    keys = set(zip(out1["conv_id"].to_pylist(), out1["turn_idx"].to_pylist()))
    assert len(keys) == out1.num_rows
    assert out1.num_rows < clean.num_rows
