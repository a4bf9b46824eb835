"""Pure-numpy core tests for analytics helpers (no Ray session needed)."""

import numpy as np

from osprey_ray.pipelines.analytics import _segmented_range_counts


def _brute(ts, gidx, W):
    out = np.empty(len(ts), dtype=np.int64)
    for i in range(len(ts)):
        out[i] = np.sum((gidx == gidx[i]) & (ts >= ts[i] - W) & (ts <= ts[i]))
    return out


def test_segmented_range_counts_matches_brute_force():
    rng = np.random.default_rng(7)
    n_groups, rows_per = 40, 25
    gidx = np.repeat(np.arange(n_groups), rows_per)
    ts = np.sort(rng.integers(0, 10**13, size=rows_per).astype(np.int64))
    ts = np.concatenate([np.sort(rng.integers(0, 10**13, size=rows_per).astype(np.int64))
                         for _ in range(n_groups)])
    W = 10**12
    want = _brute(ts, gidx, W)
    got = _segmented_range_counts(ts, gidx, W)
    assert (got == want).all()


def test_segmented_range_counts_chunked_runs_identical():
    """The int64-overflow guard path (round-3 advice): forcing tiny group
    runs must produce bit-identical counts to the single-run path."""
    rng = np.random.default_rng(11)
    n_groups, rows_per = 37, 11
    gidx = np.repeat(np.arange(n_groups), rows_per)
    ts = np.concatenate([np.sort(rng.integers(0, 10**13, size=rows_per).astype(np.int64))
                         for _ in range(n_groups)])
    W = 5 * 10**11
    one_run = _segmented_range_counts(ts, gidx, W)
    for max_g in (1, 2, 3, 7, 36, 37, 100):
        chunked = _segmented_range_counts(ts, gidx, W, max_g=max_g)
        assert (chunked == one_run).all(), f"max_g={max_g} diverged"
    assert (one_run == _brute(ts, gidx, W)).all()


def test_segmented_range_counts_would_overflow_case():
    """A span × group-count product that exceeds int64 must still be
    correct (the old code wrapped silently)."""
    span_ts = np.int64(9 * 10**17)  # span ≈ 9e17 → max_g ≈ 9 groups
    n_groups, rows_per = 50, 3
    gidx = np.repeat(np.arange(n_groups), rows_per)
    ts = np.tile(np.array([0, span_ts // 2, span_ts], dtype=np.int64), n_groups)
    W = int(span_ts // 2)
    got = _segmented_range_counts(ts, gidx, W)
    assert (got == _brute(ts, gidx, W)).all()
    # sanity: auto max_g really is below n_groups here (the guard engaged)
    span = int(ts.max() - ts.min() + W + 2)
    assert (np.iinfo(np.int64).max // span) - 1 < n_groups
