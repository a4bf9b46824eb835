"""Per-stage `ds.stats()` audit of the flagship Dataset-API path.

The brief's rule: iterate until wall-time is dominated by useful compute.
This tool is the evidence capture — it runs the flagship through the pure
Dataset API (`run_batch`, the path the streaming executor schedules) and
prints Ray Data's per-operator breakdown, so regressions in stage balance
(a starving operator, a bloated shuffle) show up as numbers, not vibes.

Usage::

    PYTHONPATH=/root/repo python tools/stage_stats.py [turns] [num_cpus]

Defaults: 2_000_000 turns, 16 CPUs.  Owns its Ray session (scripts own
sessions; library code never calls ray.init).
"""
import os
import sys
import time

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.7")
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    from osprey_ray.datagen import ensure_dataset
    from osprey_ray.pipelines.flagship import (
        flagship_spec,
        label_events_map,
        run_batch,
        verdict_stream,
    )

    d = ensure_dataset(turns, seed=42)
    files = sorted(glob.glob(f"{d}/batch/*.parquet"))
    lmap = label_events_map(pq.read_table(f"{d}/label_events.parquet"))
    spec = flagship_spec()

    # warm-up (worker import + page cache), then the measured run
    res = run_batch(rd.read_parquet(files), spec, lmap, num_partitions=num_cpus * 2)
    verdict_stream(res).write_parquet("/tmp/osprey_stats/warm")
    t0 = time.perf_counter()
    res = run_batch(rd.read_parquet(files), spec, lmap, num_partitions=num_cpus * 2)
    vs = verdict_stream(res)  # stats must come from the handle that executed
    vs.write_parquet("/tmp/osprey_stats/out")
    wall = time.perf_counter() - t0
    print(f"== flagship run_batch: {turns} turns, {num_cpus} CPUs, "
          f"{wall:.2f}s wall ({turns/wall/1e6:.2f}M turns/s) ==\n")
    print(vs.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
