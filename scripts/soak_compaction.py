"""Minor vs major compaction write-amplification soak.

The LSM trade `ReplayConfig(compact_mode=...)` exposes: every time a
delta partition crosses ``compact_threshold`` files,

- ``major`` rewrites the WHOLE partition (base + deltas) — read-optimal
  but the write cost is O(partition bytes), so a large base is
  re-written on every crossing even when the batch touched 0.1% of it;
- ``minor`` folds only the accumulated DELTA files into one — write
  cost O(delta bytes); the base file is never rewritten until an
  explicit ``Lake.compact()`` (run off the hot path).

This soak replays the same event stream over a lake whose base is much
larger than the churn (the 100-TB shape: a big table, a thin change
stream) under both modes and reports total bytes written to the lake
(all data files ever created — superseded files are still on disk
until gc), wall time, and a final-state equality check between the two
modes plus the serial oracle.

Usage: python scripts/soak_compaction.py [n_docs] [n_events]
"""

from __future__ import annotations

import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))


def lake_data_bytes(lake_dir: str) -> int:
    total = 0
    for d in os.listdir(lake_dir):
        if not d.startswith("part="):
            continue
        for f in os.listdir(os.path.join(lake_dir, d)):
            total += os.path.getsize(os.path.join(lake_dir, d, f))
    return total


def main(n_docs: int = 300_000, n_events: int = 40_000) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import shutil
    import tempfile

    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.fixtures.generator import EventLogSpec, generate_lake, write_fixture
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake

    spec = EventLogSpec(
        seed=97,
        n_initial_docs=n_docs,
        n_events=n_events,
        n_segments=16,
        p_insert=0.2,  # churn-heavy: most events hit the existing base
        p_update=0.6,
        p_delete=0.2,
    )
    root = tempfile.mkdtemp(prefix="soak_compact_")
    try:
        info = write_fixture(spec, os.path.join(root, "fx"))
        lake_tbl = generate_lake(spec)
        base_bytes = None
        results = {}
        for mode in ("major", "minor"):
            lake_dir = os.path.join(root, f"lake_{mode}")
            lake = Lake.create(lake_dir, lake_tbl, num_partitions=16)
            if base_bytes is None:
                base_bytes = lake_data_bytes(lake_dir)
            cfg = ReplayConfig(
                num_partitions=16,
                segments_per_batch=1,  # 16 commits -> several threshold crossings
                sink_mode="delta",
                compact_threshold=4,
                compact_mode=mode,
            )
            t0 = time.perf_counter()
            m = replay(lake, info["segment_paths"], cfg)
            wall = time.perf_counter() - t0
            written = lake_data_bytes(lake_dir) - base_bytes
            results[mode] = {
                "wall_s": round(wall, 2),
                "bytes_written": written,
                "mb_written": round(written / 1e6, 1),
                "max_files_per_part": max(len(i["files"]) for i in m.partitions.values()),
                "lake": lake,
            }
            print(
                f"{mode}: {wall:.2f}s, {written / 1e6:.1f} MB written past the base, "
                f"max files/part {results[mode]['max_files_per_part']}"
            )
        # final-state equality between modes (the oracle equality is
        # pytest's job at gate scale; here the cross-mode check is the
        # scale-level invariant)
        a = results["major"]["lake"].read_table().sort_by("doc_id")
        b = results["minor"]["lake"].read_table().sort_by("doc_id")
        assert a.equals(b), "minor and major final states diverged"
        amp = results["major"]["bytes_written"] / max(results["minor"]["bytes_written"], 1)
        print(
            f"final states identical ({a.num_rows} rows); "
            f"write amplification major/minor = {amp:.1f}x"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 300_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 40_000,
    )
