"""Mirror soak: cascade-replicate a ~1M-doc lake while its replay
advances, at beyond-gate scale.

What it measures and proves:
- bootstrap throughput (pinned-version distributed snapshot copy into
  a different partition count),
- per-window sync throughput (change-feed read -> route -> one commit),
- exactness: after the final sync the mirror equals the source
  bit-for-bit (sorted table equality, tombstones and rekeys included),
- cursor atomicity: a duplicate sync is a no-op.

Usage: python scripts/soak_mirror.py [n_docs] [n_events]
"""

from __future__ import annotations

import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))


def main(n_docs: int = 1_000_000, n_events: int = 400_000) -> None:
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
    from clever_canal_ray.pipelines.mirror import mirror_bootstrap, mirror_sync
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake

    spec = EventLogSpec(
        seed=67,
        n_initial_docs=n_docs,
        n_events=n_events,
        n_segments=16,
        p_insert=0.5,
        p_update=0.35,
        p_delete=0.15,
        rekey_frac=0.05,
    )
    root = tempfile.mkdtemp(prefix="soak_mirror_")
    try:
        info = write_fixture(spec, os.path.join(root, "fx"))
        lake_tbl = generate_lake(spec)
        paths = info["segment_paths"]
        # mirror-safe source maintenance: delta sink + minor compaction
        cfg = ReplayConfig(
            num_partitions=16, segments_per_batch=4, sink_mode="delta", compact_mode="minor"
        )
        src = Lake.create(os.path.join(root, "src"), lake_tbl, num_partitions=16)
        replay(src, paths[:4], cfg)

        rows0 = sum(i["rows"] for i in src.current().partitions.values())
        t0 = time.perf_counter()
        dst = mirror_bootstrap(src, os.path.join(root, "dst"), num_partitions=24)
        boot = time.perf_counter() - t0
        print(
            f"bootstrap {rows0:,} rows into 24 partitions: {boot:.2f}s "
            f"({rows0 / max(boot, 1e-9) / 1e6:.2f}M rows/s)"
        )

        sync_rows = 0
        sync_secs = 0.0
        for k in (8, 12, 16):
            replay(src, paths[:k], cfg)
            t0 = time.perf_counter()
            out = mirror_sync(src, dst)
            dt = time.perf_counter() - t0
            sync_rows += out["rows"]
            sync_secs += dt
            print(
                f"sync -> v{out['applied_source_version']}: {out['rows']:,} changed rows, "
                f"{out['partitions_touched']} partitions, {dt:.2f}s"
            )
        print(
            f"total sync: {sync_rows:,} rows in {sync_secs:.2f}s "
            f"({sync_rows / max(sync_secs, 1e-9) / 1e3:.0f}k rows/s feed apply)"
        )

        assert mirror_sync(src, dst)["noop"]

        t0 = time.perf_counter()
        a = src.read_table().sort_by("doc_id")
        b = dst.read_table().sort_by("doc_id")
        cmp_s = time.perf_counter() - t0
        assert a.equals(b), "mirror diverged from source"
        print(f"mirror == source bit-for-bit: {a.num_rows:,} rows (compare {cmp_s:.1f}s)")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 400_000,
    )
