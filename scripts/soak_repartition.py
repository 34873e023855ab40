"""Repartition soak: re-hash a ~1M-doc lake 8 -> 32 partitions
mid-stream, resume replay, and verify exactness at scale.

The 100-TB story `Lake.repartition` exists for: a lake created at P
partitions caps its read/write parallelism at P forever; when the
cluster grows 4x, the lake must follow. The soak measures the re-hash
itself (one Ray task per source partition, STREAMING its files one at
a time — memory O(largest file), tombstones and per-row __seq kept),
then proves the invariants that matter beyond gate scale:

- rows conserved and final state identical to a never-repartitioned
  control replay over the same stream,
- the resumed replay adopts the new count from the manifest (cfg still
  says 8),
- post-repartition point lookups route correctly,
- gc reaps the whole abandoned layout.

Usage: python scripts/soak_repartition.py [n_docs] [n_events]
"""

from __future__ import annotations

import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))


def main(n_docs: int = 1_000_000, n_events: int = 200_000) -> None:
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

    import pyarrow as pa
    import pyarrow.compute as pc

    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.fixtures.generator import EventLogSpec, generate_lake, write_fixture
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake

    spec = EventLogSpec(
        seed=53,
        n_initial_docs=n_docs,
        n_events=n_events,
        n_segments=16,
    )
    root = tempfile.mkdtemp(prefix="soak_repart_")
    try:
        info = write_fixture(spec, os.path.join(root, "fx"))
        lake_tbl = generate_lake(spec)
        paths = info["segment_paths"]
        cfg = ReplayConfig(num_partitions=8, segments_per_batch=4, sink_mode="delta")

        # control: never repartitioned
        control = Lake.create(os.path.join(root, "control"), lake_tbl, num_partitions=8)
        replay(control, paths, cfg)

        lake = Lake.create(os.path.join(root, "lake"), lake_tbl, num_partitions=8)
        t0 = time.perf_counter()
        replay(lake, paths[:8], cfg)
        leg1 = time.perf_counter() - t0

        rows_before = sum(i["rows"] for i in lake.current().partitions.values())
        t0 = time.perf_counter()
        m = lake.repartition(32)
        rehash = time.perf_counter() - t0
        assert m.num_partitions == 32
        rows_after = sum(i["rows"] for i in m.partitions.values())
        assert rows_after == rows_before, (rows_before, rows_after)  # verbatim rewrite
        print(
            f"re-hash 8->32 of {rows_before:,} rows: {rehash:.2f}s "
            f"({rows_before / max(rehash, 1e-9) / 1e6:.2f}M rows/s); rows after {rows_after:,}"
        )

        t0 = time.perf_counter()
        replay(lake, paths[8:], cfg)  # cfg says 8; manifest says 32 and wins
        leg2 = time.perf_counter() - t0
        print(f"replay legs: {leg1:.2f}s before, {leg2:.2f}s after (32-way writes)")

        a = lake.read_table().sort_by("doc_id")
        b = control.read_table().sort_by("doc_id")
        assert a.equals(b), "repartitioned state diverged from control"
        print(f"final state identical to never-repartitioned control ({a.num_rows:,} rows)")

        keys = a["doc_id"].to_pylist()[:: max(1, a.num_rows // 64)][:64]
        got = lake.lookup(keys).sort_by("doc_id")
        exp = a.filter(pc.is_in(a["doc_id"], value_set=pa.array(keys))).sort_by("doc_id")
        assert got.equals(exp), "lookup mismatch post-repartition"
        print(f"lookup OK over {len(keys)} keys")

        gone = lake.gc(keep_manifests=1, min_age_sec=0.0)
        assert lake.read_table().num_rows == a.num_rows
        print(f"gc reaped {gone['files_removed']} files; state intact")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 200_000,
    )
