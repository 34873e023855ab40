"""Point-lookup soak: bloom pruning on a delta-heavy lake at scale.

Builds the 100-TB serving shape — a large base with a thin churn
stream left UNCOMPACTED so every partition holds base + many delta
files — then measures ``Lake.lookup`` latency and files-read with the
bloom sidecars in place vs renamed away (the advisory fallback, which
must read every file in the key's partition). Correctness of every
probed batch is checked against the full merge-on-read table.

Also times the sidecar build itself (the write-path overhead every
data file now pays).

Usage: python scripts/soak_lookup.py [n_docs] [n_events] [n_probe_batches]
"""

from __future__ import annotations

import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))


def main(n_docs: int = 1_000_000, n_events: int = 120_000, n_batches: int = 20) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import logging
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.fixtures.generator import EventLogSpec, generate_lake, write_fixture
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state import filestats
    from clever_canal_ray.state.manifest import Lake

    spec = EventLogSpec(
        seed=31,
        n_initial_docs=n_docs,
        n_events=n_events,
        n_segments=16,
        p_insert=0.1,
        p_update=0.8,
        p_delete=0.1,
        mean_tokens=60,
    )
    root = tempfile.mkdtemp(prefix="soak_lookup_")
    try:
        t0 = time.perf_counter()
        info = write_fixture(spec, os.path.join(root, "fx"))
        lake_tbl = generate_lake(spec)
        print(f"fixture: {time.perf_counter() - t0:.1f}s ({n_docs} docs, {n_events} events)")

        # sidecar build overhead on a full-size key set (one pass)
        ids = lake_tbl["doc_id"].to_numpy(zero_copy_only=False)
        t0 = time.perf_counter()
        filestats.build_bloom(ids)
        bloom_s = time.perf_counter() - t0
        print(f"bloom build over {len(ids)} keys: {bloom_s * 1e3:.0f} ms "
              f"({len(ids) / bloom_s / 1e6:.1f} M keys/s)")

        lake = Lake.create(os.path.join(root, "lake"), lake_tbl, num_partitions=32)
        cfg = ReplayConfig(
            num_partitions=32,
            segments_per_batch=1,
            sink_mode="delta",
            compact_threshold=10_000,  # never compact: keep the delta pile
        )
        t0 = time.perf_counter()
        m = replay(lake, info["segment_paths"], cfg)
        print(f"replay: {time.perf_counter() - t0:.1f}s")
        files_per_part = [len(i["files"]) for i in m.partitions.values()]
        print(f"files/partition: min {min(files_per_part)} max {max(files_per_part)}")

        full = lake.read_table()
        live_ids = np.asarray(full["doc_id"].to_pylist(), dtype=object)

        def probe_run(tag: str) -> None:
            rng = np.random.default_rng(7)  # identical key sets per leg
            lat, fr, ft = [], 0, 0
            for b in range(n_batches):
                keys = rng.choice(live_ids, size=16, replace=False).tolist()
                keys.append(f"missing_{b}")
                t0 = time.perf_counter()
                got, stats = lake.lookup(keys, return_stats=True)
                lat.append(time.perf_counter() - t0)
                fr += stats["files_read"]
                ft += stats["files_total"]
                exp = full.filter(pc.is_in(full["doc_id"], value_set=pa.array(keys)))
                assert got.num_rows == 16 == exp.num_rows, (tag, got.num_rows, exp.num_rows)
                g = got.sort_by("doc_id")
                e = exp.sort_by("doc_id").select(g.column_names)
                assert g.equals(e), f"{tag}: lookup mismatch"
            lat = np.array(lat) * 1e3
            print(
                f"{tag}: p50 {np.percentile(lat, 50):.0f} ms, p95 "
                f"{np.percentile(lat, 95):.0f} ms over {n_batches} batches of 17 keys; "
                f"files read {fr}/{ft} ({fr / ft:.1%})"
            )

        probe_run("with blooms")

        # rename sidecars away -> advisory fallback reads everything
        moved = []
        for d in os.listdir(lake.dir):
            if not d.startswith("part="):
                continue
            for f in os.listdir(os.path.join(lake.dir, d)):
                if f.endswith(filestats.BLOOM_SUFFIX):
                    p = os.path.join(lake.dir, d, f)
                    os.replace(p, p + ".off")
                    moved.append(p)
        probe_run("no blooms ")
        for p in moved:
            os.replace(p + ".off", p)
        print("SOAK OK")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:4]]
    main(*a)
