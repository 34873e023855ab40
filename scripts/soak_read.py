"""Pruned/filtered lake-read soak: measure read_dataset(columns=,
filter=) against the full read on a ~1M-doc delta lake.

The 100-TB story: an analytics consumer of a wide CDC lake (token
payloads dominate the bytes) usually wants two narrow columns and a
predicate. The pruned read must (a) return exactly the projected full
read, (b) move an order of magnitude fewer bytes, (c) not regress
wall-time (it re-reads footers driver-side to group files by schema
availability — that cost must stay negligible at thousands of files).

Usage: python scripts/soak_read.py [n_docs] [n_events]
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

    import numpy as np
    import pyarrow.compute as pc

    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.fixtures.generator import EventLogSpec, generate_lake, write_fixture
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake

    spec = EventLogSpec(
        seed=57, n_initial_docs=n_docs, n_events=n_events, n_segments=8, include_before=False
    )
    root = tempfile.mkdtemp(prefix="soak_read_")
    try:
        t0 = time.monotonic()
        info = write_fixture(spec, root)
        lake = Lake.create(os.path.join(root, "lake"), generate_lake(spec), num_partitions=32)
        replay(
            lake,
            info["segment_paths"],
            ReplayConfig(num_partitions=32, segments_per_batch=4, sink_mode="delta"),
        )
        n_files = sum(len(i["files"]) for i in lake.current().partitions.values())
        print(f"setup: {time.monotonic()-t0:.1f}s lake rows={lake.read_dataset().count():,} files={n_files}")

        def bytes_of(ds):
            return sum(b.nbytes for b in ray.get(ds.to_arrow_refs()))

        t0 = time.monotonic()
        full_b = bytes_of(lake.read_dataset())
        full_s = time.monotonic() - t0
        t0 = time.monotonic()
        pruned_b = bytes_of(lake.read_dataset(columns=["n_tok", "source"]))
        pruned_s = time.monotonic() - t0
        t0 = time.monotonic()
        filt = lake.read_dataset(columns=["n_tok", "source"], filter=pc.field("n_tok") > 400)
        filt_b = bytes_of(filt)
        filt_s = time.monotonic() - t0
        print(
            f"full: {full_s:.1f}s {full_b:,}B | pruned: {pruned_s:.1f}s {pruned_b:,}B "
            f"({full_b/pruned_b:.1f}x fewer bytes) | pruned+filter: {filt_s:.1f}s {filt_b:,}B"
        )

        # exactness at scale: pruned+filtered vs full projected+filtered
        got = lake.read_dataset(columns=["n_tok"], filter=pc.field("n_tok") > 400).to_pandas()
        full_df = lake.read_dataset(columns=["n_tok"]).to_pandas()
        exp = full_df[full_df["n_tok"] > 400]
        assert len(got) == len(exp) and sorted(got["doc_id"])[:100] == sorted(exp["doc_id"])[:100]
        assert int(got["n_tok"].sum()) == int(exp["n_tok"].sum())
        print(f"exact: {len(got):,} filtered rows, value-sum equal")

        # compacted fast path with scan pushdown
        t0 = time.monotonic()
        lake.compact()
        print(f"compact: {time.monotonic()-t0:.1f}s")
        t0 = time.monotonic()
        fb = bytes_of(lake.read_dataset(columns=["n_tok"], filter=pc.field("n_tok") > 400))
        print(f"fast-path pruned+pushdown: {time.monotonic()-t0:.1f}s {fb:,}B")
        got2 = lake.read_dataset(columns=["n_tok"], filter=pc.field("n_tok") > 400).to_pandas()
        assert len(got2) == len(exp) and int(got2["n_tok"].sum()) == int(exp["n_tok"].sum())
        print("OK")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 200_000,
    )
