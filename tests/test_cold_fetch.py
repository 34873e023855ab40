"""Cold-segment fetch queue (sources/segments.ColdSegmentQueue — the
rds/BinlogDownloadQueue.java analog): archived segments are pulled to a
local cache with a bounded prefetch window, consumed segments are
deleted, and a fetch that crashes mid-download retries without ever
double-applying events (exactly-once rides the HWM, not the fetch)."""

import os
import shutil

import pyarrow as pa
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import (
    EventLogSpec,
    generate_events,
    generate_lake,
    write_fixture,
)
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import follow
from clever_canal_ray.sources.segments import ColdSegmentQueue
from clever_canal_ray.state.manifest import Lake


@pytest.fixture(scope="module")
def remote(tmp_path_factory):
    """A fake cold store: the fixture's segment dir, listed by name."""
    spec = EventLogSpec(seed=47, n_initial_docs=100, n_events=1200, n_segments=6)
    root = tmp_path_factory.mktemp("fx_cold")
    write_fixture(spec, str(root))
    return spec, os.path.join(str(root), "segments")


def _mk_fetcher(remote_dir: str, staging_dir: str, fail_once_for: set[str] | None = None):
    """Copy remote/name -> staging and return the staging path; names in
    ``fail_once_for`` fail their FIRST attempt after writing a partial
    staging file (the crashed-mid-download case)."""
    os.makedirs(staging_dir, exist_ok=True)
    calls: dict[str, int] = {}
    failed: set[str] = set()

    def fetch(name: str) -> str:
        src = os.path.join(remote_dir, name)
        if not os.path.exists(src):
            raise FileNotFoundError(name)
        calls[name] = calls.get(name, 0) + 1
        dst = os.path.join(staging_dir, name)
        if fail_once_for and name in fail_once_for and name not in failed:
            failed.add(name)
            with open(src, "rb") as f, open(dst, "wb") as g:
                g.write(f.read(100))  # partial bytes, then the "crash"
            raise IOError(f"simulated network drop fetching {name}")
        shutil.copyfile(src, dst)
        return dst

    return fetch, calls


def test_prefetch_window_bound(remote, tmp_path):
    spec, remote_dir = remote
    fetch, calls = _mk_fetcher(remote_dir, str(tmp_path / "staging"))
    cache = str(tmp_path / "cache")
    q = ColdSegmentQueue(
        lambda: os.listdir(remote_dir), fetch, cache, prefetch_window=2
    )
    got = q.pending(hwm_segment_id=0)
    assert len(got) == 2  # 6 remote segments, window caps residency
    resident = [n for n in os.listdir(cache) if n.endswith(".parquet")]
    assert len(resident) == 2
    # only the windowed segments were ever fetched
    assert sum(1 for n in calls if n.endswith(".parquet")) == 2
    # window slides with the HWM; already-local files are not re-fetched
    got2 = q.pending(hwm_segment_id=1)
    assert [os.path.basename(p) for p in got2] == [
        "segment-00001.parquet",
        "segment-00002.parquet",
    ]
    assert calls["segment-00001.parquet"] == 1


def test_delete_after_consume(remote, tmp_path):
    spec, remote_dir = remote
    fetch, _ = _mk_fetcher(remote_dir, str(tmp_path / "staging"))
    cache = str(tmp_path / "cache")
    q = ColdSegmentQueue(lambda: os.listdir(remote_dir), fetch, cache, prefetch_window=3)
    q.pending(hwm_segment_id=0)
    gone = q.evict(hwm_segment_id=2)
    assert sorted(os.path.basename(p) for p in gone) == [
        "segment-00000.parquet",
        "segment-00001.parquet",
    ]
    resident = [n for n in os.listdir(cache) if n.endswith(".parquet")]
    assert resident == ["segment-00002.parquet"]
    # sidecars of consumed segments went with them
    assert not any(n == "segment-00000.parquet.plan.json" for n in os.listdir(cache))


def test_follow_over_cold_queue_exactly_once_across_fetch_retries(
    ray_session, remote, tmp_path
):
    """follow() over a ColdSegmentQueue whose fetcher drops the
    connection once per segment: the final lake equals the serial
    oracle (nothing skipped, nothing double-applied) and the cache ends
    nearly empty (delete-after-consume)."""
    spec, remote_dir = remote
    all_names = {n for n in os.listdir(remote_dir) if n.endswith(".parquet")}
    fetch, calls = _mk_fetcher(
        remote_dir, str(tmp_path / "staging"), fail_once_for=set(all_names)
    )
    cache = str(tmp_path / "cache")
    q = ColdSegmentQueue(lambda: os.listdir(remote_dir), fetch, cache, prefetch_window=2)
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    m = follow(
        lake,
        q,
        ReplayConfig(num_partitions=4, segments_per_batch=2),
        poll_interval=0.01,
        idle_rounds_to_stop=3,
    )
    segs, _ = generate_events(spec)
    expect = apply_events_serial(generate_lake(spec), segs).sort_by("doc_id")
    got = lake.read_table().sort_by("doc_id")
    assert got["doc_id"].to_pylist() == expect["doc_id"].to_pylist()
    assert got["tokens"].to_pylist() == expect["tokens"].to_pylist()
    # every segment needed a retry (first attempt dropped) — and the
    # partial staging file never reached the cache
    assert all(calls[n] >= 2 for n in all_names)
    # consumed segments were evicted; at most the final window remains
    resident = [n for n in os.listdir(cache) if n.endswith(".parquet")]
    assert len(resident) <= 2
