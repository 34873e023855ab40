"""Group sources (S4), segment discovery, per-partition metrics, CLI."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_events, generate_lake
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.sources.segments import SegmentQueue, discover_segments
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(seed=61, n_initial_docs=150, n_events=900, n_segments=6)
    segs, _ = generate_events(spec)
    lake_tbl = generate_lake(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    return spec, segs, lake_tbl, oracle


def test_group_source_multi_dir(ray_session, fx, tmp_path):
    """S4: segments sharded across N journal dirs replay into one lake."""
    spec, segs, lake_tbl, oracle = fx
    dirs = [str(tmp_path / f"shard{i}") for i in range(3)]
    for d in dirs:
        os.makedirs(d)
    for i, s in enumerate(segs):
        pq.write_table(s, os.path.join(dirs[i % 3], f"segment-{i:05d}.parquet"))
    paths = discover_segments(dirs)
    assert len(paths) == 6
    # discovery returns global segment order across dirs
    assert [int(p.split("segment-")[1][:5]) for p in paths] == list(range(6))

    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    replay(lake, paths, ReplayConfig(num_partitions=4, segments_per_batch=2))
    assert_tables_equal(lake.read_table(), oracle)

    q = SegmentQueue(dirs)
    assert q.pending(hwm_segment_id=4) == paths[4:]


def test_partition_metrics_sidecar(ray_session, fx, tmp_path):
    spec, segs, lake_tbl, _ = fx
    d = str(tmp_path / "segs")
    os.makedirs(d)
    paths = []
    for i, s in enumerate(segs):
        p = os.path.join(d, f"segment-{i:05d}.parquet")
        pq.write_table(s, p)
        paths.append(p)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    m = replay(lake, paths, ReplayConfig(num_partitions=4, segments_per_batch=3))
    mt = lake.metrics_table().to_pandas()
    assert len(mt) > 0
    assert set(mt.columns) == {
        "partition_id", "batch_id", "hwm_segment_id", "hwm_offset",
        "schema_version", "rows_upserted", "rows_deleted", "events_in",
    }
    # sidecar totals match the ledger
    ledger_events = sum(r["events_in"] for r in m.ledger)
    assert int(mt["events_in"].sum()) == ledger_events


def test_cli_end_to_end(tmp_path):
    """CLI drives the whole lifecycle in a subprocess (own Ray session)."""
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_dir = str(tmp_path / "fx")
    lake_dir = str(tmp_path / "lake")

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "clever_canal_ray", *args],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout.strip().splitlines()[-1]

    gen = json.loads(run("gen-fixture", "--out", out_dir, "--events", "400", "--docs", "100", "--segments", "2"))
    assert gen["n_events"] == 400
    run("create-lake", "--lake", lake_dir, "--from", os.path.join(out_dir, "initial_lake.parquet"), "--partitions", "4")
    rep = json.loads(run("replay", "--lake", lake_dir, "--segments", os.path.join(out_dir, "segments"), "--mode", "delta"))
    assert rep["batches"] >= 1
    comp = json.loads(run("compact", "--lake", lake_dir))
    assert comp["files"] <= 4
    rp = json.loads(run("repartition", "--lake", lake_dir, "--partitions", "6"))
    assert rp["num_partitions"] == 6
    status = json.loads(run("status", "--lake", lake_dir))
    assert status["last_batch_id"] >= 0
    # incremental change feed since the initial manifest (v0 = create)
    chg = json.loads(run("changes", "--lake", lake_dir, "--since", "0",
                         "--out", str(tmp_path / "feed"), "--latest-only"))
    assert chg["rows"] > 0 and chg["to"] >= 1
    # point-read serving path through the CLI (driver-serial, no Ray)
    look = json.loads(run("lookup", "--lake", lake_dir, "--keys", "doc000000000000", "nope"))
    assert look["stats"]["keys"] == 2
    found = {r["doc_id"] for r in look["rows"]}
    assert found <= {"doc000000000000"} and "nope" not in found


def test_commit_hooks_and_lag_metric(ray_session, fx, tmp_path):
    """§2.10 extension surface: before/after-commit callbacks; F8
    liveness analog: max_execute_ts recorded per committed batch."""
    spec, segs, lake_tbl, oracle = fx
    d = str(tmp_path / "segs")
    os.makedirs(d)
    paths = []
    for i, s in enumerate(segs):
        p = os.path.join(d, f"segment-{i:05d}.parquet")
        pq.write_table(s, p)
        paths.append(p)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=2)
    calls = {"before": [], "after": []}
    cfg = ReplayConfig(
        num_partitions=2,
        segments_per_batch=3,
        before_commit=lambda bid, plan, touched: calls["before"].append(bid),
        after_commit=lambda m: calls["after"].append(m.last_batch_id),
    )
    m = replay(lake, paths, cfg)
    assert calls["before"] == calls["after"] == [r["batch_id"] for r in m.ledger]
    assert all(r.get("max_execute_ts", 0) > 0 for r in m.ledger)
    assert_tables_equal(lake.read_table(), oracle)


def test_before_commit_abort_blocks_batch(ray_session, fx, tmp_path):
    """A raising before_commit hook aborts the commit: state/HWM stay
    put (retry semantics — the reference's down-stream-handler retry
    loop, EntryEventSink.doSink:164-195)."""
    spec, segs, lake_tbl, _ = fx
    d = str(tmp_path / "segs")
    os.makedirs(d)
    paths = []
    for i, s in enumerate(segs):
        p = os.path.join(d, f"segment-{i:05d}.parquet")
        pq.write_table(s, p)
        paths.append(p)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=2)

    def deny(bid, plan, touched):
        raise RuntimeError("vetoed")

    cfg = ReplayConfig(num_partitions=2, before_commit=deny)
    with pytest.raises(RuntimeError):
        replay(lake, paths, cfg)
    m = lake.current()
    assert m.last_batch_id == -1 and m.hwm == (-1, -1)
    assert_tables_equal(lake.read_table(), lake_tbl)


def test_settled_prefix_stops_at_inflight_file(fx, tmp_path):
    """A half-written segment (truncated footer) halts consumption at
    that file — later complete segments are deferred too, preserving
    position order across the retry."""
    from clever_canal_ray.sources.segments import settled_prefix

    spec, segs, _, _ = fx
    d = str(tmp_path / "j")
    os.makedirs(d)
    paths = []
    for i, s in enumerate(segs[:3]):
        p = os.path.join(d, f"segment-{i:05d}.parquet")
        pq.write_table(s, p)
        paths.append(p)
    # truncate the MIDDLE file to simulate an in-flight write
    with open(paths[1], "r+b") as f:
        f.truncate(os.path.getsize(paths[1]) // 2)
    assert settled_prefix(paths) == paths[:1]
    # once the writer finishes, the whole list settles
    pq.write_table(segs[1], paths[1])
    assert settled_prefix(paths) == paths


def test_follow_tail_mode(ray_session, fx, tmp_path):
    """Tail-follow: segments appearing between polls are picked up;
    stops when idle (LocalBinLogConnection tail-wait analog)."""
    import threading
    import time

    from clever_canal_ray.pipelines.replay import follow

    spec, segs, lake_tbl, oracle = fx
    d = str(tmp_path / "journal")
    os.makedirs(d)
    # first half available immediately
    for i, s in enumerate(segs[:3]):
        pq.write_table(s, os.path.join(d, f"segment-{i:05d}.parquet"))

    def publish_rest():
        time.sleep(1.2)
        for i, s in enumerate(segs[3:], start=3):
            pq.write_table(s, os.path.join(d, f"segment-{i:05d}.parquet"))

    t = threading.Thread(target=publish_rest)
    t.start()
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    m = follow(
        lake, d, ReplayConfig(num_partitions=4, segments_per_batch=3),
        poll_interval=0.5, idle_rounds_to_stop=4,
    )
    t.join()
    assert_tables_equal(lake.read_table(), oracle)


def test_time_travel_read(ray_session, fx, tmp_path):
    """manifest_at(version): read the lake as of an earlier commit."""
    spec, segs, lake_tbl, oracle = fx
    d = str(tmp_path / "segs")
    os.makedirs(d)
    paths = []
    for i, s in enumerate(segs):
        p = os.path.join(d, f"segment-{i:05d}.parquet")
        pq.write_table(s, p)
        paths.append(p)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    m = replay(lake, paths, ReplayConfig(num_partitions=4, segments_per_batch=2))
    assert m.version >= 2
    # version 0 = the initial load
    t0 = lake.read_table(lake.manifest_at(0))
    assert_tables_equal(t0, lake_tbl)
    # an intermediate version has the partial state (row count between)
    t1 = lake.read_table(lake.manifest_at(1))
    assert t0.num_rows <= t1.num_rows <= lake.read_table().num_rows + 1000


def test_prometheus_metrics_export(ray_session, tmp_path):
    """Prometheus text-format export (StoreCollector analog): counters
    track the ledger, gauges the current manifest."""
    from clever_canal_ray.fixtures.generator import EventLogSpec, generate_lake, write_fixture
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.state.manifest import Lake

    spec = EventLogSpec(seed=83, n_initial_docs=100, n_events=600, n_segments=3)
    info = write_fixture(spec, str(tmp_path / "fx"))
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    m = replay(lake, info["segment_paths"], ReplayConfig(num_partitions=4, segments_per_batch=2))
    text = lake.prometheus_metrics()
    metrics = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        k, v = line.rsplit(" ", 1)
        metrics[k] = float(v)
    assert metrics["canal_events_applied_total"] == spec.n_events
    assert metrics["canal_batches_committed_total"] == len(lake.full_ledger())
    assert metrics["canal_manifest_version"] == m.version
    assert metrics["canal_hwm_segment_id"] == m.hwm[0]
    assert metrics["canal_lake_rows"] == sum(int(i["rows"]) for i in m.partitions.values())
    assert metrics["canal_last_execute_ts_ms"] > 0


def test_follow_raises_on_permanently_corrupt_segment(ray_session, fx, tmp_path):
    """A segment that stays unreadable across polls is CORRUPT publisher
    output: follow() must raise, not idle past it or return 'caught
    up' (silent data loss)."""
    import pytest

    from clever_canal_ray.pipelines.replay import follow

    spec, segs, lake_tbl, oracle = fx
    d = str(tmp_path / "journal")
    os.makedirs(d)
    p0 = os.path.join(d, "segment-00000.parquet")
    pq.write_table(segs[0], p0)
    # permanently truncated file: never settles
    with open(p0, "r+b") as f:
        f.truncate(os.path.getsize(p0) // 2)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    with pytest.raises(RuntimeError, match="unreadable"):
        follow(
            lake, d, ReplayConfig(num_partitions=4),
            poll_interval=0.05, unsettled_poll_limit=4,
            idle_rounds_to_stop=100,
        )
