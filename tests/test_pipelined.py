"""Pipelined micro-batch replay (pipeline_depth > 1): concurrent
phase-1 execution, strictly in-order phase-2 commits; identical final
state to serial replay."""

import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_events, generate_lake, write_fixture
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal

DDLS = (
    (0.5, {"op": "add_column", "table": "lake.sequences", "name": "lang", "type": "string", "nullable": True, "default": None}),
)


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(seed=77, n_initial_docs=200, n_events=1600, n_segments=8, ddls=DDLS)
    root = tmp_path_factory.mktemp("fx_pipe")
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    return spec, info, lake_tbl, oracle


def test_pipelined_matches_serial_and_oracle(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    a = Lake.create(str(tmp_path / "a"), lake_tbl, num_partitions=4)
    b = Lake.create(str(tmp_path / "b"), lake_tbl, num_partitions=4)
    replay(a, info["segment_paths"], ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta", pipeline_depth=1))
    mb = replay(b, info["segment_paths"], ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta", pipeline_depth=3))
    assert_tables_equal(a.read_table(), oracle)
    assert_tables_equal(b.read_table(), oracle)
    # commits were in order and carried the DDL
    ids = [r["batch_id"] for r in mb.ledger]
    assert ids == sorted(ids)
    assert mb.schema_version == 1


def test_pipelined_commit_order_observed(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    seen = []
    cfg = ReplayConfig(
        num_partitions=4, segments_per_batch=2, sink_mode="delta", pipeline_depth=4,
        after_commit=lambda m: seen.append(m.last_batch_id),
    )
    replay(lake, info["segment_paths"], cfg)
    assert seen == sorted(seen)
    assert_tables_equal(lake.read_table(), oracle)


def test_pipelined_driver_side_compaction(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=2)
    cfg = ReplayConfig(
        num_partitions=2, segments_per_batch=1, sink_mode="delta",
        pipeline_depth=4, compact_threshold=3,
    )
    m = replay(lake, info["segment_paths"], cfg)
    assert all(len(i["files"]) <= 3 + 1 for i in m.partitions.values())
    assert_tables_equal(lake.read_table(), oracle)


def test_pipelined_resume_and_duplicate_replay(ray_session, fx, tmp_path):
    """Kill/resume + duplicate re-offer under pipelined replay."""
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta", pipeline_depth=3)
    # first half, then "crash", then re-offer the WHOLE stream
    replay(lake, info["segment_paths"][:4], cfg)
    lake2 = Lake(str(tmp_path / "lake"))
    m = replay(lake2, info["segment_paths"], cfg)
    assert_tables_equal(lake2.read_table(), oracle)
    # replaying everything again is a no-op
    m2 = replay(lake2, info["segment_paths"], cfg)
    assert m2.hwm == m.hwm
    assert_tables_equal(lake2.read_table(), oracle)


def test_pipelined_salted_skew(ray_session, fx, tmp_path):
    """salt_factor and pipeline_depth compose (skew + overlap)."""
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(
        num_partitions=4, segments_per_batch=2, sink_mode="delta",
        pipeline_depth=3, salt_factor=4,
    )
    replay(lake, info["segment_paths"], cfg)
    assert_tables_equal(lake.read_table(), oracle)


def test_pipelined_crash_mid_stream_resumes(ray_session, fx, tmp_path):
    """Driver dies after the k-th in-order commit of a pipelined run
    (before_commit raises); a fresh driver re-offered the whole stream
    resumes from the manifest HWM and converges — phase-1 files of the
    never-committed batches are invisible orphans (gc'able)."""
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)

    class Crash(RuntimeError):
        pass

    committed = []

    def bomb(batch_id, plan, touched):
        if len(committed) >= 2:
            raise Crash("driver killed")
        committed.append(batch_id)

    cfg = ReplayConfig(
        num_partitions=4, segments_per_batch=2, sink_mode="delta",
        pipeline_depth=3, before_commit=bomb,
    )
    with pytest.raises(Crash):
        replay(lake, info["segment_paths"], cfg)
    m_crash = Lake(str(tmp_path / "lake")).current()
    assert m_crash.last_batch_id == committed[-1]

    # fresh driver, same journal offered again: converges exactly-once
    lake2 = Lake(str(tmp_path / "lake"))
    replay(
        lake2,
        info["segment_paths"],
        ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta", pipeline_depth=3),
    )
    assert_tables_equal(lake2.read_table(), oracle)
    # orphan phase-1 files from the crashed batches are unreferenced -> gc
    stats = lake2.gc(keep_manifests=1)
    assert stats["files_removed"] >= 0
    assert_tables_equal(lake2.read_table(), oracle)
