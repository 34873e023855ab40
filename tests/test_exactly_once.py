"""Exactly-once semantics: duplicated segments, duplicate commits,
kill & resume from the manifest (FIXTURES.md §5; reference semantics
D2 MemoryMetaManager.java:236-247 / D3 EntryPosition.included).
"""

import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_events, generate_lake, write_fixture
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay, replay_batch
from clever_canal_ray.state.manifest import DuplicateCommitError, Lake
from tests.util import assert_tables_equal


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(seed=7, n_initial_docs=200, n_events=1500, n_segments=5)
    root = tmp_path_factory.mktemp("fx1")
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    return spec, info, lake_tbl, oracle


def test_duplicated_segment_replay_is_noop(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2)
    paths = info["segment_paths"]
    # replay segment 2's file twice inside the stream, then everything again
    dup_stream = paths[:3] + [paths[2]] + paths[3:]
    m1 = replay(lake, dup_stream, cfg)
    state1 = lake.read_table()
    assert_tables_equal(state1, oracle)
    # full re-run over the same lake: every event is <= HWM -> no-op
    m2 = replay(lake, paths, cfg)
    assert m2.hwm == m1.hwm
    assert_tables_equal(lake.read_table(), oracle)


def test_duplicate_batch_commit_rejected(ray_session, fx, tmp_path):
    spec, info, lake_tbl, _ = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4)
    m = replay_batch(lake, info["segment_paths"][:2], cfg)
    committed = m.last_batch_id
    # direct ledger-level duplicate commit must raise (D2 FIFO rule)
    with pytest.raises(DuplicateCommitError):
        lake.commit_batch(m, batch_id=committed, new_hwm=m.hwm, touched={})
    # pipeline-level replay of the committed batch id is a silent no-op
    m2 = replay_batch(lake, info["segment_paths"][:2], cfg, batch_id=committed)
    assert m2.version == m.version


def test_kill_and_resume_from_manifest(ray_session, fx, tmp_path):
    """Stop after batch k's commit; a fresh driver resumes from the
    manifest and converges without reprocessing below the HWM."""
    spec, info, lake_tbl, oracle = fx
    lake_dir = str(tmp_path / "lake")
    lake = Lake.create(lake_dir, lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4)
    paths = info["segment_paths"]
    m1 = replay_batch(lake, paths[:2], cfg)  # "crash" after this commit
    hwm_after_k = m1.hwm
    assert hwm_after_k > (-1, -1)

    lake2 = Lake(lake_dir)  # fresh handle = restarted driver
    assert lake2.current().hwm == hwm_after_k
    m2 = replay(lake2, paths, cfg)  # re-offered the whole stream
    assert_tables_equal(lake2.read_table(), oracle)
    # nothing below the old HWM was re-applied: ledger positions advance
    for rec in m2.ledger[1:]:
        assert tuple(rec["prev_hwm"]) < tuple(rec["hwm"])


def test_rollback_redelivers(ray_session, fx, tmp_path):
    """EventStore.rollback analog: pointer time-travel re-delivers
    un-acked events; replay converges again (idempotent upsert)."""
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2)
    m = replay(lake, info["segment_paths"], cfg)
    assert m.version >= 2
    lake.rollback_to_version(m.version - 1)
    m2 = replay(lake, info["segment_paths"], cfg)
    assert_tables_equal(lake.read_table(), oracle)


def test_create_refuses_existing_lake(ray_session, fx, tmp_path):
    """Lake.create never clobbers committed state (single-writer safety)."""
    spec, info, lake_tbl, _ = fx
    d = str(tmp_path / "lake")
    Lake.create(d, lake_tbl, num_partitions=2)
    with pytest.raises(FileExistsError):
        Lake.create(d, lake_tbl, num_partitions=2)


def test_commit_conflict_detected(ray_session, fx, tmp_path):
    """A second writer racing the manifest loses with CommitConflictError
    (single-writer-per-lake invariant surfaced, not silent corruption)."""
    from clever_canal_ray.state.manifest import CommitConflictError

    spec, info, lake_tbl, _ = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=2)
    base = lake.current()
    # writer A commits
    lake.commit_batch(base, batch_id=0, new_hwm=(0, 1), touched={})
    # writer B still holds the old base -> conflict (not duplicate: new id)
    with pytest.raises(CommitConflictError):
        lake.commit_batch(base, batch_id=1, new_hwm=(0, 2), touched={})
