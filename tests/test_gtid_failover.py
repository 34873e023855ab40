"""GTID-analog failover: logical txn ids survive re-segmentation, so a
mirror/archived copy of the stream (same events, different file
positions) replays exactly-once via ReplayConfig(gtid_dedup=True) —
the MysqlGtIdSet resume semantics (MysqlConnection.java:184,
driver/.../MysqlGtIdSet.java)."""

import dataclasses
import os

import pyarrow.parquet as pq
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import (
    EventLogSpec,
    generate_events,
    generate_lake,
    write_fixture,
)
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal

SPEC_A = EventLogSpec(seed=19, n_initial_docs=150, n_events=1200, n_segments=4)
SPEC_B = dataclasses.replace(SPEC_A, segment_base=50)  # the mirror: same txns, new positions


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    ra = tmp_path_factory.mktemp("src_a")
    rb = tmp_path_factory.mktemp("src_b")
    info_a = write_fixture(SPEC_A, str(ra))
    info_b = write_fixture(SPEC_B, str(rb))
    segs_a, _ = generate_events(SPEC_A)
    segs_b, _ = generate_events(SPEC_B)
    # the mirror really is the same logical stream
    assert [t["txn_id"].to_pylist() for t in segs_a] == [t["txn_id"].to_pylist() for t in segs_b]
    assert [t["doc_id"].to_pylist() for t in segs_a] == [t["doc_id"].to_pylist() for t in segs_b]
    return info_a, info_b


def test_full_failover_is_noop(ray_session, fx, tmp_path):
    info_a, info_b = fx
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, gtid_dedup=True)
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(SPEC_A), num_partitions=4)
    m1 = replay(lake, info_a["segment_paths"], cfg)
    assert m1.txn_hwm >= 0
    state1 = lake.read_table()
    applied_a = sum(r["events_in"] for r in lake.full_ledger())
    assert applied_a == SPEC_A.n_events

    # switch to the mirror: positions incomparable (all "ahead"), but
    # every txn is <= txn_hwm -> zero events re-applied
    m2 = replay(lake, info_b["segment_paths"], cfg)
    assert m2.hwm[0] >= 50  # position hwm moved onto source B's axis
    assert sum(r["events_in"] for r in lake.full_ledger()) == applied_a
    assert_tables_equal(lake.read_table(), state1)


def test_partial_failover_applies_only_missing_txns(ray_session, fx, tmp_path):
    info_a, info_b = fx
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, gtid_dedup=True)
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(SPEC_A), num_partitions=4)
    # source A dies after half its segments
    replay(lake, info_a["segment_paths"][:2], cfg)
    partial_applied = sum(r["events_in"] for r in lake.full_ledger())
    assert 0 < partial_applied < SPEC_A.n_events

    # mirror offers the WHOLE stream; only the missing tail applies
    replay(lake, info_b["segment_paths"], cfg)
    total_applied = sum(r["events_in"] for r in lake.full_ledger())
    assert total_applied == SPEC_A.n_events

    segs_a, _ = generate_events(SPEC_A)
    oracle = apply_events_serial(generate_lake(SPEC_A), segs_a)
    assert_tables_equal(lake.read_table(), oracle)


def test_manifest_gtid_executed_bookkeeping(ray_session, tmp_path):
    """With source_uuid set, every commit extends the manifest's
    MySQL-format gtid_executed set; contiguous commits collapse to one
    interval; a duplicate replay is a no-op on the set."""
    from clever_canal_ray.state.gtid import GtidSet

    spec = EventLogSpec(seed=31, n_initial_docs=60, n_events=400, n_segments=4)
    segs, _ = generate_events(spec)
    lake_tbl = generate_lake(spec)
    d = str(tmp_path / "segs")
    os.makedirs(d)
    paths = []
    for i, s in enumerate(segs):
        p = os.path.join(d, f"segment-{i:05d}.parquet")
        pq.write_table(s, p)
        paths.append(p)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, source_uuid="src-a")
    m = replay(lake, paths, cfg)
    gs = GtidSet.parse(m.gtid_executed)
    # one contiguous interval 0..txn_hwm for the single source
    assert str(gs) == f"src-a:0-{m.txn_hwm}"
    assert gs.txn_count() == m.txn_hwm + 1
    # duplicate replay: no change
    m2 = replay(lake, paths, cfg)
    assert m2.gtid_executed == m.gtid_executed


def test_gtid_executed_mid_stream_start_claims_only_applied(ray_session, tmp_path):
    """A fresh lake started mid-stream (skip_to) must NOT claim the
    skipped txns as executed — the interval starts at the first txn the
    replay actually applied."""
    from clever_canal_ray.state.gtid import GtidSet

    spec = EventLogSpec(seed=33, n_initial_docs=60, n_events=400, n_segments=4)
    segs, _ = generate_events(spec)
    lake_tbl = generate_lake(spec)
    d = str(tmp_path / "segs")
    os.makedirs(d)
    paths = []
    for i, s in enumerate(segs):
        p = os.path.join(d, f"segment-{i:05d}.parquet")
        pq.write_table(s, p)
        paths.append(p)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    # skip the first segment entirely: start at its max position
    s0 = segs[0]
    skip_pos = (
        int(s0["segment_id"][len(s0) - 1].as_py()),
        int(s0["offset"][len(s0) - 1].as_py()),
    )
    lake.skip_to(skip_pos)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, source_uuid="src-b")
    m = replay(lake, paths, cfg)
    gs = GtidSet.parse(m.gtid_executed)
    # the first txn above the skip position, NOT txn 0
    import numpy as np

    txn0 = int(s0["txn_id"][len(s0) - 1].as_py()) + 1
    assert str(gs) == f"src-b:{txn0}-{m.txn_hwm}"
    assert not gs.contains("src-b", 0)
