"""Hot-key skew (salted reduce) + ordering-regression scenarios
(FIXTURES.md §5; TimelineBarrier.java:114-125 — position order wins
over execute_ts)."""

import numpy as np
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_events, generate_lake, write_fixture
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    # extreme skew: one hot key takes 60% of updates
    spec = EventLogSpec(
        seed=23, n_initial_docs=100, n_events=2000, n_segments=4,
        p_insert=0.2, p_update=0.7, p_delete=0.1,
        hot_frac=0.01, hot_mass=0.6,
    )
    root = tmp_path_factory.mktemp("fx_skew")
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    return spec, info, lake_tbl, oracle


def test_salted_reduce_matches_unsalted(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    lake_a = Lake.create(str(tmp_path / "a"), lake_tbl, num_partitions=4)
    lake_b = Lake.create(str(tmp_path / "b"), lake_tbl, num_partitions=4)
    replay(lake_a, info["segment_paths"], ReplayConfig(num_partitions=4, salt_factor=1))
    replay(lake_b, info["segment_paths"], ReplayConfig(num_partitions=4, salt_factor=4))
    assert_tables_equal(lake_a.read_table(), oracle)
    assert_tables_equal(lake_b.read_table(), oracle)


def test_combiner_bounds_shuffle_rows(ray_session, fx, tmp_path):
    """The within-batch LWW combiner collapses hot keys: the reduce
    stage must see far fewer event-rows than raw events_in."""
    spec, info, lake_tbl, _ = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    m = replay(lake, info["segment_paths"], ReplayConfig(num_partitions=4, segments_per_batch=4))
    total_events = sum(r["events_in"] for r in m.ledger)
    total_upserts = sum(r["rows_upserted"] + r["rows_deleted"] for r in m.ledger)
    assert total_events >= 1900
    # with 60% of updates on ~1 key, winners << events
    assert total_upserts < total_events


def test_position_order_beats_timestamps(ray_session, fx, tmp_path):
    """execute_ts regresses inside transactions by construction; the
    final state must still follow (segment_id, offset) order."""
    spec, info, lake_tbl, oracle = fx
    segs, _ = generate_events(spec)
    ts = np.concatenate([t["execute_ts"].to_numpy(zero_copy_only=False).astype("int64") for t in segs])
    assert (np.diff(ts) < 0).any(), "fixture should contain ts regressions"
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    replay(lake, info["segment_paths"], ReplayConfig(num_partitions=4))
    assert_tables_equal(lake.read_table(), oracle)
