"""TRUNCATE events (EventType.TRUNCATE=8 analog): whole-table reset at
a stream position; schema survives; replay converges; exactly-once."""

import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_events, generate_lake, write_fixture
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(
        seed=83, n_initial_docs=150, n_events=1200, n_segments=4,
        truncates=(0.5,),
        ddls=((0.3, {"op": "add_column", "table": "lake.sequences", "name": "lang", "type": "string", "nullable": True, "default": None}),),
    )
    root = tmp_path_factory.mktemp("fx_trunc")
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    return spec, info, lake_tbl, oracle


def test_truncate_replay_converges(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    m = replay(lake, info["segment_paths"], ReplayConfig(num_partitions=4, segments_per_batch=2))
    final = lake.read_table()
    # the truncate wiped pre-truncate rows: initial keys only survive if
    # re-touched after the truncate
    assert final.num_rows < lake_tbl.num_rows + 1200
    assert_tables_equal(final, oracle)
    # schema survived the truncate (DDL applied before it)
    assert m.schema_version == 1
    assert any(r.get("truncate") for r in m.ledger)


def test_truncate_exactly_once_and_pipelined_fallback(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    # pipelined config: must fall back to serial on the truncate and
    # still converge
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta", pipeline_depth=3)
    m1 = replay(lake, info["segment_paths"], cfg)
    assert_tables_equal(lake.read_table(), oracle)
    # duplicate replay is a no-op (HWM covers the truncate position)
    m2 = replay(lake, info["segment_paths"], cfg)
    assert m2.hwm == m1.hwm
    assert_tables_equal(lake.read_table(), oracle)


def test_truncate_everything_at_end(ray_session, tmp_path):
    """Truncate as the final event: lake ends empty."""
    spec = EventLogSpec(seed=17, n_initial_docs=80, n_events=300, n_segments=2, truncates=(0.999,))
    info = write_fixture(spec, str(tmp_path / "fx"))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=2)
    replay(lake, info["segment_paths"], ReplayConfig(num_partitions=2))
    final = lake.read_table()
    assert_tables_equal(final, oracle)
    assert final.num_rows <= 2  # at most the tail events after truncate


def test_unsubscribed_table_truncate_does_not_wipe(ray_session, tmp_path):
    """A TRUNCATE event for a table outside the F1-F3 subscription
    filters must NOT wipe the subscribed state (code-review
    regression: it previously truncated the whole lake)."""
    import pyarrow.compute as pc

    from clever_canal_ray.oracle import apply_events_serial

    spec = EventLogSpec(
        seed=53, n_initial_docs=150, n_events=1000, n_segments=4,
        truncates=((0.5, "other.stream"),),  # not ours
    )
    info = write_fixture(spec, str(tmp_path / "fx"))
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    cfg = ReplayConfig(
        num_partitions=4, segments_per_batch=2,
        table_whitelist_regex=r"lake\.sequences",
    )
    replay(lake, info["segment_paths"], cfg)
    # expected: every row event applied, the foreign truncate ignored
    segs, _ = generate_events(spec)
    no_t = [t.filter(pc.invert(pc.equal(t["op"], "T"))) for t in segs]
    oracle = apply_events_serial(generate_lake(spec), no_t)
    assert_tables_equal(lake.read_table(), oracle)


def test_truncate_commit_advances_gtid_watermark(ray_session, tmp_path):
    """The truncate commit itself must advance txn_hwm over its window
    (code-review regression: a failover right after a truncate-ended
    commit re-applied the window's transactions)."""
    spec = EventLogSpec(
        seed=59, n_initial_docs=100, n_events=800, n_segments=4, truncates=((0.5,),)
    )
    info = write_fixture(spec, str(tmp_path / "fx"))
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    commits = []
    cfg = ReplayConfig(
        num_partitions=4, segments_per_batch=2, gtid_dedup=True,
        after_commit=lambda m: commits.append((m.ledger[-1].get("truncate"), m.txn_hwm)),
    )
    replay(lake, info["segment_paths"], cfg)
    # the truncate's own txn id, from the plan sidecar
    from clever_canal_ray.sources.segments import load_segment_plan

    t_entries = [
        tp for p in info["segment_paths"] for tp in load_segment_plan(p)["truncates"]
    ]
    assert t_entries and t_entries[0][3] is not None
    t_txn = int(t_entries[0][3])
    # the TRUNCATE COMMIT ITSELF carries the watermark over its window
    # (not just some later commit): without new_txn_hwm on the truncate
    # path this reads the pre-window value
    trunc_hwms = [w for is_t, w in commits if is_t]
    assert trunc_hwms and trunc_hwms[0] >= t_txn
    hwms = [w for _, w in commits]
    assert hwms == sorted(hwms)
