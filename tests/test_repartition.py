"""Lake.repartition — re-hash into a new partition count (the
grow-the-cluster operation). Resumed replay must pick up the new count
from the manifest; state, lookup, change feed and gc must stay exact."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
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
from clever_canal_ray.state import filestats
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(seed=61, n_initial_docs=800, n_events=2000, n_segments=8)
    root = tmp_path_factory.mktemp("fx_repart")
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    return spec, info, lake_tbl, segs, oracle


def test_repartition_mid_replay_converges(ray_session, fx, tmp_path):
    """Grow 4 -> 8 between replay legs: the resumed replay reads the
    new count from the manifest (the cfg still says 4) and the final
    state equals the serial oracle; then shrink 8 -> 3 and re-check."""
    spec, info, lake_tbl, segs, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta")
    paths = info["segment_paths"]
    replay(lake, paths[:4], cfg)
    pre_rows = sum(i["rows"] for i in lake.current().partitions.values())
    m = lake.repartition(8)
    assert m.num_partitions == 8
    # the re-hash rewrites every version verbatim: file-row conservation
    assert sum(i["rows"] for i in m.partitions.values()) == pre_rows
    replay(lake, paths[4:], cfg)  # cfg says 4; manifest says 8 and wins
    final = lake.read_table()
    assert_tables_equal(final, oracle)
    # point lookup still routes correctly post-repartition
    keys = final["doc_id"].to_pylist()[:5] + ["missing"]
    got = lake.lookup(keys)
    exp = final.filter(pc.is_in(final["doc_id"], value_set=pa.array(keys)))
    assert_tables_equal(got, exp)
    # shrink
    m2 = lake.repartition(3)
    assert m2.num_partitions == 3
    assert_tables_equal(lake.read_table(), oracle)
    assert_tables_equal(lake.lookup(keys), exp)


def test_repartition_noop_and_guards(ray_session, fx, tmp_path):
    spec, info, lake_tbl, segs, oracle = fx
    lake = Lake.create(str(tmp_path / "lake_g"), lake_tbl, num_partitions=4)
    v = lake.current().version
    assert lake.repartition(4).version == v  # no-op, no version bump
    with pytest.raises(ValueError, match=">= 1"):
        lake.repartition(0)
    with pytest.raises(ValueError, match="not applicable"):
        lake.repartition(8, table="lake.t0")
    from clever_canal_ray.fixtures.generator import write_multi_table_fixture

    mspec = EventLogSpec(seed=62, n_initial_docs=50, n_events=100, n_segments=2)
    minfo = write_multi_table_fixture(mspec, str(tmp_path / "mfx"), n_tables=2)
    mlake = Lake.create_multi(str(tmp_path / "mlake"), minfo["initials"], partitions_per_table=2)
    with pytest.raises(ValueError, match="multi-table"):
        mlake.repartition(8)
    with pytest.raises(KeyError, match="unknown table"):
        mlake.repartition(8, table="lake.typo")
    mv = mlake.current().version
    assert mlake.repartition(2, table="lake.t0").version == mv  # per-table no-op


def test_repartition_multi_table_one_table(ray_session, tmp_path):
    """Grow ONE table of a multi-table lake mid-replay: its range moves
    to a fresh pid block (never reused — drop_table discipline), the
    other table's range is untouched, and the resumed replay routes by
    the new count (routing rebuilt from manifest.tables per batch)."""
    from clever_canal_ray.fixtures.generator import write_multi_table_fixture
    from tests.test_multi_table import _oracle_split

    spec = EventLogSpec(seed=63, n_initial_docs=300, n_events=1500, n_segments=6)
    minfo = write_multi_table_fixture(spec, str(tmp_path / "mfx"), n_tables=2)
    mlake = Lake.create_multi(str(tmp_path / "mlake"), minfo["initials"], partitions_per_table=3)
    cfg = ReplayConfig(segments_per_batch=2, sink_mode="delta")
    paths = minfo["segment_paths"]
    replay(mlake, paths[:3], cfg)
    m = mlake.repartition(8, table="lake.t0")
    t0 = m.tables["lake.t0"]
    assert t0["num_partitions"] == 8
    assert t0["base_pid"] >= 6  # fresh block past both original ranges
    assert m.tables["lake.t1"] == mlake.manifest_at(m.version - 1).tables["lake.t1"]
    replay(mlake, paths[3:], cfg)
    oracles = _oracle_split(spec, 2)
    assert_tables_equal(mlake.read_table(table="lake.t0"), oracles[0])
    assert_tables_equal(mlake.read_table(table="lake.t1"), oracles[1])
    # point lookup routes into the moved range
    final0 = mlake.read_table(table="lake.t0")
    keys = final0["doc_id"].to_pylist()[:5]
    got = mlake.lookup(keys, table="lake.t0")
    exp = final0.filter(pc.is_in(final0["doc_id"], value_set=pa.array(keys)))
    assert_tables_equal(got, exp)
    # gc reaps the abandoned range's files; state still exact
    gone = mlake.gc(keep_manifests=1, min_age_sec=0.0)
    assert gone["files_removed"] > 0
    assert_tables_equal(mlake.read_table(table="lake.t0"), oracles[0])


def test_read_changes_exact_across_repartition_upserts(ray_session, fx, tmp_path):
    """Every version (incl. tombstones) keeps its writing batch id
    through the streaming re-hash, so a feed window straddling the
    repartition is IDENTICAL to the same window read at the
    pre-repartition manifest — upserts and deletes both."""
    spec, info, lake_tbl, segs, oracle = fx
    lake = Lake.create(str(tmp_path / "lake_rc"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta")
    paths = info["segment_paths"]
    replay(lake, paths[:4], cfg)
    v_mid = lake.current().version
    floor = lake.manifest_at(v_mid).last_batch_id
    replay(lake, paths[4:], cfg)
    pre_repart = lake.current().version
    lake.repartition(6)
    import ray

    def grab(**kw):
        df = pa.concat_tables(
            ray.get(lake.read_changes(v_mid, latest_only=True, **kw).to_arrow_refs()),
            promote_options="default",
        ).to_pandas()
        return df.sort_values("doc_id").reset_index(drop=True)

    feed = grab()
    assert len(feed) > 0
    assert (feed["__seq"] > floor).all()  # carried-over rows invisible
    feed_pre = grab(to_version=pre_repart)
    assert feed_pre["__deleted"].any()  # the window really has deletes
    pd.testing.assert_frame_equal(feed, feed_pre)  # tombstones survive the re-hash


def test_repartition_across_schema_evolution(ray_session, tmp_path):
    """Re-hash a lake whose partitions hold files at DIFFERENT schema
    versions (pre- and post-widen deltas): the merge upcasts each source
    partition to the journal's current schema, and the resumed replay
    (with the remaining DDL) still converges to the serial oracle."""
    ddls = (
        (0.3, {"op": "add_column", "table": "lake.sequences", "name": "lang", "type": "string", "nullable": True, "default": None}),
        (0.7, {"op": "widen_type", "table": "lake.sequences", "name": "n_tok", "from": "int32", "to": "int64"}),
    )
    spec = EventLogSpec(seed=64, n_initial_docs=200, n_events=1200, n_segments=6, ddls=ddls)
    root = tmp_path / "fx_ddl"
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    lake = Lake.create(str(tmp_path / "lake_ddl"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta")
    paths = info["segment_paths"]
    replay(lake, paths[:4], cfg)  # past the add_column: mixed-schema files
    assert lake.current().schema_version >= 1
    m = lake.repartition(7)
    assert m.schema_version == lake.manifest_at(m.version - 1).schema_version
    replay(lake, paths[4:], cfg)  # the widen lands after the re-hash
    final = lake.read_table()
    assert final.schema.field("n_tok").type == pa.int64()
    assert_tables_equal(final, oracle)


def test_repartition_abort_leaves_lake_intact(ray_session, fx, tmp_path, monkeypatch):
    """Crash between writing the re-hashed files and the manifest swap:
    the current manifest never moves (readers see the old layout), a
    retried repartition succeeds, and gc reaps the aborted attempt's
    orphan files (the failed-task discipline gc documents)."""
    spec, info, lake_tbl, segs, oracle = fx
    lake = Lake.create(str(tmp_path / "lake_ab"), lake_tbl, num_partitions=4)
    replay(lake, info["segment_paths"], ReplayConfig(num_partitions=4, segments_per_batch=4, sink_mode="delta"))
    v = lake.current().version

    def boom(m, parent=None):
        raise RuntimeError("simulated crash before manifest publish")

    monkeypatch.setattr(lake, "_write_manifest", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        lake.repartition(8)
    monkeypatch.undo()
    assert lake.current().version == v  # pointer never moved
    assert_tables_equal(lake.read_table(), oracle)
    m = lake.repartition(8)  # retry succeeds
    assert m.num_partitions == 8
    assert_tables_equal(lake.read_table(), oracle)
    lake.gc(keep_manifests=1, min_age_sec=0.0)
    live = {f for i in lake.current().partitions.values() for f in i["files"]}
    on_disk = set()
    for d in os.listdir(lake.dir):
        if d.startswith("part="):
            for n in os.listdir(os.path.join(lake.dir, d)):
                if not n.endswith(filestats.BLOOM_SUFFIX):
                    on_disk.add(f"{d}/{n}")
    assert on_disk == live  # aborted attempt's orphans reaped
    assert_tables_equal(lake.read_table(), oracle)


def test_gc_reaps_old_partitioning(ray_session, fx, tmp_path):
    spec, info, lake_tbl, segs, oracle = fx
    lake = Lake.create(str(tmp_path / "lake_gc"), lake_tbl, num_partitions=4)
    replay(lake, info["segment_paths"], ReplayConfig(num_partitions=4, segments_per_batch=4, sink_mode="delta"))
    lake.repartition(8)
    gone = lake.gc(keep_manifests=1, min_age_sec=0.0)
    assert gone["files_removed"] > 0
    live = {f for i in lake.current().partitions.values() for f in i["files"]}
    on_disk = set()
    for d in os.listdir(lake.dir):
        if d.startswith("part="):
            for n in os.listdir(os.path.join(lake.dir, d)):
                if not n.endswith(filestats.BLOOM_SUFFIX):
                    on_disk.add(f"{d}/{n}")
    assert on_disk == live
    assert_tables_equal(lake.read_table(), oracle)
