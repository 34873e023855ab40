"""Delta sink mode: write-optimal change files + merge-on-read +
auto-compaction; final state identical to compact mode and the oracle."""

import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_events, generate_lake, write_fixture
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(seed=31, n_initial_docs=250, n_events=1800, n_segments=6)
    root = tmp_path_factory.mktemp("fx_delta")
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    return spec, info, lake_tbl, oracle


def test_delta_mode_converges(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta")
    m = replay(lake, info["segment_paths"], cfg)
    # delta files accumulated
    assert any(len(i["files"]) > 1 for i in m.partitions.values())
    assert_tables_equal(lake.read_table(), oracle)
    # streaming read (delta path with the __pid groupby) agrees
    ds_tbl = lake.read_dataset().to_pandas()
    import pyarrow as pa

    assert_tables_equal(pa.Table.from_pandas(ds_tbl, preserve_index=False), oracle)


def test_compaction_preserves_state(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta")
    replay(lake, info["segment_paths"], cfg)
    m = lake.compact()
    assert all(len(i["files"]) <= 1 for i in m.partitions.values())
    assert_tables_equal(lake.read_table(), oracle)
    # fast-path streaming read after compaction
    import pyarrow as pa

    ds_tbl = lake.read_dataset().to_pandas()
    assert_tables_equal(pa.Table.from_pandas(ds_tbl, preserve_index=False), oracle)


def test_auto_compaction_bounds_files(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=2)
    cfg = ReplayConfig(
        num_partitions=2, segments_per_batch=1, sink_mode="delta", compact_threshold=3
    )
    m = replay(lake, info["segment_paths"], cfg)
    assert all(len(i["files"]) <= 3 for i in m.partitions.values())
    assert_tables_equal(lake.read_table(), oracle)


def test_delta_matches_compact(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    a = Lake.create(str(tmp_path / "a"), lake_tbl, num_partitions=4)
    b = Lake.create(str(tmp_path / "b"), lake_tbl, num_partitions=4)
    replay(a, info["segment_paths"], ReplayConfig(num_partitions=4, sink_mode="compact"))
    replay(b, info["segment_paths"], ReplayConfig(num_partitions=4, sink_mode="delta"))
    assert_tables_equal(a.read_table(), b.read_table())


def test_minor_compact_folds_deltas_without_touching_base(ray_session, fx, tmp_path):
    """lake.compact(mode='minor'): every partition ends at <=2 files,
    the base file path is UNCHANGED (never rewritten), and both read
    paths still match the oracle."""
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta")
    m = replay(lake, info["segment_paths"], cfg)
    bases = {p: i["files"][0] for p, i in m.partitions.items()}
    assert any(len(i["files"]) > 2 for i in m.partitions.values())
    m2 = lake.compact(mode="minor")
    assert all(len(i["files"]) <= 2 for i in m2.partitions.values())
    for p, i in m2.partitions.items():
        assert i["files"][0] == bases[p], "minor compact must not rewrite the base"
    assert_tables_equal(lake.read_table(), oracle)
    import pyarrow as pa

    ds_tbl = lake.read_dataset().to_pandas()
    assert_tables_equal(pa.Table.from_pandas(ds_tbl, preserve_index=False), oracle)
    # a follow-up major compact converges to single files and agrees
    m3 = lake.compact()
    assert all(len(i["files"]) == 1 for i in m3.partitions.values())
    assert_tables_equal(lake.read_table(), oracle)


def test_minor_auto_compaction_inline(ray_session, fx, tmp_path):
    """compact_mode='minor' in the replay hot path: threshold
    crossings fold deltas inline (mode=replace_deltas) — the base file
    written by the first batch is never rewritten afterwards — and the
    converged state equals the oracle."""
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=2)
    cfg = ReplayConfig(
        num_partitions=2,
        segments_per_batch=1,
        sink_mode="delta",
        compact_threshold=3,
        compact_mode="minor",
    )
    m = replay(lake, info["segment_paths"], cfg)
    assert all(len(i["files"]) <= 3 for i in m.partitions.values())
    # base files are the create-time (batch 0) files; they must still
    # be the head of every partition's file list — never rewritten
    for i in m.partitions.values():
        assert i["files"][0].split("/")[-1].startswith("b00000000-")
    assert_tables_equal(lake.read_table(), oracle)


def test_minor_matches_major_and_compact_sink(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    a = Lake.create(str(tmp_path / "a"), lake_tbl, num_partitions=4)
    b = Lake.create(str(tmp_path / "b"), lake_tbl, num_partitions=4)
    replay(a, info["segment_paths"], ReplayConfig(num_partitions=4, sink_mode="compact"))
    replay(
        b,
        info["segment_paths"],
        ReplayConfig(
            num_partitions=4,
            segments_per_batch=1,
            sink_mode="delta",
            compact_threshold=3,
            compact_mode="minor",
        ),
    )
    assert_tables_equal(a.read_table(), b.read_table())


def test_compact_mode_validated(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=2)
    with pytest.raises(ValueError, match="compact_mode"):
        replay(lake, info["segment_paths"], ReplayConfig(compact_mode="bogus"))
    with pytest.raises(ValueError, match="mode"):
        lake.compact(mode="bogus")


def test_gc_removes_compacted_deltas(ray_session, fx, tmp_path):
    """gc() deletes files no retained manifest references; recent
    rollback still works; older rollback loses its files (documented)."""
    import os

    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta")
    replay(lake, info["segment_paths"], cfg)
    lake.compact()

    def count_files():
        return sum(
            len(os.listdir(os.path.join(str(tmp_path / "lake"), d)))
            for d in os.listdir(str(tmp_path / "lake"))
            if d.startswith("part=")
        )

    before = count_files()
    stats = lake.gc(keep_manifests=1, min_age_sec=0)
    assert stats["files_removed"] > 0
    assert count_files() == before - stats["files_removed"]
    # state intact after gc
    assert_tables_equal(lake.read_table(), oracle)
    ds_rows = lake.read_dataset().count()
    assert ds_rows == oracle.num_rows
