"""Transaction atomicity across batch cuts + the F1-F6 filter surface."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_events, generate_lake
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import plan_batch, replay, replay_batch
from clever_canal_ray.schema import pack_position
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(seed=5, n_initial_docs=100, n_events=600, n_segments=2, mean_txn_size=8)
    segs, _ = generate_events(spec)
    lake_tbl = generate_lake(spec)
    return spec, segs, lake_tbl


def _split_mid_txn(seg: pa.Table, root: str):
    """Split one segment file in the middle of a transaction."""
    commit = seg["txn_commit"].to_numpy(zero_copy_only=False)
    # choose a cut point where txn_commit is False (row i ends file 1)
    cut = None
    for i in range(len(seg) // 2, len(seg) - 1):
        if not commit[i]:
            cut = i + 1
            break
    assert cut is not None
    a, b = seg.slice(0, cut), seg.slice(cut)
    pa_path, pb_path = os.path.join(root, "seg-a.parquet"), os.path.join(root, "seg-b.parquet")
    pq.write_table(a, pa_path)
    pq.write_table(b, pb_path)
    return pa_path, pb_path, a


def test_no_partial_txn_visible(ray_session, fx, tmp_path):
    """Batch cut mid-transaction: the incomplete tail txn must not be
    applied; ack stays at the last complete txn (PositionRange.ack)."""
    spec, segs, lake_tbl = fx
    root = str(tmp_path)
    pa_path, pb_path, first_part = _split_mid_txn(segs[0], root)

    lake = Lake.create(os.path.join(root, "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4)
    m1 = replay_batch(lake, [pa_path], cfg)  # only the first half-file
    # ack < last event of the half-file (tail txn incomplete)
    commit = first_part["txn_commit"].to_numpy(zero_copy_only=False)
    seg_ids = first_part["segment_id"].to_numpy(zero_copy_only=False)
    offs = first_part["offset"].to_numpy(zero_copy_only=False)
    import numpy as np

    pos = pack_position(seg_ids, offs)
    last_commit_pos = int(pos[commit].max())
    assert pack_position(m1.hwm[0], m1.hwm[1]) == last_commit_pos
    assert last_commit_pos < int(pos.max())

    # lake state == oracle applied to events up to the ack only
    truncated = first_part.filter(pa.array(pos <= last_commit_pos))
    assert_tables_equal(lake.read_table(), apply_events_serial(lake_tbl, [truncated]))

    # offering the rest (with overlap) completes the txn and converges
    seg1 = os.path.join(root, "seg-1.parquet")
    pq.write_table(segs[1], seg1)
    replay_batch(lake, [pa_path, pb_path], cfg)
    replay_batch(lake, [pb_path, seg1], cfg)
    assert_tables_equal(lake.read_table(), apply_events_serial(lake_tbl, segs))


def _write_segs(segs, root):
    paths = []
    for i, s in enumerate(segs):
        p = os.path.join(root, f"s{i}.parquet")
        pq.write_table(s, p)
        paths.append(p)
    return paths


def test_event_class_filter_drop_deletes(ray_session, fx, tmp_path):
    """F6: drop all DELETE events -> final state equals oracle over the
    D-filtered stream."""
    spec, segs, lake_tbl = fx
    paths = _write_segs(segs, str(tmp_path))
    lake = Lake.create(os.path.join(str(tmp_path), "lake"), lake_tbl, num_partitions=4)
    replay(lake, paths, ReplayConfig(num_partitions=4, drop_ops=("D",)))
    filtered = [s.filter(pc.invert(pc.equal(s["op"], "D"))) for s in segs]
    assert_tables_equal(lake.read_table(), apply_events_serial(lake_tbl, filtered))


def test_table_regex_and_list_filters(ray_session, fx, tmp_path):
    """F1/F3: whitelist regex matching keeps events; a non-matching
    list filter drops everything (empty commit still advances HWM —
    the F7 position-advance analog)."""
    spec, segs, lake_tbl = fx
    paths = _write_segs(segs, str(tmp_path))
    lake = Lake.create(os.path.join(str(tmp_path), "lakeA"), lake_tbl, num_partitions=2)
    replay(lake, paths, ReplayConfig(num_partitions=2, table_whitelist_regex=r"lake\..*"))
    assert_tables_equal(lake.read_table(), apply_events_serial(lake_tbl, segs))

    lake2 = Lake.create(os.path.join(str(tmp_path), "lakeB"), lake_tbl, num_partitions=2)
    m = replay(lake2, paths, ReplayConfig(num_partitions=2, table_list=("other.table",)))
    # nothing applied, but the cursor still advanced (no stuck stream)
    assert m.hwm > (-1, -1)
    assert_tables_equal(lake2.read_table(), lake_tbl)


def test_blacklist_and_predicate(ray_session, fx, tmp_path):
    spec, segs, lake_tbl = fx
    paths = _write_segs(segs, str(tmp_path))
    # F2 blacklist everything -> untouched lake
    lake = Lake.create(os.path.join(str(tmp_path), "lakeC"), lake_tbl, num_partitions=2)
    replay(lake, paths, ReplayConfig(num_partitions=2, table_blacklist_regex=r"lake\.sequences"))
    assert_tables_equal(lake.read_table(), lake_tbl)
    # F4 user predicate: only even segment offsets pass
    lake2 = Lake.create(os.path.join(str(tmp_path), "lakeD"), lake_tbl, num_partitions=2)
    pred = lambda t: pc.equal(pc.bit_wise_and(t["offset"], 1), 0)  # noqa: E731
    replay(lake2, paths, ReplayConfig(num_partitions=2, predicate=pred))
    filtered = [s.filter(pc.equal(pc.bit_wise_and(s["offset"], 1), 0)) for s in segs]
    assert_tables_equal(lake2.read_table(), apply_events_serial(lake_tbl, filtered))


def test_column_projection(ray_session, fx, tmp_path):
    """F5: dropped payload columns are nulled in applied images."""
    spec, segs, lake_tbl = fx
    paths = _write_segs(segs, str(tmp_path))
    lake = Lake.create(os.path.join(str(tmp_path), "lakeE"), lake_tbl, num_partitions=2)
    replay(lake, paths, ReplayConfig(num_partitions=2, column_projection=("tokens", "n_tok")))
    final = lake.read_table().to_pylist()
    orig_ids = set(lake_tbl["doc_id"].to_pylist())
    touched = [r for r in final if r["doc_id"] not in orig_ids]
    assert touched and all(r["source"] is None for r in touched)
    assert all(r["tokens"] is not None for r in touched)
