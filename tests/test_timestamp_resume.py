"""Timestamp-positioned start/resume — the findStartPositionInternal
rewind-by-timestamp analog (MysqlEventParser.java:466-547): consumer
seek and lake skip_to both start delivery at the transaction containing
the first event with execute_ts >= T."""

import os

import numpy as np
import pyarrow as pa
import pytest

from clever_canal_ray.client import ChangeConsumer
from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import (
    EventLogSpec,
    generate_events,
    generate_lake,
    write_fixture,
)
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.schema import pack_position
from clever_canal_ray.sources.segments import find_start_position
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(seed=61, n_initial_docs=200, n_events=2000, n_segments=5)
    root = tmp_path_factory.mktemp("fx_ts")
    info = write_fixture(spec, str(root))
    segs, _ = generate_events(spec)
    return spec, info, segs, str(root)


def _sorted_events(segs):
    full = pa.concat_tables(segs)
    pos = pack_position(
        full["segment_id"].to_numpy(zero_copy_only=False),
        full["offset"].to_numpy(zero_copy_only=False),
    )
    return full.take(pa.array(np.argsort(pos, kind="stable")))


def test_find_start_position_semantics(fx):
    spec, info, segs, root = fx
    full = _sorted_events(segs)
    ts = full["execute_ts"].to_numpy(zero_copy_only=False).astype("datetime64[ms]").astype(np.int64)
    target = int(ts[len(ts) // 2])
    pos = find_start_position(info["segment_paths"], target)
    p64 = int(pack_position(pos[0], pos[1]))
    # the boundary precedes the first event with ts >= target ...
    first = int(np.where(ts >= target)[0][0])
    all_pos = pack_position(
        full["segment_id"].to_numpy(zero_copy_only=False),
        full["offset"].to_numpy(zero_copy_only=False),
    )
    assert p64 < int(all_pos[first])
    # ... and it IS a txn boundary
    idx = int(np.where(all_pos == p64)[0][0])
    assert bool(full["txn_commit"][idx].as_py())
    # before the stream start / after its end
    assert find_start_position(info["segment_paths"], int(ts.min()) - 10_000) == (-1, -1)
    end = find_start_position(info["segment_paths"], int(ts.max()) + 10_000)
    assert int(pack_position(end[0], end[1])) == int(all_pos.max())


def test_consumer_seek_to_timestamp(fx, tmp_path):
    spec, info, segs, root = fx
    full = _sorted_events(segs)
    ts = full["execute_ts"].to_numpy(zero_copy_only=False).astype("datetime64[ms]").astype(np.int64)
    target = int(ts[int(len(ts) * 0.7)])
    c = ChangeConsumer(os.path.join(root, "segments"), str(tmp_path / "state"))
    c.subscribe()
    pos = c.seek_to_timestamp(target)
    delivered = 0
    first_batch_min = None
    while True:
        got = c.get_without_ack(500)
        if got is None:
            break
        bid, t = got
        if first_batch_min is None:
            first_batch_min = int(
                pack_position(t["segment_id"][0].as_py(), t["offset"][0].as_py())
            )
        delivered += t.num_rows
        c.ack(bid)
    all_pos = pack_position(
        full["segment_id"].to_numpy(zero_copy_only=False),
        full["offset"].to_numpy(zero_copy_only=False),
    )
    expected = int((all_pos > int(pack_position(pos[0], pos[1]))).sum())
    assert delivered == expected
    assert first_batch_min > int(pack_position(pos[0], pos[1]))


def test_lake_skip_to_timestamp_replay(ray_session, fx, tmp_path):
    """Fresh lake + skip_to(find_start_position(ts)) + full replay ==
    serial oracle applied only from the suffix after the boundary."""
    spec, info, segs, root = fx
    full = _sorted_events(segs)
    ts = full["execute_ts"].to_numpy(zero_copy_only=False).astype("datetime64[ms]").astype(np.int64)
    target = int(ts[len(ts) // 2])
    pos = find_start_position(info["segment_paths"], target)
    p64 = int(pack_position(pos[0], pos[1]))

    lake_tbl = generate_lake(spec)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    m = lake.skip_to(pos)
    assert m.hwm == pos
    replay(lake, info["segment_paths"], ReplayConfig(num_partitions=4, segments_per_batch=2))

    all_pos = pack_position(
        full["segment_id"].to_numpy(zero_copy_only=False),
        full["offset"].to_numpy(zero_copy_only=False),
    )
    suffix = full.filter(pa.array(all_pos > p64))
    oracle = apply_events_serial(lake_tbl, [suffix])
    assert_tables_equal(lake.read_table(), oracle)
    # skip_to refuses to rewind
    with pytest.raises(ValueError):
        lake.skip_to((0, 1))
