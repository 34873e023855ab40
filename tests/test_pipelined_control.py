"""Pipelined replay must NOT collapse to serial on control events
(r2 verdict #6): batches on BOTH sides of a registry DDL / TRUNCATE
run concurrently; only the control group itself takes the serial cut.
Final state must equal the fully-serial replay."""

import threading
import time

import pytest

import importlib

replay_mod = importlib.import_module("clever_canal_ray.pipelines.replay")
from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import (
    EventLogSpec,
    write_multi_table_fixture,
)
from clever_canal_ray.schema import pack_position
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


def _spec():
    return EventLogSpec(
        seed=55,
        n_initial_docs=150,
        n_events=4000,
        n_segments=8,
        include_before=False,
        ddls=((0.5, {"op": "create_table", "table": "lake.t9", "num_partitions": 4}),),
    )


def _build(tmp_path, name):
    info = write_multi_table_fixture(_spec(), str(tmp_path / name), n_tables=2)
    lake = Lake.create_multi(
        str(tmp_path / name / "lake"), info["initials"], partitions_per_table=4
    )
    return info, lake


def test_pipelined_overlap_on_both_sides_of_create_table(ray_session, tmp_path, monkeypatch):
    info, lake = _build(tmp_path, "pl")
    _, lake_serial = _build(tmp_path, "sr")

    # the DDL position splits left/right
    import json

    import pyarrow.dataset as pds

    t = pds.dataset(info["segment_paths"]).to_table(columns=["segment_id", "offset", "op"])
    import numpy as np

    op = np.asarray(t["op"].to_numpy(zero_copy_only=False), dtype=object)
    pos = pack_position(
        t["segment_id"].to_numpy(zero_copy_only=False),
        t["offset"].to_numpy(zero_copy_only=False),
    )
    ddl_pos = int(pos[op == "DDL"][0])

    orig = replay_mod._execute_batch
    lock = threading.Lock()
    inflight = {"L": 0, "R": 0}
    peak = {"L": 0, "R": 0}

    def wrapped(lake_, group, plan, hwm, *a, **k):
        side = "L" if int(pack_position(plan.ack[0], plan.ack[1])) < ddl_pos else "R"
        with lock:
            inflight[side] += 1
            peak[side] = max(peak[side], inflight[side])
        time.sleep(0.4)  # widen the overlap window
        try:
            return orig(lake_, group, plan, hwm, *a, **k)
        finally:
            with lock:
                inflight[side] -= 1

    monkeypatch.setattr(replay_mod, "_execute_batch", wrapped)
    cfg = ReplayConfig(sink_mode="delta", pipeline_depth=4, segments_per_batch=1)
    replay_mod.replay(lake, info["segment_paths"], cfg)
    monkeypatch.setattr(replay_mod, "_execute_batch", orig)

    # batches EXECUTED CONCURRENTLY on each side of the registry DDL
    assert peak["L"] >= 2, f"left-side batches ran serially: peak={peak}"
    assert peak["R"] >= 2, f"right-side batches ran serially: peak={peak}"

    # same final state as the fully-serial replay
    replay_mod.replay(
        lake_serial,
        info["segment_paths"],
        ReplayConfig(sink_mode="compact", pipeline_depth=1, segments_per_batch=1),
    )
    lake.compact()
    m_p, m_s = lake.current(), lake_serial.current()
    assert m_p.hwm == m_s.hwm
    assert sorted(m_p.tables) == sorted(m_s.tables) and "lake.t9" in m_p.tables
    for name in sorted(m_p.tables):
        assert_tables_equal(lake.read_table(table=name), lake_serial.read_table(table=name))
