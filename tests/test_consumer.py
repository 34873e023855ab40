"""ChangeConsumer: the Canal get/ack/rollback consumer protocol
(SURVEY.md §3.1 consumer loop; MemoryMetaManager FIFO rules)."""

import os

import numpy as np
import pyarrow.compute as pc
import pytest

from clever_canal_ray.client import ChangeConsumer, FifoAckError
from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_events, write_fixture
from clever_canal_ray.schema import pack_position


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(seed=41, n_initial_docs=100, n_events=800, n_segments=4)
    root = tmp_path_factory.mktemp("fx_cons")
    info = write_fixture(spec, str(root))
    segs, _ = generate_events(spec)
    total = sum(len(s) for s in segs)
    return spec, info, total, str(root)


def _drain(consumer, batch_size=100):
    """subscribe → get/ack loop until drained; returns delivered tables."""
    out = []
    while True:
        got = consumer.get_without_ack(batch_size)
        if got is None:
            break
        bid, tbl = got
        out.append((bid, tbl))
        consumer.ack(bid)
    return out

def test_get_ack_loop_delivers_everything_once(fx, tmp_path):
    spec, info, total, root = fx
    c = ChangeConsumer(os.path.join(root, "segments"), str(tmp_path / "state"))
    c.subscribe()
    batches = _drain(c)
    delivered = sum(t.num_rows for _, t in batches)
    assert delivered == total
    # batch ids are consecutive, positions strictly increasing, no dup rows
    ids = [b for b, _ in batches]
    assert ids == list(range(len(ids)))
    all_pos = np.concatenate(
        [
            pack_position(
                t["segment_id"].to_numpy(zero_copy_only=False),
                t["offset"].to_numpy(zero_copy_only=False),
            )
            for _, t in batches
        ]
    )
    assert (np.diff(all_pos) > 0).all()
    # every batch ends on a txn boundary
    for _, t in batches:
        assert bool(t["txn_commit"][-1].as_py())


def test_streaming_gets_with_multi_inflight(fx, tmp_path):
    """Successive gets stream successive batches while earlier ones
    stay un-acked (CanalServerWithEmbedded get/ack pipelining); acks
    must still drain FIFO; rollback re-delivers every un-acked row."""
    spec, info, total, root = fx
    c = ChangeConsumer(os.path.join(root, "segments"), str(tmp_path / "s2"))
    c.subscribe()
    bid1, t1 = c.get_without_ack(50)
    bid2, t2 = c.get_without_ack(50)
    assert bid2 == bid1 + 1
    assert t2["offset"][0].as_py() != t1["offset"][0].as_py()
    # FIFO: acking the newer batch first is rejected
    with pytest.raises(FifoAckError):
        c.ack(bid2)
    c.ack(bid1)
    c.ack(bid2)
    bid3, t3 = c.get_without_ack(50)
    assert t3["offset"][0].as_py() not in (t1["offset"][0].as_py(), t2["offset"][0].as_py())
    # rollback: un-acked b3 re-delivered from its start with a fresh id
    c.rollback()
    bid4, t4 = c.get_without_ack(50)
    assert bid4 == bid3 + 1
    assert t4["offset"][0].as_py() == t3["offset"][0].as_py()


def test_txn_longer_than_batch_size_does_not_livelock(fx, tmp_path):
    """A committed transaction longer than batch_size must still be
    delivered (window grows to the next txn boundary) — regression for
    the get_without_ack livelock."""
    spec, info, total, root = fx
    c = ChangeConsumer(os.path.join(root, "segments"), str(tmp_path / "s_live"))
    c.subscribe()
    delivered = 0
    saw_oversize = False
    while True:
        got = c.get_without_ack(1)  # every multi-row txn exceeds this
        if got is None:
            break
        bid, t = got
        saw_oversize = saw_oversize or t.num_rows > 1
        delivered += t.num_rows
        assert bool(t["txn_commit"][-1].as_py())
        c.ack(bid)
    assert delivered == total
    assert saw_oversize


def test_fifo_ack_enforced_and_rollback(fx, tmp_path):
    spec, info, total, root = fx
    c = ChangeConsumer(os.path.join(root, "segments"), str(tmp_path / "s3"))
    c.subscribe()
    b1, _ = c.get_without_ack(50)
    with pytest.raises(FifoAckError):
        c.ack(b1 + 5)
    c.ack(b1)
    b2, t2 = c.get_without_ack(50)
    c.rollback()  # un-acked b2 dropped; re-delivered with a fresh id
    b3, t3 = c.get_without_ack(50)
    assert t3["offset"][0].as_py() == t2["offset"][0].as_py()
    c.ack(b3)


def test_restart_resumes_from_cursor_file(fx, tmp_path):
    spec, info, total, root = fx
    state = str(tmp_path / "s4")
    c = ChangeConsumer(os.path.join(root, "segments"), state)
    c.subscribe()
    b1, t1 = c.get_without_ack(200)
    c.ack(b1)
    last_pos = int(pack_position(t1["segment_id"][-1].as_py(), t1["offset"][-1].as_py()))
    # fresh process analog: new object, same meta.json
    c2 = ChangeConsumer(os.path.join(root, "segments"), state)
    b2, t2 = c2.get_without_ack(200)
    first_pos = int(pack_position(t2["segment_id"][0].as_py(), t2["offset"][0].as_py()))
    assert first_pos > last_pos
    assert b2 == b1 + 1


def test_subscribe_filter_replace(fx, tmp_path):
    """A new subscribe(cfg) REPLACES the filter set
    (AbstractCanalInstance.subscribeChange analog); position still
    advances past filtered rows (F7)."""
    spec, info, total, root = fx
    c = ChangeConsumer(os.path.join(root, "segments"), str(tmp_path / "s5"))
    c.subscribe(ReplayConfig(drop_ops=("D", "U", "DDL")))
    batches = _drain(c)
    ops = {o for _, t in batches for o in t["op"].to_pylist()}
    assert ops == {"I"}
    # filter swap: new consumer state, deliver everything
    c2 = ChangeConsumer(os.path.join(root, "segments"), str(tmp_path / "s6"))
    c2.subscribe(ReplayConfig())
    assert sum(t.num_rows for _, t in _drain(c2)) == total


def test_write_flat_messages(ray_session, fx, tmp_path):
    """FlatMessage JSON export: one object per change with the Canal
    client wire shape (database/table/pkNames/type/es/data/old)."""
    import glob
    import json as _json

    import ray.data as rd

    from clever_canal_ray.functions.cdc_ops import write_flat_messages

    spec, info, total, root = fx
    ds = rd.read_parquet(info["segment_paths"])
    out = str(tmp_path / "flat")
    write_flat_messages(ds, out)
    files = glob.glob(os.path.join(out, "*.json"))
    assert files
    rows = []
    for f in files:
        with open(f) as fh:
            rows.extend(_json.loads(line) for line in fh if line.strip())
    assert len(rows) == total
    sample = rows[0]
    assert set(sample) == {
        "database", "table", "pkNames", "isDdl", "type", "es", "sql", "data", "old",
        "updated",
    }
    assert sample["pkNames"] == ["doc_id"]
    assert any(r["type"] == "D" and r["data"] is None for r in rows)
    # per-column change mask (LogEventConvert.isUpdate analog): for U
    # rows, `updated` names exactly the differing columns and `old`
    # carries ONLY their before-values (unchanged cells null)
    checked = 0
    for r in rows:
        if r["type"] != "U" or r["old"] is None or r["updated"] is None:
            continue
        non_null_old = {k for k, v in r["old"].items() if v is not None}
        assert non_null_old <= set(r["updated"])
        for k in r["updated"]:
            assert r["data"] is None or r["old"].get(k) != r["data"].get(k) or r["old"].get(k) is None
        # a column present in old must genuinely differ from the after image
        for k in non_null_old:
            assert r["data"][k] != r["old"][k]
        checked += 1
    assert checked > 0


def test_consumer_protocol_random_sequences(fx, tmp_path):
    """Model-based fuzz of the get/ack/rollback protocol: random
    operation sequences must deliver, between acks and rollbacks,
    exactly the suffix of events past the acked cursor, in order,
    ending on txn boundaries."""
    import numpy as np

    spec, info, total, root = fx
    rng = np.random.default_rng(123)
    c = ChangeConsumer(os.path.join(root, "segments"), str(tmp_path / "fuzz"))
    c.subscribe()

    acked_pos = -1  # packed position of the acked cursor
    delivered_after_ack = []  # (batch_id, first_pos, last_pos) in-flight, FIFO
    for step in range(120):
        op = rng.choice(["get", "ack", "rollback"], p=[0.6, 0.3, 0.1])
        if op == "get":
            got = c.get_without_ack(int(rng.integers(1, 120)))
            if got is None:
                continue
            bid, t = got
            pos = pack_position(
                t["segment_id"].to_numpy(zero_copy_only=False),
                t["offset"].to_numpy(zero_copy_only=False),
            )
            assert (np.diff(pos) > 0).all()
            assert bool(t["txn_commit"][-1].as_py())
            expected_start = (
                delivered_after_ack[-1][2] if delivered_after_ack else acked_pos
            )
            assert int(pos[0]) > expected_start  # continues past last delivery
            delivered_after_ack.append((bid, int(pos[0]), int(pos[-1])))
        elif op == "ack":
            if not delivered_after_ack:
                continue
            bid, first, last = delivered_after_ack.pop(0)
            c.ack(bid)
            acked_pos = last
        else:
            c.rollback()
            delivered_after_ack = []
    # drain to the end; total delivered past the acked cursor is exact
    c.rollback()
    remaining = 0
    while True:
        got = c.get_without_ack(500)
        if got is None:
            break
        bid, t = got
        remaining += t.num_rows
        c.ack(bid)
    all_segs, _ = generate_events(spec)
    import pyarrow as pa

    full = pa.concat_tables(all_segs)
    all_pos = pack_position(
        full["segment_id"].to_numpy(zero_copy_only=False),
        full["offset"].to_numpy(zero_copy_only=False),
    )
    assert remaining == int((all_pos > acked_pos).sum())


def test_pending_cache_across_segment_arrival(fx, tmp_path):
    """The decode cache must compose with tail-follow: a get's
    txn-headroom over-read stays pending (asserted NON-empty — the
    cache path genuinely runs), then a new segment 'arrives' — the
    cache must be invalidated (new paths may interleave below the
    cached tail in multi-dir journals) and the continued drain must
    deliver exactly the rows an uninterrupted drain delivers."""
    import shutil

    spec, info, total, root = fx

    ref = ChangeConsumer(os.path.join(root, "segments"), str(tmp_path / "ref"))
    ref.subscribe()
    want = [t for _, t in _drain(ref, batch_size=64)]
    want_pos = np.concatenate(
        [
            pack_position(
                t["segment_id"].to_numpy(zero_copy_only=False),
                t["offset"].to_numpy(zero_copy_only=False),
            )
            for t in want
        ]
    )

    # copy the fixture and hide the last segment
    segs_dir = str(tmp_path / "segments")
    shutil.copytree(os.path.join(root, "segments"), segs_dir)
    names = sorted(n for n in os.listdir(segs_dir) if n.endswith(".parquet"))
    hidden = os.path.join(str(tmp_path), names[-1])
    os.rename(os.path.join(segs_dir, names[-1]), hidden)

    c = ChangeConsumer(segs_dir, str(tmp_path / "state"))
    c.subscribe()
    got = []
    bid, t = c.get_without_ack(64)
    got.append(t)
    c.ack(bid)
    # the 2x headroom over-read must be cached, not discarded
    assert c._pending is not None and c._pending.num_rows > 0
    cached_paths = c._pending_paths
    # the segment arrives; the SAME consumer must invalidate its cache
    # (the new path set) and still deliver everything exactly once
    os.rename(hidden, os.path.join(segs_dir, names[-1]))
    got += [t for _, t in _drain(c, batch_size=64)]
    assert c._pending_paths != cached_paths

    got_pos = np.concatenate(
        [
            pack_position(
                t["segment_id"].to_numpy(zero_copy_only=False),
                t["offset"].to_numpy(zero_copy_only=False),
            )
            for t in got
        ]
    )
    assert np.array_equal(got_pos, want_pos)


def test_long_poll_wakes_on_published_segment(fx, tmp_path):
    """get_without_ack(timeout_ms=...) — the embedded
    getWithoutAck(timeout): an expired poll blocks for the timeout and
    returns None; a segment published mid-poll wakes it."""
    import shutil
    import threading
    import time

    spec, info, total, root = fx
    seg_src = os.path.join(root, "segments")
    names = sorted(n for n in os.listdir(seg_src) if n.endswith(".parquet"))
    live = tmp_path / "live"
    os.makedirs(live)

    def publish(name: str) -> None:
        side = name + ".plan.json"
        if os.path.exists(os.path.join(seg_src, side)):
            shutil.copyfile(os.path.join(seg_src, side), os.path.join(live, side))
        tmp = os.path.join(live, name + ".tmp")
        shutil.copyfile(os.path.join(seg_src, name), tmp)
        os.replace(tmp, os.path.join(live, name))

    for n in names[:-1]:
        publish(n)
    c = ChangeConsumer(str(live), str(tmp_path / "state"))
    c.subscribe()
    _drain(c)
    t0 = time.monotonic()
    assert c.get_without_ack(500, timeout_ms=250) is None
    assert time.monotonic() - t0 >= 0.23

    th = threading.Thread(target=lambda: (time.sleep(0.4), publish(names[-1])))
    th.start()
    t0 = time.monotonic()
    got = c.get_without_ack(10_000, timeout_ms=30_000)
    elapsed = time.monotonic() - t0
    th.join()
    assert got is not None and got[1].num_rows > 0
    assert elapsed >= 0.35
    c.ack(got[0])
    assert sum(t.num_rows for _, t in _drain(c)) + got[1].num_rows > 0
