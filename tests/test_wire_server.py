"""Network consumer surface (server.py — the server-netty
SessionHandler.java:43-243 / SimpleCanalConnector analog): a second
process drains a journal over TCP via subscribe/get/ack/rollback with
the same semantics as the in-process ChangeConsumer."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow.compute as pc
import pytest

from clever_canal_ray.client import ChangeConsumer, FifoAckError
from clever_canal_ray.fixtures.generator import EventLogSpec, write_fixture
from clever_canal_ray.schema import pack_position
from clever_canal_ray.server import ConsumerServer, WireConsumer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(seed=43, n_initial_docs=100, n_events=800, n_segments=4)
    root = tmp_path_factory.mktemp("fx_wire")
    info = write_fixture(spec, str(root))
    return str(root), info["n_events"]


@pytest.fixture()
def server(fx, tmp_path):
    root, _ = fx
    srv = ConsumerServer(os.path.join(root, "segments"), str(tmp_path / "state"))
    srv.start()
    yield srv
    srv.stop()


def test_wire_lookup(fx, tmp_path):
    """Point reads over the wire: a lake-backed server answers lookup
    with the same rows as a direct Lake.lookup; a journal-only server
    rejects the command with a clean error."""
    import pyarrow as pa

    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.fixtures.generator import generate_lake
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake

    root, _ = fx
    spec = EventLogSpec(seed=43, n_initial_docs=100, n_events=800, n_segments=4)
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    seg_dir = os.path.join(root, "segments")
    paths = sorted(os.path.join(seg_dir, f) for f in os.listdir(seg_dir) if f.endswith(".parquet"))
    replay(lake, paths, ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta"))

    srv = ConsumerServer(
        seg_dir, str(tmp_path / "state"), lake_dir=str(tmp_path / "lake")
    )
    srv.start()
    try:
        full = lake.read_table()
        keys = full["doc_id"].to_pylist()[:5] + ["missing"]
        with WireConsumer(srv.host, srv.port) as wire:
            got, stats = wire.lookup(keys)
            assert stats["keys"] == 6
            exp = full.filter(pc.is_in(full["doc_id"], value_set=pa.array(keys)))
            g = got.sort_by("doc_id")
            assert g.equals(exp.sort_by("doc_id").select(g.column_names))
            # errors surface as clean wire errors, connection stays usable
            with pytest.raises(RuntimeError, match="unknown table|takes no table"):
                wire.lookup(["k"], table="nope")
            assert wire.ping()
    finally:
        srv.stop()
    # journal-only server: lookup unavailable
    srv2 = ConsumerServer(seg_dir, str(tmp_path / "state2"))
    srv2.start()
    try:
        with WireConsumer(srv2.host, srv2.port) as wire:
            with pytest.raises(RuntimeError, match="no lake_dir"):
                wire.lookup(["k"])
    finally:
        srv2.stop()


def _drain(c, batch_size=100):
    out = []
    while True:
        got = c.get_without_ack(batch_size)
        if got is None:
            break
        bid, t = got
        out.append((bid, t))
        c.ack(bid)
    return out


def test_wire_equals_inprocess(fx, server, tmp_path):
    """The wire drain must deliver byte-identical batches to a direct
    ChangeConsumer over the same journal (cdc_consumer_drain over the
    wire)."""
    root, total = fx
    wire = WireConsumer(server.host, server.port, client_id="w1")
    wire.subscribe()
    got_wire = _drain(wire)
    wire.close()
    direct = ChangeConsumer(os.path.join(root, "segments"), str(tmp_path / "direct"))
    direct.subscribe()
    got_direct = _drain(direct)
    assert sum(t.num_rows for _, t in got_wire) == total
    assert len(got_wire) == len(got_direct)
    for (bw, tw), (bd, td) in zip(got_wire, got_direct):
        assert bw == bd
        assert tw.schema.equals(td.schema)
        assert tw.equals(td)


def test_wire_fifo_and_rollback(fx, server):
    root, total = fx
    c = WireConsumer(server.host, server.port, client_id="w2")
    c.subscribe()
    b0, t0 = c.get_without_ack(100)
    b1, t1 = c.get_without_ack(100)
    # FIFO: acking the newer batch first is rejected server-side
    with pytest.raises(FifoAckError):
        c.ack(b1)
    c.ack(b0)
    # rollback drops the un-acked b1; the next get re-delivers its rows
    c.rollback()
    b2, t2 = c.get_without_ack(100)
    assert b2 > b1  # fresh batch id
    assert t2.num_rows == t1.num_rows
    assert t2.equals(t1)
    c.close()


def test_wire_filters_apply_server_side(fx, server):
    root, total = fx
    c = WireConsumer(server.host, server.port, client_id="w3")
    c.subscribe(cfg={"drop_ops": ["D"]})
    rows = 0
    ops = set()
    while True:
        got = c.get_without_ack(500)
        if got is None:
            break
        bid, t = got
        rows += t.num_rows
        ops |= set(t["op"].to_pylist())
        c.ack(bid)
    assert "D" not in ops
    assert 0 < rows < total
    # non-wire-settable fields are rejected, not silently dropped
    with pytest.raises(RuntimeError):
        c.subscribe(cfg={"predicate": "lambda t: t"})
    c.close()


def test_wire_subprocess_client_drains_acks_rollback(fx, tmp_path):
    """The verdict's bar: a REAL second process connects through the
    CLI-spawned server, drains with FIFO acks, survives a rollback
    mid-stream, and its delivered positions are exactly-once and
    ordered."""
    root, total = fx
    env = dict(os.environ, PYTHONPATH=REPO)
    srv_proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "clever_canal_ray",
            "serve",
            "--journal",
            os.path.join(root, "segments"),
            "--state",
            str(tmp_path / "state"),
        ],
        stdout=subprocess.PIPE,
        text=True,
        env=env,
        cwd=REPO,
    )
    try:
        endpoint = json.loads(srv_proc.stdout.readline())
        client_script = r"""
import json, sys
from clever_canal_ray.server import WireConsumer
from clever_canal_ray.schema import pack_position

host, port = sys.argv[1], int(sys.argv[2])
c = WireConsumer(host, port, client_id="sub1")
c.subscribe()
pos = []
rolled = False
n_batches = 0
while True:
    got = c.get_without_ack(150)
    if got is None:
        break
    bid, t = got
    if not rolled and n_batches == 2:
        # survive a rollback mid-stream: drop this un-acked batch,
        # expect exact re-delivery next get
        c.rollback()
        rolled = True
        continue
    pos.extend(
        int(p)
        for p in pack_position(
            t["segment_id"].to_numpy(zero_copy_only=False),
            t["offset"].to_numpy(zero_copy_only=False),
        )
    )
    c.ack(bid)
    n_batches += 1
c.close()
print(json.dumps({"n": len(pos), "sorted": pos == sorted(pos), "dups": len(pos) != len(set(pos)), "rolled": rolled}))
"""
        out = subprocess.run(
            [sys.executable, "-c", client_script, str(endpoint["host"]), str(endpoint["port"])],
            capture_output=True,
            text=True,
            env=env,
            cwd=REPO,
            timeout=120,
        )
        assert out.returncode == 0, out.stderr
        res = json.loads(out.stdout.strip().splitlines()[-1])
        assert res["n"] == total
        assert res["sorted"] is True
        assert res["dups"] is False
        assert res["rolled"] is True
    finally:
        srv_proc.kill()
        srv_proc.wait()


def test_wire_client_resumes_after_reconnect(fx, server):
    """Cursor durability: a client that acks half the stream, closes,
    and reconnects (same client id) resumes exactly after its last ack."""
    root, total = fx
    c = WireConsumer(server.host, server.port, client_id="w5")
    c.subscribe()
    b0, t0 = c.get_without_ack(total // 2)
    c.ack(b0)
    last = pack_position(
        t0["segment_id"].to_numpy(zero_copy_only=False),
        t0["offset"].to_numpy(zero_copy_only=False),
    ).max()
    c.close()
    c2 = WireConsumer(server.host, server.port, client_id="w5")
    c2.subscribe()
    rest = _drain(c2)
    c2.close()
    first = min(
        pack_position(
            t["segment_id"].to_numpy(zero_copy_only=False),
            t["offset"].to_numpy(zero_copy_only=False),
        ).min()
        for _, t in rest
    )
    assert first > last
    assert t0.num_rows + sum(t.num_rows for _, t in rest) == total


def test_wire_changes(ray_session, fx, tmp_path):
    """Incremental change feed over the wire (stateless `changes` RPC):
    equals the distributed read_changes collection for the same window;
    polling with the returned to-version tails the lake (empty window);
    a journal-only server rejects the command cleanly."""
    import pyarrow as pa
    import ray

    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.fixtures.generator import generate_lake
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake

    root, _ = fx
    spec = EventLogSpec(seed=43, n_initial_docs=100, n_events=800, n_segments=4)
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    seg_dir = os.path.join(root, "segments")
    paths = sorted(os.path.join(seg_dir, f) for f in os.listdir(seg_dir) if f.endswith(".parquet"))
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta")
    replay(lake, paths[:2], cfg)
    v_mid = lake.current().version
    replay(lake, paths[2:], cfg)

    srv = ConsumerServer(seg_dir, str(tmp_path / "state"), lake_dir=str(tmp_path / "lake"))
    srv.start()
    try:
        with WireConsumer(srv.host, srv.port) as wire:
            got, to = wire.changes(v_mid, latest_only=True)
            assert to == lake.current().version
            assert got.num_rows > 0
            dist = pa.concat_tables(
                ray.get(lake.read_changes(v_mid, latest_only=True).to_arrow_refs()),
                promote_options="default",
            )
            cols = sorted(got.column_names)
            assert got.sort_by("doc_id").select(cols).equals(
                dist.sort_by("doc_id").select(cols)
            )
            # tombstones ride the feed
            assert pc.any(got["__deleted"]).as_py()
            # tail poll: nothing new past the served to-version
            empty, to2 = wire.changes(to)
            assert empty.num_rows == 0 and to2 == to
    finally:
        srv.stop()
    srv2 = ConsumerServer(seg_dir, str(tmp_path / "state2"))
    srv2.start()
    try:
        with WireConsumer(srv2.host, srv2.port) as wire:
            with pytest.raises(RuntimeError, match="changes unavailable"):
                wire.changes(0)
    finally:
        srv2.stop()


def test_wire_changes_mid_read_commit(ray_session, fx, tmp_path):
    """Ceiling race regression: a commit that lands WHILE the server
    reads a `changes` window must not advance the to-version handed to
    the client — otherwise the client's next poll (since=to) would skip
    the mid-read rows forever. The served `to` must be resolved before
    the read plan."""
    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.fixtures.generator import generate_lake
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake

    root, _ = fx
    spec = EventLogSpec(seed=43, n_initial_docs=100, n_events=800, n_segments=4)
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    seg_dir = os.path.join(root, "segments")
    paths = sorted(os.path.join(seg_dir, f) for f in os.listdir(seg_dir) if f.endswith(".parquet"))
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta")
    replay(lake, paths[:2], cfg)
    v0 = lake.current().version

    srv = ConsumerServer(seg_dir, str(tmp_path / "state"), lake_dir=str(tmp_path / "lake"))
    srv.start()
    try:
        # generous timeout: the hooked read below runs a replay inline
        wire = WireConsumer(srv.host, srv.port, timeout=300)
        _, to_prime = wire.changes(0)  # prime the server's lazy Lake
        assert to_prime == v0

        real = srv._lake.read_changes_table
        committed = {}

        def hooked(since, to_version=None, **kw):
            out = real(since, to_version=to_version, **kw)
            if not committed:  # commit lands AFTER the read, BEFORE the response
                replay(lake, paths[2:], cfg)
                committed["v"] = lake.current().version
            return out

        srv._lake.read_changes_table = hooked
        got, to = wire.changes(0)
        srv._lake.read_changes_table = real
        assert committed["v"] > v0  # the mid-read commit really happened
        # the served ceiling is the pre-commit version...
        assert to == v0
        # ...so polling from it picks the mid-read rows up — none skipped
        got2, to2 = wire.changes(to)
        assert to2 == committed["v"] and got2.num_rows > 0
        one_shot, to3 = wire.changes(0)
        assert to3 == to2
        assert got.num_rows + got2.num_rows == one_shot.num_rows
        wire.close()
    finally:
        srv.stop()


def test_wire_concurrent_clients(fx, tmp_path):
    """Thread-safety of the serving surface: N clients drain the same
    journal concurrently (distinct cursors), racing their first
    `changes` calls against the server's lazy Lake init, and every
    client sees the complete, identical stream."""
    import threading

    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.fixtures.generator import generate_lake
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake

    root, total = fx
    spec = EventLogSpec(seed=43, n_initial_docs=100, n_events=800, n_segments=4)
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    seg_dir = os.path.join(root, "segments")
    paths = sorted(os.path.join(seg_dir, f) for f in os.listdir(seg_dir) if f.endswith(".parquet"))
    replay(lake, paths, ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta"))
    v_final = lake.current().version

    srv = ConsumerServer(seg_dir, str(tmp_path / "state"), lake_dir=str(tmp_path / "lake"))
    srv.start()
    results: dict[str, tuple] = {}
    errors: list[BaseException] = []

    def worker(cid: str) -> None:
        try:
            c = WireConsumer(srv.host, srv.port, client_id=cid, timeout=120)
            # first call races the lazy Lake init across threads
            feed, to = c.changes(0)
            c.subscribe()
            got = _drain(c, batch_size=64)
            rows = sum(t.num_rows for _, t in got)
            pos_sum = sum(
                int(np.asarray(t["segment_id"]).astype(np.int64).sum())
                + int(np.asarray(t["offset"]).astype(np.int64).sum())
                for _, t in got
            )
            results[cid] = (rows, pos_sum, feed.num_rows, to)
            c.close()
        except BaseException as e:  # surface into the main thread
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(f"cc{i}",)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
    srv.stop()
    assert not errors, errors
    assert len(results) == 4
    vals = set(results.values())
    assert len(vals) == 1  # identical drain + identical feed for every client
    rows, _, feed_rows, to = vals.pop()
    assert rows == total and to == v_final and feed_rows > 0


def test_wire_stats(fx, server, tmp_path):
    """Admin surface (CanalStats analog): `stats` reports the journal
    head plus per-client cursors and in-flight counts, is read-only
    (the admin connection never creates a consumer), and reports
    durable clients from meta files after a server restart."""
    root, total = fx
    c1 = WireConsumer(server.host, server.port, client_id="s1")
    c1.subscribe()
    b0, _ = c1.get_without_ack(100)
    c1.ack(b0)
    b1, _ = c1.get_without_ack(100)  # left in flight

    admin = WireConsumer(server.host, server.port, client_id="admin")
    st = admin.stats()
    assert st["journal_head"] is not None and len(st["journal_head"]) == 2
    assert st["n_segments"] == 4
    rows = {c["client_id"]: c for c in st["clients"]}
    assert "admin" not in rows  # read-only: no consumer for the caller
    s1 = rows["s1"]
    assert s1["attached"] and s1["subscribed"] and s1["inflight"] == 1
    assert tuple(s1["delivered"]) == c1.delivered_position
    # lag is visible: acked < delivered <= head
    assert tuple(s1["cursor"]) < tuple(s1["delivered"]) <= tuple(st["journal_head"])
    assert [c["client_id"] for c in admin.stats(of="s1")["clients"]] == ["s1"]

    # drained consumer: cursor meets delivered, nothing in flight
    c1.ack(b1)
    _drain(c1)
    s1b = admin.stats(of="s1")["clients"][0]
    assert s1b["inflight"] == 0
    assert s1b["cursor"] == s1b["delivered"]
    assert tuple(s1b["cursor"]) <= tuple(st["journal_head"])
    admin.close()
    c1.close()

    # a fresh server over the same state dir reports the durable cursor
    # without the client attached (restart-visibility)
    srv2 = ConsumerServer(os.path.join(root, "segments"), str(tmp_path / "state"))
    srv2.start()
    try:
        with WireConsumer(srv2.host, srv2.port, client_id="admin2") as a2:
            got = {c["client_id"]: c for c in a2.stats()["clients"]}
            assert got["s1"]["attached"] is False
            assert got["s1"]["cursor"] == s1b["cursor"]
            assert got["s1"]["subscribed"] is True
    finally:
        srv2.stop()


def test_cli_consumer_stats(fx, server, capsys):
    """CLI wiring: `consumer-stats` prints the stats snapshot as JSON."""
    from clever_canal_ray.__main__ import main as cli_main

    c = WireConsumer(server.host, server.port, client_id="cli1")
    c.subscribe()
    bid, _ = c.get_without_ack(50)
    c.ack(bid)
    assert cli_main(["consumer-stats", "--port", str(server.port), "--of", "cli1"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert [r["client_id"] for r in out["clients"]] == ["cli1"]
    assert out["clients"][0]["inflight"] == 0
    c.close()


def test_wire_snapshot_bootstrap_then_tail(ray_session, fx, tmp_path):
    """Remote bootstrap handshake: `snapshot` pins one lake version with
    its file listing + manifest; the client bulk-reads the pinned state
    itself and tails with changes(since=version) — composing exactly to
    the final lake even though the pointer advanced in between."""
    import pandas as pd
    import pyarrow as pa

    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.fixtures.generator import generate_lake
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake, Manifest

    root, _ = fx
    spec = EventLogSpec(seed=43, n_initial_docs=100, n_events=800, n_segments=4)
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    seg_dir = os.path.join(root, "segments")
    paths = sorted(os.path.join(seg_dir, f) for f in os.listdir(seg_dir) if f.endswith(".parquet"))
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta")
    replay(lake, paths[:2], cfg)

    srv = ConsumerServer(seg_dir, str(tmp_path / "state"), lake_dir=str(tmp_path / "lake"))
    srv.start()
    try:
        wire = WireConsumer(srv.host, srv.port)
        snap = wire.snapshot()
        assert snap["version"] == lake.current().version
        assert snap["tables"] is None and snap["num_partitions"] == 4
        flat = [f for p in snap["partitions"].values() for f in p["files"]]
        assert flat and all(os.path.isabs(f) and os.path.exists(f) for f in flat)
        m = Manifest.from_json(snap["manifest"])
        assert m.version == snap["version"]
        t0 = Lake(snap["lake_dir"]).read_table(m=m)
        assert t0.num_rows > 0  # raw per-file "rows" include delta dups; merge-on-read collapses

        replay(lake, paths[2:], cfg)  # the pointer moves on
        feed, to = wire.changes(snap["version"], latest_only=True)
        assert to == lake.current().version > snap["version"]

        # serial apply of the tail onto the pinned snapshot
        sdf = t0.to_pandas().set_index("doc_id")
        for _, row in feed.to_pandas().sort_values("__seq").iterrows():
            if row["__deleted"]:
                sdf = sdf.drop(row["doc_id"], errors="ignore")
            else:
                vals = row.drop(["__seq", "__deleted", "doc_id"])
                for c in vals.index:
                    if c not in sdf.columns:
                        sdf[c] = None
                sdf.loc[row["doc_id"], vals.index] = vals
    finally:
        srv.stop()
    got = sdf.reset_index().sort_values("doc_id").reset_index(drop=True)
    exp = lake.read_table().to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(exp.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_wire_long_poll_get(fx, tmp_path):
    """get(timeout_ms=...) long-polls a drained journal server-side (the
    reference getWithoutAck(timeout)): an expired poll blocks for the
    timeout then returns None; a segment published mid-poll wakes it
    with the new rows."""
    import shutil
    import threading
    import time as _time

    import pyarrow.parquet as pq

    root, _ = fx
    seg_src = os.path.join(root, "segments")
    names = sorted(n for n in os.listdir(seg_src) if n.endswith(".parquet"))
    assert len(names) == 4
    live = tmp_path / "livejournal"
    os.makedirs(live)

    def publish(name: str) -> None:
        # sidecar first, then the parquet atomically (rename within the
        # dir) — the consumer discovers segments by parquet presence
        side = name + ".plan.json"
        if os.path.exists(os.path.join(seg_src, side)):
            shutil.copyfile(os.path.join(seg_src, side), os.path.join(live, side))
        tmp = os.path.join(live, name + ".tmp")
        shutil.copyfile(os.path.join(seg_src, name), tmp)
        os.replace(tmp, os.path.join(live, name))

    for n in names[:3]:
        publish(n)

    srv = ConsumerServer(str(live), str(tmp_path / "state"))
    srv.start()
    try:
        c = WireConsumer(srv.host, srv.port, client_id="lp")
        c.subscribe()
        _drain(c)
        # expired long-poll: blocks for the timeout, then empty
        t0 = _time.monotonic()
        assert c.get_without_ack(500, timeout_ms=300) is None
        assert _time.monotonic() - t0 >= 0.28

        th = threading.Thread(target=lambda: (_time.sleep(0.5), publish(names[3])))
        th.start()
        t0 = _time.monotonic()
        got = c.get_without_ack(10_000, timeout_ms=30_000)
        elapsed = _time.monotonic() - t0
        th.join()
        assert got is not None, "long-poll missed the mid-poll publish"
        bid, t = got
        assert t.num_rows == pq.read_metadata(os.path.join(seg_src, names[3])).num_rows
        assert elapsed >= 0.45  # woke on arrival, not instantly
        c.ack(bid)
        assert c.get_without_ack(10) is None  # immediate mode still empty-fast
        c.close()
    finally:
        srv.stop()


def test_wire_changes_column_pruning(ray_session, fx, tmp_path):
    """columns= on the changes RPC prunes the server read AND the wire
    payload; values match the full feed projected."""
    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.fixtures.generator import generate_lake
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake

    root, _ = fx
    spec = EventLogSpec(seed=43, n_initial_docs=100, n_events=800, n_segments=4)
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    seg_dir = os.path.join(root, "segments")
    paths = sorted(os.path.join(seg_dir, f) for f in os.listdir(seg_dir) if f.endswith(".parquet"))
    replay(lake, paths, ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta"))

    srv = ConsumerServer(seg_dir, str(tmp_path / "state"), lake_dir=str(tmp_path / "lake"))
    srv.start()
    try:
        with WireConsumer(srv.host, srv.port) as wire:
            slim, to1 = wire.changes(0, columns=["n_tok"])
            full, to2 = wire.changes(0)
            assert to1 == to2
            assert sorted(slim.column_names) == ["__deleted", "__seq", "doc_id", "n_tok"]
            keep = sorted(slim.column_names)
            order = [("doc_id", "ascending"), ("__seq", "ascending")]
            assert slim.select(keep).sort_by(order).equals(full.select(keep).sort_by(order))
            assert len(slim.to_pandas().to_json()) < len(full.to_pandas().to_json())
            with pytest.raises(RuntimeError, match="not in the"):
                wire.changes(0, columns=["nope"])
    finally:
        srv.stop()


def test_stats_not_blocked_by_long_poll(fx, server):
    """REGRESSION (review finding): the admin stats read must not
    serialize behind a session lock held by a long-polling get — busy
    sessions answer from the durable meta snapshot."""
    import threading
    import time

    c = WireConsumer(server.host, server.port, client_id="lp2", timeout=30)
    c.subscribe()
    _drain(c)
    th = threading.Thread(target=lambda: c.get_without_ack(100, timeout_ms=5000))
    th.start()
    time.sleep(0.4)  # the drained long-poll now holds lp2's session lock
    admin = WireConsumer(server.host, server.port, client_id="adm")
    t0 = time.monotonic()
    st = admin.stats(of="lp2")
    elapsed = time.monotonic() - t0
    th.join()
    assert elapsed < 2.0, f"stats blocked {elapsed:.1f}s behind the long-poll"
    (row,) = st["clients"]
    assert row["attached"] is True
    assert row["cursor"] == row["delivered"]  # drained durable snapshot
    admin.close()
    c.close()


def test_wire_auth_handshake(fx, tmp_path):
    """MySQL-style scramble auth (SecurityUtil.java:28-51 /
    ClientAuthenticationHandler.java:40-78 analog) over a real socket:
    good credentials drain normally; bad credentials are rejected AND
    the connection is closed; a credential-less client gets a clean
    AuthError; an unauthenticated session may issue nothing but auth.
    The plaintext never crosses the wire (only the XOR token)."""
    import socket
    import struct

    from clever_canal_ray.server import AuthError, scramble_gen_pass

    root, total = fx
    srv = ConsumerServer(
        os.path.join(root, "segments"),
        str(tmp_path / "state_auth"),
        users={"reader": scramble_gen_pass("s3cret")},
    )
    srv.start()
    try:
        # good credentials: full drain works
        c = WireConsumer(
            srv.host, srv.port, client_id="a1", username="reader", password="s3cret"
        )
        c.subscribe()
        got = _drain(c)
        assert sum(t.num_rows for _, t in got) == total
        c.close()

        # wrong password: rejected, socket closed by the server
        with pytest.raises((AuthError, ConnectionError)):
            WireConsumer(
                srv.host, srv.port, client_id="a2", username="reader", password="nope"
            )
        # unknown user
        with pytest.raises((AuthError, ConnectionError)):
            WireConsumer(
                srv.host, srv.port, client_id="a3", username="ghost", password="s3cret"
            )
        # credential-less client: clean, informative failure
        c2 = WireConsumer(srv.host, srv.port, client_id="a4")
        with pytest.raises(AuthError, match="requires authentication"):
            c2.ping()
        c2.close()

        # raw socket probing: any pre-auth command is refused and the
        # server hangs up (fail closed)
        s = socket.create_connection((srv.host, srv.port), timeout=10)
        hs = json.loads(_raw_frame(s))
        assert hs["auth_required"] and len(bytes.fromhex(hs["seed"])) == 8
        payload = json.dumps({"cmd": "get", "batch_size": 10}).encode()
        s.sendall(struct.pack(">I", len(payload)) + payload)
        resp = json.loads(_raw_frame(s))
        assert resp["ok"] is False and resp["error"] == "AuthError"
        assert s.recv(1) == b""  # server closed the connection
        s.close()
    finally:
        srv.stop()


def _raw_frame(s):
    import struct

    head = b""
    while len(head) < 4:
        head += s.recv(4 - len(head))
    (n,) = struct.unpack(">I", head)
    buf = b""
    while len(buf) < n:
        buf += s.recv(n - len(buf))
    return buf


def test_wire_auth_seed_is_per_connection(fx, tmp_path):
    """A replayed token from one connection must not authenticate a new
    connection (fresh random seed each time — replay resistance)."""
    import socket
    import struct

    from clever_canal_ray.server import scramble_gen_pass, _scramble_token

    root, _ = fx
    srv = ConsumerServer(
        os.path.join(root, "segments"),
        str(tmp_path / "state_auth2"),
        users={"reader": scramble_gen_pass("pw")},
    )
    srv.start()
    try:
        s1 = socket.create_connection((srv.host, srv.port), timeout=10)
        seed1 = bytes.fromhex(json.loads(_raw_frame(s1))["seed"])
        token1 = _scramble_token("pw", seed1)
        s2 = socket.create_connection((srv.host, srv.port), timeout=10)
        seed2 = bytes.fromhex(json.loads(_raw_frame(s2))["seed"])
        assert seed1 != seed2
        # replay s1's token on s2: must be rejected
        payload = json.dumps(
            {"cmd": "auth", "username": "reader", "token": token1.hex()}
        ).encode()
        s2.sendall(struct.pack(">I", len(payload)) + payload)
        resp = json.loads(_raw_frame(s2))
        assert resp["ok"] is False
        s1.close()
        s2.close()
    finally:
        srv.stop()


def test_cluster_consumer_failover_mid_drain(fx, tmp_path):
    """ClusterCanalConnector analog: two servers share the journal and
    state_dir (the HA pair's common meta store); the primary is KILLED
    mid-drain and the drain completes exactly-once against the standby
    — every event delivered exactly once by position, the un-acked
    in-flight batch re-delivered after failover."""
    from clever_canal_ray.server import ClusterWireConsumer

    root, total = fx
    state = str(tmp_path / "state_ha")
    seg = os.path.join(root, "segments")
    primary = ConsumerServer(seg, state)
    standby = ConsumerServer(seg, state)
    primary.start()
    standby.start()
    try:
        c = ClusterWireConsumer(
            [(primary.host, primary.port), (standby.host, standby.port)],
            client_id="ha1",
            retries=4,
            retry_backoff=0.05,
        )
        c.subscribe()
        seen: list[tuple] = []  # (segment_id, offset) of every ACKED row
        killed = False
        while True:
            got = c.get_without_ack(150)
            if got is None:
                break
            bid, t = got
            if not killed and seen:
                # kill the primary AFTER this batch was delivered but
                # BEFORE it is acked: the in-flight batch must be
                # rolled back and re-delivered by the standby (batch
                # BOUNDARIES may differ — the standby's decode cache is
                # cold — but the STREAM must restart at the same
                # position, and no row may be lost or doubled)
                first_pos = (t["segment_id"][0].as_py(), t["offset"][0].as_py())
                primary.stop()
                killed = True
                got2 = c.get_without_ack(150)
                assert got2 is not None
                bid2, t2 = got2
                assert (
                    t2["segment_id"][0].as_py(),
                    t2["offset"][0].as_py(),
                ) == first_pos  # re-delivery resumes at the un-acked cursor
                assert c.failovers >= 1
                bid, t = bid2, t2
            seen.extend(zip(t["segment_id"].to_pylist(), t["offset"].to_pylist()))
            c.ack(bid)
        assert killed, "primary was never killed mid-drain"
        # exactly-once at ROW level: every event once, none twice
        assert len(seen) == total
        assert len(set(seen)) == total
        c.close()
    finally:
        try:
            primary.stop()
        except Exception:
            pass
        standby.stop()


def test_cluster_consumer_auth_and_all_down(fx, tmp_path):
    """Failover composes with auth; when every endpoint is down the
    cluster client fails loudly after its retries."""
    from clever_canal_ray.server import (
        ClusterWireConsumer,
        scramble_gen_pass,
    )

    root, total = fx
    state = str(tmp_path / "state_ha2")
    seg = os.path.join(root, "segments")
    users = {"reader": scramble_gen_pass("pw")}
    a = ConsumerServer(seg, state, users=users)
    b = ConsumerServer(seg, state, users=users)
    a.start()
    b.start()
    try:
        c = ClusterWireConsumer(
            [(a.host, a.port), (b.host, b.port)],
            client_id="ha2",
            username="reader",
            password="pw",
            retries=3,
            retry_backoff=0.05,
        )
        c.subscribe()
        got = c.get_without_ack(100)
        assert got is not None
        bid, t = got
        a.stop()  # current node dies with a batch in flight
        got2 = c.get_without_ack(100)
        assert got2 is not None and got2[1].equals(t)
        c.ack(got2[0])
        b.stop()  # now EVERYTHING is down
        with pytest.raises(ConnectionError, match="retries failed|no server endpoint"):
            c.get_without_ack(100)
        c.close()
    finally:
        for s in (a, b):
            try:
                s.stop()
            except Exception:
                pass


def test_credentialed_client_against_open_server_fails_fast(fx, server):
    """A client configured WITH credentials against an auth-DISABLED
    server must fail in ~5s with a pointed AuthError, not hang for the
    full socket timeout waiting for a handshake that never comes."""
    import time as _time

    from clever_canal_ray.server import AuthError

    t0 = _time.monotonic()
    with pytest.raises(AuthError, match="not auth-enabled"):
        WireConsumer(
            server.host, server.port, client_id="x", timeout=30.0,
            username="u", password="p",
        )
    assert _time.monotonic() - t0 < 10.0
