"""Live-source adapter (sources/live.py — the MysqlConnection.dump S1
seam without MySQL): an external cursor (sqlite outbox table / JSONL
TCP firehose) is polled into settled journal segments while
``pipelines.replay.follow`` tails the same directory — end to end from
live-written changes to lake convergence, including adapter
crash/resume exactly-once."""

import json
import os
import sqlite3
import threading
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.pipelines.replay import follow, replay
from clever_canal_ray.schema import lake_schema
from clever_canal_ray.sources.live import (
    JsonlSocketSource,
    SegmentPublisher,
    SqliteChangeSource,
    pump,
)
from clever_canal_ray.sources.segments import discover_segments
from clever_canal_ray.state.manifest import Lake

BASE = {"op": "base_schema", "fields": [["doc_id", "string"], ["val", "string"]]}
PAYLOAD = lake_schema([BASE])


def _mk_lake(tmp_path, name="lake"):
    tbl = pa.Table.from_pylist(
        [{"doc_id": f"seed{i}", "val": f"v{i}"} for i in range(5)],
        schema=pa.schema(list(PAYLOAD)),
    )
    return Lake.create(str(tmp_path / name), tbl, num_partitions=2, ddl_journal=[BASE])


def _serial_apply(state: dict, recs: list[dict]) -> dict:
    for r in recs:
        if r["op"] in ("I", "U"):
            state[r["doc_id"]] = r["after"]["val"]
        elif r["op"] == "D":
            state.pop(r["doc_id"], None)
    return state


def _lake_state(lake) -> dict:
    t = lake.read_table()
    return dict(zip(t["doc_id"].to_pylist(), t["val"].to_pylist()))


def _mk_outbox(path):
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE changes (seq INTEGER PRIMARY KEY AUTOINCREMENT, op TEXT, "
        "doc_id TEXT, before TEXT, after TEXT, txn_id INTEGER, ts_ms INTEGER)"
    )
    con.commit()
    con.close()


def _insert(path, recs, txn_id=None):
    con = sqlite3.connect(path)
    for r in recs:
        con.execute(
            "INSERT INTO changes (op, doc_id, before, after, txn_id, ts_ms) "
            "VALUES (?,?,?,?,?,?)",
            (
                r["op"],
                r["doc_id"],
                json.dumps(r["before"]) if r.get("before") else None,
                json.dumps(r["after"]) if r.get("after") else None,
                r.get("txn_id", txn_id),
                r.get("ts_ms", 1_700_000_000_000),
            ),
        )
    con.commit()
    con.close()


def _changes(n, start=0, prefix="live"):
    out = []
    for i in range(start, start + n):
        d = f"{prefix}{i % max(n // 2, 1)}"
        out.append({"op": "U" if i % 3 else "I", "doc_id": d,
                    "after": {"doc_id": d, "val": f"x{i}"}})
        if i % 7 == 3:
            out.append({"op": "D", "doc_id": d})
    return out


def test_sqlite_outbox_live_to_lake(ray_session, tmp_path):
    """LIVE e2e: a writer thread keeps inserting into the sqlite outbox
    while the adapter pumps segments and follow() tails the directory —
    the lake converges to the serial application of every change."""
    db = str(tmp_path / "outbox.db")
    seg = str(tmp_path / "segments")
    _mk_outbox(db)
    lake = _mk_lake(tmp_path)
    all_recs: list[dict] = []

    def writer():
        for burst in range(6):
            recs = _changes(12, start=burst * 12)
            all_recs.extend(recs)
            _insert(db, recs, txn_id=burst)
            time.sleep(0.05)

    src = SqliteChangeSource(db)
    pub = SegmentPublisher(seg, PAYLOAD)

    def adapter():
        pump(src, pub, poll_interval=0.03, idle_rounds_to_stop=25)

    wt = threading.Thread(target=writer)
    at = threading.Thread(target=adapter)
    wt.start()
    at.start()
    m = follow(
        lake,
        seg,
        ReplayConfig(num_partitions=2, segments_per_batch=4, sink_mode="delta"),
        poll_interval=0.05,
        idle_rounds_to_stop=30,
    )
    wt.join()
    at.join()
    # one more catch-up pass in case follow idled out before the tail
    m = follow(
        lake, seg, ReplayConfig(num_partitions=2, segments_per_batch=4, sink_mode="delta"),
        poll_interval=0.02, idle_rounds_to_stop=3,
    )
    expected = _serial_apply({f"seed{i}": f"v{i}" for i in range(5)}, all_recs)
    assert _lake_state(lake) == expected
    assert m.hwm > (-1, -1)
    # every outbox row made it into exactly one journal position
    n_events = sum(pq.read_metadata(p).num_rows for p in discover_segments(seg))
    assert n_events == len(all_recs)


def test_adapter_crash_resume_exactly_once(ray_session, tmp_path):
    """Kill the adapter between publishes; a NEW publisher+source pair
    recovered from the directory (cursor rides in the plan sidecar)
    neither re-publishes nor drops records."""
    db = str(tmp_path / "outbox.db")
    seg = str(tmp_path / "segments")
    _mk_outbox(db)
    recs1 = _changes(10, prefix="a")
    _insert(db, recs1)
    src = SqliteChangeSource(db)
    pub = SegmentPublisher(seg, PAYLOAD)
    pump(src, pub, max_rounds=1)
    assert pub.source_cursor == len(recs1)

    # "crash": throw both objects away; resume purely from disk
    pub2 = SegmentPublisher(seg, PAYLOAD)
    assert pub2.source_cursor == len(recs1)
    assert pub2.next_segment_id == 1
    src2 = SqliteChangeSource(db, cursor=pub2.source_cursor)
    recs2 = _changes(8, start=10, prefix="b")
    _insert(db, recs2)
    pump(src2, pub2, max_rounds=1)

    paths = discover_segments(seg)
    assert len(paths) == 2
    n_events = sum(pq.read_metadata(p).num_rows for p in paths)
    assert n_events == len(recs1) + len(recs2)  # no dup, no loss

    lake = _mk_lake(tmp_path)
    replay(lake, paths, ReplayConfig(num_partitions=2, segments_per_batch=2))
    expected = _serial_apply(
        {f"seed{i}": f"v{i}" for i in range(5)}, recs1 + recs2
    )
    assert _lake_state(lake) == expected


def test_orphan_sidecar_is_harmless(ray_session, tmp_path):
    """A crash AFTER the plan sidecar but BEFORE the data-file rename
    leaves an orphan sidecar: resume must ignore it (cursor comes from
    the last VISIBLE segment) and the republished segment overwrites
    the orphan."""
    seg = str(tmp_path / "segments")
    pub = SegmentPublisher(seg, PAYLOAD)
    pub.publish(_changes(5, prefix="a"), source_cursor=5)
    # simulate the crash window for the NEXT segment: sidecar only
    orphan = os.path.join(seg, "segment-00001.parquet.plan.json")
    with open(orphan, "w") as f:
        f.write(json.dumps({"source_cursor": 99, "max_txn": 99}))
    pub2 = SegmentPublisher(seg, PAYLOAD)
    assert pub2.source_cursor == 5  # orphan ignored
    assert pub2.next_segment_id == 1
    pub2.publish(_changes(3, start=5, prefix="b"), source_cursor=8)
    # the republished segment replaced the orphan's sidecar
    with open(orphan) as f:
        assert json.load(f)["source_cursor"] == 8


def test_jsonl_socket_live_to_lake(ray_session, tmp_path):
    """LIVE e2e over TCP: a firehose server emits JSONL change records;
    the adapter drains them into segments; follow() converges the lake."""
    import socket as _socket

    seg = str(tmp_path / "segments")
    lake = _mk_lake(tmp_path)
    recs = _changes(40, prefix="s")
    srv = _socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    host, port = srv.getsockname()

    def firehose():
        conn, _ = srv.accept()
        for i, r in enumerate(recs):
            conn.sendall((json.dumps(r) + "\n").encode())
            if i % 10 == 9:
                time.sleep(0.05)  # bursts, like a real feed
        conn.close()

    ft = threading.Thread(target=firehose)
    ft.start()
    src = JsonlSocketSource(host, port)
    pub = SegmentPublisher(seg, PAYLOAD)

    def adapter():
        pump(src, pub, poll_interval=0.02, idle_rounds_to_stop=50)

    at = threading.Thread(target=adapter)
    at.start()
    follow(
        lake,
        seg,
        ReplayConfig(num_partitions=2, segments_per_batch=4, sink_mode="delta"),
        poll_interval=0.05,
        idle_rounds_to_stop=30,
    )
    ft.join()
    at.join()
    follow(
        lake, seg, ReplayConfig(num_partitions=2, segments_per_batch=4, sink_mode="delta"),
        poll_interval=0.02, idle_rounds_to_stop=3,
    )
    src.close()
    srv.close()
    expected = _serial_apply({f"seed{i}": f"v{i}" for i in range(5)}, recs)
    assert _lake_state(lake) == expected
    n_events = sum(pq.read_metadata(p).num_rows for p in discover_segments(seg))
    assert n_events == len(recs)


def test_publisher_txn_framing(tmp_path):
    """External txn ids become journal transactions: consecutive runs
    share a txn_id; commit flags land on each run's last event; all-None
    ids collapse to one txn per publish."""
    seg = str(tmp_path / "segments")
    pub = SegmentPublisher(seg, PAYLOAD)
    recs = [
        {"op": "I", "doc_id": "a", "after": {"doc_id": "a", "val": "1"}, "txn_id": 7},
        {"op": "U", "doc_id": "a", "after": {"doc_id": "a", "val": "2"}, "txn_id": 7},
        {"op": "I", "doc_id": "b", "after": {"doc_id": "b", "val": "3"}, "txn_id": 8},
    ]
    p = pub.publish(recs, source_cursor=3)
    t = pq.read_table(p)
    assert t["txn_id"].to_pylist() == [1, 1, 2]
    assert t["txn_commit"].to_pylist() == [False, True, True]
    assert t["seq_in_txn"].to_pylist() == [0, 1, 0]
    p2 = pub.publish(
        [{"op": "I", "doc_id": "c", "after": {"doc_id": "c", "val": "4"}},
         {"op": "I", "doc_id": "d", "after": {"doc_id": "d", "val": "5"}}],
        source_cursor=5,
    )
    t2 = pq.read_table(p2)
    assert t2["txn_id"].to_pylist() == [3, 3]
    assert t2["txn_commit"].to_pylist() == [False, True]


def test_cli_live_adapter_and_metrics(ray_session, tmp_path, capsys):
    """CLI wiring: `live-adapter --sqlite` publishes settled segments
    from the outbox (payload via --fields), and `metrics --port` scrapes
    a serving endpoint's prometheus families."""
    from clever_canal_ray.__main__ import main as cli_main
    from clever_canal_ray.server import ConsumerServer

    db = str(tmp_path / "outbox.db")
    seg = str(tmp_path / "segments")
    _mk_outbox(db)
    recs = _changes(12, prefix="cli")
    _insert(db, recs)
    rc = cli_main(
        [
            "live-adapter",
            "--segments", seg,
            "--sqlite", db,
            "--fields", "doc_id:string,val:string",
            "--poll-interval", "0.01",
            "--idle-rounds", "2",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["published"] == len(recs) and out["next_segment"] == 1
    lake = _mk_lake(tmp_path)
    replay(lake, discover_segments(seg), ReplayConfig(num_partitions=2))
    assert _lake_state(lake) == _serial_apply(
        {f"seed{i}": f"v{i}" for i in range(5)}, recs
    )
    # resume is a no-op (cursor rode in the plan sidecar)
    rc = cli_main(
        [
            "live-adapter", "--segments", seg, "--sqlite", db,
            "--fields", "doc_id:string,val:string",
            "--poll-interval", "0.01", "--idle-rounds", "2",
        ]
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["published"] == 0

    srv = ConsumerServer(seg, str(tmp_path / "state"), lake_dir=lake.dir)
    srv.start()
    try:
        assert cli_main(["scrape-metrics", "--port", str(srv.port)]) == 0
        text = capsys.readouterr().out
        assert "# TYPE canal_instance_put_rows counter" in text
        assert "canal_instance_received_binlog_bytes" in text
    finally:
        srv.stop()


def test_pump_never_commits_partial_external_txn(ray_session, tmp_path):
    """REGRESSION (round-5 review): a poll limit that cuts an external
    transaction mid-run must NOT publish the prefix as a committed txn
    — the trailing run is held back until a later poll proves it
    complete (different txn_id after it) or the source quiesces."""
    db = str(tmp_path / "outbox.db")
    seg = str(tmp_path / "segments")
    _mk_outbox(db)
    # txn 1: rows 1-4, txn 2: rows 5-6; poll limit 3 cuts txn 1 at row 3
    recs = [
        {"op": "I", "doc_id": f"t1_{i}", "after": {"doc_id": f"t1_{i}", "val": "a"},
         "txn_id": 1}
        for i in range(4)
    ] + [
        {"op": "I", "doc_id": f"t2_{i}", "after": {"doc_id": f"t2_{i}", "val": "b"},
         "txn_id": 2}
        for i in range(2)
    ]
    _insert(db, recs)
    src = SqliteChangeSource(db)
    pub = SegmentPublisher(seg, PAYLOAD)
    # idle_rounds_to_stop >= carry_flush_idle_rounds so quiescence is
    # PROVEN before the stop — a lower stop threshold strands the tail
    # for the resume to re-poll instead of flushing it
    pump(src, pub, poll_interval=0.0, idle_rounds_to_stop=4,
         max_records_per_segment=3)
    paths = discover_segments(seg)
    tables = [pq.read_table(p) for p in paths]
    # every internal txn is fully contained in one segment with its
    # commit on its true last row — no partial prefix was committed
    seen_rows = 0
    for t in tables:
        txn = t["txn_id"].to_pylist()
        commit = t["txn_commit"].to_pylist()
        for i in range(len(txn)):
            is_last_of_txn = i + 1 == len(txn) or txn[i + 1] != txn[i]
            assert commit[i] == is_last_of_txn
        seen_rows += t.num_rows
    assert seen_rows == len(recs)
    # external txn 1 (4 rows) maps to ONE internal txn id
    allt = pq.read_table(paths[0])
    first_txn_rows = [d for d, x in zip(allt["doc_id"].to_pylist(), allt["txn_id"].to_pylist()) if x == allt["txn_id"][0].as_py()]
    assert len(first_txn_rows) in (4, 6)  # txn-1 run never split
    # and the committed cursor never covered held-back rows: a resumed
    # adapter republishes nothing, loses nothing
    pub2 = SegmentPublisher(seg, PAYLOAD)
    src2 = SqliteChangeSource(db, cursor=pub2.source_cursor)
    assert pump(src2, pub2, max_rounds=2, poll_interval=0.0) == 0


def test_pump_cursor_excludes_held_back_records(ray_session, tmp_path):
    """If the adapter crashes after publishing the ready prefix while a
    txn run is held back, resume must re-poll the held-back rows (the
    committed cursor is the last PUBLISHED record's seq)."""
    db = str(tmp_path / "outbox.db")
    seg = str(tmp_path / "segments")
    _mk_outbox(db)
    recs = [
        {"op": "I", "doc_id": "a1", "after": {"doc_id": "a1", "val": "1"}, "txn_id": 1},
        {"op": "I", "doc_id": "a2", "after": {"doc_id": "a2", "val": "2"}, "txn_id": 1},
        {"op": "I", "doc_id": "b1", "after": {"doc_id": "b1", "val": "3"}, "txn_id": 2},
    ]
    _insert(db, recs)
    src = SqliteChangeSource(db)
    pub = SegmentPublisher(seg, PAYLOAD)
    # a max_rounds stop STRANDS the held-back carry (publishing it
    # could commit a half-transaction); only the ready prefix lands,
    # its sidecar carrying the cursor of its own last record
    pump(src, pub, max_rounds=1, poll_interval=0.0)
    paths = discover_segments(seg)
    assert len(paths) == 1
    from clever_canal_ray.sources.segments import load_segment_plan

    assert load_segment_plan(paths[0])["source_cursor"] == 2
    assert pub.source_cursor == 2  # last PUBLISHED seq, not the poll cursor (3)
    # resume (fresh adapter, as after a crash): re-polls exactly the
    # stranded carry, once
    pub2 = SegmentPublisher(seg, PAYLOAD)
    assert pub2.source_cursor == 2
    src2 = SqliteChangeSource(db, cursor=pub2.source_cursor)
    n = pump(src2, pub2, poll_interval=0.0, idle_rounds_to_stop=4)
    assert n == 1
    total = sum(pq.read_metadata(p).num_rows for p in discover_segments(seg))
    assert total == 3


def test_pump_slow_source_does_not_half_commit(ray_session, tmp_path):
    """REGRESSION (round-5 follow-up review): ONE empty poll (a merely
    slow upstream mid-transaction) must NOT flush the held-back run —
    only sustained quiescence (carry_flush_idle_rounds) may."""
    seg = str(tmp_path / "segments")

    from tests.util import ScriptedSource as Scripted

    t9a = [{"op": "I", "doc_id": f"x{i}", "after": {"doc_id": f"x{i}", "val": "a"},
            "txn_id": 9} for i in range(2)]
    t9b = [{"op": "I", "doc_id": "x2", "after": {"doc_id": "x2", "val": "a"},
            "txn_id": 9}]
    t10 = [{"op": "I", "doc_id": "y0", "after": {"doc_id": "y0", "val": "b"},
            "txn_id": 10}]
    # poll sequence: first half of txn 9; ONE stall; rest of txn 9 + txn 10
    src = Scripted([t9a, [], t9b + t10])
    pub = SegmentPublisher(seg, PAYLOAD)
    pump(src, pub, poll_interval=0.0, idle_rounds_to_stop=4)
    tables = [pq.read_table(p) for p in discover_segments(seg)]
    rows = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    txn = rows["txn_id"].to_pylist()
    # ALL of external txn 9 shares ONE internal txn id (never split by
    # the stall), and its commit sits on its true last row
    t9_ids = {x for x, d in zip(txn, rows["doc_id"].to_pylist()) if d.startswith("x")}
    assert len(t9_ids) == 1, txn
    commit = rows["txn_commit"].to_pylist()
    for i in range(len(txn)):
        assert commit[i] == (i + 1 == len(txn) or txn[i + 1] != txn[i])
