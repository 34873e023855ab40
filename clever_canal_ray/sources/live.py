"""Generic LIVE-source adapter — the S1 seam without MySQL.

The reference's live path is MysqlConnection.dump (parse/driver/.../
MysqlConnection.java:157): hold a cursor against an external change
feed, pull events, hand them to the parser. No MySQL exists in this
environment, so this module provides the GENERIC seam with two concrete
external cursors:

- :class:`SqliteChangeSource` — poll a SQL *outbox/trigger* table
  (``seq INTEGER PRIMARY KEY`` + change columns) with an incremental
  ``WHERE seq > cursor`` read: the classic trigger-based CDC shape.
- :class:`JsonlSocketSource` — drain newline-delimited JSON change
  records from a TCP firehose (the Maxwell/Debezium-wire shape).

Records from either source flow through :class:`SegmentPublisher`,
which frames transactions, assigns (segment_id, offset) positions, and
writes SETTLED journal segments (atomic: plan sidecar first, then a
tmp→rename of the data file) that ``pipelines.replay.follow`` tails
exactly like any other journal — the adapter is upstream of, and
invisible to, the whole replay/lake machinery.

Exactly-once across adapter crashes: the source cursor is committed
INSIDE the published segment's plan sidecar (written before the data
file becomes visible). On restart, :meth:`SegmentPublisher.resume`
recovers ``next segment id`` from the data files present and the
source cursor from the LAST visible segment's plan — so a crash
between publish and any external ack can never double-publish (the
cursor travels with the data) nor lose records (an invisible segment's
records are re-polled). This is the findStartPosition-from-meta
resume rule applied to the adapter itself.

Record shape (a plain dict per change):

``{"op": "I"|"U"|"D", "doc_id": str, "after": {...}|None,
   "before": {...}|None, "txn_id": int (optional), "ts_ms": int
   (optional), "table": str (optional)}``

Records without ``txn_id`` are framed as one transaction per
``publish()`` call; with ``txn_id``, consecutive runs of equal ids
become transactions (commit flag on each run's last event).
"""

from __future__ import annotations

import json
import os
import socket
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from clever_canal_ray.schema import event_schema


class SegmentPublisher:
    """Turn polled change records into settled journal segments."""

    def __init__(
        self,
        seg_dir: str,
        payload_schema: pa.Schema,
        table: str = "lake.live",
        start_segment_id: int = 0,
    ):
        self.seg_dir = seg_dir
        self.payload = payload_schema
        self.table = table
        os.makedirs(seg_dir, exist_ok=True)
        self.next_segment_id = start_segment_id
        self.next_txn_id = 1
        self.resume()

    # -- crash recovery -----------------------------------------------------

    def resume(self):
        """Derive publisher state from the directory: next segment id
        from the data files PRESENT (orphan sidecars from a crashed
        publish are invisible and get overwritten), txn watermark and
        source cursor from the last visible segment's plan."""
        from clever_canal_ray.sources.segments import (
            discover_segments,
            load_segment_plan,
        )

        self.source_cursor = None
        paths = discover_segments(self.seg_dir, missing_ok=True)
        if not paths:
            return self
        last = paths[-1]
        import re

        self.next_segment_id = (
            max(int(re.search(r"segment-(\d+)\.parquet$", p).group(1)) for p in paths)
            + 1
        )
        plan = load_segment_plan(last)
        if plan is not None:
            self.source_cursor = plan.get("source_cursor")
            if plan.get("max_txn") is not None:
                self.next_txn_id = int(plan["max_txn"]) + 1
        else:  # no sidecar: one bounded read of the last file's txn col
            t = pq.read_table(last, columns=["txn_id"])
            if t.num_rows:
                import pyarrow.compute as pc

                self.next_txn_id = int(pc.max(t["txn_id"]).as_py()) + 1
        return self

    # -- publish --------------------------------------------------------------

    def publish(self, records: list[dict], source_cursor=None) -> str | None:
        """Write one settled segment holding ``records`` (None if
        empty). ``source_cursor`` is committed in the plan sidecar —
        the adapter's exactly-once bookmark."""
        if not records:
            return None
        from clever_canal_ray.fixtures.generator import segment_plan_metadata

        seg_id = self.next_segment_id
        n = len(records)
        # --- transaction framing -----------------------------------------
        ext = [r.get("txn_id") for r in records]
        txn_ids = []
        seq_in_txn = []
        commit = [False] * n
        # consecutive runs of equal external txn ids become one txn;
        # all-None ids collapse to a single run = one txn per publish
        cur_ext, cur_txn, seq = object(), None, 0
        for i, e in enumerate(ext):
            if i == 0 or e != cur_ext:
                cur_ext = e
                cur_txn = self.next_txn_id
                self.next_txn_id += 1
                seq = 0
                if i > 0:
                    commit[i - 1] = True
            txn_ids.append(cur_txn)
            seq_in_txn.append(seq)
            seq += 1
        commit[n - 1] = True
        payload_t = pa.struct(list(self.payload))
        now_ms = int(time.time() * 1000)

        def col(name, typ, default=None):
            return pa.array([r.get(name, default) for r in records], typ)

        t = pa.Table.from_arrays(
            [
                pa.array([seg_id] * n, pa.int32()),
                pa.array(list(range(n)), pa.int64()),
                pa.array(txn_ids, pa.int64()),
                pa.array(seq_in_txn, pa.int32()),
                pa.array(commit, pa.bool_()),
                pa.array(
                    [int(r.get("ts_ms", now_ms)) for r in records], pa.timestamp("ms")
                ),
                col("op", pa.string()),
                pa.array([r.get("table", self.table) for r in records], pa.string()),
                col("doc_id", pa.string()),
                pa.array([0] * n, pa.int32()),
                pa.array(
                    [
                        json.dumps(r["ddl"]) if r.get("op") == "DDL" else None
                        for r in records
                    ],
                    pa.string(),
                ),
                pa.array([r.get("before") for r in records], payload_t),
                pa.array([r.get("after") for r in records], payload_t),
            ],
            schema=event_schema(self.payload),
        )
        final = os.path.join(self.seg_dir, f"segment-{seg_id:05d}.parquet")
        plan = json.loads(segment_plan_metadata(t))
        plan["source_cursor"] = source_cursor
        plan["max_txn"] = int(max(txn_ids))
        # commit order: sidecar FIRST (invisible until the data file
        # lands — discover_segments only sees *.parquet), then an
        # atomic tmp→rename so follow()'s settled_prefix never reads a
        # torn footer and the cursor is never visible without its data
        with open(final + ".plan.json", "w") as f:
            f.write(json.dumps(plan, separators=(",", ":")))
        tmp = os.path.join(self.seg_dir, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(t, tmp, use_dictionary=["op", "table", "segment_id"])
        os.replace(tmp, final)
        self.next_segment_id = seg_id + 1
        self.source_cursor = source_cursor
        return final


class SqliteChangeSource:
    """External SQL cursor: an *outbox* table polled incrementally —
    ``SELECT ... WHERE seq > :cursor ORDER BY seq`` (stdlib sqlite3
    stands in for any JDBC-ish source). Expected table columns:
    ``seq INTEGER PRIMARY KEY, op TEXT, doc_id TEXT, before TEXT,
    after TEXT, txn_id INTEGER NULL, ts_ms INTEGER NULL`` (before/after
    as JSON objects or NULL)."""

    def __init__(self, db_path: str, table: str = "changes", cursor=None):
        self.db_path = db_path
        self.table = table
        self.cursor = -1 if cursor is None else int(cursor)

    def poll(self, limit: int = 10_000) -> list[dict]:
        import sqlite3

        con = sqlite3.connect(self.db_path)
        try:
            rows = con.execute(
                f"SELECT seq, op, doc_id, before, after, txn_id, ts_ms "
                f"FROM {self.table} WHERE seq > ? ORDER BY seq LIMIT ?",
                (self.cursor, limit),
            ).fetchall()
        finally:
            con.close()
        out = []
        for seq, op, doc_id, before, after, txn_id, ts_ms in rows:
            # _seq rides along so pump() can commit the cursor of the
            # last record actually published (txn carry may hold back a
            # suffix); publish() ignores unknown keys
            rec = {"op": op, "doc_id": doc_id, "_seq": int(seq)}
            if before is not None:
                rec["before"] = json.loads(before)
            if after is not None:
                rec["after"] = json.loads(after)
            if txn_id is not None:
                rec["txn_id"] = int(txn_id)
            if ts_ms is not None:
                rec["ts_ms"] = int(ts_ms)
            out.append(rec)
            self.cursor = int(seq)
        return out


class JsonlSocketSource:
    """External firehose cursor: newline-delimited JSON change records
    over TCP. The socket itself is the cursor (records are consumed by
    reading); exactly-once across ADAPTER restarts therefore needs a
    re-playable upstream — which :func:`pump` gets by publishing each
    poll's records before polling again (an unpublished tail dies with
    the process and is simply re-sent by a reconnecting upstream, the
    at-least-once + positional-dedup contract every Canal MQ sink
    uses). ``poll`` drains complete lines currently buffered."""

    def __init__(self, host: str, port: int, connect_timeout: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=connect_timeout)
        self._sock.settimeout(0.05)
        self._buf = b""
        self._eof = False
        self.cursor = 0  # lines consumed (observability only)

    def poll(self, limit: int = 10_000) -> list[dict]:
        while not self._eof:
            try:
                chunk = self._sock.recv(65536)
            except (TimeoutError, socket.timeout):
                break
            if not chunk:
                self._eof = True
                break
            self._buf += chunk
            if self._buf.count(b"\n") >= limit:
                break
        out = []
        while b"\n" in self._buf and len(out) < limit:
            line, self._buf = self._buf.split(b"\n", 1)
            if line.strip():
                out.append(json.loads(line))
                self.cursor += 1
        return out

    @property
    def exhausted(self) -> bool:
        return self._eof and b"\n" not in self._buf

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:  # pragma: no cover
            pass


def _split_trailing_txn(records: list[dict]) -> tuple[list[dict], list[dict]]:
    """Split off the trailing maximal run of records sharing the LAST
    record's external txn_id (None ids never split — they frame as one
    txn per publish by construction)."""
    last = records[-1].get("txn_id")
    if last is None:
        return records, []
    i = len(records)
    while i > 0 and records[i - 1].get("txn_id") == last:
        i -= 1
    return records[:i], records[i:]


def pump(
    source,
    publisher: SegmentPublisher,
    poll_interval: float = 0.05,
    max_rounds: int | None = None,
    idle_rounds_to_stop: int | None = None,
    max_records_per_segment: int = 50_000,
    carry_flush_idle_rounds: int = 3,
) -> int:
    """The adapter daemon: poll the external cursor, publish settled
    segments, repeat — the EventParser dump-loop analog. Returns the
    number of records published. Run it next to (or in a thread beside)
    ``pipelines.replay.follow`` on the same directory.

    Transaction-boundary rule: a poll (or its ``limit``) can cut an
    EXTERNAL transaction mid-run; committing the prefix would publish a
    half-transaction the replay planner then applies atomically —
    wrongly. The trailing run of records sharing the newest external
    txn_id is therefore HELD BACK until one of:

    - a later poll shows a different txn_id after it (provably
      complete);
    - ``carry_flush_idle_rounds`` CONSECUTIVE empty polls (quiescence —
      several rounds, not one, so a merely SLOW upstream mid-txn
      doesn't get a half-commit; an outbox writes each txn's rows in
      one SQL transaction, so sustained silence means the run landed);
    - the source is exhausted (EOF) or an idle-stop fires (same
      quiescence argument).

    A ``max_rounds`` stop does NOT flush the carry: a replayable source
    (``_seq``-stamped outbox) simply re-polls it on resume — stranding
    is safe, a premature commit is not.

    Cursor rule: each published segment's sidecar carries the cursor of
    its own LAST record (``_seq``), so held-back records are never
    skipped on resume; sources without ``_seq`` keep the previous
    bookmark while a carry is pending (at-least-once) instead of
    clobbering it."""
    published = 0
    rounds = 0
    idle = 0
    carry: list[dict] = []

    def flush(records: list[dict]) -> None:
        nonlocal published
        if records:
            # commit the cursor of the last record actually PUBLISHED —
            # the source's own cursor may already cover held-back carry
            # records, and skipping those on resume would lose data
            cur = records[-1].get("_seq")
            if cur is None:
                cur = (
                    getattr(source, "cursor", None)
                    if not carry
                    # carry pending and no per-record seqs: keep the old
                    # bookmark (resume re-polls, at-least-once) rather
                    # than clobbering it with None
                    else publisher.source_cursor
                )
            publisher.publish(records, source_cursor=cur)
            published += len(records)

    while True:
        fresh = source.poll(limit=max_records_per_segment)
        if fresh:
            idle = 0
            records = carry + fresh
            ready, carry = _split_trailing_txn(records)
            flush(ready)
        else:
            idle += 1
            if carry and idle >= carry_flush_idle_rounds:
                # sustained quiescence: the held-back run is complete.
                # Clear carry FIRST so flush() sees no pending hold-back
                # and records the source's exact (now-complete) cursor
                # for _seq-less sources.
                done, carry = carry, []
                flush(done)
        rounds += 1
        hit_max = max_rounds is not None and rounds >= max_rounds
        exhausted = getattr(source, "exhausted", False)
        idle_stop = idle_rounds_to_stop is not None and idle >= idle_rounds_to_stop
        if hit_max or exhausted or idle_stop:
            # flush the tail only when quiescence is PROVEN (EOF, or
            # enough consecutive empty polls) — an idle_rounds_to_stop
            # below carry_flush_idle_rounds must not become a back door
            # for half-transaction commits; stranded carry is re-polled
            # on resume by any replayable source
            if carry and (exhausted or idle >= carry_flush_idle_rounds):
                done, carry = carry, []
                flush(done)
            return published
        time.sleep(poll_interval)
