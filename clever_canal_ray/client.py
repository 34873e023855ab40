"""ChangeConsumer — the CanalServer/CanalConnector consumer protocol.

Mirrors the reference's client-facing surface (SURVEY.md §3.1 consumer
loop, CanalServerWithEmbedded.java:202-400; client/CanalConnector.java):

- ``subscribe()``      — register; cursor starts at the stream head or
                         the persisted position (MetaManager.subscribe,
                         CanalServerWithEmbedded.java:136-158)
- ``get_without_ack(batch_size)`` — cut the NEXT batch of change
  events after the delivered cursor; successive gets stream successive
  batches while earlier ones stay un-acked in the FIFO ledger
  (CanalServerWithEmbedded.java:279-292 get/ack pipelining); returns
  ``(batch_id, pyarrow.Table)``. A transaction longer than
  ``batch_size`` grows the cut window to the next txn boundary, so a
  batch may exceed batch_size by at most one transaction.
- ``ack(batch_id)``    — FIFO-enforced (must be the oldest in-flight
  batch, MemoryMetaManager.removePositionRange:236-247); advances the
  durable cursor to the batch's last *transaction boundary*
  (PositionRange.ack semantics)
- ``rollback()``       — drop all in-flight batches and reset the
  delivered cursor to the acked cursor; everything un-acked is
  re-delivered (MemoryEventStoreWithBuffer.rollback:572-582)

The cursor + in-flight ledger persist to ``<state>/meta.json`` on
every mutation — the FileMixedMetaManager ``meta.dat.json`` analog
(FileMixedMetaManager.java:35-299), so a restarted consumer resumes
exactly where it acked. Batches are cut at transaction boundaries:
events of an incomplete trailing txn stay in the stream (F9/T1 rules).

Filters (F1-F6) apply server-side via a ReplayConfig, matching the
subscribe-filter-replace semantics (a new subscribe(filter) swaps the
active filter, AbstractCanalInstance.subscribeChange:69-95).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pds
import pyarrow.parquet as pq

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.schema import pack_position
from clever_canal_ray.sources.segments import discover_segments
from clever_canal_ray.stages.combine import filter_mask


class FifoAckError(Exception):
    """Acked batch is not the oldest in-flight one (FIFO rule, D2)."""


class ChangeConsumer:
    def __init__(
        self,
        journal_dirs: list[str] | str,
        state_dir: str,
        client_id: str = "1001",
        cfg: Optional[ReplayConfig] = None,
    ):
        self.dirs = [journal_dirs] if isinstance(journal_dirs, str) else list(journal_dirs)
        self.state_dir = state_dir
        self.client_id = client_id
        self.cfg = cfg or ReplayConfig()
        os.makedirs(state_dir, exist_ok=True)
        # pluggable persistence (FileMixedMetaManager / zk-meta analog):
        # a state_dir stamped by ObjectStoreStorage.format_state keeps
        # the cursor on object-store semantics — each mutation is one
        # atomic full-object PUT (same cost shape as the reference's
        # per-ack zk write); POSIX (default) is tmp+rename as before
        from clever_canal_ray.state.storage import storage_for_state

        self.storage = storage_for_state(state_dir)
        self._meta_path = os.path.join(state_dir, f"meta-{client_id}.json")
        self._cursor: tuple[int, int] = (-1, -1)  # durable acked position
        self._delivered: tuple[int, int] = (-1, -1)  # position after last get
        self._inflight: list[dict] = []  # [{"batch_id", "start", "ack"}]
        self._next_batch_id = 0
        self._subscribed = False
        # decode cache: rows already read past the delivered cursor
        # (each get reads ~2x its window for txn-boundary headroom; the
        # overflow used to be discarded and re-decoded next get). Pure
        # in-memory — a restart rebuilds it from the segments, the
        # durable cursor/ledger are untouched. Valid only for the
        # segment set it was read from (_pending_paths).
        self._pending: pa.Table | None = None
        self._pending_paths: tuple = ()
        # delivery counters (prometheus get/ack/empty families)
        self._delivered_rows = 0
        self._acked_rows = 0
        self._empty_gets = 0
        self._last_delivered_ts_ms = 0
        self._last_acked_ts_ms = 0
        self._load()

    # -- persistence (meta.dat.json analog) -------------------------------

    def _load(self) -> None:
        if self.storage.exists(self._meta_path):
            d = json.loads(self.storage.get_text(self._meta_path))
            self._cursor = tuple(d["cursor"])
            self._delivered = tuple(d.get("delivered", d["cursor"]))
            self._inflight = d["inflight"]
            self._next_batch_id = d["next_batch_id"]
            self._subscribed = d["subscribed"]
            self._delivered_rows = int(d.get("delivered_rows", 0))
            self._acked_rows = int(d.get("acked_rows", 0))
            self._empty_gets = int(d.get("empty_gets", 0))
            self._last_delivered_ts_ms = int(d.get("last_delivered_ts_ms", 0))
            self._last_acked_ts_ms = int(d.get("last_acked_ts_ms", 0))

    def _persist(self) -> None:
        self.storage.put_text(
            self._meta_path,
            json.dumps(
                {
                    "cursor": list(self._cursor),
                    "delivered": list(self._delivered),
                    "inflight": self._inflight,
                    "next_batch_id": self._next_batch_id,
                    "subscribed": self._subscribed,
                    # delivery counters for the prometheus get/ack
                    # families (EntryCollector.java:39-43 analog)
                    "delivered_rows": self._delivered_rows,
                    "acked_rows": self._acked_rows,
                    "empty_gets": self._empty_gets,
                    "last_delivered_ts_ms": self._last_delivered_ts_ms,
                    "last_acked_ts_ms": self._last_acked_ts_ms,
                }
            ),
        )

    # -- protocol ---------------------------------------------------------

    def subscribe(self, cfg: Optional[ReplayConfig] = None) -> None:
        """Register; a new cfg REPLACES the active filter set."""
        if cfg is not None:
            self.cfg = cfg
        self._subscribed = True
        self._persist()

    def get_without_ack(
        self, batch_size: int, timeout_ms: int | None = None
    ) -> tuple[int, pa.Table] | None:
        """Cut the next ~``batch_size`` events after the delivered
        cursor. Returns None when the stream is drained. The batch
        always ends on a transaction boundary; a transaction longer
        than batch_size grows the window, so the batch may exceed
        batch_size by at most one transaction. Successive gets return
        successive batches (multi-entry in-flight FIFO ledger).

        ``timeout_ms`` long-polls a drained journal (the reference
        getWithoutAck(timeout), CanalServerWithEmbedded): re-check for
        newly settled segments every 50 ms until the deadline instead
        of returning None immediately."""
        sig = self._journal_stat_sig() if timeout_ms else None
        got = self._get_once(batch_size)
        if got is not None or not timeout_ms:
            if got is None:
                self._empty_gets += 1  # client_empty_batches family
            return got
        deadline = time.monotonic() + int(timeout_ms) / 1000.0
        while got is None and time.monotonic() < deadline:
            time.sleep(min(0.05, max(0.0, deadline - time.monotonic())))
            # cheap stat precheck: only re-run the footer/dataset probe
            # when the journal's (name, size, mtime) signature changed —
            # an idle 30s long-poll otherwise pays ~600 full disk probes.
            # The signature is taken BEFORE each probe, so a file landing
            # after it always flips the comparison.
            new_sig = self._journal_stat_sig()
            if new_sig == sig:
                continue
            sig = new_sig
            got = self._get_once(batch_size)
        if got is None:
            self._empty_gets += 1  # client_empty_batches family
        return got

    def _journal_stat_sig(self) -> tuple:
        out = []
        for p in discover_segments(self.dirs, missing_ok=True):
            try:
                st = os.stat(p)
                out.append((p, st.st_size, st.st_mtime_ns))
            except OSError:  # racing a writer's rename
                out.append((p, -1, -1))
        return tuple(out)

    def _get_once(self, batch_size: int) -> tuple[int, pa.Table] | None:
        if not self._subscribed:
            raise RuntimeError("subscribe() first")
        start = self._delivered
        limit = max(int(batch_size), 1)
        while True:
            t_full = self._read_after(start, limit)
            if t_full is None or t_full.num_rows == 0:
                return None
            events = t_full.slice(0, limit)
            ack = self._last_commit(events)
            if ack is not None:
                break
            if events.num_rows < limit:
                # stream exhausted mid-txn: incomplete tail stays — but
                # keep it DECODED so the next get (after new segments
                # settle) doesn't re-read it
                self._pending = t_full
                return None
            # txn longer than the window: grow until its commit row appears
            limit *= 2
        # cut at ack with ZERO-COPY slices: t_full is position-ordered,
        # so rows <= ack are a prefix — the delivered window — and the
        # rest (window overflow + txn-headroom over-read) becomes the
        # pending decode cache for the next get. The old filter-based
        # cut copied the struct-heavy table twice per get.
        pos_all = pack_position(
            t_full["segment_id"].to_numpy(zero_copy_only=False),
            t_full["offset"].to_numpy(zero_copy_only=False),
        )
        idx = int(np.searchsorted(pos_all, int(pack_position(ack[0], ack[1])), side="right"))
        self._pending = t_full.slice(idx) if idx < t_full.num_rows else None
        events = t_full.slice(0, idx)
        # F1-F6 delivery filters AFTER the ack cut: a filtered-out row
        # still advances the position (the F7 position-advance rule)
        m = filter_mask(events, self.cfg)
        m_np = np.asarray(
            m.to_numpy(zero_copy_only=False) if hasattr(m, "to_numpy") else m, dtype=bool
        )
        if not m_np.all():
            events = events.filter(pa.array(m_np))
        batch_id = self._next_batch_id
        self._next_batch_id += 1
        # batch row count + newest event ts ride the in-flight record so
        # ack can maintain the ack_rows/ack_delay families (PositionRange
        # carries the same for the reference's EntryCollector)
        max_ts = 0
        if events.num_rows:
            import pyarrow.compute as pc

            # cast to int64 ms BEFORE leaving Arrow: a naive-datetime
            # .timestamp() would reinterpret the UTC-epoch value in the
            # host's local timezone and skew the get/ack delay gauges
            mx = pc.max(events["execute_ts"].cast(pa.int64())).as_py()
            if mx is not None:
                max_ts = int(mx)
        self._inflight.append(
            {
                "batch_id": batch_id,
                "start": list(start),
                "ack": list(ack),
                "rows": events.num_rows,
                "max_ts": max_ts,
            }
        )
        self._delivered = ack
        self._delivered_rows += events.num_rows
        self._last_delivered_ts_ms = max(self._last_delivered_ts_ms, max_ts)
        self._persist()
        return batch_id, events

    @property
    def delivered_position(self) -> tuple[int, int]:
        """Position after the last get — equals the newest in-flight
        batch's ack boundary (PositionRange.ack)."""
        return self._delivered

    def stats(self) -> dict:
        """Cursor snapshot for the admin/monitoring surface (the
        CanalStats consumer-lag analog exposed by the reference's admin
        port): durable acked cursor, delivered cursor, and the count of
        in-flight (delivered-not-yet-acked) batches."""
        return {
            "cursor": list(self._cursor),
            "delivered": list(self._delivered),
            "inflight": len(self._inflight),
            "subscribed": self._subscribed,
            "next_batch_id": self._next_batch_id,
            "delivered_rows": self._delivered_rows,
            "acked_rows": self._acked_rows,
            "empty_gets": self._empty_gets,
            "last_delivered_ts_ms": self._last_delivered_ts_ms,
            "last_acked_ts_ms": self._last_acked_ts_ms,
        }

    def ack(self, batch_id: int) -> None:
        if not self._inflight or self._inflight[0]["batch_id"] != batch_id:
            raise FifoAckError(
                f"batch {batch_id} is not the oldest in-flight "
                f"({self._inflight[0]['batch_id'] if self._inflight else 'none'})"
            )
        rec = self._inflight.pop(0)
        self._cursor = tuple(rec["ack"])
        self._acked_rows += int(rec.get("rows", 0))
        self._last_acked_ts_ms = max(self._last_acked_ts_ms, int(rec.get("max_ts", 0)))
        self._persist()

    def seek_to_timestamp(self, ts_ms: int) -> tuple[int, int]:
        """Timestamp-positioned rewind/seek (MysqlEventParser
        .findStartPositionInternal rewind-by-timestamp analog): move
        the cursor to the last txn boundary before the first event with
        ``execute_ts`` >= ts_ms; in-flight batches are dropped and the
        next get delivers from the transaction containing that event."""
        from clever_canal_ray.sources.segments import find_start_position

        pos = find_start_position(self.dirs, ts_ms)
        self._cursor = pos
        self._delivered = pos
        self._inflight = []
        self._pending = None  # decode cache is relative to delivered
        self._persist()
        return pos

    def rollback(self) -> None:
        """Clear the in-flight ledger and reset the delivered cursor to
        the acked cursor; everything un-acked is re-delivered by
        subsequent gets (with fresh batch ids)."""
        self._inflight = []
        self._delivered = self._cursor
        self._pending = None  # decode cache is relative to delivered
        self._persist()

    # -- internals --------------------------------------------------------

    def _read_after(self, start: tuple[int, int], limit: int) -> pa.Table | None:
        """At least ``limit`` position-ordered rows after ``start`` (up
        to ~2× for txn-boundary headroom — the caller slices its window
        and the overflow becomes the next get's pending cache): the
        pending decode cache first (its rows are exactly the
        already-decoded stream after the delivered cursor == start),
        then disk from the cache's tail onward. Does not mutate the
        cache — the grow loop in get_without_ack may call again with a
        larger limit.

        The cache is only valid while the SEGMENT SET is unchanged: a
        group/multi-dir journal may land a new segment whose positions
        interleave BELOW the cached tail, and a disk read from the tail
        would skip it forever. Any new path drops the cache and falls
        back to a full re-read from the delivered cursor."""
        paths = tuple(discover_segments(self.dirs, missing_ok=True))
        if self._pending is not None and paths != self._pending_paths:
            self._pending = None
        chunks: list[pa.Table] = []
        have = 0
        disk_from = start
        if self._pending is not None and self._pending.num_rows:
            chunks.append(self._pending)
            have = self._pending.num_rows
            last = self._pending.slice(self._pending.num_rows - 1, 1)
            disk_from = (
                int(last["segment_id"][0].as_py()),
                int(last["offset"][0].as_py()),
            )
        if have < limit:
            disk = self._read_disk_after(disk_from, limit - have)
            if disk is not None:
                chunks.append(disk)
        self._pending_paths = paths
        if not chunks:
            return None
        t = pa.concat_tables(chunks) if len(chunks) > 1 else chunks[0]
        if t.num_rows == 0:
            return None
        return t

    def _read_disk_after(self, start: tuple[int, int], limit: int) -> pa.Table | None:
        paths = discover_segments(self.dirs, missing_ok=True)
        if not paths:
            return None
        flt = (pds.field("segment_id") > start[0]) | (
            (pds.field("segment_id") == start[0]) & (pds.field("offset") > start[1])
        )
        dset = pds.dataset(paths)
        batches = []
        got = 0
        # low readahead: this loop breaks early once the window fills,
        # and the scanner's default prefetch (16 batches x 4 fragments)
        # decodes far past the break just to be discarded — measured
        # 1.6x on the repeated-get pattern
        for b in dset.to_batches(
            filter=flt,
            batch_size=max(1024, limit),
            batch_readahead=1,
            fragment_readahead=1,
        ):
            if b.num_rows == 0:
                continue
            batches.append(b)
            got += b.num_rows
            if got >= limit * 2:  # headroom so a txn boundary exists
                break
        if not batches:
            return None
        t = pa.Table.from_batches(batches)
        # global position order; segments usually arrive ordered, so
        # only pay the full-table take when they genuinely interleave
        pos = pack_position(
            t["segment_id"].to_numpy(zero_copy_only=False),
            t["offset"].to_numpy(zero_copy_only=False),
        )
        if len(pos) > 1 and (np.diff(pos) < 0).any():
            t = t.take(pa.array(np.argsort(pos, kind="stable")))
        return t  # overflow beyond limit lands in the pending cache

    @staticmethod
    def _last_commit(t: pa.Table) -> tuple[int, int] | None:
        commit = t["txn_commit"].to_numpy(zero_copy_only=False).astype(bool)
        if not commit.any():
            return None
        seg = t["segment_id"].to_numpy(zero_copy_only=False)
        off = t["offset"].to_numpy(zero_copy_only=False)
        pos = pack_position(seg, off)
        i = int(np.argmax(np.where(commit, pos, -1)))
        return int(seg[i]), int(off[i])

