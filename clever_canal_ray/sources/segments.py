"""Segment-file sources — the LocalBinLogConnection / BinLogFileQueue /
GroupEventParser analogs (SURVEY.md S2/S4).

A "journal" is a directory of ordered Parquet segment files
(``segment-%05d.parquet``); ``SegmentQueue`` tracks which files are
beyond the committed HWM (BinLogFileQueue.java file-rotation follow,
minus tail-wait: sources here are immutable snapshots, new files are
picked up on the next poll).

``discover_segments`` over several directories is the group-source
(GroupEventParser.java:13-50): N sharded journals replayed into one
lake. Shards must use disjoint ``segment_id`` ranges (the generator
assigns ``shard_index * stride``); the merge order is then the plain
(segment_id, offset) total order, which interleaves shards by segment
— the k-way merge barrier (O7 TimelineBarrier) is unnecessary because
our reduce only needs per-doc_id order, not global time order
(SURVEY.md O7 row).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

_SEG_RE = re.compile(r"segment-(\d+)\.parquet$")


def discover_segments(dirs: list[str] | str, missing_ok: bool = False) -> list[str]:
    """All segment files across journal dirs, in (dir-assigned
    segment-number) order.

    ``missing_ok=True`` tolerates a not-yet-created dir — for TAILERS
    that may legitimately start before their publisher (follow loops,
    consumer long-polls, the live-source adapter). One-shot callers
    (replay CLI) keep the default so a typo'd path raises instead of
    silently replaying zero events.
    """
    if isinstance(dirs, str):
        dirs = [dirs]
    found: list[tuple[int, str]] = []
    for d in dirs:
        if missing_ok and not os.path.isdir(d):
            continue  # publisher hasn't created it yet: nothing to consume
        for name in os.listdir(d):
            m = _SEG_RE.search(name)
            if m:
                found.append((int(m.group(1)), os.path.join(d, name)))
    found.sort()
    return [p for _, p in found]


def load_segment_plan(path: str) -> dict | None:
    """Load a segment's plan metadata (``.plan.json`` sidecar, legacy
    parquet-footer fallback); None if neither exists."""
    import json

    sidecar = path + ".plan.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.loads(f.read())
    import pyarrow.parquet as pq

    md = pq.read_metadata(path).metadata
    if md and b"ccr_plan" in md:
        return json.loads(md[b"ccr_plan"])
    return None


def settled_prefix(paths: list[str]) -> list[str]:
    """Longest prefix of ``paths`` whose parquet footers are complete.

    A tail-follow poll can observe a segment mid-write (the publisher's
    ``write_table`` is not atomic). Reading a truncated file would crash
    the replay, and skipping *just* that file would break position
    ordering if a later segment is already complete — so consumption
    stops at the first unsettled file and retries it next poll. This is
    the binlog tailer's wait-for-flushed-bytes rule
    (LocalBinLogConnection.java:75-120 tail-wait analog).
    """
    import pyarrow.parquet as pq

    out: list[str] = []
    for p in paths:
        try:
            pq.read_metadata(p)
        except Exception:
            break
        out.append(p)
    return out


def find_start_position(paths_or_dirs, ts_ms: int) -> tuple[int, int]:
    """Timestamp-positioned start (MysqlEventParser
    .findStartPositionInternal:466-547 rewind-by-timestamp analog):
    the last transaction-boundary position BEFORE the first event whose
    ``execute_ts`` >= ts_ms, in (segment_id, offset) order. Feeding it
    as a cursor/HWM delivers the whole transaction containing that
    event and everything after. Returns (-1, -1) when ts_ms precedes
    the stream.

    Plan sidecars prune the scan to one segment (plus its predecessor
    for the boundary); files without plans get a light column scan.
    """
    import numpy as np
    import pyarrow.dataset as pds

    from clever_canal_ray.schema import pack_position

    if isinstance(paths_or_dirs, str) or (
        isinstance(paths_or_dirs, list)
        and paths_or_dirs
        # dirs-vs-paths WITHOUT touching the filesystem: segment files
        # always end in .parquet (the discover regex requires it), so
        # an isdir probe — which misroutes a NOT-YET-CREATED journal
        # dir into the "these are file paths" branch — isn't needed
        and not str(paths_or_dirs[0]).endswith(".parquet")
    ):
        # consumer-side seek: tolerate a shard dir whose publisher
        # hasn't started yet (same rule as the get/long-poll path)
        paths = discover_segments(paths_or_dirs, missing_ok=True)
    else:
        paths = list(paths_or_dirs)
    if not paths:
        return (-1, -1)
    # prune: first segment whose max_ts >= ts holds the first such event
    # (min/max ts per segment overlap only by jitter); scan it plus its
    # predecessor (for the preceding txn boundary)
    first_idx = 0
    plans = [load_segment_plan(p) for p in paths]
    if all(pl is not None and pl.get("max_ts") is not None for pl in plans):
        first_idx = next(
            (i for i, pl in enumerate(plans) if pl["max_ts"] >= ts_ms), len(paths) - 1
        )
    scan = paths[max(0, first_idx - 1) : first_idx + 1]
    t = pds.dataset(scan).to_table(
        columns=["segment_id", "offset", "execute_ts", "txn_commit"]
    )
    seg = t["segment_id"].to_numpy(zero_copy_only=False)
    off = t["offset"].to_numpy(zero_copy_only=False)
    pos = pack_position(seg, off)
    order = np.argsort(pos, kind="stable")
    ts = t["execute_ts"].to_numpy(zero_copy_only=False).astype("datetime64[ms]").astype(np.int64)[order]
    commit = t["txn_commit"].to_numpy(zero_copy_only=False).astype(bool)[order]
    at_or_after = np.where(ts >= ts_ms)[0]
    if len(at_or_after) == 0:
        # whole scanned window precedes ts: start after its last boundary
        bidx = np.where(commit)[0]
        if len(bidx) == 0:
            return (-1, -1)
        i = int(bidx[-1])
        return (int(seg[order][i]), int(off[order][i]))
    first = int(at_or_after[0])
    bidx = np.where(commit[:first])[0]
    if len(bidx) == 0:
        return (-1, -1)
    i = int(bidx[-1])
    return (int(seg[order][i]), int(off[order][i]))


@dataclass
class SegmentQueue:
    """Poll-based file queue over journal dirs: ``pending(hwm_segment)``
    returns files that may still hold events above the HWM."""

    dirs: list[str]

    def all_segments(self) -> list[str]:
        # tail-follow queue: may poll before the publisher created the dir
        return discover_segments(self.dirs, missing_ok=True)

    def pending(self, hwm_segment_id: int) -> list[str]:
        out = []
        for p in self.all_segments():
            m = _SEG_RE.search(p)
            if m and int(m.group(1)) >= hwm_segment_id:
                out.append(p)
        return out


class ColdSegmentQueue:
    """Cold-storage segment queue — the rds/BinlogDownloadQueue.java
    analog (prefetch window + delete-after-consume): segments live in
    an archive the replay cannot read directly (S3/OSS in the
    reference); a user-supplied ``fetch`` callable pulls one segment to
    local disk, at most ``prefetch_window`` segments are resident ahead
    of the HWM at a time, and segments the HWM has passed are deleted
    from the local cache (BinlogDownloadQueue.prepare/execute bounded
    download + tryDelete).

    ``list_remote() -> list[str]``: ordered remote segment NAMES
    (``segment-%05d.parquet``). ``fetch(name) -> staging_path``: blocking
    download returning where it put the bytes; the queue ``os.replace``s
    staging into the cache, so a fetch that crashed mid-download leaves
    nothing consumable and the next poll simply retries — replay stays
    exactly-once because the HWM filter, not the fetch count, decides
    what applies. Plan sidecars (``<name>.plan.json``) are fetched
    best-effort: a missing sidecar only costs the O(files) plan fast
    path, never correctness.

    Duck-typed drop-in for ``SegmentQueue`` in ``follow()`` (same
    ``pending``; ``evict`` is called as the HWM advances).
    """

    def __init__(
        self,
        list_remote,
        fetch,
        cache_dir: str,
        prefetch_window: int = 4,
        delete_after_consume: bool = True,
    ):
        if prefetch_window < 1:
            raise ValueError("prefetch_window must be >= 1")
        self.list_remote = list_remote
        self.fetch = fetch
        self.cache_dir = cache_dir
        self.prefetch_window = prefetch_window
        self.delete_after_consume = delete_after_consume
        os.makedirs(cache_dir, exist_ok=True)

    @staticmethod
    def _seg_id(name: str) -> int | None:
        m = _SEG_RE.search(name)
        return int(m.group(1)) if m else None

    def _ensure_local(self, name: str) -> str:
        local = os.path.join(self.cache_dir, name)
        if not os.path.exists(local):
            staging = self.fetch(name)
            os.replace(staging, local)  # atomic: never a half-file in cache
            # sidecar best-effort (plan fast path only; replay is
            # correct without it)
            try:
                side_staging = self.fetch(name + ".plan.json")
                os.replace(side_staging, local + ".plan.json")
            except Exception:
                pass
        return local

    def pending(self, hwm_segment_id: int) -> list[str]:
        """Local paths of up to ``prefetch_window`` segments at/above
        the HWM segment, fetching the missing ones. A fetch failure
        truncates the window at the failed segment (everything before
        it is still consumable; the next poll retries)."""
        names = []
        for n in self.list_remote():
            s = self._seg_id(n)
            if s is not None and s >= hwm_segment_id:
                names.append((s, n))
        names.sort()
        out: list[str] = []
        for _, n in names[: self.prefetch_window]:
            try:
                out.append(self._ensure_local(n))
            except Exception:
                break  # consume the prefix; retry the rest next poll
        return out

    def evict(self, hwm_segment_id: int) -> list[str]:
        """Delete cached segments strictly below the HWM segment (fully
        consumed — ``pending`` never returns them again)."""
        if not self.delete_after_consume:
            return []
        gone = []
        for name in os.listdir(self.cache_dir):
            s = self._seg_id(name)
            if s is not None and s < hwm_segment_id:
                p = os.path.join(self.cache_dir, name)
                os.unlink(p)
                side = p + ".plan.json"
                if os.path.exists(side):
                    os.unlink(side)
                gone.append(p)
        return gone
