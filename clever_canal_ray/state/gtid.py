"""GTID executed-set tracking — the MysqlGtIdSet / UUIDSet analog.

The reference resumes and dedups by MySQL GTID sets (MysqlGtIdSet.java
parse/add/contains/union; UUIDSet interval merging), whose textual form
is the documented MySQL ``gtid_executed`` format::

    uuid:1-5:11:13-20[,uuid2:1-27...]

The engine's hot-path dedup uses the scalar ``txn_hwm`` watermark
(sound because a binlog is totally ordered per source); this module
adds the full interval-set semantics for the cases a scalar can't
represent — applied-txn GAPS across interleaved/sharded sources, and
resume audit ("exactly which txns are in the lake"). The manifest
records the canonical string per commit; intervals stay tiny because
contiguous txn ranges merge.

All interval state per uuid is a flat sorted numpy array
``[s0, e0, s1, e1, ...]`` of half-open ``[s, e)`` ranges, so the batch
membership test is one vectorized ``searchsorted`` (odd insertion index
= inside a range) — no per-row Python in any consumer.
"""

from __future__ import annotations

import numpy as np


class GtidSet:
    """Mutable set of executed txn ids per source uuid, canonical
    MySQL-style text round-trip, vectorized membership."""

    def __init__(self) -> None:
        self._ranges: dict[str, np.ndarray] = {}  # uuid -> flat [s,e) pairs

    # -- construction ----------------------------------------------------

    @classmethod
    def parse(cls, text: str) -> "GtidSet":
        """Parse ``uuid:1-5:11,uuid2:3`` (MySQL gtid_executed format;
        single numbers are one-element ranges, bounds inclusive)."""
        out = cls()
        text = (text or "").strip()
        if not text:
            return out
        for part in text.split(","):
            fields = part.strip().split(":")
            if len(fields) < 2 or not fields[0]:
                raise ValueError(f"malformed GTID set component: {part!r}")
            uuid = fields[0].lower()
            for iv in fields[1:]:
                lo, sep, hi = iv.partition("-")
                if sep and not hi:
                    # '5-' is a truncation artifact, not a single txn —
                    # silently shrinking the set would hide corruption
                    raise ValueError(f"truncated GTID interval: {iv!r}")
                start = int(lo)
                end = int(hi) if hi else start
                if end < start:
                    raise ValueError(f"descending GTID interval: {iv!r}")
                out.add_range(uuid, start, end)
        return out

    # -- mutation ---------------------------------------------------------

    def add_range(self, uuid: str, start: int, end: int) -> None:
        """Add inclusive txn range [start, end], merging adjacent and
        overlapping intervals (UUIDSet semantics: 1-5 + 6-9 -> 1-9)."""
        uuid = uuid.lower()
        s, e = int(start), int(end) + 1  # to half-open
        cur = self._ranges.get(uuid)
        if cur is None or len(cur) == 0:
            self._ranges[uuid] = np.array([s, e], dtype=np.int64)
            return
        # merge: collect ranges, insert, coalesce (sets are tiny —
        # contiguous commits collapse to one interval)
        pairs = cur.reshape(-1, 2).tolist()
        pairs.append([s, e])
        pairs.sort()
        merged = [pairs[0]]
        for lo, hi in pairs[1:]:
            if lo <= merged[-1][1]:  # overlap or adjacency in half-open form
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        self._ranges[uuid] = np.array(merged, dtype=np.int64).ravel()

    def add(self, uuid: str, txn: int) -> None:
        self.add_range(uuid, txn, txn)

    def union(self, other: "GtidSet") -> "GtidSet":
        out = GtidSet()
        for src in (self, other):
            for uuid, flat in src._ranges.items():
                for lo, hi in flat.reshape(-1, 2):
                    out.add_range(uuid, int(lo), int(hi) - 1)
        return out

    # -- queries ----------------------------------------------------------

    def contains(self, uuid: str, txn: int) -> bool:
        return bool(self.contains_vec(uuid, np.array([txn]))[0])

    def contains_vec(self, uuid: str, txns: np.ndarray) -> np.ndarray:
        """Vectorized membership for a txn-id array — odd searchsorted
        insertion index means inside a [s, e) range."""
        flat = self._ranges.get(uuid.lower())
        t = np.asarray(txns, dtype=np.int64)
        if flat is None or len(flat) == 0:
            return np.zeros(len(t), dtype=bool)
        idx = np.searchsorted(flat, t, side="right")
        return (idx % 2) == 1

    def is_contained_within(self, other: "GtidSet") -> bool:
        """True iff every txn of self is in other (MysqlGtIdSet
        .isContainedWithin — the failover safety check)."""
        for uuid, flat in self._ranges.items():
            oflat = other._ranges.get(uuid)
            if oflat is None:
                return False
            for lo, hi in flat.reshape(-1, 2):
                i = int(np.searchsorted(oflat, lo, side="right"))
                if i % 2 != 1 or hi > oflat[i]:
                    return False
        return True

    def txn_count(self) -> int:
        return int(
            sum((flat.reshape(-1, 2)[:, 1] - flat.reshape(-1, 2)[:, 0]).sum()
                for flat in self._ranges.values())
        )

    # -- canonical text ---------------------------------------------------

    def __str__(self) -> str:
        parts = []
        for uuid in sorted(self._ranges):
            ivs = []
            for lo, hi in self._ranges[uuid].reshape(-1, 2):
                lo, hi = int(lo), int(hi) - 1  # back to inclusive
                ivs.append(str(lo) if lo == hi else f"{lo}-{hi}")
            parts.append(":".join([uuid] + ivs))
        return ",".join(parts)

    def __eq__(self, other) -> bool:
        return isinstance(other, GtidSet) and str(self) == str(other)

    def __repr__(self) -> str:
        return f"GtidSet({str(self)!r})"
