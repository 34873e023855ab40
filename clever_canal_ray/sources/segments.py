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


def discover_segments(dirs: list[str] | str) -> list[str]:
    """All segment files across journal dirs, in (dir-assigned
    segment-number) order."""
    if isinstance(dirs, str):
        dirs = [dirs]
    found: list[tuple[int, str]] = []
    for d in dirs:
        for name in os.listdir(d):
            m = _SEG_RE.search(name)
            if m:
                found.append((int(m.group(1)), os.path.join(d, name)))
    found.sort()
    return [p for _, p in found]


@dataclass
class SegmentQueue:
    """Poll-based file queue over journal dirs: ``pending(hwm_segment)``
    returns files that may still hold events above the HWM."""

    dirs: list[str]

    def all_segments(self) -> list[str]:
        return discover_segments(self.dirs)

    def pending(self, hwm_segment_id: int) -> list[str]:
        out = []
        for p in self.all_segments():
            m = _SEG_RE.search(p)
            if m and int(m.group(1)) >= hwm_segment_id:
                out.append(p)
        return out
