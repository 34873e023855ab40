"""Stateless parse/filter/combine stage — the EventParser+EntryEventSink analog.

One zero-copy Arrow ``map_batches`` body that replaces the reference's
serial parse thread + sink filter chain (LogEventConvert.parse:78-119,
EntryEventSink.sinkData:109-209):

1. position filter: keep ``hwm < (segment_id,offset) <= ack`` — the
   exactly-once replay guard (D3, EntryPosition.included analog) plus
   the txn-boundary ack cut (PositionRange.ack,
   MemoryEventStoreWithBuffer.java:431-439);
2. table/op/user filters (F1-F6, see config.py);
3. row-image flattening: ``after`` struct -> payload columns, up-cast
   to the batch's target schema version (P3/P4 + schema-evolution cast);
4. **within-batch last-writer-wins partial reduce** per doc_id — the
   combiner that keeps the single ``groupby(pid)`` shuffle small under
   hot-key skew (SURVEY.md §4 skew row): a key updated k times in one
   batch ships one row, not k.

Everything is vectorized (pyarrow.compute / numpy / pandas indices);
no per-row Python in the hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.schema import pack_position
from clever_canal_ray.state.partitioning import partition_ids

# output meta columns of the combine stage (payload columns follow)
COMBINE_META = ["pid", "doc_id", "pos", "op", "n_events"]


def _anchor_regex(expr: str) -> re.Pattern:
    """Comma-joined, ^…$-anchored alternation (AviaterRegexFilter.java:63-96)."""
    parts = sorted((p.strip() for p in expr.split(",") if p.strip()), key=len, reverse=True)
    return re.compile("|".join(f"(?:^{p}$)" for p in parts))


def filter_mask(batch: pa.Table, cfg: ReplayConfig) -> pa.ChunkedArray | pa.Array:
    """F1-F6 boolean mask over a batch (vectorized)."""
    mask = pc.invert(pc.is_in(batch["op"], value_set=pa.array(list(cfg.drop_ops) or ["__none__"])))
    tbl = batch["table"]
    if cfg.table_whitelist_regex:
        pat = "|".join(
            f"(?:^{p.strip()}$)" for p in cfg.table_whitelist_regex.split(",") if p.strip()
        )
        mask = pc.and_(mask, pc.match_substring_regex(tbl, pat))
    if cfg.table_blacklist_regex:
        pat = "|".join(
            f"(?:^{p.strip()}$)" for p in cfg.table_blacklist_regex.split(",") if p.strip()
        )
        mask = pc.and_(mask, pc.invert(pc.match_substring_regex(tbl, pat)))
    if cfg.table_list is not None:
        mask = pc.and_(mask, pc.is_in(tbl, value_set=pa.array(list(cfg.table_list))))
    if cfg.predicate is not None:
        user = cfg.predicate(batch)
        if not isinstance(user, (pa.Array, pa.ChunkedArray)):
            user = pa.array(np.asarray(user, dtype=bool))
        mask = pc.and_(mask, user)
    return mask


def make_combine_fn(cfg: ReplayConfig, target_payload: pa.Schema, hwm: tuple[int, int], ack: tuple[int, int]):
    """Build the map_batches body for one micro-batch (closure carries
    only small immutable config — broadcast once per task by Ray)."""
    hwm_pos = int(pack_position(hwm[0], hwm[1])) if hwm[0] >= 0 else -1
    ack_pos = int(pack_position(ack[0], ack[1]))
    payload_names = [f.name for f in target_payload]
    proj = set(cfg.column_projection) if cfg.column_projection is not None else None

    def combine(batch: pa.Table) -> pa.Table:
        # 1. position window (hwm, ack]
        pos = pack_position(
            batch["segment_id"].to_numpy(zero_copy_only=False),
            batch["offset"].to_numpy(zero_copy_only=False),
        )
        keep = (pos > hwm_pos) & (pos <= ack_pos)
        # row events only — DDL is handled driver-side (F9 isolation)
        op_np = np.asarray(batch["op"].to_numpy(zero_copy_only=False), dtype=object)
        keep &= (op_np == "I") | (op_np == "U") | (op_np == "D")
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return _empty_combined(target_payload)
        pos = pos[keep]
        # 2. F1-F6 filters
        m = filter_mask(batch, cfg)
        m_np = np.asarray(m.to_numpy(zero_copy_only=False) if hasattr(m, "to_numpy") else m, dtype=bool)
        if not m_np.all():
            batch = batch.filter(pa.array(m_np))
            pos = pos[m_np]
        if batch.num_rows == 0:
            return _empty_combined(target_payload)

        # 3. within-batch LWW partial reduce (vectorized index math)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(doc)
        order = np.lexsort((pos, codes))  # by key, then position
        last_of_key = np.ones(len(order), dtype=bool)
        last_of_key[:-1] = codes[order[:-1]] != codes[order[1:]]
        winners = order[last_of_key]
        counts = np.bincount(codes)[codes[winners]]

        sel = batch.take(pa.array(winners))
        wpos = pos[winners]

        # 4. flatten after-image -> payload columns, cast to target
        after = sel["after"].combine_chunks() if isinstance(sel["after"], pa.ChunkedArray) else sel["after"]
        cols: list[pa.Array] = []
        for f in target_payload:
            if f.name == "doc_id":
                cols.append(sel["doc_id"].cast(pa.string()).combine_chunks() if isinstance(sel["doc_id"], pa.ChunkedArray) else sel["doc_id"])
                continue
            try:
                child = pc.struct_field(after, f.name)
            except (KeyError, pa.ArrowInvalid):
                child = pa.nulls(len(sel), f.type)
            if proj is not None and f.name not in proj and f.name != "doc_id":
                child = pa.nulls(len(sel), f.type)  # F5: dropped cell
            if child.type != f.type:
                child = child.cast(f.type)
            cols.append(child)

        pids = partition_ids(sel["doc_id"].to_numpy(zero_copy_only=False), cfg.num_partitions)
        if cfg.salt_factor > 1:
            pids = (pids.astype(np.int64) * cfg.salt_factor + (wpos % cfg.salt_factor)).astype(np.int32)
        meta = [
            pa.array(pids, pa.int32()),
            cols[payload_names.index("doc_id")],
            pa.array(wpos, pa.int64()),
            sel["op"],
            pa.array(counts, pa.int64()),
        ]
        names = COMBINE_META + [f"p_{n}" for n in payload_names]
        return pa.Table.from_arrays(meta + cols, names=names)

    return combine


def _empty_combined(target_payload: pa.Schema) -> pa.Table:
    names = COMBINE_META + [f"p_{f.name}" for f in target_payload]
    arrays = [
        pa.array([], pa.int32()),
        pa.array([], pa.string()),
        pa.array([], pa.int64()),
        pa.array([], pa.string()),
        pa.array([], pa.int64()),
    ] + [pa.array([], f.type) for f in target_payload]
    return pa.Table.from_arrays(arrays, names=names)
