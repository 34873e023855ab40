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

Duplicate positions *within* one micro-batch window (a segment file
listed twice in the same group) are harmless: the LWW tie resolves to
an identical payload, so the final state is unchanged (idempotent
upsert); only the ``events_in`` throughput counter counts them twice.
Cross-batch duplicates are excluded exactly by the HWM filter (D3).
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
COMBINE_META = ["pid", "doc_id", "pos", "is_del", "n_events"]


def _anchor_regex(expr: str) -> re.Pattern:
    """Comma-joined, ^…$-anchored alternation (AviaterRegexFilter.java:63-96)."""
    parts = sorted((p.strip() for p in expr.split(",") if p.strip()), key=len, reverse=True)
    return re.compile("|".join(f"(?:^{p}$)" for p in parts))


def filter_mask(batch: pa.Table, cfg: ReplayConfig) -> pa.ChunkedArray | pa.Array:
    """F1-F6 boolean mask over a batch (vectorized)."""
    mask = pc.invert(pc.is_in(batch["op"], value_set=pa.array(list(cfg.drop_ops) or ["__none__"])))
    tbl = batch["table"] if "table" in batch.column_names else None
    if cfg.table_whitelist_regex:
        # pattern construction shared with the driver-side truncate
        # subscription check (replay._table_subscribed) — keep in sync
        mask = pc.and_(
            mask, pc.match_substring_regex(tbl, _anchor_regex(cfg.table_whitelist_regex).pattern)
        )
    if cfg.table_blacklist_regex:
        mask = pc.and_(
            mask,
            pc.invert(
                pc.match_substring_regex(tbl, _anchor_regex(cfg.table_blacklist_regex).pattern)
            ),
        )
    if cfg.table_list is not None:
        mask = pc.and_(mask, pc.is_in(tbl, value_set=pa.array(list(cfg.table_list))))
    if cfg.predicate is not None:
        user = cfg.predicate(batch)
        if not isinstance(user, (pa.Array, pa.ChunkedArray)):
            user = pa.array(np.asarray(user, dtype=bool))
        mask = pc.and_(mask, user)
    return mask


def make_combine_fn(
    cfg: ReplayConfig,
    target_payload: pa.Schema,
    hwm: tuple[int, int],
    ack: tuple[int, int],
    routing: dict[str, tuple[int, int]] | None = None,
    txn_hwm: int = -1,
    xa_commits: tuple = (),
    has_patch: bool = False,
):
    """Build the map_batches body for one micro-batch (closure carries
    only small immutable config — broadcast once per task by Ray).

    ``routing``: multi-table lakes — table name -> (base_pid,
    num_partitions); events route to global pid = base + hash(doc) % P
    (Header.schemaName/tableName routing, EntryProtocol.proto:80-113).
    Events of unregistered tables are dropped (unsubscribed-destination
    rule). ``target_payload`` is then the union schema; each
    partition's reducer casts down to its table's schema.
    """
    hwm_pos = int(pack_position(hwm[0], hwm[1])) if hwm[0] >= 0 else -1
    ack_pos = int(pack_position(ack[0], ack[1]))
    payload_names = [f.name for f in target_payload]
    # rename_column: events physically carry the ORIGINAL column name
    # (their epoch's layout); resolve target names through the
    # journal's rename map (schema.attach_renames on target_payload;
    # already reverse-mapped {final: [old names]})
    from clever_canal_ray.schema import reverse_renames_from_metadata

    _rev_renames = reverse_renames_from_metadata(target_payload)
    # F5 column projection: tuple = global keep-list; dict = PER-TABLE
    # keep-lists {table: (cols...)} (parseFieldFilterMap analog,
    # AbstractEventParser.java:667-682) — tables absent from the dict
    # keep all columns.
    proj_raw = cfg.column_projection
    proj = set(proj_raw) if isinstance(proj_raw, (tuple, list, set)) else None
    proj_by_table = dict(proj_raw) if isinstance(proj_raw, dict) else None

    has_filters = any(
        [
            cfg.drop_ops,
            cfg.table_whitelist_regex,
            cfg.table_blacklist_regex,
            cfg.table_list is not None,
            cfg.predicate is not None,
        ]
    )

    def combine(batch: pa.Table) -> pa.Table:
        # 1. position window (hwm, ack] + row events only (DDL is
        # handled driver-side, F9 isolation). Computed on light
        # columns; the payload is untouched unless rows actually drop.
        pos = pack_position(
            batch["segment_id"].to_numpy(zero_copy_only=False),
            batch["offset"].to_numpy(zero_copy_only=False),
        )
        keep = (pos > hwm_pos) & (pos <= ack_pos)
        if cfg.gtid_dedup and txn_hwm >= 0:
            # GTID failover dedup: logical txn identity survives
            # re-segmentation; txns already applied under another
            # source's positions are dropped here (MysqlGtIdSet resume)
            keep &= batch["txn_id"].to_numpy(zero_copy_only=False) > txn_hwm
        op_col = batch["op"]
        # control rows (DDL / TRUNCATE / XA verdicts) never enter the
        # data path — the driver consumes them from the plan (F9
        # isolation; XA fixpoint in plan_batch)
        is_ctl = pc.is_in(
            op_col, value_set=pa.array(["DDL", "T", "XC", "XR"])
        ).to_numpy(zero_copy_only=False)
        keep &= ~is_ctl
        if "xa_id" in batch.column_names:
            # XA branch events apply only when their branch COMMITTED at
            # or below the ack (plan_batch guarantees no branch at/below
            # the ack is unresolved — so "not committed" == rolled back)
            xa_f = batch["xa_id"].to_numpy(zero_copy_only=False).astype(np.float64)
            is_xa = ~np.isnan(xa_f)
            if is_xa.any():
                ok = np.isin(
                    xa_f[is_xa].astype(np.int64), np.asarray(xa_commits, dtype=np.int64)
                )
                drop = is_xa.copy()
                drop[is_xa] = ~ok
                keep &= ~drop
        if has_filters:
            m = filter_mask(batch, cfg)
            keep &= np.asarray(
                m.to_numpy(zero_copy_only=False) if hasattr(m, "to_numpy") else m, dtype=bool
            )
        if not keep.all():
            batch = batch.filter(pa.array(keep))  # the only payload copy
            pos = pos[keep]
        if batch.num_rows == 0:
            return _empty_combined(target_payload, has_patch=has_patch)

        # 1a. PK-change expansion: a row with non-null new_doc_id is an
        # UPDATE whose primary key changed (LogEventConvert.parseOneRow
        # key-diff analog) — it becomes TWO logical rows at the same
        # position: a tombstone at the old key and an upsert at the new
        # key (how a Canal client applies the change). Both count as
        # applied row changes in events_in.
        if "new_doc_id" in batch.column_names:
            nd = batch["new_doc_id"]
            if isinstance(nd, pa.ChunkedArray):
                nd = nd.combine_chunks()
            rk = pc.is_valid(nd).to_numpy(zero_copy_only=False)
            if rk.any():
                rk_arr = pa.array(rk)
                moved = batch.filter(rk_arr)
                op_i = moved.schema.get_field_index("op")
                doc_i = moved.schema.get_field_index("doc_id")
                dels = moved.set_column(
                    op_i, "op", pa.array(np.full(moved.num_rows, "D", dtype=object), pa.string())
                )
                ups = moved.set_column(doc_i, "doc_id", moved["new_doc_id"])
                batch = pa.concat_tables([batch.filter(pc.invert(rk_arr)), dels, ups])
                pos = np.concatenate([pos[~rk], pos[rk], pos[rk]])

        # 1b. multi-table routing: factorize the (low-cardinality)
        # table column; drop unregistered tables (unsubscribed
        # destinations never enter the apply path).
        tcodes = tuniq = None
        if routing is not None or proj_by_table is not None:
            tbl_np = np.asarray(batch["table"].to_numpy(zero_copy_only=False), dtype=object)
            tcodes, tuniq = pd.factorize(tbl_np)
            if routing is not None:
                reg = np.array([t in routing for t in tuniq], dtype=bool)
                if not reg.all():
                    keep_t = reg[tcodes]
                    batch = batch.filter(pa.array(keep_t))
                    pos = pos[keep_t]
                    if batch.num_rows == 0:
                        return _empty_combined(target_payload, has_patch=has_patch)
                    tbl_np = tbl_np[keep_t]
                    tcodes, tuniq = pd.factorize(tbl_np)

        # 2. within-batch LWW partial reduce (vectorized index math).
        # When the batch has few repeated keys the reduce would copy
        # ~all the payload for nothing — pass through instead and let
        # the partition reducer do the single final LWW (it must
        # anyway). Hot-key-heavy batches still collapse here.
        # Multi-table: the LWW key is (table, doc_id) — doc_ids are
        # only unique per table.
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(doc)
        if tcodes is not None and len(tuniq) > 1:
            codes = codes.astype(np.int64) * len(tuniq) + tcodes
            codes = pd.factorize(codes)[0]
        n_unique = codes.max() + 1 if len(codes) else 0
        # partial-JSON patch rows (JsonDiffConversion analog) fold onto
        # PRIOR rows of their doc — the keep-last collapse would drop
        # the image a patch needs; patch-bearing batches ship every row
        # and the apply stage does the single ordered fold per doc
        any_patch = has_patch and batch["patch"].null_count < batch.num_rows
        if n_unique < 0.7 * len(codes) and not any_patch:
            order = np.lexsort((pos, codes))  # by key, then position
            last_of_key = np.ones(len(order), dtype=bool)
            last_of_key[:-1] = codes[order[:-1]] != codes[order[1:]]
            winners = order[last_of_key]
            counts = np.bincount(codes)[codes[winners]]
            batch = batch.take(pa.array(winners))
            pos = pos[winners]
            doc = doc[winners]
            if tcodes is not None:
                tcodes = tcodes[winners]
        else:
            counts = np.ones(batch.num_rows, dtype=np.int64)

        # 3. flatten after-image -> payload columns (zero-copy
        # struct_field views), cast to the batch's target schema.
        # doc_id ships once (meta column); op shrinks to a bool mask —
        # both trim shuffle bytes.
        after = batch["after"].combine_chunks() if isinstance(batch["after"], pa.ChunkedArray) else batch["after"]
        doc_arr = batch["doc_id"]
        if isinstance(doc_arr, pa.ChunkedArray):
            doc_arr = doc_arr.combine_chunks()
        cols: list[pa.Array] = []
        for f in target_payload:
            if f.name == "doc_id":
                continue
            child = None
            for cand in [f.name] + _rev_renames.get(f.name, []):
                try:
                    child = pc.struct_field(after, cand)
                    break
                except (KeyError, pa.ArrowInvalid):
                    continue
            if child is None:
                child = pa.nulls(batch.num_rows, f.type)
            if proj is not None and f.name not in proj:
                child = pa.nulls(batch.num_rows, f.type)  # F5: dropped cell
            elif proj_by_table is not None and tcodes is not None:
                # F5 per-table: null the cell only for rows of tables
                # whose keep-list excludes this column
                drop_codes = [
                    c
                    for c, t in enumerate(tuniq)
                    if t in proj_by_table and f.name not in proj_by_table[t]
                ]
                if drop_codes:
                    keep_cell = ~np.isin(tcodes, drop_codes)
                    if not keep_cell.all():
                        if child.type != f.type:
                            child = child.cast(f.type)
                        child = pc.if_else(
                            pa.array(keep_cell), child, pa.nulls(batch.num_rows, f.type)
                        )
            if child.type != f.type:
                child = child.cast(f.type)
            cols.append(child)

        if routing is not None:
            from clever_canal_ray.state.partitioning import stable_hash

            base_arr = np.array([routing[t][0] for t in tuniq], dtype=np.int64)
            p_arr = np.array([routing[t][1] for t in tuniq], dtype=np.uint64)
            local = (stable_hash(doc) % p_arr[tcodes]).astype(np.int64)
            pids = (base_arr[tcodes] + local).astype(np.int32)
            if cfg.salt_factor > 1:  # same formula as salted_partition_ids, on global pids
                pids = (pids.astype(np.int64) * cfg.salt_factor + (pos % cfg.salt_factor)).astype(np.int32)
        elif cfg.salt_factor > 1:
            from clever_canal_ray.state.partitioning import salted_partition_ids

            pids = salted_partition_ids(doc, cfg.num_partitions, cfg.salt_factor, pos)
        else:
            pids = partition_ids(doc, cfg.num_partitions)
        is_del = pc.equal(batch["op"], "D")
        if isinstance(is_del, pa.ChunkedArray):
            is_del = is_del.combine_chunks()
        meta = [
            pa.array(pids, pa.int32()),
            doc_arr,
            pa.array(pos, pa.int64()),
            is_del,
            pa.array(counts, pa.int64()),
        ]
        names = COMBINE_META + [f"p_{n}" for n in payload_names if n != "doc_id"]
        arrays = meta + cols
        if has_patch:
            pcol = batch["patch"]
            arrays.append(pcol.combine_chunks() if isinstance(pcol, pa.ChunkedArray) else pcol)
            names = names + ["__patch"]
        return pa.Table.from_arrays(arrays, names=names)

    return combine


# columns the combine stage actually needs — passed to read_parquet so
# the (large, unused) `before` struct never leaves storage
def combine_read_columns(
    need_table_col: bool = True,
    need_ts: bool = False,
    need_txn: bool = False,
    need_rekey: bool = False,
    need_xa: bool = False,
    need_patch: bool = False,
) -> list[str]:
    cols = ["segment_id", "offset", "op", "doc_id", "after"]
    if need_table_col:
        cols.insert(3, "table")
    if need_ts:
        cols.append("execute_ts")
    if need_txn:
        cols.append("txn_id")
    if need_rekey:
        cols.append("new_doc_id")
    if need_xa:
        cols.append("xa_id")
    if need_patch:
        cols.append("patch")
    return cols


def _empty_combined(target_payload: pa.Schema, has_patch: bool = False) -> pa.Table:
    names = COMBINE_META + [f"p_{f.name}" for f in target_payload if f.name != "doc_id"]
    arrays = [
        pa.array([], pa.int32()),
        pa.array([], pa.string()),
        pa.array([], pa.int64()),
        pa.array([], pa.bool_()),
        pa.array([], pa.int64()),
    ] + [pa.array([], f.type) for f in target_payload if f.name != "doc_id"]
    if has_patch:
        names = names + ["__patch"]
        arrays.append(pa.array([], pa.string()))
    return pa.Table.from_arrays(arrays, names=names)
