"""The flagship pipeline: binlog-segment replay → lake upsert.

Dataflow per micro-batch (SURVEY.md §7.1), expressed Ray-Data-first:

    ray.data.read_parquet(segment files, position-filter pushdown)
      → map_batches(combine)        # parse/filter/cast + partial LWW  (stateless)
      → groupby("pid")              # THE one hash shuffle
      → map_groups(partition_upsert)# merge-on-read + phase-1 write    (P tasks)
      → take_all()                  # P tiny metrics rows to the driver
    driver: commit_batch()          # phase-2 atomic manifest swap

Driver-side planning reads only the light position/txn/DDL columns of
the batch's segment files (pyarrow row-group pruned) to compute the
transaction-boundary ack — the PositionRange.ack rule: only complete
transactions commit (MemoryEventStoreWithBuffer.java:431-439); the
incomplete tail past the ack stays above the HWM and is re-read by the
next micro-batch (replay-from-cursor, CanalServerWithEmbedded.java:279-292).

DDL events are extracted driver-side (they are rare and tiny) and
appended to the manifest's schema journal — the DDL-isolation analog
(F9, MemoryEventStoreWithBuffer.doGet:389-417): every data event in the
batch is cast to the batch's final schema version, which is lossless
because only additive/widening DDL is legal (FIXTURES.md §3).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.dataset as pds

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.schema import lake_schema, pack_position
from clever_canal_ray.stages.combine import combine_read_columns, make_combine_fn
from clever_canal_ray.stages.reduce import make_desalt_fn, make_partition_upsert_fn
from clever_canal_ray.state.manifest import DuplicateCommitError, Lake, Manifest


@dataclass
class BatchPlan:
    ack: tuple[int, int] | None  # None = nothing committable in window
    new_ddls: list[dict]  # journal entries [{"position": [s,o], "ddl": {...}}]
    n_candidate_events: int
    max_execute_ts: int | None = None  # ms; source-side liveness (F8 analog)


def plan_batch(segment_paths: list[str], hwm: tuple[int, int]) -> BatchPlan:
    """Driver-side light scan: ack position + DDL extraction.

    Reads only (segment_id, offset, txn_commit, op, ddl) — a few bytes
    per event vs the KB-scale token payloads — with the position filter
    pushed into Parquet row-group pruning.
    """
    dset = pds.dataset(segment_paths)
    flt = (pds.field("segment_id") > hwm[0]) | (
        (pds.field("segment_id") == hwm[0]) & (pds.field("offset") > hwm[1])
    )
    meta = dset.to_table(
        columns=["segment_id", "offset", "txn_commit", "op", "ddl", "execute_ts"], filter=flt
    )
    if meta.num_rows == 0:
        return BatchPlan(ack=None, new_ddls=[], n_candidate_events=0)
    import numpy as np

    seg = meta["segment_id"].to_numpy(zero_copy_only=False)
    off = meta["offset"].to_numpy(zero_copy_only=False)
    pos = pack_position(seg, off)
    commit = meta["txn_commit"].to_numpy(zero_copy_only=False).astype(bool)
    if not commit.any():
        return BatchPlan(ack=None, new_ddls=[], n_candidate_events=int(meta.num_rows))
    ack_i = int(np.argmax(np.where(commit, pos, -1)))
    ack = (int(seg[ack_i]), int(off[ack_i]))
    ack_pos = pos[ack_i]

    op = np.asarray(meta["op"].to_numpy(zero_copy_only=False), dtype=object)
    is_ddl = (op == "DDL") & (pos <= ack_pos)
    ddls = []
    if is_ddl.any():
        order = np.argsort(pos[is_ddl], kind="stable")
        ddl_strs = np.asarray(meta["ddl"].to_numpy(zero_copy_only=False), dtype=object)[is_ddl][order]
        ddl_pos_s = seg[is_ddl][order]
        ddl_pos_o = off[is_ddl][order]
        for s, o, d in zip(ddl_pos_s, ddl_pos_o, ddl_strs):
            ddls.append({"position": [int(s), int(o)], "ddl": json.loads(d)})
    n_cand = int((pos <= ack_pos).sum())
    ts = meta["execute_ts"].to_numpy(zero_copy_only=False)
    max_ts = int(ts[pos <= ack_pos].max().astype("datetime64[ms]").astype("int64")) if n_cand else None
    return BatchPlan(ack=ack, new_ddls=ddls, n_candidate_events=n_cand, max_execute_ts=max_ts)


def replay_batch(
    lake: Lake,
    segment_paths: list[str],
    cfg: ReplayConfig | None = None,
    batch_id: int | None = None,
) -> Manifest:
    """Process one micro-batch of segment files; returns the committed
    (or unchanged, if nothing to do / duplicate) manifest."""
    import ray.data as rd

    cfg = cfg or ReplayConfig()
    base = lake.current()
    if batch_id is None:
        batch_id = base.last_batch_id + 1
    if batch_id <= base.last_batch_id:
        # D2: duplicate batch replay is a no-op
        return base

    plan = plan_batch(segment_paths, base.hwm)
    if plan.ack is None:
        return base

    journal = base.ddl_journal + plan.new_ddls
    target_payload = lake_schema([e["ddl"] for e in journal])

    flt = (pds.field("segment_id") > base.hwm[0]) | (
        (pds.field("segment_id") == base.hwm[0]) & (pds.field("offset") > base.hwm[1])
    )
    # prune at the read: the (large) `before` struct and txn-framing
    # columns never leave storage; the full schema is read only when a
    # user predicate (F4) may reference arbitrary columns
    if cfg.predicate is None:
        need_table = bool(
            cfg.table_whitelist_regex or cfg.table_blacklist_regex or cfg.table_list is not None
        )
        columns = combine_read_columns(need_table_col=need_table)
        ds = rd.read_parquet(segment_paths, filter=flt, columns=columns)
    else:
        ds = rd.read_parquet(segment_paths, filter=flt)
    combine = make_combine_fn(cfg, target_payload, base.hwm, plan.ack)
    ds = ds.map_batches(combine, batch_format="pyarrow", batch_size=cfg.batch_size)
    if cfg.salt_factor > 1:
        ds = ds.groupby("pid").map_groups(make_desalt_fn(cfg.salt_factor), batch_format="pyarrow")
    part_files = {int(pid): info["files"] for pid, info in base.partitions.items()}
    upsert = make_partition_upsert_fn(
        lake.dir,
        part_files,
        target_payload,
        batch_id,
        sink_mode=cfg.sink_mode,
        compact_threshold=cfg.compact_threshold,
    )
    metrics_rows = ds.groupby("pid").map_groups(upsert, batch_format="pyarrow").take_all()

    touched = {
        int(r["pid"]): {
            "file": r["file"],
            "rows": r["rows"],
            "rows_upserted": r["rows_upserted"],
            "rows_deleted": r["rows_deleted"],
            "events_in": r["events_in"],
            "mode": r["mode"],
        }
        for r in metrics_rows
    }
    if cfg.before_commit is not None:
        cfg.before_commit(batch_id, plan, touched)
    try:
        m = lake.commit_batch(
            base,
            batch_id=batch_id,
            new_hwm=plan.ack,
            touched=touched,
            new_ddls=plan.new_ddls,
            metrics={"max_execute_ts": plan.max_execute_ts} if plan.max_execute_ts else None,
        )
    except DuplicateCommitError:
        return lake.current()
    if cfg.after_commit is not None:
        cfg.after_commit(m)
    return m


def replay(lake: Lake, segment_paths: list[str], cfg: ReplayConfig | None = None) -> Manifest:
    """Replay a whole segment log as consecutive micro-batches.

    ``segment_paths`` MUST be in ascending (segment_id) order — use
    ``sources.discover_segments`` for multi-directory group sources; a
    lexicographic path sort would interleave shard directories out of
    position order and events behind an already-advanced HWM would be
    (correctly, but surprisingly) skipped as replayed.

    Each micro-batch re-reads the previous batch's final file too, so a
    transaction tail deferred past the previous ack is picked up (the
    position filter makes the overlap cheap — replay-from-cursor).
    """
    cfg = cfg or ReplayConfig()
    paths = list(segment_paths)
    n = cfg.segments_per_batch
    m = lake.current()
    i = 0
    while i < len(paths):
        group = paths[max(0, i - 1) : i + n]  # overlap one file for deferred txn tails
        m = replay_batch(lake, group, cfg)
        i += n
    # one final pass over the trailing files in case an ack was deferred
    if len(paths) > 1:
        m2 = replay_batch(lake, paths[-min(len(paths), n) :], cfg)
        if m2.version != m.version:
            m = m2
    return m
