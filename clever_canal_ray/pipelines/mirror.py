"""Lake→lake incremental replication (cascade mirror).

A downstream replica keeps a full copy of a source lake in lockstep
WITHOUT access to the binlog segments: :func:`mirror_bootstrap` copies
a pinned snapshot (distributed, never through the driver), then each
:func:`mirror_sync` applies the source's incremental change feed
(``Lake.read_changes``) between the last applied source manifest
version and the current one. This is the Canal *cascading* deployment
— one instance consuming another instance's output as its own input
(reference: client adapters replaying a Canal stream into a second
store, client-adapter/launcher CanalAdapterService → per-destination
AbstractCanalAdapterWorker sync loops) — expressed over shared lake
storage instead of a live server connection, and the Iceberg
incremental-scan table-replication pattern.

Exactly-once without a side channel: the mirror's cursor IS the
destination manifest's ``last_batch_id`` — each sync commits with
``batch_id = <source manifest version applied>``, so the data apply
and the cursor advance are ONE atomic manifest swap. A crash between
the delta-file writes and the commit leaves only orphan files
(``Lake.gc`` reaps them) and the retried sync re-applies the same
window; a concurrent duplicate sync hits ``DuplicateCommitError`` and
reads back the committed state (D2 discipline, consumer side).

What the feed window carries across, and how the mirror applies it:

- **upserts / deletes**: the per-key ``latest_only`` collapse of the
  window (tombstones kept) lands as ONE delta file per touched mirror
  partition, ``__seq`` re-stamped to the mirror's batch id (= source
  version — monotone, so LWW across syncs is exact in the mirror's
  own sequence space and the mirror's OWN change feed stays valid).
- **DDLs**: the source journal suffix (everything past the mirror's
  journal length) commits with the batch — column evolution AND
  registry ops (create/drop/rename table) replay, with partition
  ranges allocated in the mirror's own pid space.
- **TRUNCATE**: recorded in the source ledger (``metrics.truncate``);
  the mirror wipes the target range in the same commit and drops
  collapsed feed rows from at-or-below the truncate batch (a key whose
  last write precedes the truncate must die; one written after it
  survives).
- **source repartition / minor compaction**: invisible — both preserve
  per-row ``__seq`` and tombstones, so carried rows fail the feed's
  seq floor.

Constraint (the ``read_changes`` caveat made operational): any write
that RESTAMPS per-row ``__seq`` and folds tombstones — a MAJOR
``Lake.compact()``, the replay reducer's major auto-compact, or any
``sink_mode="compact"`` batch — makes deletes inside the window
invisible to the feed. Both sites stamp the manifest
(``last_major_compact_version`` / ``last_seq_rewrite_version``) and
``mirror_sync`` refuses a window spanning either stamp with
:class:`MirrorWindowError`. Operate mirrored sources with
``sink_mode="delta"`` + ``compact_mode="minor"``, and sync before any
major compact. A source ``rollback_to_version`` below the mirror's
cursor also requires re-bootstrapping (the mirror only moves forward).

Reference parity note: Canal solves the same problem with an MQ relay
(FlatMessage → consumer); that path ships too (sources/flat_json.py
round trip). The mirror is the storage-level variant: no broker, no
re-serialization, reads only files added in the window.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from clever_canal_ray.state.manifest import (
    DuplicateCommitError,
    Lake,
    Manifest,
    route_ddls,
)
from clever_canal_ray.state.partitioning import partition_ids


class MirrorWindowError(RuntimeError):
    """The sync window cannot be applied exactly from the change feed
    (major compaction / seq-rewrite inside it, gc'd manifests, journal
    divergence, or more than one table truncated). Re-bootstrap, or
    narrow the window by syncing more often."""


def mirror_bootstrap(
    src: Lake,
    dst_dir: str,
    num_partitions: int | None = None,
    src_version: int | None = None,
    transform=None,
) -> Lake:
    """Create a mirror of ``src`` at a pinned manifest version.

    Distributed copy: the snapshot streams straight from the source
    partition files into the mirror's writers (``create_from_dataset``
    machinery — the dump never lands on the driver). The mirror's
    cursor is stamped so the first :func:`mirror_sync` picks up exactly
    where the snapshot was pinned.

    ``num_partitions``: mirror partition count (default: same as the
    source; multi-table lakes always copy the source's per-table
    layout). The mirror re-hashes by key, so a different count is fine.
    """
    v0 = src.current().version if src_version is None else int(src_version)
    m0 = src.manifest_at(v0)
    if transform is None:
        transform = lambda ds: ds  # noqa: E731
    if m0.tables is not None:
        initials = {
            name: transform(src.read_dataset(m=m0, table=name)) for name in sorted(m0.tables)
        }
        ppt = {name: t["num_partitions"] for name, t in m0.tables.items()}
        journals = {name: list(t["ddl_journal"]) for name, t in m0.tables.items()}
        dst = Lake.create_multi_from_datasets(
            dst_dir,
            initials,
            partitions_per_table=ppt,
            start_position=tuple(m0.hwm),
            ddl_journals=journals,
        )
        # registry history before v0 lives only in the top-level journal
        # (route_ddls applied it already); carry it so the journal-prefix
        # check in mirror_sync sees the same suffix the source appends
        if m0.ddl_journal:
            cur = dst.current()
            old_name = getattr(cur, "_obj_name", None)
            cur.ddl_journal.extend(m0.ddl_journal)
            cur.schema_version = len(cur.ddl_journal)
            # same-version amend: a NEW uniquely-named object keeping
            # the original's parent, CAS'd in over the original
            name = dst._write_manifest(cur, parent=cur.parent)
            dst._swap_current(name, expected=old_name)
    else:
        dst = Lake.create_from_dataset(
            dst_dir,
            transform(src.read_dataset(m=m0)),
            num_partitions=num_partitions or m0.num_partitions,
            start_position=tuple(m0.hwm),
            ddl_journal=list(m0.ddl_journal),
        )
    # cursor stamp: last_batch_id = source version applied (atomic with
    # the commit; an empty batch here, data came via the bootstrap)
    dst.commit_batch(
        dst.current(),
        batch_id=v0,
        new_hwm=tuple(m0.hwm),
        touched={},
        metrics={"mirror_source_version": v0, "mirror_bootstrap": True},
        new_txn_hwm=m0.txn_hwm if m0.txn_hwm >= 0 else None,
    )
    return dst


def _window_truncates(src: Lake, floor_batch: int, ceil_batch: int, m_ceil=None) -> dict:
    """Truncates committed in (floor_batch, ceil_batch], from the
    source ledger: target (True = whole lake, str = table) -> LAST
    truncate batch id for that target.

    Fast path: the ceiling manifest's inline ring (last LEDGER_KEEP
    records) covers the window whenever it is not full OR its oldest
    record is at/below the floor — O(64) per sync instead of re-reading
    the whole ledger.jsonl on every poll of a long-lived ``--follow``
    loop. A mirror lagging further than the ring falls back to the
    full-history sidecar."""
    from clever_canal_ray.state.manifest import LEDGER_KEEP

    recs = None
    if m_ceil is not None and m_ceil.ledger:
        ids = [r.get("batch_id", -1) for r in m_ceil.ledger]
        if len(m_ceil.ledger) < LEDGER_KEEP or min(ids) <= floor_batch:
            recs = m_ceil.ledger
    if recs is None:
        recs = src.full_ledger()
    out: dict = {}
    for rec in recs:
        b = rec.get("batch_id", -1)
        t = rec.get("truncate")
        if t and floor_batch < b <= ceil_batch:
            out[t] = max(out.get(t, -1), b)
    return out


def _apply_feed(
    dst_dir: str,
    feed,
    base_pid: int,
    num_partitions: int,
    batch_id: int,
    trunc_batch: int | None,
) -> dict[int, dict]:
    """Route one table's collapsed feed window into mirror partitions:
    tag pid → one bucketed shuffle → ONE writer task per touched
    partition (single-writer invariant; only P one-row metric records
    return to the driver). Rows at-or-below ``trunc_batch`` drop (the
    truncate in this window kills them); ``__seq`` re-stamps to
    ``batch_id``; ``__deleted`` tombstones pass through."""

    def tag(t: pa.Table) -> pa.Table:
        if trunc_batch is not None:
            t = t.filter(pc.greater(t["__seq"], pa.scalar(trunc_batch, pa.int64())))
        t = t.drop_columns(["__seq"])  # re-stamped by the writer
        pid = partition_ids(t["doc_id"].to_numpy(zero_copy_only=False), num_partitions)
        return t.append_column(
            "__pid", pa.array(pid + np.int32(base_pid), pa.int32())
        )

    def write_group(group: pa.Table) -> pa.Table:
        pid = int(group["__pid"][0].as_py())
        body = group.drop_columns(["__pid"]).combine_chunks()
        # _write_part_file stamps __seq=batch_id (absent), keeps
        # __deleted, and writes the key-bloom sidecar for lookups
        rel = Lake(dst_dir)._write_part_file(body, pid, batch_id)
        dead = int(pc.sum(body["__deleted"]).as_py() or 0)
        return pa.Table.from_pydict(
            {
                "pid": pa.array([pid], pa.int32()),
                "file": pa.array([rel], pa.string()),
                "rows": pa.array([body.num_rows], pa.int64()),
                "rows_deleted": pa.array([dead], pa.int64()),
            }
        )

    metrics = (
        feed.map_batches(tag, batch_format="pyarrow")
        .groupby("__pid")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )  # ≤ P one-row dicts — the only driver-side materialization
    return {
        int(r["pid"]): {
            "file": r["file"],
            "rows": int(r["rows"]),
            "mode": "append",
            "rows_upserted": int(r["rows"]) - int(r["rows_deleted"]),
            "rows_deleted": int(r["rows_deleted"]),
            "events_in": int(r["rows"]),
        }
        for r in metrics
    }


def mirror_sync(src: Lake, dst: Lake, to_version: int | None = None, transform=None) -> dict:
    """Apply the source's change-feed window (cursor, ``to_version``]
    to the mirror in one atomic commit. Returns a summary dict;
    ``noop=True`` when already caught up. Raises
    :class:`MirrorWindowError` when the window cannot be applied
    exactly (see module docstring).

    ``transform``: optional ``Dataset -> Dataset`` hook applied to each
    collapsed feed window before it routes into the mirror — the
    derived-mirror extension point (e.g. incremental curation flips
    filtered-out rows to tombstones). The transform must preserve the
    feed schema (payload + ``__seq`` + ``__deleted``) and must be
    DETERMINISTIC per row: a crash-retried sync re-runs it over the
    same window and has to produce the same commit."""
    dst_m = dst.current()
    v0 = dst_m.last_batch_id
    if v0 < 0:
        raise MirrorWindowError(
            f"{dst.dir} has no mirror cursor — create it with mirror_bootstrap()"
        )
    src_cur = src.current()
    v1 = src_cur.version if to_version is None else int(to_version)
    if v1 < v0:
        raise MirrorWindowError(
            f"source at version {v1} is BELOW the mirror cursor {v0} "
            "(rollback_to_version on the source?) — re-bootstrap the mirror"
        )
    if v1 == v0:
        return {"applied_source_version": v0, "rows": 0, "noop": True}
    m1 = src_cur if v1 == src_cur.version else src.manifest_at(v1)
    try:
        m0 = src.manifest_at(v0)
    except FileNotFoundError:
        raise MirrorWindowError(
            f"source manifest v{v0} is gone (gc'd past the mirror cursor) — "
            "raise gc(keep_manifests) above the sync lag, or re-bootstrap"
        ) from None
    # seq-rewrite hazard: a major compact / compact-sink batch inside
    # the window restamped rows and folded tombstones — deletes in the
    # window are unrecoverable from the feed
    for stamp in ("last_major_compact_version", "last_seq_rewrite_version"):
        sv = int(m1.metrics.get(stamp, -1))
        if v0 < sv <= v1:
            raise MirrorWindowError(
                f"window ({v0}, {v1}] spans a seq-rewriting write "
                f"({stamp}={sv}): deletes folded into it cannot be mirrored. "
                "Sync before major compaction; keep mirrored sources on "
                'sink_mode="delta" + compact_mode="minor".'
            )
    if (m1.tables is None) != (dst_m.tables is None):
        raise MirrorWindowError("source/mirror single- vs multi-table layouts differ")
    # DDL suffix: the mirror's journal must be a prefix of the source's
    dj, sj = dst_m.ddl_journal, m1.ddl_journal
    if dj != sj[: len(dj)]:
        raise MirrorWindowError(
            "mirror DDL journal diverged from the source — re-bootstrap"
        )
    new_ddls = sj[len(dj):]
    # truncates in the window, by source batch id; at most one target
    # per sync commit (sync more often across multi-truncate windows)
    truncs = _window_truncates(src, m0.last_batch_id, m1.last_batch_id, m_ceil=m1)
    if m1.tables is not None:
        routing_after = (
            route_ddls(dst_m.tables, new_ddls, min_new_base=dst_m.next_base_pid())
            if new_ddls
            else dst_m.tables
        )
        if set(routing_after) != set(m1.tables):
            raise MirrorWindowError(
                f"table registries diverged after DDL replay: mirror "
                f"{sorted(routing_after)} vs source {sorted(m1.tables)} — re-bootstrap"
            )
        # an unregistered-table truncate was a no-op on the source too
        truncs = {t: b for t, b in truncs.items() if t in routing_after}
    if len(truncs) > 1:
        raise MirrorWindowError(
            f"window ({v0}, {v1}] truncates {sorted(map(str, truncs))} — one "
            "truncate target per sync; sync at or between the truncates"
        )
    trunc_target = next(iter(truncs), False)
    touched: dict[int, dict] = {}
    if m1.tables is None:
        feed = src.read_changes(v0, to_version=v1, latest_only=True)
        if transform is not None:
            feed = transform(feed)
        touched = _apply_feed(
            dst.dir, feed, 0, dst_m.num_partitions, v1, truncs.get(trunc_target)
        )
    else:
        for name in sorted(m1.tables):
            feed = src.read_changes(v0, to_version=v1, table=name, latest_only=True)
            if transform is not None:
                feed = transform(feed)
            trec = routing_after[name]
            touched.update(
                _apply_feed(
                    dst.dir,
                    feed,
                    trec["base_pid"],
                    trec["num_partitions"],
                    v1,
                    truncs.get(name),
                )
            )
    rows = sum(i["rows"] for i in touched.values())
    try:
        dst.commit_batch(
            dst_m,
            batch_id=v1,
            new_hwm=tuple(m1.hwm),
            touched=touched,
            new_ddls=new_ddls or None,
            metrics={"mirror_source_version": v1},
            truncate=trunc_target,
            new_txn_hwm=m1.txn_hwm if m1.txn_hwm >= 0 else None,
        )
    except DuplicateCommitError:
        # a concurrent sync won the swap; our files are orphans (gc)
        return {
            "applied_source_version": dst.current().last_batch_id,
            "rows": 0,
            "noop": True,
            "lost_race": True,
        }
    return {
        "applied_source_version": v1,
        "rows": rows,
        "partitions_touched": len(touched),
        "ddls_applied": len(new_ddls),
        "truncated": str(trunc_target) if trunc_target else None,
        "noop": False,
    }
