"""Lake manifest: two-phase commit, HWM, batch ledger, schema journal.

This single small JSON structure replaces three reference subsystems:

- **LogPositionManager** (parse/index/*.java) — the ingest high-water
  mark ``hwm = (segment_id, offset)``, always a transaction boundary
  (PositionRange.ack semantics, MemoryEventStoreWithBuffer.java:431-439).
- **MetaManager** (MemoryMetaManager.java:19-318) — the batch ledger
  with FIFO/duplicate-commit rejection (removePositionRange FIFO check
  at MemoryMetaManager.java:236-247 → here: committing a batch_id ≤
  the committed HWM batch is a detected no-op, D2).
- **TableMetaTSDB** (DatabaseTableMeta.java:177-281) — the DDL journal
  (history rows) plus the current-schema snapshot, replayed on load.

Commit protocol (two-phase):
  1. reduce tasks write uniquely-named Parquet data files under
     ``lake_dir/part=<pid>/`` (phase 1 — invisible until referenced);
  2. the driver PUTs a UNIQUELY-NAMED
     ``_manifest/manifest-<v+1>-<uuid>.json`` listing the exact files
     per partition (phase 2a — still invisible), then publishes it with
     a compare-and-swap of the ``_CURRENT`` pointer against the
     manifest object name it loaded as base (phase 2b — the single
     linearization point; losing the CAS raises CommitConflictError).
Orphan files from failed/retried Ray tasks — and orphan manifests from
CAS losers or writers that died between 2a and 2b — are never
referenced, so retries are safe; a re-committed batch is rejected by
the ledger. History is the ``parent`` chain walked from ``_CURRENT``
(manifest_at / gc), never filename arithmetic, so abandoned timelines
after a rollback can never shadow the live one.

On a real cluster ``lake_dir`` must be shared storage (NFS/S3/HDFS);
the protocol runs on a pluggable backend (state/storage.py): POSIX
swaps the pointer atomically under a lock, object stores map the swap
to a conditional PUT (S3 If-Match / GCS generation-match) and the
history journal to per-record immutable objects — proven end to end by
tests/test_object_store_backend.py, including the two-writer race.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from clever_canal_ray.schema import (
    lake_schema,
    reverse_renames_from_metadata,
    upcast_table,
    widen_union,
)
from clever_canal_ray.state import filestats
from clever_canal_ray.state.partitioning import partition_ids
from clever_canal_ray.state.storage import StorageCASError, storage_for


# engine-internal columns carried in every lake data file:
#   __seq     — the batch_id that wrote the file (-1 = initial load);
#               per-partition last-writer-wins merge key across files
#   __deleted — tombstone flag (delta sink mode writes tombstone rows)
HELPER_COLS = ("__seq", "__deleted")

# ledger records kept inline in the manifest JSON; full history lives in
# the append-only _manifest/ledger.jsonl sidecar (Lake.full_ledger()).
# Bounds per-commit manifest size/IO to O(P + K) instead of O(batches).
LEDGER_KEEP = 64

# footer-signature sets for the filtered-read pushdown check, keyed by
# (lake dir, manifest version, table) — files under a committed version
# are immutable so entries never go stale; bounded by periodic clear
_PUSHDOWN_SIG_CACHE: dict = {}

# file-order tie-break headroom per __seq in merge_partition_files
_SEQ_RANK_STRIDE = 1 << 20


def _strip_helpers(table: pa.Table) -> pa.Table:
    drop = [c for c in HELPER_COLS if c in table.column_names]
    return table.drop_columns(drop) if drop else table


def _pruned_schema(target: pa.Schema, columns: list[str]) -> pa.Schema:
    """Selected payload fields, with doc_id (the merge key) always
    first. The target's metadata (the rename map, attach_renames) rides
    along so upcast/merge still resolve pre-rename files."""
    names = ["doc_id"] + [c for c in columns if c != "doc_id"]
    return pa.schema([target.field(n) for n in names], metadata=target.metadata)


def _file_read_columns(path: str, needed: list[str], rev: dict) -> list[str]:
    """Physical columns to read from ``path`` for the logical ``needed``
    list: intersect with the file's footer AND include the old physical
    names of renamed columns (files written before a rename_column DDL
    carry the old name on disk — ``rev`` is upcast_table's reverse
    rename map, final → [old names])."""
    have = set(pq.read_schema(path).names)
    out = []
    for c in needed:
        if c in have:
            out.append(c)
        for old in rev.get(c, ()):
            if old in have:
                out.append(old)
    return out


def _validate_columns(columns, target: pa.Schema, what: str) -> None:
    missing = [c for c in columns if target.get_field_index(c) < 0]
    if missing:
        raise ValueError(f"read_dataset: columns not in the {what} schema: {missing}")


def _read_files_pruned(files: list[str], read_h: pa.Schema, scan_filter=None):
    """``rd.read_parquet`` with column pushdown across heterogeneous
    footers: group files by which of the needed PHYSICAL columns they
    actually have (schema evolution — pre-DDL files lack later columns;
    pre-rename files carry a renamed column's OLD name), read each
    group with its subset, up-cast to ``read_h`` (missing → null,
    renames coalesce via the metadata map), union. Engine-written files
    always carry the helper columns (_write_part_file →
    ensure_helper_columns)."""
    import ray.data as rd

    needed = [f.name for f in read_h]
    rev = reverse_renames_from_metadata(read_h)
    groups: dict[frozenset, list] = {}
    for f in files:
        groups.setdefault(frozenset(_file_read_columns(f, needed, rev)), []).append(f)

    def widen(t: pa.Table, s=read_h) -> pa.Table:
        return upcast_table(t, s)

    kw = {} if scan_filter is None else {"filter": scan_filter}
    parts = [
        rd.read_parquet(fs, columns=sorted(key), **kw).map_batches(
            widen, batch_format="pyarrow"
        )
        for key, fs in groups.items()
    ]
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]


def ensure_helper_columns(table: pa.Table, seq: int, deleted=None) -> pa.Table:
    if "__seq" not in table.column_names:
        import numpy as np

        table = table.append_column("__seq", pa.array(np.full(len(table), seq, np.int64), pa.int64()))
    if "__deleted" not in table.column_names:
        if deleted is None:
            import numpy as np

            deleted = pa.array(np.zeros(len(table), bool), pa.bool_())
        table = table.append_column("__deleted", deleted)
    return table


def merge_partition_files(
    tables: list[pa.Table], target: pa.Schema, keep_seq: bool = False
) -> pa.Table:
    """Merge-on-read of one partition's files (manifest list order):
    last-writer-wins per doc_id by (__seq, file order), tombstones
    dropped, result up-cast to ``target`` without helper columns.

    ``keep_seq=True``: each winner retains its ORIGINAL per-row
    ``__seq`` (the batch that wrote it) in the output — used by major
    compaction so rewritten files stay exact under the
    ``Lake.read_changes`` incremental filter (``__seq > floor``)."""
    import numpy as np

    target_h = pa.schema(
        list(target) + [pa.field("__seq", pa.int64()), pa.field("__deleted", pa.bool_())],
        metadata=target.metadata,  # carries the rename map for upcast
    )
    # file order within the manifest breaks __seq ties (same-batch
    # rewrite); encoded as a stride rank — the stride bounds how many
    # files one partition may accumulate between compactions
    if len(tables) >= _SEQ_RANK_STRIDE:
        raise ValueError(
            f"partition has {len(tables)} files; merge rank supports < {_SEQ_RANK_STRIDE} "
            "— compact() the lake more often"
        )
    parts = []
    for i, t in enumerate(tables):
        t = ensure_helper_columns(t, seq=-1)
        t = upcast_table(t, target_h)
        t = t.set_column(
            t.schema.get_field_index("__seq"),
            "__seq",
            pa.array(
                t["__seq"].to_numpy(zero_copy_only=False) * _SEQ_RANK_STRIDE + i, pa.int64()
            ),
        )
        parts.append(t)
    merged = pa.concat_tables(parts)
    if merged.num_rows == 0:
        return target.empty_table()
    import pandas as pd

    doc = merged["doc_id"].to_numpy(zero_copy_only=False)
    seq = merged["__seq"].to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(doc)
    order = np.lexsort((seq, codes))
    last = np.ones(len(order), dtype=bool)
    last[:-1] = codes[order[:-1]] != codes[order[1:]]
    winners = order[last]
    out = merged.take(pa.array(winners))
    alive = pc.invert(out["__deleted"].combine_chunks() if isinstance(out["__deleted"], pa.ChunkedArray) else out["__deleted"])
    out = out.filter(alive)
    if keep_seq:
        orig_seq = out["__seq"].to_numpy(zero_copy_only=False) // _SEQ_RANK_STRIDE
        kept = upcast_table(_strip_helpers(out), target)
        return kept.append_column("__seq", pa.array(orig_seq, pa.int64()))
    return upcast_table(_strip_helpers(out), target)


def merge_delta_files(tables: list[pa.Table], target: pa.Schema) -> pa.Table:
    """Minor-compaction merge of one partition's DELTA files (the base
    file excluded): last-writer-wins per doc_id by (__seq, file order),
    but — unlike :func:`merge_partition_files` — tombstones are KEPT and
    every winner retains its ORIGINAL per-row ``__seq``. The output is
    itself a valid delta file: read paths order versions by ``__seq``
    alone (see ``read_dataset``), so preserving per-row seqs keeps the
    total order against both the untouched base and any future deltas.

    The LSM "minor compaction" analog: bounds a partition's file count
    without ever rewriting the (potentially much larger) base file —
    the maintenance write cost is O(delta bytes), not O(partition
    bytes). Reference trade-off mirror: MemoryEventStoreWithBuffer's
    ring never rewrites acked history either (SURVEY.md §3)."""
    import numpy as np
    import pandas as pd

    target_h = pa.schema(
        list(target) + [pa.field("__seq", pa.int64()), pa.field("__deleted", pa.bool_())],
        metadata=target.metadata,  # carries the rename map for upcast
    )
    parts = [upcast_table(ensure_helper_columns(t, seq=-1), target_h) for t in tables]
    merged = pa.concat_tables(parts)
    clean = pa.schema(list(target_h))  # data files carry no schema metadata
    if merged.num_rows == 0:
        return clean.empty_table()
    doc = merged["doc_id"].to_numpy(zero_copy_only=False)
    seq = merged["__seq"].to_numpy(zero_copy_only=False)
    # file order breaks same-__seq ties exactly like the rank stride in
    # merge_partition_files (kept as a separate sort key so the stored
    # per-row __seq values are never altered)
    rank = np.repeat(np.arange(len(parts), dtype=np.int64), [t.num_rows for t in parts])
    codes, _ = pd.factorize(doc)
    order = np.lexsort((rank, seq, codes))
    last = np.ones(len(order), dtype=bool)
    last[:-1] = codes[order[:-1]] != codes[order[1:]]
    out = merged.take(pa.array(order[last]))
    return out.replace_schema_metadata(None)


def _fan_out(fn, todo: list[tuple]) -> list:
    """Maintenance-op harness shared by ``compact()`` and
    ``repartition()``: one ``num_cpus=1`` Ray task per work item when a
    Ray session exists, serial fallback otherwise (library code never
    initializes Ray itself)."""
    try:
        import ray

        ray_ok = ray.is_initialized()
    except ImportError:  # pragma: no cover
        ray_ok = False
    if ray_ok and len(todo) > 1:
        import ray

        remote = ray.remote(num_cpus=1)(fn)
        return ray.get([remote.remote(*args) for args in todo])
    return [fn(*args) for args in todo]


# per-(batch, partition) metrics sidecar schema (FIXTURES.md §4)
METRICS_PARTITION_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("batch_id", pa.int64()),
        ("hwm_segment_id", pa.int32()),
        ("hwm_offset", pa.int64()),
        ("schema_version", pa.int32()),
        ("rows_upserted", pa.int64()),
        ("rows_deleted", pa.int64()),
        ("events_in", pa.int64()),
    ]
)


# DDL verbs that alter the table REGISTRY rather than one table's
# schema (DruidDdlParser CREATE/ERASE/RENAME classification analog)
REGISTRY_DDL_OPS = ("create_table", "drop_table", "rename_table")


def route_ddls(
    tables: dict[str, dict], new_ddls: list[dict], min_new_base: int = 0
) -> dict[str, dict]:
    """Copy ``tables`` with each DDL journal entry applied: column DDLs
    append to their target table's journal; registry DDLs
    (create/drop/rename_table) mutate the registry itself. Multi-table
    DDLs must carry the table name in the ddl record
    (``{"op": ..., "table": "db.tbl"}``) — the Header.schemaName/
    tableName routing rule. ``min_new_base``: lowest pid a created
    table may claim (pass Manifest.next_base_pid() so a dropped table's
    partition range is never reused while its files may survive)."""
    out = {n: {**t, "ddl_journal": list(t["ddl_journal"])} for n, t in tables.items()}
    for e in new_ddls:
        d = e["ddl"]
        op = d["op"]
        name = d.get("table")
        if op == "create_table":
            if name in out:
                raise KeyError(f"create_table: {name!r} already exists")
            base = max(
                [min_new_base] + [t["base_pid"] + t["num_partitions"] for t in out.values()]
            )
            out[name] = {
                "base_pid": base,
                "num_partitions": int(d.get("num_partitions", 8)),
                "ddl_journal": [],
            }
        elif op == "drop_table":
            if name not in out:
                raise KeyError(f"drop_table: unknown table {name!r}")
            del out[name]
        elif op == "rename_table":
            dst = d["to"]
            if name not in out:
                raise KeyError(f"rename_table: unknown table {name!r}")
            if dst in out:
                raise KeyError(f"rename_table: {dst!r} already exists")
            out[dst] = out.pop(name)
        else:
            if name not in out:
                raise KeyError(
                    f"DDL targets unknown table {name!r} (registered: {sorted(out)})"
                )
            out[name]["ddl_journal"].append(e)
    return out


class DuplicateCommitError(Exception):
    """Batch already committed — replay must treat this as a no-op."""


class CommitConflictError(Exception):
    """Manifest advanced underneath us (lost the single-writer race)."""


@dataclass
class Manifest:
    version: int
    num_partitions: int
    hwm: tuple[int, int]  # (segment_id, offset), inclusive, txn boundary
    last_batch_id: int
    schema_version: int
    # GTID analog (MysqlGtIdSet / UUIDSet, driver/.../MysqlGtIdSet.java):
    # the highest LOGICAL transaction id fully applied. Txn ids survive
    # re-segmentation (a mirror or archived copy of the stream numbers
    # its files differently but keeps txn identity), so a failover
    # source replays exactly-once via `ReplayConfig.gtid_dedup` even
    # though its (segment_id, offset) positions are incomparable.
    txn_hwm: int = -1
    # full MySQL-format gtid_executed audit string ("uuid:0-N[,...]")
    # maintained from txn_hwm transitions when ReplayConfig.source_uuid
    # is set — the resume/failover audit surface (state/gtid.GtidSet)
    gtid_executed: str = ""
    ddl_journal: list[dict] = field(default_factory=list)  # [{"position":[s,o],"ddl":{...}}]
    partitions: dict[str, dict] = field(default_factory=dict)  # pid -> {"files":[rel], "rows":n}
    # last LEDGER_KEEP committed batch records; full history is the
    # append-only ledger.jsonl sidecar (Lake.full_ledger())
    ledger: list[dict] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)
    # multi-table lakes (reference: routing by Header.schemaName/tableName,
    # EntryProtocol.proto:80-113; per-table meta TableMetaCache.java:45-76):
    # name -> {"base_pid": int, "num_partitions": int, "ddl_journal": [...]}.
    # Each table owns the global pid range [base_pid, base_pid+num_partitions);
    # None = single-table lake (legacy layout, ddl_journal at top level).
    tables: dict[str, dict] | None = None
    # object name of the previous committed manifest — manifests are
    # uniquely named (CAS losers leave harmless orphans), so history is
    # resolved by walking this chain from _CURRENT, not by filename
    # arithmetic. "" = v0 or a legacy (deterministically-named) parent.
    parent: str = ""

    @property
    def payload_schema(self) -> pa.Schema:
        """Single-table: the journal-evolved schema. Multi-table: the
        union of every table's schema (what the combine stage flattens
        to; each partition casts down to its table's schema)."""
        if self.tables is None:
            return lake_schema([e["ddl"] for e in self.ddl_journal])
        return widen_union([self.schema_of_table(t) for t in sorted(self.tables)])

    # -- multi-table helpers ----------------------------------------------

    def schema_of_table(self, name: str) -> pa.Schema:
        if self.tables is None:
            raise ValueError("single-table lake: use payload_schema")
        return lake_schema([e["ddl"] for e in self.tables[name]["ddl_journal"]])

    def table_of_pid(self, pid: int) -> str:
        for name, t in self.tables.items():
            if t["base_pid"] <= pid < t["base_pid"] + t["num_partitions"]:
                return name
        raise KeyError(f"pid {pid} not in any table range")

    def schema_of_pid(self, pid: int) -> pa.Schema:
        if self.tables is None:
            return self.payload_schema
        return self.schema_of_table(self.table_of_pid(pid))

    def routing(self) -> dict[str, tuple[int, int]] | None:
        """table name -> (base_pid, num_partitions), or None (single)."""
        if self.tables is None:
            return None
        return {n: (t["base_pid"], t["num_partitions"]) for n, t in self.tables.items()}

    def next_base_pid(self) -> int:
        """Lowest pid a newly created table may claim: past every live
        range AND every pid that ever held files (a dropped table's
        range is not reused while its files may survive on disk)."""
        ends = [t["base_pid"] + t["num_partitions"] for t in (self.tables or {}).values()]
        pids = [int(p) + 1 for p in self.partitions]
        return max(ends + pids + [self.num_partitions])

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "num_partitions": self.num_partitions,
                "hwm": list(self.hwm),
                "last_batch_id": self.last_batch_id,
                "schema_version": self.schema_version,
                "txn_hwm": self.txn_hwm,
                "gtid_executed": self.gtid_executed,
                "ddl_journal": self.ddl_journal,
                "partitions": self.partitions,
                "ledger": self.ledger,
                "metrics": self.metrics,
                "tables": self.tables,
                "parent": self.parent,
            },
            separators=(",", ":"),
        )

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        return Manifest(
            version=d["version"],
            num_partitions=d["num_partitions"],
            hwm=tuple(d["hwm"]),
            last_batch_id=d["last_batch_id"],
            schema_version=d["schema_version"],
            txn_hwm=d.get("txn_hwm", -1),
            gtid_executed=d.get("gtid_executed", ""),
            ddl_journal=d["ddl_journal"],
            partitions=d["partitions"],
            ledger=d["ledger"],
            metrics=d.get("metrics", {}),
            tables=d.get("tables"),
            parent=d.get("parent", ""),
        )


class Lake:
    """A hash-partitioned Parquet lake with manifest-tracked state."""

    def __init__(self, lake_dir: str, storage=None):
        self.dir = lake_dir
        self.manifest_dir = os.path.join(lake_dir, "_manifest")
        # backend for manifest/pointer/ledger I/O (posix default; a lake
        # created object-store-backed is stamped with a _STORAGE marker
        # so every later Lake(dir) — CLI, tests, workers — resolves the
        # same backend). Data files are uniquely-named write-once
        # parquet on BOTH backends (PUT semantics), written directly.
        self.storage = storage or storage_for(lake_dir)

    # -- creation ---------------------------------------------------------

    @staticmethod
    def _normalize_journal(entries) -> list[dict]:
        """Accept raw DDL dicts or full journal entries; a snapshot
        DDL's position is at-or-below the dump position (unknown ⇒
        [-1,-1])."""
        return [
            e if "ddl" in e else {"position": [-1, -1], "ddl": e} for e in (entries or [])
        ]

    @staticmethod
    def _begin_create(lake_dir: str) -> "Lake":
        """Shared creation preamble: refuse to clobber an existing lake
        (a pointed _CURRENT means committed state lives here — resume
        with ``Lake(dir)`` instead)."""
        lake = Lake(lake_dir)
        if lake.storage.exists(os.path.join(lake.manifest_dir, "_CURRENT")):
            raise FileExistsError(
                f"{lake_dir} already holds a committed lake; open it with Lake(dir) "
                "or choose a fresh directory"
            )
        lake.storage.makedirs(lake.manifest_dir)
        return lake

    def _finish_create(self, m: Manifest) -> "Lake":
        name = self._write_manifest(m, parent="")
        try:
            # create-only CAS (expected=None): two racing creators
            # cannot both win even if they passed _begin_create's probe
            self._swap_current(name, expected=None)
        except CommitConflictError:
            raise FileExistsError(
                f"{self.dir} already holds a committed lake; open it with "
                "Lake(dir) or choose a fresh directory"
            ) from None
        return self

    @staticmethod
    def _multi_parts(writer, initials: dict, partitions_per_table, ddl_journals):
        """Shared multi-table loop: table i owns the contiguous pid
        range [base_i, base_i + P_i); per-table DDL journals seed the
        TableMetaCache-analog schema state."""
        tables: dict[str, dict] = {}
        parts: dict[str, dict] = {}
        base = 0
        for name in sorted(initials):
            p = int(
                partitions_per_table[name]
                if isinstance(partitions_per_table, dict)
                else partitions_per_table
            )
            parts.update(writer(initials[name], p, base))
            tables[name] = {
                "base_pid": base,
                "num_partitions": p,
                "ddl_journal": Lake._normalize_journal((ddl_journals or {}).get(name)),
            }
            base += p
        return parts, tables, base

    @staticmethod
    def create(
        lake_dir: str,
        table: pa.Table,
        num_partitions: int = 16,
        start_position: tuple[int, int] = (-1, -1),
        ddl_journal: list[dict] | None = None,
    ) -> "Lake":
        """Bootstrap a lake from an initial driver-side table.

        ``start_position`` / ``ddl_journal``: see
        :meth:`create_from_dataset` (same handoff semantics, driver-side
        snapshot)."""
        lake = Lake._begin_create(lake_dir)
        journal = Lake._normalize_journal(ddl_journal)
        return lake._finish_create(
            Manifest(
                version=0,
                num_partitions=num_partitions,
                hwm=tuple(start_position),
                last_batch_id=-1,
                schema_version=len(journal),
                ddl_journal=journal,
                partitions=lake._write_initial_partitions(table, num_partitions, base_pid=0),
            )
        )

    @staticmethod
    def create_multi(
        lake_dir: str,
        initials: dict[str, pa.Table],
        partitions_per_table: int | dict = 8,
        start_position: tuple[int, int] = (-1, -1),
        ddl_journals: dict[str, list] | None = None,
    ) -> "Lake":
        """Bootstrap a MULTI-TABLE lake: one manifest, one global pid
        space — table i owns the contiguous pid range
        [base_i, base_i + P_i). Events route by their ``table`` column
        (Header.schemaName/tableName, EntryProtocol.proto:80-113);
        every table keeps its own DDL journal (TableMetaCache.java:45-76
        per-table meta analog), seedable per table via ``ddl_journals``
        for dumps taken after mid-stream DDLs."""
        lake = Lake._begin_create(lake_dir)
        parts, tables, base = Lake._multi_parts(
            lake._write_initial_partitions, initials, partitions_per_table, ddl_journals
        )
        return lake._finish_create(
            Manifest(
                version=0,
                num_partitions=base,
                hwm=tuple(start_position),
                last_batch_id=-1,
                schema_version=0,
                partitions=parts,
                tables=tables,
            )
        )

    @staticmethod
    def create_from_dataset(
        lake_dir: str,
        ds,
        num_partitions: int | None = 16,
        start_position: tuple[int, int] = (-1, -1),
        ddl_journal: list[dict] | None = None,
    ) -> "Lake":
        """DISTRIBUTED snapshot bootstrap: hash-partition a
        ``ray.data.Dataset`` of payload rows by ``doc_id`` and write the
        initial partition files in parallel — the full-dump →
        incremental handoff a Canal deployment performs when a replica
        is seeded from a dump taken at a known binlog position
        (MysqlEventParser.findStartPositionInternal:466-547 "configured
        master position" resume rule).

        Unlike :meth:`create`, the snapshot never lands on the driver.
        Each partition IS materialized in its writer task (one file per
        partition, read-optimal), so size ``num_partitions`` to the
        worker heap: partition ≈ dump_bytes / num_partitions must fit in
        one task. Pass ``num_partitions=None`` to derive it from
        ``ds.size_bytes()`` at ~256 MB per partition.

        The manifest HWM is stamped with ``start_position`` (the dump's
        binlog coordinates) so a subsequent :func:`replay` applies only
        events strictly above it: bootstrap + replay of the full log is
        exactly-once end to end (D3 filter ``offset > hwm``).

        File layout, seq stamps, and hash placement are identical to
        the driver-side path, so both bootstraps converge to the same
        lake state.

        ``ddl_journal``: schema state as-of the dump position, for dumps
        taken after mid-stream DDLs — the TableMetaTSDB *snapshot* half
        of DatabaseTableMeta.rollback (snapshot ≤ pos, then replay
        history above it; DatabaseTableMeta.java:195-216): the journal
        seeds the manifest so replay's epoch casts resume from the
        dump's schema version, while DDL events above ``start_position``
        replay normally.
        """
        lake = Lake._begin_create(lake_dir)
        if num_partitions is None:
            num_partitions = Lake._derive_num_partitions(ds)
        journal = Lake._normalize_journal(ddl_journal)
        return lake._finish_create(
            Manifest(
                version=0,
                num_partitions=num_partitions,
                hwm=tuple(start_position),
                last_batch_id=-1,
                schema_version=len(journal),
                ddl_journal=journal,
                partitions=lake._bootstrap_partitions_distributed(
                    ds, num_partitions, base_pid=0
                ),
            )
        )

    @staticmethod
    def create_multi_from_datasets(
        lake_dir: str,
        initials: dict,
        partitions_per_table: int | dict = 8,
        start_position: tuple[int, int] = (-1, -1),
        ddl_journals: dict[str, list] | None = None,
    ) -> "Lake":
        """Multi-table variant of :meth:`create_from_dataset`:
        ``initials`` maps table name -> ``ray.data.Dataset``; one
        manifest, contiguous pid ranges per table as in
        :meth:`create_multi`; ``ddl_journals`` seeds per-table schema
        state for dumps taken after mid-stream DDLs."""
        lake = Lake._begin_create(lake_dir)

        def writer(ds, p, base):
            return lake._bootstrap_partitions_distributed(ds, p, base_pid=base)

        parts, tables, base = Lake._multi_parts(
            writer, initials, partitions_per_table, ddl_journals
        )
        return lake._finish_create(
            Manifest(
                version=0,
                num_partitions=base,
                hwm=tuple(start_position),
                last_batch_id=-1,
                schema_version=0,
                partitions=parts,
                tables=tables,
            )
        )

    @staticmethod
    def _derive_num_partitions(ds, target_bytes: int = 256 << 20) -> int:
        size = None
        try:
            size = ds.size_bytes()
        except Exception:
            pass
        if not size:
            return 16
        return max(16, -(-int(size) // target_bytes))

    def _bootstrap_partitions_distributed(
        self, ds, num_partitions: int, base_pid: int
    ) -> dict[str, dict]:
        """Tag pid → one bucketed shuffle → one writer task per
        partition (single-writer invariant); only P one-row metrics
        records return to the driver."""
        import numpy as np

        lake_dir = self.dir

        def tag(batch: pa.Table) -> pa.Table:
            pid = partition_ids(batch["doc_id"].to_numpy(zero_copy_only=False), num_partitions)
            return batch.append_column(
                "pid", pa.array(pid + np.int32(base_pid), pa.int32())
            )

        def write_group(group: pa.Table) -> pa.Table:
            pid = int(group["pid"][0].as_py())
            body = group.drop_columns(["pid"]).combine_chunks()
            body = ensure_helper_columns(body, seq=-1)
            d = os.path.join(lake_dir, f"part={pid:05d}")
            os.makedirs(d, exist_ok=True)
            rel = f"part={pid:05d}/b{0:08d}-{uuid.uuid4().hex}.parquet"
            pq.write_table(body, os.path.join(lake_dir, rel), use_dictionary=False)
            filestats.write_sidecar(
                os.path.join(lake_dir, rel), body["doc_id"].to_numpy(zero_copy_only=False)
            )
            return pa.Table.from_pydict(
                {
                    "pid": pa.array([pid], pa.int32()),
                    "file": pa.array([rel], pa.string()),
                    "rows": pa.array([body.num_rows], pa.int64()),
                }
            )

        metrics = (
            ds.map_batches(tag, batch_format="pyarrow")
            .groupby("pid")
            .map_groups(write_group, batch_format="pyarrow")
            .take_all()
        )  # ≤ P one-row dicts — the only driver-side materialization
        return {str(r["pid"]): {"files": [r["file"]], "rows": int(r["rows"])} for r in metrics}

    def _write_initial_partitions(
        self, table: pa.Table, num_partitions: int, base_pid: int
    ) -> dict[str, dict]:
        import numpy as np

        pids = partition_ids(table["doc_id"].to_numpy(zero_copy_only=False), num_partitions)
        parts: dict[str, dict] = {}
        order = np.argsort(pids, kind="stable")
        sorted_tbl = table.take(order)
        sorted_pids = pids[order]
        bounds = np.searchsorted(sorted_pids, np.arange(num_partitions + 1))
        for pid in range(num_partitions):
            lo, hi = int(bounds[pid]), int(bounds[pid + 1])
            if lo == hi:
                continue
            rel = self._write_part_file(sorted_tbl.slice(lo, hi - lo), base_pid + pid, batch_id=0, seq=-1)
            parts[str(base_pid + pid)] = {"files": [rel], "rows": hi - lo}
        return parts

    # -- manifest IO ------------------------------------------------------

    def _load_named(self, name: str) -> Manifest:
        m = Manifest.from_json(
            self.storage.get_text(os.path.join(self.manifest_dir, name))
        )
        m._obj_name = name
        return m

    def current(self) -> Manifest:
        name = self.storage.read_pointer(os.path.join(self.manifest_dir, "_CURRENT"))
        if name is None:
            raise FileNotFoundError(os.path.join(self.manifest_dir, "_CURRENT"))
        return self._load_named(name)

    def _load_parent(self, m: Manifest) -> Manifest | None:
        """Previous manifest on the committed chain, or None at v0.
        Falls back to the legacy deterministic filename for manifests
        written before unique naming."""
        if m.parent:
            return self._load_named(m.parent)
        if m.version <= 0:
            return None
        legacy = f"manifest-{m.version - 1:08d}.json"
        if self.storage.exists(os.path.join(self.manifest_dir, legacy)):
            return self._load_named(legacy)
        return None

    def manifest_at(self, version: int) -> Manifest:
        """Time-travel: load a historical manifest snapshot by walking
        the parent chain from _CURRENT (manifest objects are uniquely
        named; CAS-losing writers leave orphans that are NOT on the
        chain). Files must not have been gc'd past it — see
        gc(keep_manifests)."""
        legacy = os.path.join(self.manifest_dir, f"manifest-{version:08d}.json")
        if self.storage.exists(legacy):  # pre-unique-naming lake
            return self._load_named(f"manifest-{version:08d}.json")
        m = self.current()
        while m.version > version:
            pm = self._load_parent(m)
            if pm is None:
                raise FileNotFoundError(
                    f"manifest version {version} not reachable from "
                    f"_CURRENT (v{self.current().version}); gc'd?"
                )
            m = pm
        if m.version != version:
            raise FileNotFoundError(f"manifest version {version} not on the chain")
        return m

    def _write_manifest(self, m: Manifest, parent: str | None = None) -> str:
        """Phase-2a: PUT the manifest under a UNIQUE name (two racing
        writers can never overwrite each other's snapshot); visibility
        comes only from the _CURRENT pointer swap."""
        if parent is not None:
            m.parent = parent
        name = f"manifest-{m.version:08d}-{uuid.uuid4().hex[:8]}.json"
        self.storage.put_text(os.path.join(self.manifest_dir, name), m.to_json())
        m._obj_name = name
        return name

    def _swap_current(
        self, name: str, expected: str | None, force: bool = False
    ) -> None:
        """Phase-2b: compare-and-swap the pointer — the ONE
        linearization point of a commit. ``expected`` is the manifest
        object name the writer loaded at start (names are unique, so
        value-compare is a sound CAS token); on POSIX the swap is an
        atomic replace under a lock, on object stores a conditional
        PUT. Losing the race raises CommitConflictError."""
        try:
            self.storage.swap_pointer(
                os.path.join(self.manifest_dir, "_CURRENT"),
                name,
                expected,
                force=force,
            )
        except StorageCASError as e:
            raise CommitConflictError(str(e)) from None

    def _write_part_file(self, table: pa.Table, pid: int, batch_id: int, seq: int | None = None) -> str:
        table = ensure_helper_columns(table, seq=batch_id if seq is None else seq)
        d = os.path.join(self.dir, f"part={pid:05d}")
        os.makedirs(d, exist_ok=True)
        rel = f"part={pid:05d}/b{batch_id:08d}-{uuid.uuid4().hex}.parquet"
        # no dict encoding: token payloads are high-cardinality (see
        # stages/reduce._write_file)
        pq.write_table(table, os.path.join(self.dir, rel), use_dictionary=False)
        filestats.write_sidecar(
            os.path.join(self.dir, rel), table["doc_id"].to_numpy(zero_copy_only=False)
        )
        return rel

    # -- commit (phase 2) -------------------------------------------------

    def commit_batch(
        self,
        base: Manifest,
        batch_id: int,
        new_hwm: tuple[int, int],
        touched: dict[int, dict],
        new_ddls: list[dict] | None = None,
        metrics: dict | None = None,
        truncate: bool | str = False,
        new_txn_hwm: int | None = None,
        source_uuid: str | None = None,
        min_txn_applied: int | None = None,
    ) -> Manifest:
        """Atomically publish a micro-batch.

        ``touched``: pid -> {"file": rel_path, "rows": n, ...metrics} for
        partitions rewritten by this batch; untouched partitions carry
        their previous files forward. Duplicate batch (batch_id ≤
        committed) raises DuplicateCommitError — callers treat it as a
        no-op (idempotent replay, D2/D3). A concurrent commit (manifest
        version advanced) raises CommitConflictError.
        """
        cur = self.current()
        if batch_id <= cur.last_batch_id:
            raise DuplicateCommitError(f"batch {batch_id} already committed (hwm batch {cur.last_batch_id})")
        if cur.version != base.version:
            raise CommitConflictError(f"manifest moved {base.version} -> {cur.version}")
        # registry DDLs route FIRST so a truncate in the same batch can
        # name a table created/renamed by an earlier DDL of the window
        journal = list(cur.ddl_journal)
        if new_ddls:
            journal.extend(new_ddls)
        tables = cur.tables
        num_partitions = cur.num_partitions
        if tables is not None and new_ddls:
            tables = route_ddls(tables, new_ddls, min_new_base=cur.next_base_pid())
        # TRUNCATE: the committed state starts from an empty table
        # (EventType.TRUNCATE=8; rows die, schema survives).
        # truncate=True wipes the whole (single-table) lake; a table
        # NAME wipes only that table's partition range (multi-table),
        # resolved against the post-DDL registry
        if truncate is True:
            parts = {}
        elif truncate:
            trec = tables[truncate]
            lo, hi = trec["base_pid"], trec["base_pid"] + trec["num_partitions"]
            parts = {p: i for p, i in cur.partitions.items() if not (lo <= int(p) < hi)}
        else:
            parts = dict(cur.partitions)
        rows_upserted = rows_deleted = events_in = 0
        seq_rewrite = False  # any partition fully rewritten (seq restamped)
        for pid, info in touched.items():
            if info.get("mode") == "noop":
                # patch-only partition where every patch matched 0 rows
                # (stages/reduce.fold_patch_rows): no file written, but
                # the events still count as applied
                events_in += int(info.get("events_in", 0))
                continue
            if info.get("mode") == "append":  # delta sink: add a change file
                prev = parts.get(str(pid), {"files": [], "rows": 0})
                parts[str(pid)] = {
                    "files": prev["files"] + [info["file"]],
                    "rows": int(prev["rows"]) + int(info["rows"]),
                }
            elif info.get("mode") == "replace_deltas":
                # minor auto-compact (compact_mode="minor"): the file
                # folds every accumulated delta PLUS this batch's
                # changes; the base file stays untouched
                prev = parts.get(str(pid), {"files": [], "rows": 0})
                parts[str(pid)] = {
                    "files": prev["files"][:1] + [info["file"]],
                    "rows": int(info["rows"]),
                }
            else:  # compact sink: the file IS the partition now
                parts[str(pid)] = {"files": [info["file"]], "rows": int(info["rows"])}
                seq_rewrite = True
            rows_upserted += int(info.get("rows_upserted", 0))
            rows_deleted += int(info.get("rows_deleted", 0))
            events_in += int(info.get("events_in", 0))
        if tables is not None and new_ddls:
            live = [
                (t["base_pid"], t["base_pid"] + t["num_partitions"]) for t in tables.values()
            ]
            # drop_table: its partitions leave the manifest (files are
            # unreferenced -> gc'd); create_table: the pid space grows
            parts = {
                p: i for p, i in parts.items() if any(lo <= int(p) < hi for lo, hi in live)
            }
            num_partitions = max([num_partitions] + [hi for _, hi in live])
        rec = {
            "batch_id": batch_id,
            "prev_hwm": list(cur.hwm),
            "hwm": list(new_hwm),
            "events_in": events_in,
            "rows_upserted": rows_upserted,
            "rows_deleted": rows_deleted,
            "partitions_touched": len(touched),
            "schema_version": len(journal),
        }
        if metrics:
            rec.update(metrics)
        # O(1)-scrape running totals (prometheus_metrics reads these
        # instead of replaying the whole ledger sidecar)
        totals = dict(cur.metrics)
        if "events_applied_total" not in totals and cur.last_batch_id >= 0:
            # first commit on a pre-running-totals lake: seed from the
            # full ledger once so history isn't undercounted forever
            hist = self.full_ledger()
            totals["events_applied_total"] = sum(r.get("events_in", 0) for r in hist)
            totals["rows_upserted_total"] = sum(r.get("rows_upserted", 0) for r in hist)
            totals["rows_deleted_total"] = sum(r.get("rows_deleted", 0) for r in hist)
            totals["batches_committed_total"] = len(hist)
            totals["last_execute_ts_ms"] = max(
                (r.get("max_execute_ts", 0) for r in hist), default=0
            )
        totals["events_applied_total"] = int(totals.get("events_applied_total", 0)) + events_in
        totals["rows_upserted_total"] = int(totals.get("rows_upserted_total", 0)) + rows_upserted
        totals["rows_deleted_total"] = int(totals.get("rows_deleted_total", 0)) + rows_deleted
        totals["batches_committed_total"] = int(totals.get("batches_committed_total", 0)) + 1
        if metrics and metrics.get("max_execute_ts"):
            totals["last_execute_ts_ms"] = max(
                int(totals.get("last_execute_ts_ms", 0)), int(metrics["max_execute_ts"])
            )
        if seq_rewrite:
            # a compact-path write restamps per-row __seq to this batch
            # and folds tombstones — read_changes windows spanning this
            # version re-emit rewritten rows (LWW-idempotent) but cannot
            # see deletes folded into the rewrite; incremental consumers
            # (pipelines/mirror) check this stamp and refuse the window
            totals["last_seq_rewrite_version"] = cur.version + 1
        next_txn_hwm = max(cur.txn_hwm, new_txn_hwm if new_txn_hwm is not None else -1)
        gtid_executed = cur.gtid_executed
        if source_uuid and next_txn_hwm > cur.txn_hwm:
            # audit bookkeeping: extend this source's executed interval
            # set by the txns this commit applied (MySQL gtid_executed
            # format; GtidSet merges contiguous ranges in place). The
            # lower bound: consecutive commits apply exactly
            # (prev_hwm, new_hwm] on a totally-ordered source; the FIRST
            # commit of a fresh lake (txn_hwm unset) must use the
            # window's actual min txn — a mid-stream start (skip_to /
            # tail-only replay) must never claim earlier txns as
            # executed. Unknown lower bound -> record nothing rather
            # than over-claim.
            from clever_canal_ray.state.gtid import GtidSet

            start = cur.txn_hwm + 1 if cur.txn_hwm >= 0 else min_txn_applied
            if start is not None:
                gs = GtidSet.parse(gtid_executed)
                gs.add_range(source_uuid, start, next_txn_hwm)
                gtid_executed = str(gs)
        m = Manifest(
            version=cur.version + 1,
            num_partitions=num_partitions,
            hwm=new_hwm,
            last_batch_id=batch_id,
            schema_version=len(journal),
            txn_hwm=next_txn_hwm,
            gtid_executed=gtid_executed,
            ddl_journal=journal,
            partitions=parts,
            ledger=(cur.ledger + [rec])[-LEDGER_KEEP:],
            metrics=totals,
            tables=tables,
        )
        name = self._write_manifest(m, parent=getattr(cur, "_obj_name", ""))
        # CAS on the pointer: expected = the object name we LOADED as
        # base — closes the check-then-swap race window two concurrent
        # writers could previously slip through (both read version v,
        # both passed the version check, last swap silently won)
        self._swap_current(name, expected=getattr(cur, "_obj_name", None))
        # sidecars AFTER the commit point so a CAS loser never pollutes
        # them (its batch never happened). Crash window: a death right
        # here loses the sidecar record of a COMMITTED batch — covered
        # by the manifest's inline ring for LEDGER_KEEP batches, and
        # full_ledger prefers the ring when the sidecar lacks a batch.
        self.storage.append_journal(
            os.path.join(self.manifest_dir, "ledger.jsonl"),
            json.dumps(rec, separators=(",", ":")),
        )
        # per-partition metrics sidecar (FIXTURES.md §4 shape) — kept out
        # of the manifest JSON so it stays small at P=4096
        if touched:
            mt = pa.Table.from_pylist(
                [
                    {
                        "partition_id": int(pid),
                        "batch_id": batch_id,
                        "hwm_segment_id": int(new_hwm[0]),
                        "hwm_offset": int(new_hwm[1]),
                        "schema_version": len(journal),
                        "rows_upserted": int(info.get("rows_upserted", 0)),
                        "rows_deleted": int(info.get("rows_deleted", 0)),
                        "events_in": int(info.get("events_in", 0)),
                    }
                    for pid, info in touched.items()
                ],
                schema=METRICS_PARTITION_SCHEMA,
            )
            mdir = os.path.join(self.manifest_dir, "metrics")
            self.storage.makedirs(mdir)
            pq.write_table(mt, os.path.join(mdir, f"batch-{batch_id:08d}.parquet"))
        return m

    def full_ledger(self) -> list[dict]:
        """Complete committed-batch history: the ledger.jsonl sidecar
        merged with the inline ring (a lake created before the sidecar
        existed holds older records only inline), filtered to batches
        the current manifest actually committed (a crash between the
        sidecar append and the pointer swap may leave one uncommitted
        tail line — dropped here)."""
        cur = self.current()
        by_id: dict[int, dict] = {rec["batch_id"]: rec for rec in cur.ledger}
        path = os.path.join(self.manifest_dir, "ledger.jsonl")
        for line in self.storage.journal_lines(path):
            rec = json.loads(line)
            by_id[rec["batch_id"]] = rec  # sidecar wins on overlap
        return [by_id[b] for b in sorted(by_id) if b <= cur.last_batch_id]

    def skip_to(self, position: tuple[int, int], batch_id: int | None = None) -> Manifest:
        """Advance the HWM past a stream prefix WITHOUT applying it —
        the start-at-position/timestamp primitive (pair with
        ``sources.segments.find_start_position(dirs, ts_ms)`` for
        "begin replaying this journal at timestamp T" on a fresh lake).
        Committed as an empty batch; refuses to move the HWM backwards
        (HWM is monotone — rewind is ``rollback_to_version``)."""
        cur = self.current()
        if tuple(position) <= tuple(cur.hwm):
            raise ValueError(f"skip_to {position} is not ahead of HWM {cur.hwm}")
        return self.commit_batch(
            cur,
            batch_id=cur.last_batch_id + 1 if batch_id is None else batch_id,
            new_hwm=tuple(position),
            touched={},
            metrics={"skip": True},
        )

    def rollback_to_version(self, version: int) -> Manifest:
        """Time-travel the pointer back (EventStore.rollback analog:
        un-acked work is simply re-delivered from the earlier HWM).
        Admin op: the swap is forced (no CAS) — later commits branch a
        NEW uniquely-named timeline from here, so abandoned descendants
        can never collide with or shadow it."""
        target = self.manifest_at(version)  # raises if unreachable
        self._swap_current(
            getattr(target, "_obj_name", f"manifest-{version:08d}.json"),
            expected=None,
            force=True,
        )
        return self.current()

    # -- reads ------------------------------------------------------------

    def data_files(self, m: Manifest | None = None) -> list[str]:
        m = m or self.current()
        return [os.path.join(self.dir, f) for info in m.partitions.values() for f in info["files"]]

    def read_table(
        self,
        m: Manifest | None = None,
        table: str | None = None,
        columns: list[str] | None = None,
        filter=None,
    ) -> pa.Table:
        """Full materialized read (tests / small lakes only):
        per-partition merge-on-read (delta files, tombstones, up-cast).

        ``columns`` / ``filter`` mirror :meth:`read_dataset` on the
        serial path: the read prunes to the named payload columns
        (+ doc_id), and the predicate — over result columns — applies
        post-merge per partition (current-state semantics).

        Multi-table lakes: pass ``table`` to read one table in its own
        schema; with table=None every partition is up-cast to the union
        schema (columns missing from a table read as null)."""
        m = m or self.current()
        out_schema = m.schema_of_table(table) if table is not None else m.payload_schema
        if columns is not None:
            _validate_columns(columns, out_schema, table or "lake")
            out_schema = _pruned_schema(out_schema, columns)
        lo, hi = (0, m.num_partitions)
        if table is not None:
            t = m.tables[table]
            lo, hi = t["base_pid"], t["base_pid"] + t["num_partitions"]
        tables = []
        for pid_s, info in m.partitions.items():
            pid = int(pid_s)
            if not (lo <= pid < hi):
                continue
            pid_schema = m.schema_of_pid(pid)
            if columns is None:
                tgt = pid_schema
                files = [pq.read_table(os.path.join(self.dir, f)) for f in info["files"]]
            else:
                pid_names = set(pid_schema.names)
                tgt = _pruned_schema(pid_schema, [c for c in columns if c in pid_names])
                need = [fld.name for fld in tgt] + list(HELPER_COLS)
                rev = reverse_renames_from_metadata(tgt)
                files = []
                for f in info["files"]:
                    path = os.path.join(self.dir, f)
                    files.append(pq.read_table(path, columns=_file_read_columns(path, need, rev)))
            if files:
                merged = upcast_table(merge_partition_files(files, tgt), out_schema)
                if filter is not None:
                    merged = merged.filter(filter)
                tables.append(merged)
        if not tables:
            return out_schema.empty_table()
        return pa.concat_tables(tables)

    def read_dataset(
        self,
        m: Manifest | None = None,
        table: str | None = None,
        columns: list[str] | None = None,
        filter=None,
    ):
        """Streaming read as a ray.data.Dataset with merge-on-read.

        Fast path (fully compacted lake: ≤1 file per partition): plain
        parallel read, tombstone filter + up-cast per batch, no
        shuffle. Delta path: ONE Ray task per partition reads that
        partition's own files (the manifest maps pid → files) and
        merges — also no shuffle; memory is O(partition bytes) per
        task, which the partition count is sized for. ``compact()``
        still wins for repeated reads (single pass, no per-read merge).

        ``columns`` prunes the read to the named payload columns (plus
        ``doc_id``, always included — the merge key): only those
        columns leave storage. Files are grouped by which of the
        needed columns their footer actually has (schema evolution:
        a pre-DDL file lacks later columns), each group reads with
        column pushdown, and missing columns fill as nulls on the
        up-cast — so a 2-column scan over a wide lake never pays for
        the other columns' bytes.

        ``filter`` (a ``pyarrow.compute`` Expression over RESULT columns
        — i.e. over ``columns`` when that is given) selects rows of the
        CURRENT state: it is applied after merge-on-read, so an old
        version matching the predicate can never resurrect a key whose
        latest version does not. On the compacted fast path with a
        uniform file schema the expression is additionally pushed into
        the parquet scan (row-group statistics skip I/O); the delta
        path never pushes below the merge — that would be the
        resurrection bug.

        Multi-table lakes: ``table`` reads one table in its own schema;
        table=None unions every table up-cast to the union schema."""
        import ray.data as rd

        m = m or self.current()
        if m.tables is not None and table is None:
            union = m.payload_schema
            if columns is not None:
                _validate_columns(columns, union, "union")
                union = _pruned_schema(union, columns)

            def widen(t: pa.Table, s=union) -> pa.Table:
                return upcast_table(t, s)

            parts = []
            for name in sorted(m.tables):
                sub = None
                if columns is not None:
                    names = set(m.schema_of_table(name).names)
                    sub = [c for c in columns if c in names] or ["doc_id"]
                parts.append(
                    self.read_dataset(m, name, columns=sub).map_batches(
                        widen, batch_format="pyarrow"
                    )
                )
            ds = parts[0]
            ds = ds.union(*parts[1:]) if len(parts) > 1 else ds
            if filter is not None:
                # after the widen: a column missing from one table reads
                # as null there and the predicate sees it (null = no match)
                ds = ds.map_batches(
                    lambda t, e=filter: t.filter(e), batch_format="pyarrow"
                )
            return ds

        if table is not None:
            trec = m.tables[table]
            base, p = trec["base_pid"], trec["num_partitions"]
            target = m.schema_of_table(table)
            pids_in = [
                pid_s for pid_s in m.partitions if base <= int(pid_s) < base + p
            ]
        else:
            base, p = 0, m.num_partitions
            target = m.payload_schema
            pids_in = list(m.partitions)
        if columns is not None:
            _validate_columns(columns, target, table or "lake")
            target = _pruned_schema(target, columns)
        files = [
            os.path.join(self.dir, f) for pid_s in pids_in for f in m.partitions[pid_s]["files"]
        ]
        if not files:
            return rd.from_arrow(target.empty_table())

        def _read(files_in, scan_filter=None):
            if columns is None:
                return (
                    rd.read_parquet(files_in)
                    if scan_filter is None
                    else rd.read_parquet(files_in, filter=scan_filter)
                )
            read_h = pa.schema(
                list(target)
                + [pa.field("__seq", pa.int64()), pa.field("__deleted", pa.bool_())],
                metadata=target.metadata,  # rename map for the upcast
            )
            return _read_files_pruned(files_in, read_h, scan_filter=scan_filter)

        if all(len(m.partitions[pid_s]["files"]) <= 1 for pid_s in pids_in):
            pushdown = None
            if filter is not None:
                # scan pushdown is safe on the fast path (each row is its
                # key's final version) but only when every file physically
                # has every result column — uniform footers alone aren't
                # enough (a uniformly PRE-ddl file set lacks an added
                # column the expression may reference; the upcast path
                # null-fills it, the scan would error). The footer scan
                # is O(files) driver I/O — cached per (dir, manifest
                # version, resolved file list): data files under a
                # version are immutable, but version numbers RESTART when
                # a lake dir is deleted and recreated in-process (tests,
                # destructive re-bootstrap), so (dir, version) alone can
                # alias two different file sets — the file tuple (already
                # computed, free) disambiguates.
                cache_key = (self.dir, m.version, table, tuple(files))
                sigs = _PUSHDOWN_SIG_CACHE.get(cache_key)
                if sigs is None:
                    sigs = {frozenset(pq.read_schema(f).names) for f in files}
                    if len(_PUSHDOWN_SIG_CACHE) > 256:  # bounded, newest wins
                        _PUSHDOWN_SIG_CACHE.clear()
                    _PUSHDOWN_SIG_CACHE[cache_key] = sigs
                if len(sigs) == 1 and set(target.names) <= next(iter(sigs)):
                    pushdown = filter
            ds = _read(files, scan_filter=pushdown)

            def clean(t: pa.Table, s=target, e=filter) -> pa.Table:
                if "__deleted" in t.column_names:
                    t = t.filter(pc.invert(t["__deleted"].combine_chunks() if isinstance(t["__deleted"], pa.ChunkedArray) else t["__deleted"]))
                out = upcast_table(_strip_helpers(t), s)
                return out.filter(e) if e is not None else out

            return ds.map_batches(clean, batch_format="pyarrow")

        # delta path: the manifest already maps each partition to its
        # files, so merge-on-read is embarrassingly parallel — ONE task
        # per partition reads its OWN files and merges. No all-to-all:
        # the earlier groupby(__pid) implementation pushed every byte
        # through the exchange and the shuffle dominated wall-time
        # ~16:1 over the useful merge at 1M rows (BASELINE soak_read).
        # __seq (written per file) totally orders versions per key, so
        # within-task file order is irrelevant.
        items = []
        for pid_s in pids_in:
            fs = [os.path.join(self.dir, f) for f in m.partitions[pid_s]["files"]]
            if fs:
                items.append({"files": fs})
        read_cols = (
            None if columns is None else [f.name for f in target] + list(HELPER_COLS)
        )

        rev = reverse_renames_from_metadata(target)

        def read_merge(df, s=target, e=filter, cols=read_cols, rv=rev) -> pa.Table:
            out = []
            for fs in df["files"]:
                tabs = []
                for f in fs:
                    if cols is None:
                        tabs.append(pq.read_table(f))
                    else:
                        tabs.append(pq.read_table(f, columns=_file_read_columns(f, cols, rv)))
                merged = merge_partition_files(tabs, s)
                # post-merge only: filtering the raw versions could drop
                # a key's latest row and resurrect an older matching one
                if e is not None:
                    merged = merged.filter(e)
                out.append(merged.replace_schema_metadata(None))
            return pa.concat_tables(out) if len(out) > 1 else out[0]

        return rd.from_items(items, override_num_blocks=len(items)).map_batches(
            read_merge, batch_format="pandas"
        )

    def lookup(
        self,
        doc_ids,
        m: Manifest | None = None,
        table: str | None = None,
        return_stats: bool = False,
        columns: list[str] | None = None,
    ):
        """Distributed point lookup of CURRENT row state by primary key.

        The lake-side ``get()`` a serving adapter needs (reference
        parity: Canal ships no store — downstream adapters build one
        per client; here the lake itself answers): each key routes to
        its hash partition (1/P of the lake per key), the partition's
        files are pruned with the per-file key blooms
        (state/filestats — delta files that cannot contain any probed
        key are never opened), survivors are read with a ``doc_id``
        predicate (row-group pruning + row filter — only matching rows
        materialize), and merge-on-read runs over just those rows.
        Deleted / absent keys return no row.

        Scale shape: cost is O(keys × files-per-partition), independent
        of lake size; fan-out is one Ray task per touched partition
        (driver-serial fallback when Ray is down), and the bloom
        sidecars are read INSIDE the task — the driver plans from the
        manifest alone, so a lookup never does O(files) driver I/O
        (workers LRU-cache sidecars across calls; files are immutable).
        Multi-table lakes must pass ``table``.

        ``return_stats=True`` → ``(table, stats)`` with the pruning
        evidence (files_total vs files_read). ``columns`` prunes the
        row read and the result to the named payload columns
        (+ doc_id) — point reads of a wide lake skip the heavy
        payload's bytes.
        """
        import numpy as np

        m = m or self.current()
        if m.tables is not None and table is None:
            raise ValueError("multi-table lake: lookup() requires table=")
        if table is not None:
            if m.tables is None:
                raise ValueError("single-table lake: lookup() takes no table=")
            if table not in m.tables:
                raise ValueError(f"unknown table {table!r}; have {sorted(m.tables)}")
            trec = m.tables[table]
            base, p = trec["base_pid"], trec["num_partitions"]
            out_schema = m.schema_of_table(table)
        else:
            base, p = 0, m.num_partitions
            out_schema = m.payload_schema
        if columns is not None:
            _validate_columns(columns, out_schema, table or "lake")
            out_schema = _pruned_schema(out_schema, columns)
        keys = np.asarray(list(dict.fromkeys(doc_ids)), dtype=object)
        stats = {"keys": len(keys), "partitions_touched": 0, "files_total": 0, "files_read": 0}
        if len(keys) == 0:
            empty = out_schema.empty_table()
            return (empty, stats) if return_stats else empty
        pids = base + partition_ids(keys, p)
        plans = []  # (pid, ALL abs paths in manifest order, key values)
        for pid in np.unique(pids):
            info = m.partitions.get(str(int(pid)))
            if not info:
                continue
            sel = pids == pid
            paths = [os.path.join(self.dir, f) for f in info["files"]]
            stats["files_total"] += len(paths)
            plans.append((int(pid), paths, keys[sel].tolist()))
        stats["partitions_touched"] = len(plans)

        def fetch(
            paths: list[str],
            key_vals: list,
            pid_schema: pa.Schema,
            out_s: pa.Schema,
            cols: list | None = None,
        ):
            import numpy as _np

            from clever_canal_ray.state import filestats as _fs

            # bloom prune where the data files are read (no false
            # negatives: every file that holds a probed key survives;
            # ~1% of non-holders survive and contribute 0 rows after
            # the read filter). Pruning keeps manifest order, which
            # merge_partition_files' LWW tie-break relies on.
            fh1, fh2 = _fs.key_hashes(_np.asarray(key_vals, dtype=object))
            pruned = [q for q in paths if _fs.file_may_contain_any(q, fh1, fh2)]
            if not pruned:
                return out_s.empty_table(), len(pruned)
            flt = pc.field("doc_id").isin(key_vals)
            if cols is None:
                tbls = [pq.read_table(q, filters=flt) for q in pruned]
            else:
                rv = reverse_renames_from_metadata(pid_schema)
                tbls = [
                    pq.read_table(q, filters=flt, columns=_file_read_columns(q, cols, rv))
                    for q in pruned
                ]
            return upcast_table(merge_partition_files(tbls, pid_schema), out_s), len(pruned)

        ray_ok = False
        try:
            import ray

            ray_ok = ray.is_initialized() and len(plans) > 1
        except ImportError:  # pragma: no cover
            pass
        def _args(pid):
            pid_schema = m.schema_of_pid(pid)
            if columns is None:
                return pid_schema, None
            names = set(pid_schema.names)
            tgt = _pruned_schema(pid_schema, [c for c in columns if c in names])
            return tgt, [f.name for f in tgt] + list(HELPER_COLS)

        if ray_ok:
            remote = ray.remote(num_cpus=1)(fetch)
            futs = []
            for pid, paths, kv in plans:
                tgt, cols = _args(pid)
                futs.append(remote.remote(paths, kv, tgt, out_schema, cols))
            results = ray.get(futs)
        else:
            results = []
            for pid, paths, kv in plans:
                tgt, cols = _args(pid)
                results.append(fetch(paths, kv, tgt, out_schema, cols))
        stats["files_read"] = sum(n for _, n in results)
        tbls = [t for t, _ in results if t.num_rows]
        out = pa.concat_tables(tbls) if tbls else out_schema.empty_table()
        return (out, stats) if return_stats else out

    def _changes_plan(
        self,
        since_version: int,
        to_version: int | None,
        table: str | None,
        latest_only: bool,
        columns: list[str] | None = None,
    ) -> tuple[list[str], pa.Schema, pa.Schema, int, int]:
        """Manifest-only diff shared by ``read_changes`` (streaming) and
        ``read_changes_table`` (serial serving path): absolute paths of
        files ADDED in the window, the payload/helper target schemas
        (pruned to ``columns`` + doc_id when given), the ``__seq``
        floor, and the partition count for latest_only."""
        old = self.manifest_at(since_version)
        new = self.manifest_at(to_version) if to_version is not None else self.current()
        if new.tables is not None and table is not None:
            trec = new.tables[table]
            lo, hi = trec["base_pid"], trec["base_pid"] + trec["num_partitions"]
            target = new.schema_of_table(table)
            p_count = trec["num_partitions"]
        else:
            if new.tables is not None and latest_only:
                raise ValueError("multi-table lake: latest_only requires table=")
            lo, hi = 0, 1 << 62
            target = new.payload_schema
            p_count = new.num_partitions
        if columns is not None:
            _validate_columns(columns, target, table or "lake")
            target = _pruned_schema(target, columns)
        target_h = pa.schema(
            list(target) + [pa.field("__seq", pa.int64()), pa.field("__deleted", pa.bool_())],
            metadata=target.metadata,
        )
        files = []
        files_by_pid: dict[str, list[str]] = {}
        for pid_s, info in new.partitions.items():
            if not (lo <= int(pid_s) < hi):
                continue
            before = set(old.partitions.get(pid_s, {}).get("files", ()))
            added = [os.path.join(self.dir, f) for f in info["files"] if f not in before]
            if added:
                files_by_pid[pid_s] = added
                files.extend(added)
        return files, target, target_h, old.last_batch_id, p_count, files_by_pid

    def read_changes_table(
        self,
        since_version: int,
        to_version: int | None = None,
        table: str | None = None,
        latest_only: bool = False,
        columns: list[str] | None = None,
    ) -> pa.Table:
        """Driver-serial materialized change feed — the SERVING-PATH
        variant of ``read_changes`` (same plan, same semantics,
        including the major-compact tombstone caveat), for callers
        without a Ray session (the wire server's ``changes`` RPC).
        Reads one window file at a time; intended for the bounded
        windows a downstream consumer polls — use the streaming
        ``read_changes`` for bulk exports. ``columns`` prunes the read
        (+ doc_id and the helpers) so a tail-poller of a wide lake only
        pays for the columns it asks for."""
        files, target, target_h, seq_floor, _, _ = self._changes_plan(
            since_version, to_version, table, latest_only, columns
        )
        needed = [f.name for f in target_h]
        rev = reverse_renames_from_metadata(target_h)
        clean_h = pa.schema(list(target_h))
        tables = []
        for f in files:
            if columns is None:
                t = pq.read_table(f)
            else:
                t = pq.read_table(f, columns=_file_read_columns(f, needed, rev))
            t = upcast_table(ensure_helper_columns(t, seq=-1), target_h)
            t = t.filter(pc.greater(t["__seq"], pa.scalar(seq_floor, pa.int64())))
            if t.num_rows:
                tables.append(t.replace_schema_metadata(None))
        if not tables:
            return clean_h.empty_table()
        out = pa.concat_tables(tables)
        if latest_only:
            # single-partition fold: last writer per key by per-row
            # __seq, tombstones kept (merge_delta_files contract)
            out = merge_delta_files([out], target)
        return out

    def read_changes(
        self,
        since_version: int,
        to_version: int | None = None,
        table: str | None = None,
        latest_only: bool = False,
        columns: list[str] | None = None,
    ):
        """Incremental change feed between two manifest versions — the
        Iceberg incremental-scan analog of a Canal client tailing the
        instance (CanalConnector.get), replayed from the lake's own
        manifest history instead of the live journal.

        Returns a streaming ``ray.data.Dataset`` of the rows WRITTEN by
        batches committed after ``since_version``: payload columns plus
        ``__seq`` (the writing batch id) and ``__deleted`` (tombstone =
        delete event). Only files ADDED since the old manifest are
        read — a manifest-only diff, no I/O to plan — and rows filter to
        ``__seq > old.last_batch_id``, which keeps compaction rewrites
        in the window invisible: both minor and major compaction
        preserve per-row ``__seq`` (``merge keep_seq``), so carried-over
        rows fail the filter.

        Caveat: MAJOR compaction physically drops tombstones, so a
        delete committed before a major compact in the same window folds
        into absence. Read the feed before major-compacting, or pass
        ``to_version`` at the pre-compact manifest (``gc`` retains
        ``keep_manifests`` versions).

        ``latest_only=True``: collapse to one row per key (last writer
        in the window, tombstones kept) — requires ``table=`` on
        multi-table lakes (keys are only unique within a table).

        ``columns`` prunes the read to the named payload columns
        (+ doc_id and the __seq/__deleted helpers, which the feed's
        semantics need) — same footer-grouped pushdown as
        ``read_dataset``.
        """
        import ray.data as rd

        files, target, target_h, seq_floor, _, by_pid = self._changes_plan(
            since_version, to_version, table, latest_only, columns
        )
        clean_h = pa.schema(list(target_h))
        if not files:
            return rd.from_arrow(clean_h.empty_table())

        def window_rows(t: pa.Table, s=target_h, floor=seq_floor) -> pa.Table:
            t = upcast_table(ensure_helper_columns(t, seq=-1), s)
            out = t.filter(pc.greater(t["__seq"], pa.scalar(floor, pa.int64())))
            return out.replace_schema_metadata(None)

        if not latest_only:
            raw = (
                rd.read_parquet(files)
                if columns is None
                else _read_files_pruned(files, target_h)
            )
            return raw.map_batches(window_rows, batch_format="pyarrow")

        # latest_only: window files are already per-partition (the plan
        # maps pid → added files), so the per-key collapse is one task
        # per partition over its own files — no shuffle (same rewrite
        # as read_dataset's delta path)
        read_cols = None if columns is None else [f.name for f in target_h]
        items = [{"files": fs} for fs in by_pid.values()]

        rev_lo = reverse_renames_from_metadata(target_h)

        def read_collapse(df, s=target, cols=read_cols, rv=rev_lo) -> pa.Table:
            out = []
            for fs in df["files"]:
                tabs = []
                for f in fs:
                    if cols is None:
                        tabs.append(pq.read_table(f))
                    else:
                        tabs.append(pq.read_table(f, columns=_file_read_columns(f, cols, rv)))
                w = pa.concat_tables([window_rows(t) for t in tabs], promote_options="default")
                out.append(merge_delta_files([w], s).replace_schema_metadata(None))
            return pa.concat_tables(out, promote_options="default") if len(out) > 1 else out[0]

        return rd.from_items(items, override_num_blocks=len(items)).map_batches(
            read_collapse, batch_format="pandas"
        )

    def gc(self, keep_manifests: int = 2, min_age_sec: float = 900.0) -> dict:
        """Garbage-collect data files no manifest in the retained window
        references (compacted-away deltas, orphans from failed tasks).

        Keeps files referenced by the current manifest and the last
        ``keep_manifests`` manifest versions (so a recent
        ``rollback_to_version`` still works); older manifests are
        retained as JSON but their exclusive files are gone — the
        snapshot-expiry analog (DatabaseTableMeta 360h expiry).
        Run after compaction at the operator's cadence.

        ``min_age_sec``: unreferenced files younger than this are
        spared — an IN-FLIGHT batch's phase-1 files are by design
        unreferenced until their phase-2 commit, so deleting fresh
        files would corrupt a concurrent replay. Pass 0 only when no
        replay can be running.
        """
        import time as _time
        cur = self.current()
        live: set[str] = set()
        m: Manifest | None = cur
        for _ in range(keep_manifests):  # walk the committed chain back
            if m is None:
                break
            for info in m.partitions.values():
                live.update(info["files"])
            m = self._load_parent(m)
        # manifest objects REACHABLE from the pointer (full chain walk,
        # O(versions) small JSON reads): these stay retained — a mirror
        # lagging past keep_manifests can still plan read_changes from
        # them. Everything else is a CAS loser / crashed writer /
        # rollback-abandoned timeline: a true orphan.
        keep_objs: set[str] = set()
        m = cur
        while m is not None:
            keep_objs.add(getattr(m, "_obj_name", f"manifest-{m.version:08d}.json"))
            keep_objs.add(f"manifest-{m.version:08d}.json")  # legacy twin
            m = self._load_parent(m)
        removed = 0
        freed = 0
        spared = 0
        now = _time.time()
        for d in self.storage.list_names(self.dir):
            if not d.startswith("part="):
                continue
            for name in self.storage.list_names(os.path.join(self.dir, d)):
                rel = f"{d}/{name}"
                # a bloom sidecar lives and dies with its data file
                data_rel = (
                    rel[: -len(filestats.BLOOM_SUFFIX)]
                    if name.endswith(filestats.BLOOM_SUFFIX)
                    else rel
                )
                if data_rel not in live:
                    p = os.path.join(self.dir, rel)
                    if now - self.storage.mtime(p) < min_age_sec:
                        spared += 1  # possibly an in-flight batch's phase-1 file
                        continue
                    freed += self.storage.size(p)
                    self.storage.delete(p)
                    removed += 1
        # orphan-manifest GC: CAS losers and writers that died between
        # PUT and swap leave uniquely-named unreachable objects (and
        # rollback abandons whole timelines); harmless individually but
        # they accumulate forever without this sweep. min_age spares an
        # IN-FLIGHT commit's freshly-PUT (not yet swapped-in) manifest.
        manifests_removed = 0
        for name in self.storage.list_names(self.manifest_dir):
            # sweep scope: manifest objects AND put_text temp debris
            # (".tmp.<hex>" left by a writer that died mid-PUT — the
            # same crashed-writer class, one rename earlier)
            is_manifest = name.startswith("manifest-") and name.endswith(".json")
            is_tmp_debris = ".tmp." in name
            if not (is_manifest or is_tmp_debris):
                continue
            if name in keep_objs:
                continue
            p = os.path.join(self.manifest_dir, name)
            try:
                if now - self.storage.mtime(p) < min_age_sec:
                    spared += 1
                    continue
                freed += self.storage.size(p)
                self.storage.delete(p)
                manifests_removed += 1
            except OSError:  # racing another gc
                continue
        return {
            "files_removed": removed,
            "bytes_freed": freed,
            "files_live": len(live),
            "files_spared_young": spared,
            "manifests_removed": manifests_removed,
        }

    def prometheus_metrics(self) -> str:
        """Render engine counters in Prometheus text exposition format —
        the StoreCollector/EntryCollector analog (StoreCollector.java:
        33-43): scrape by serving this string (e.g. via any WSGI
        one-liner) or shipping it to a pushgateway; no server is bound
        here. Counters come from O(1) running totals in the manifest
        (legacy lakes fall back to one ledger replay); gauges from the
        current manifest."""
        from clever_canal_ray.state.gtid import GtidSet

        cur = self.current()
        if "events_applied_total" in cur.metrics:
            t = cur.metrics  # O(1) running totals maintained per commit
            events = int(t.get("events_applied_total", 0))
            upserts = int(t.get("rows_upserted_total", 0))
            deletes = int(t.get("rows_deleted_total", 0))
            batches = int(t.get("batches_committed_total", 0))
            last_ts = int(t.get("last_execute_ts_ms", 0))
        else:  # pre-running-totals lake: one-time ledger replay
            ledger = self.full_ledger()
            events = sum(r.get("events_in", 0) for r in ledger)
            upserts = sum(r.get("rows_upserted", 0) for r in ledger)
            deletes = sum(r.get("rows_deleted", 0) for r in ledger)
            batches = len(ledger)
            last_ts = max((r.get("max_execute_ts", 0) for r in ledger), default=0)
        rows = sum(int(i["rows"]) for i in cur.partitions.values())
        files = sum(len(i["files"]) for i in cur.partitions.values())
        lines = [
            "# TYPE canal_events_applied_total counter",
            f"canal_events_applied_total {events}",
            "# TYPE canal_rows_upserted_total counter",
            f"canal_rows_upserted_total {upserts}",
            "# TYPE canal_rows_deleted_total counter",
            f"canal_rows_deleted_total {deletes}",
            "# TYPE canal_batches_committed_total counter",
            f"canal_batches_committed_total {batches}",
            "# TYPE canal_manifest_version gauge",
            f"canal_manifest_version {cur.version}",
            "# TYPE canal_hwm_segment_id gauge",
            f"canal_hwm_segment_id {cur.hwm[0]}",
            "# TYPE canal_hwm_offset gauge",
            f"canal_hwm_offset {cur.hwm[1]}",
            "# TYPE canal_txn_hwm gauge",
            f"canal_txn_hwm {cur.txn_hwm}",
            "# TYPE canal_gtid_executed_txns gauge",
            f"canal_gtid_executed_txns {GtidSet.parse(cur.gtid_executed).txn_count()}",
            "# TYPE canal_schema_version gauge",
            f"canal_schema_version {cur.schema_version}",
            "# TYPE canal_lake_rows gauge",
            f"canal_lake_rows {rows}",
            "# TYPE canal_lake_files gauge",
            f"canal_lake_files {files}",
            "# TYPE canal_last_execute_ts_ms gauge",
            f"canal_last_execute_ts_ms {last_ts}",
        ]
        for name, t in sorted((cur.tables or {}).items()):
            trows = sum(
                int(i["rows"])
                for p, i in cur.partitions.items()
                if t["base_pid"] <= int(p) < t["base_pid"] + t["num_partitions"]
            )
            lines.append(f'canal_table_rows{{table="{name}"}} {trows}')
        return "\n".join(lines) + "\n"

    def metrics_table(self) -> pa.Table:
        """All per-(batch, partition) metrics rows (A1 counters, lineage)."""
        mdir = os.path.join(self.manifest_dir, "metrics")
        files = sorted(
            os.path.join(mdir, f)
            for f in self.storage.list_names(mdir)
            if f.endswith(".parquet")
        )
        if not files:
            return METRICS_PARTITION_SCHEMA.empty_table()
        return pa.concat_tables([pq.read_table(f) for f in files])

    def repartition(self, num_partitions: int, table: str | None = None) -> Manifest:
        """Re-hash the lake (or ONE table of a multi-table lake) into a
        new partition count — the grow-the-cluster operation (a lake
        created at P partitions caps its write/read parallelism at P;
        when the cluster grows 4×, so should P). No batch is consumed:
        manifest version bump only, and a replay resumed afterwards
        picks up the new count from the manifest automatically
        (single-table: replay.py re-reads ``num_partitions`` from the
        base manifest; multi-table: routing is rebuilt from
        ``manifest.tables`` every batch).

        Distributed shape: ONE task per SOURCE partition STREAMS its
        files one at a time — memory O(largest file), not O(partition
        bytes) — splitting each file's rows by NEW pid with helper
        columns intact. Every version (including tombstones) keeps its
        per-row ``__seq``, so read paths reconstruct LWW exactly as
        before (``__seq`` alone totally orders versions per key; keys
        are disjoint across source partitions, and pieces keep their
        per-source file order) and ``read_changes`` stays exact across
        the re-hash INCLUDING tombstone windows. Data never lands on
        the driver. The re-hash rewrites versions verbatim (no fold),
        so run ``compact()`` afterwards to fold each new partition to
        one read-optimal file, and ``gc()`` to reap the old files.

        Multi-table lakes: pass ``table``; its range moves to a FRESH
        pid block past ``next_base_pid()`` (the drop_table discipline —
        ``num_partitions`` is monotone, so an abandoned range is never
        reused while its files may survive on disk) and other tables'
        ranges are untouched.

        Run off the hot path, like ``compact()``: a replay commit that
        lands mid-re-hash makes this raise ``CommitConflictError`` (and
        vice versa) — the single-writer race is loud, never corrupting.
        """
        cur = self.current()
        p_new = int(num_partitions)
        if p_new < 1:
            raise ValueError(f"num_partitions must be >= 1, got {p_new}")
        if cur.tables is not None:
            if table is None:
                raise ValueError("multi-table lake: pass table= to repartition one table")
            if table not in cur.tables:
                raise KeyError(
                    f"repartition: unknown table {table!r} (registered: {sorted(cur.tables)})"
                )
            trec = cur.tables[table]
            if p_new == trec["num_partitions"]:
                return cur
            lo, hi = trec["base_pid"], trec["base_pid"] + trec["num_partitions"]
            new_base = cur.next_base_pid()
            target_schema = cur.schema_of_table(table)
        else:
            if table is not None:
                raise ValueError("single-table lake: table= is not applicable")
            if p_new == cur.num_partitions:
                return cur
            lo, hi = 0, cur.num_partitions
            new_base = 0
            target_schema = None  # per-source-pid (constant here)
        import numpy as np

        file_batch = cur.last_batch_id + 1  # file-name stamp only

        def split_one(pid_s: str, files: list[str]) -> list[tuple[int, str, int]]:
            target = target_schema if target_schema is not None else cur.schema_of_pid(int(pid_s))
            target_h = pa.schema(
                list(target) + [pa.field("__seq", pa.int64()), pa.field("__deleted", pa.bool_())],
                metadata=target.metadata,  # carries the rename map for upcast
            )
            out = []
            for f in files:  # one file resident at a time — O(file bytes)
                t = pq.read_table(os.path.join(self.dir, f))
                t = upcast_table(ensure_helper_columns(t, seq=-1), target_h)
                t = t.replace_schema_metadata(None)
                if t.num_rows == 0:
                    continue
                pids = new_base + partition_ids(
                    t["doc_id"].to_numpy(zero_copy_only=False), p_new
                )
                # one argsort + zero-copy slices (the _write_initial_
                # partitions split shape), not p_new full-table filters
                order = np.argsort(pids, kind="stable")
                sorted_tbl = t.take(order)
                sorted_pids = pids[order]
                uniq, starts = np.unique(sorted_pids, return_index=True)
                bounds = np.append(starts, len(sorted_pids))
                for i, npid in enumerate(uniq):
                    lo_i, hi_i = int(bounds[i]), int(bounds[i + 1])
                    rel = self._write_part_file(
                        sorted_tbl.slice(lo_i, hi_i - lo_i), int(npid), batch_id=file_batch
                    )
                    out.append((int(npid), rel, hi_i - lo_i))
            return out

        todo = [
            (pid_s, info["files"])
            for pid_s, info in cur.partitions.items()
            if info["files"] and lo <= int(pid_s) < hi
        ]
        results = _fan_out(split_one, todo)
        # untouched ranges carry over; the source range leaves the
        # manifest (files unreferenced -> gc'd)
        parts = {
            p: i for p, i in cur.partitions.items() if not (lo <= int(p) < hi)
        }
        for pid in range(new_base, new_base + p_new):
            parts[str(pid)] = {"files": [], "rows": 0}
        for pieces in results:
            for npid, rel, rows in pieces:
                parts[str(npid)]["files"].append(rel)
                parts[str(npid)]["rows"] += rows
        if cur.tables is not None:
            new_tables = {
                n: ({**t, "base_pid": new_base, "num_partitions": p_new} if n == table else t)
                for n, t in cur.tables.items()
            }
            num_partitions = max(cur.num_partitions, new_base + p_new)
        else:
            new_tables = None
            num_partitions = p_new
        latest = self.current()
        if latest.version != cur.version:
            raise CommitConflictError(
                f"manifest moved {cur.version} -> {latest.version} during repartition()"
            )
        m = Manifest(
            version=cur.version + 1,
            num_partitions=num_partitions,
            hwm=cur.hwm,
            last_batch_id=cur.last_batch_id,
            schema_version=cur.schema_version,
            txn_hwm=cur.txn_hwm,
            gtid_executed=cur.gtid_executed,
            ddl_journal=cur.ddl_journal,
            partitions=parts,
            ledger=cur.ledger,
            metrics=cur.metrics,
            tables=new_tables,
        )
        name = self._write_manifest(m, parent=getattr(cur, "_obj_name", ""))
        self._swap_current(name, expected=getattr(cur, "_obj_name", None))
        return m

    def compact(self, pids: list[int] | None = None, mode: str = "major") -> Manifest:
        """Bound multi-file partitions (no batch consumed; manifest
        version bump only). The delta-mode maintenance operation.

        ``mode="major"`` (default): full merge-on-read rewrite — every
        partition collapses to ONE read-optimal file; write cost is
        O(partition bytes).

        ``mode="minor"``: fold each partition's accumulated DELTA files
        into one delta, never reading or rewriting the base file
        (``files[0]``) — the LSM minor-compaction analog; write cost is
        O(delta bytes), partitions end at ≤2 files. Run a major compact
        when the read path should return to single-file fast-path."""
        if mode not in ("major", "minor"):
            raise ValueError(f"mode must be 'major' or 'minor', got {mode!r}")
        cur = self.current()
        parts = dict(cur.partitions)
        min_files = 1 if mode == "major" else 2
        todo = [
            (pid_s, info["files"])
            for pid_s, info in parts.items()
            if len(info["files"]) > min_files and (pids is None or int(pid_s) in pids)
        ]

        def compact_one(pid_s: str, files: list[str]) -> tuple[str, list[str], int]:
            target = cur.schema_of_pid(int(pid_s))
            if mode == "minor":
                deltas = [pq.read_table(os.path.join(self.dir, f)) for f in files[1:]]
                merged = merge_delta_files(deltas, target)
                base_rows = pq.read_metadata(os.path.join(self.dir, files[0])).num_rows
                if merged.num_rows == 0:  # deltas were all empty
                    return pid_s, files[:1], base_rows
                rel = self._write_part_file(merged, int(pid_s), batch_id=cur.last_batch_id + 1)
                # "rows" for delta partitions counts file rows (the same
                # sum the append path accumulates), not live rows
                return pid_s, [files[0], rel], base_rows + merged.num_rows
            tables = [pq.read_table(os.path.join(self.dir, f)) for f in files]
            # keep_seq: rows retain the __seq of the batch that wrote
            # them, so the rewrite stays invisible to read_changes'
            # __seq > floor incremental filter
            merged = merge_partition_files(tables, target, keep_seq=True)
            rel = self._write_part_file(merged, int(pid_s), batch_id=cur.last_batch_id + 1)
            return pid_s, [rel], merged.num_rows

        results = _fan_out(compact_one, todo)  # parallel partition rewrites
        for pid_s, files, rows in results:
            parts[pid_s] = {"files": files, "rows": rows}
        # surface the single-writer race the same way commit_batch does:
        # a commit that landed while we compacted must not be clobbered
        latest = self.current()
        if latest.version != cur.version:
            raise CommitConflictError(
                f"manifest moved {cur.version} -> {latest.version} during compact()"
            )
        metrics = cur.metrics
        if mode == "major" and results:
            # stamp the version so incremental consumers (read_changes
            # callers, pipelines/mirror) can detect a window that spans
            # a tombstone-dropping rewrite instead of silently missing
            # deletes folded into it
            metrics = {**cur.metrics, "last_major_compact_version": cur.version + 1}
        m = Manifest(
            version=cur.version + 1,
            num_partitions=cur.num_partitions,
            hwm=cur.hwm,
            last_batch_id=cur.last_batch_id,
            schema_version=cur.schema_version,
            txn_hwm=cur.txn_hwm,
            gtid_executed=cur.gtid_executed,
            ddl_journal=cur.ddl_journal,
            partitions=parts,
            ledger=cur.ledger,
            metrics=metrics,
            tables=cur.tables,
        )
        name = self._write_manifest(m, parent=getattr(cur, "_obj_name", ""))
        self._swap_current(name, expected=getattr(cur, "_obj_name", None))
        return m
