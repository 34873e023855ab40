"""FlatMessage JSONL → canonical change-event segments.

The consume-side of Canal's MQ path: Canal serializes row changes as
FlatMessage JSON onto Kafka/RocketMQ (protocol/FlatMessage.java:10-35;
our producer is ``cdc_ops.write_flat_messages``), and downstream
systems ingest FROM that stream. This source closes the round trip —
a lake can be fed from the flat JSON journal alone:

    events ──write_flat_messages──► JSONL ──flat_messages_to_segments──►
    parquet segments ──replay──► lake

Position semantics: FlatMessage (like Canal's MQ output) carries no
binlog coordinates — consumers inherit order from the MQ partition. We
synthesize the same contract: file order is segment order, row order
within a file is offset order, and every row is its own transaction
(MQ flat consumers apply row-at-a-time idempotently; there is no txn
framing to recover). The synthesized txn id is the packed (segment,
offset) position, so txn ids stay globally unique and monotone — the
invariant the GTID watermark (``ReplayConfig.gtid_dedup``) relies on.
Replay convergence is unaffected: last-writer-wins resolves by the
synthesized order, which equals the original event order.

**File order is stream order.** The directory listing is sorted by
name; pass ``files=[...]`` explicitly when names don't sort in stream
order (Ray's ``write_json`` emits UUID-prefixed names — rename them or
list them in order; two producer runs appended into one directory DO
NOT sort correctly by name).

PK-change rows are reconstructed from the change mask: a U row whose
``old`` carries a different ``doc_id`` than ``data`` becomes a rekey
event (delete(old)+upsert(new)) — exactly how a Canal client detects a
key change from FlatMessage.old. DDL rows replay from ``sql``
(FlatMessage.sql holds the structured DDL record); when ``payload`` is
not given, the stream's own DDL records are scanned first and the
physical payload (base + add/widen; renames and drops stay under their
original physical names, mirroring the event-encoding rule) is derived
from them. TRUNCATE passes through as an ``op="T"`` control row. XA
branch internals are not part of the FlatMessage surface — the
producer refuses unresolved branches; replay the stream through the
engine first.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj
import pyarrow.parquet as pq

from clever_canal_ray.schema import event_schema, lake_schema, pack_position

_ALLOWED_OPS = {"I", "U", "D", "DDL", "T"}
_PHYSICAL_DDL_OPS = ("add_column", "widen_type")


def _struct_from(src: pa.Array, payload: pa.Schema, n: int) -> pa.Array:
    """Rebuild a payload struct from a JSON-inferred struct: fields cast
    to the payload types, missing fields null, null rows preserved."""
    if src is None or pa.types.is_null(src.type):
        return pa.nulls(n, pa.struct(list(payload)))
    children = []
    src_names = {src.type.field(i).name for i in range(src.type.num_fields)}
    for f in payload:
        if f.name in src_names:
            children.append(pc.struct_field(src, f.name).cast(f.type))
        else:
            children.append(pa.nulls(n, f.type))
    mask = pc.is_null(src)
    return pa.StructArray.from_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in children],
        fields=list(payload),
        mask=mask.combine_chunks() if isinstance(mask, pa.ChunkedArray) else mask,
    )


def scan_flat_file(path: str) -> dict:
    """Cheap pre-scan of one FlatMessage file: DDL records (in order),
    whether any PK-change row exists, and the DELETE/keyless-DELETE
    counts for the directory-level stripped-stream check."""
    import json

    t = pj.read_json(path)
    op = np.asarray(t["type"].to_numpy(zero_copy_only=False), dtype=object)
    is_ddl = op == "DDL"
    ddls = []
    if is_ddl.any():
        if "sql" not in t.column_names:
            raise ValueError(
                f"{path}: DDL rows without a 'sql' field cannot replay schema evolution"
            )
        sql = np.asarray(t["sql"].to_numpy(zero_copy_only=False), dtype=object)
        ddls = [json.loads(s) for s in sql[is_ddl]]

    def ids(col):
        if col not in t.column_names or pa.types.is_null(t[col].type):
            return np.full(t.num_rows, None, dtype=object)
        struct = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
        if struct.type.num_fields == 0 or struct.type.get_field_index("doc_id") == -1:
            return np.full(t.num_rows, None, dtype=object)
        return np.asarray(
            pc.struct_field(struct, "doc_id").to_numpy(zero_copy_only=False), dtype=object
        )

    data_id, old_id = ids("data"), ids("old")
    rekey = bool(
        ((op == "U") & (old_id != None) & (data_id != None) & (old_id != data_id)).any()  # noqa: E711
    )
    is_d = op == "D"
    return {
        "ddls": ddls,
        "rekey": rekey,
        "n_d": int(is_d.sum()),
        "n_keyless_d": int((is_d & (old_id == None)).sum()),  # noqa: E711
    }


def flat_file_to_events(
    path: str,
    segment_id: int,
    payload: pa.Schema | None = None,
    include_rekey: bool | None = None,
) -> pa.Table:
    """One FlatMessage JSONL file → one canonical event segment table.

    ``payload`` is the PHYSICAL layout (base + add/widen columns, the
    encoding every data row uses); default = base schema v0.
    ``include_rekey`` forces the ``new_doc_id`` column on/off so every
    segment of a stream shares one schema (replay rejects a micro-batch
    whose files disagree); None = decide from this file alone."""
    payload = payload if payload is not None else lake_schema([])
    t = pj.read_json(path)
    n = t.num_rows
    op = np.asarray(t["type"].to_numpy(zero_copy_only=False), dtype=object)
    unknown = set(op) - _ALLOWED_OPS
    if unknown:
        if None in unknown:
            raise ValueError(f"{path}: rows without a 'type' field")
        raise ValueError(
            f"{path}: FlatMessage stream carries unsupported types "
            f"{sorted(map(str, unknown))} (XA branches must be resolved by "
            "replaying through the engine before export)"
        )
    is_ddl = op == "DDL"
    is_t = op == "T"
    if is_ddl.any() and "sql" not in t.column_names:
        raise ValueError(
            f"{path}: DDL rows without a 'sql' field cannot replay schema evolution"
        )

    data = t["data"].combine_chunks() if isinstance(t["data"], pa.ChunkedArray) else t["data"]
    old = None
    if "old" in t.column_names:
        old = t["old"].combine_chunks() if isinstance(t["old"], pa.ChunkedArray) else t["old"]
    after = _struct_from(data, payload, n)
    before = _struct_from(old, payload, n)

    data_id = np.asarray(
        pc.struct_field(after, "doc_id").to_numpy(zero_copy_only=False), dtype=object
    )
    old_id = np.asarray(
        pc.struct_field(before, "doc_id").to_numpy(zero_copy_only=False), dtype=object
    )
    # rekey reconstruction from the change mask (old.doc_id differs);
    # DELETE rows carry their image in `old` (data is null for D — the
    # beforeColumns→data mapping Canal applies on DELETE)
    rk = (op == "U") & (old_id != None) & (data_id != None) & (old_id != data_id)  # noqa: E711
    doc_id = np.where(op == "D", old_id, np.where(rk, old_id, data_id))
    new_doc_id = np.where(rk, data_id, None)
    if include_rekey is None:
        include_rekey = bool(rk.any())
    elif rk.any() and not include_rekey:
        raise ValueError(f"{path}: PK-change rows present but include_rekey=False")
    # a keyless D is a delete of a row that did not exist (the producer
    # had no before-image to emit) — a no-op for any applier; DROP it.
    # The stripped-stream refusal (ALL deletes keyless) happens at the
    # DIRECTORY level in flat_messages_to_segments — per-file counts
    # are too small to judge (write_json emits many small files).
    keyless_d = (op == "D") & (doc_id == None)  # noqa: E711
    missing = np.isin(op, ("I", "U")) & (doc_id == None)  # noqa: E711
    if missing.any():
        raise ValueError(f"{path}: {int(missing.sum())} I/U messages carry no key")
    if keyless_d.any():
        keep = ~keyless_d
        t = t.filter(pa.array(keep))
        n = t.num_rows
        op, is_ddl, is_t, doc_id, new_doc_id = (
            op[keep], is_ddl[keep], is_t[keep], doc_id[keep], new_doc_id[keep],
        )
        after, before = after.filter(pa.array(keep)), before.filter(pa.array(keep))

    # DDL rows: the after/doc_id must be null, ddl JSON rides along
    ddl_col = (
        np.asarray(t["sql"].to_numpy(zero_copy_only=False), dtype=object)
        if "sql" in t.column_names
        else np.full(n, None, dtype=object)
    )
    ddl_col = np.where(is_ddl, ddl_col, None)
    doc_id = np.where(is_ddl | is_t, None, doc_id)
    # schema epoch within the file: DDL count prefix (replay recomputes
    # epochs from DDL positions; this column mirrors the producer's)
    sv = np.cumsum(is_ddl).astype(np.int32)

    es = t["es"].cast(pa.timestamp("ms")) if "es" in t.column_names else pa.nulls(n, pa.timestamp("ms"))
    offsets = 4 + np.arange(n, dtype=np.int64)
    # txn id = packed position: globally unique + monotone across
    # segments (plan sidecars and the GTID watermark depend on it; a
    # per-file counter would collide and gtid_dedup would drop data)
    txn_ids = pack_position(np.full(n, segment_id, dtype=np.int64), offsets)
    schema = event_schema(payload, include_rekey=include_rekey)
    arrays = [
        pa.array(np.full(n, segment_id, dtype=np.int32), pa.int32()),
        pa.array(offsets, pa.int64()),
        pa.array(txn_ids.astype(np.int64), pa.int64()),
        pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
        pa.array(np.ones(n, dtype=bool), pa.bool_()),  # every row commits
        es,
        pa.array(op, pa.string()),
        pa.array(
            [
                f"{d}.{tb}"
                for d, tb in zip(
                    t["database"].to_pylist() if "database" in t.column_names else ["lake"] * n,
                    t["table"].to_pylist() if "table" in t.column_names else ["sequences"] * n,
                )
            ],
            pa.string(),
        ),
        pa.array(doc_id, pa.string()),
        pa.array(sv, pa.int32()),
        pa.array(ddl_col, pa.string()),
    ]
    if include_rekey:
        arrays.append(pa.array(new_doc_id, pa.string()))
    arrays += [before, after]
    return pa.Table.from_arrays(arrays, schema=schema)


def flat_messages_to_segments(
    json_dir: str,
    out_dir: str,
    payload: pa.Schema | None = None,
    segment_base: int = 0,
    files: list[str] | None = None,
) -> list[str]:
    """Convert a directory of FlatMessage JSONL files into replayable
    parquet segments — one file = one segment, converted in parallel
    Ray tasks, each with a ``.plan.json`` footer sidecar so replay
    plans from metadata alone. Returns the segment paths in order.

    Two passes: a cheap parallel pre-scan derives (a) the stream's
    physical payload from its OWN DDL records when ``payload`` is not
    given, (b) whether ANY file carries PK-change rows (so every
    segment shares one schema), and (c) the directory-level
    stripped-stream check (a stream whose DELETEs are ALL keyless was
    produced without before-images and cannot be replayed).

    ``files``: explicit stream-ordered list; default = directory
    listing sorted by NAME (see module docstring for the ordering
    contract)."""
    import ray

    from clever_canal_ray.fixtures.generator import segment_plan_metadata

    if files is None:
        files = sorted(
            os.path.join(json_dir, f)
            for f in os.listdir(json_dir)
            if f.endswith(".json") or f.endswith(".jsonl")
        )
    if not files:
        raise FileNotFoundError(f"no .json/.jsonl files under {json_dir}")
    os.makedirs(out_dir, exist_ok=True)

    scan_r = ray.remote(scan_flat_file)
    scans = ray.get([scan_r.remote(p) for p in files])
    n_d = sum(s["n_d"] for s in scans)
    if n_d >= 5 and sum(s["n_keyless_d"] for s in scans) == n_d:
        raise ValueError(
            f"{json_dir}: every DELETE in the stream lacks a row image in "
            "'old' — produced without before-images; deletes are "
            "unrecoverable and the stream cannot be replayed"
        )
    include_rekey = any(s["rekey"] for s in scans)
    if payload is None:
        ddls = [d for s in scans for d in s["ddls"] if d["op"] in _PHYSICAL_DDL_OPS]
        payload = lake_schema(ddls)

    @ray.remote
    def convert(path: str, seg: int, out_path: str) -> str:
        t = flat_file_to_events(path, seg, payload, include_rekey=include_rekey)
        pq.write_table(t, out_path, use_dictionary=False, row_group_size=65536)
        with open(out_path + ".plan.json", "w") as f:
            f.write(segment_plan_metadata(t))
        return out_path

    outs = [
        convert.remote(p, segment_base + i, os.path.join(out_dir, f"segment-{segment_base + i:05d}.parquet"))
        for i, p in enumerate(files)
    ]
    return list(ray.get(outs))
