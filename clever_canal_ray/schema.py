"""Canonical schemas + schema-evolution (DDL) rules.

The lake table is the ``input_hint`` payload (BASELINE.json:15):
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``.

Schema evolution mirrors Canal's TableMetaTSDB rules (reference:
clever-canal-parse/.../tsdb/DatabaseTableMeta.java:530-637
``compareTableMeta``/``synonymsType``; MemoryTableMeta.java:67-128):
only *additive* (add nullable column) and *widening* (int32→int64,
list<int32>→list<int64>) changes are legal; rows written before a DDL
are up-cast on read (merge-on-read), never rewritten in place.

A schema version is a list of DDL records applied in order to the v0
base schema — the exact snapshot+replay shape of Canal's MetaHistory /
MetaSnapshot tables (DatabaseTableMeta.java:177-216, 229-281).
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

# --- type name <-> arrow type table (the "synonymsType" analog) -----------

_TYPE_FROM_NAME = {
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "string": pa.string(),
    "binary": pa.binary(),
    "bool": pa.bool_(),
    "timestamp[s]": pa.timestamp("s"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[us]": pa.timestamp("us"),
    # the unsigned-BIGINT promotion endpoint (LogEventConvert.java:694-725
    # promotes unsigned types one width up; unsigned BIGINT lands in
    # DECIMAL) — scale 0, max precision
    "decimal": pa.decimal128(38, 0),
    "list<int32>": pa.list_(pa.int32()),
    "list<int64>": pa.list_(pa.int64()),
    "list<float32>": pa.list_(pa.float32()),
    "list<float64>": pa.list_(pa.float64()),
}
_NAME_FROM_TYPE = {v: k for k, v in _TYPE_FROM_NAME.items()}

# Legal widenings (LogEventConvert.java:694-725 unsigned-promotion analog):
# each key may widen to any type in its value set. int*→decimal is the
# unsigned-BIGINT endpoint; timestamp unit widening is lossless
# (s → ms → us up-casts multiply, never truncate).
_WIDEN_OK = {
    "int8": {"int16", "int32", "int64", "decimal"},
    "int16": {"int32", "int64", "decimal"},
    "int32": {"int64", "decimal"},
    "int64": {"decimal"},
    "float32": {"float64"},
    "timestamp[s]": {"timestamp[ms]", "timestamp[us]"},
    "timestamp[ms]": {"timestamp[us]"},
    "list<int32>": {"list<int64>"},
    "list<float32>": {"list<float64>"},
}

# Verbs a CDC stream carries that do NOT change the row schema — the
# DruidDdlParser C_INDEX/D_INDEX/DCL classifications (DruidDdlParser
# .parse:22-160): the journal records them (audit trail) and replay
# continues; halting on them would stall a real stream on every
# CREATE INDEX.
_NOOP_DDL_VERBS = {"create_index", "drop_index", "alter_index", "dcl"}


def type_from_name(name: str) -> pa.DataType:
    return _TYPE_FROM_NAME[name]


def type_name(t: pa.DataType) -> str:
    return _NAME_FROM_TYPE[t]


# --- base (v0) lake schema ------------------------------------------------

LAKE_SCHEMA_V0 = pa.schema(
    [
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)


class SchemaEvolutionError(ValueError):
    pass


def apply_ddl(schema: pa.Schema, ddl: dict[str, Any], dropped: set | None = None) -> pa.Schema:
    """Apply one structured DDL record to a schema.

    DDL records are the structured analog of Canal's DDL history rows
    (FIXTURES.md §3; verb classification DruidDdlParser.parse:22-160):
    ``add_column | widen_type | rename_column | drop_column`` (plus the
    multi-table registry verbs create/drop/rename_table handled at the
    manifest layer). ``dropped`` (optional, mutated) tracks RETIRED
    names — dropped columns AND rename sources: reusing one (add or
    rename target) is rejected, because old files still physically
    hold the name and merge-on-read would resurrect its values into
    the new unrelated column; compact + a fresh name instead.
    """
    op = ddl["op"]
    if op in _NOOP_DDL_VERBS:
        return schema  # journal-recorded no-op (index/DCL verbs)
    if op == "base_schema":
        # arbitrary user-table payloads (the RowsLogBuffer.fetchValue
        # type families: decimal / temporal / binary / string /
        # numeric): a journal whose FIRST entry is base_schema replaces
        # the v0 tokenized-sequence base with the user table's shape —
        # the CREATE TABLE statement seeding Canal's TableMetaTSDB
        # (DatabaseTableMeta.java:177-216 apply of the first snapshot).
        # Everything downstream (widen/rename/drop, merge-on-read
        # up-cast, per-partition reduce) is payload-agnostic.
        fields = [
            pa.field(n, type_from_name(t), nullable=(n != "doc_id"))
            for n, t in ddl["fields"]
        ]
        names = [f.name for f in fields]
        if "doc_id" not in names:
            raise SchemaEvolutionError("base_schema needs the 'doc_id' key column")
        if len(set(names)) != len(names):
            raise SchemaEvolutionError("base_schema has duplicate column names")
        return pa.schema(fields)
    if op == "add_column":
        name = ddl["name"]
        if schema.get_field_index(name) != -1:
            raise SchemaEvolutionError(f"column {name!r} already exists")
        if dropped is not None and name in dropped:
            raise SchemaEvolutionError(
                f"column {name!r} was dropped or renamed away earlier; old files may "
                "still hold its values — compact the lake and use a fresh name"
            )
        return schema.append(pa.field(name, type_from_name(ddl["type"]), nullable=True))
    if op == "widen_type":
        name = ddl["name"]
        i = schema.get_field_index(name)
        if i == -1:
            raise SchemaEvolutionError(f"column {name!r} not found")
        old = type_name(schema.field(i).type)
        new = ddl["to"]
        if new not in _WIDEN_OK.get(old, ()) :
            raise SchemaEvolutionError(f"illegal widen {old} -> {new} for {name!r}")
        return schema.set(i, pa.field(name, type_from_name(new), nullable=schema.field(i).nullable))
    if op == "rename_column":
        src, dst = ddl["from"], ddl["to"]
        i = schema.get_field_index(src)
        if i == -1:
            raise SchemaEvolutionError(f"column {src!r} not found")
        if schema.get_field_index(dst) != -1:
            raise SchemaEvolutionError(f"column {dst!r} already exists")
        if src == "doc_id":
            raise SchemaEvolutionError("the primary-key column cannot be renamed")
        if dropped is not None:
            if dst in dropped:
                raise SchemaEvolutionError(
                    f"column {dst!r} was dropped or renamed away earlier; old files "
                    "may still hold its values — compact the lake and use a fresh name"
                )
            dropped.add(src)  # the source name is retired on disk
        f = schema.field(i)
        return schema.set(i, pa.field(dst, f.type, nullable=f.nullable))
    if op == "drop_column":
        name = ddl["name"]
        i = schema.get_field_index(name)
        if i == -1:
            raise SchemaEvolutionError(f"column {name!r} not found")
        if name == "doc_id":
            raise SchemaEvolutionError("the primary-key column cannot be dropped")
        if dropped is not None:
            dropped.add(name)
        return schema.remove(i)
    raise SchemaEvolutionError(f"unknown DDL op {op!r}")


def journal_renames(ddls: list[dict[str, Any]]) -> dict[str, str]:
    """Cumulative old-name -> final-name map of a DDL journal (files
    written before a rename keep the old column name on disk; the
    merge-on-read up-cast follows this map)."""
    out: dict[str, str] = {}
    for d in ddls:
        if d["op"] == "rename_column":
            src, dst = d["from"], d["to"]
            for k, v in list(out.items()):
                if v == src:
                    out[k] = dst
            out[src] = dst
        elif d["op"] == "drop_column":
            # dropping a renamed column ends its chain
            out = {k: v for k, v in out.items() if v != d["name"]}
    return out


RENAMES_META_KEY = b"ccr_renames"


def reverse_renames_from_metadata(schema: pa.Schema) -> dict[str, list[str]]:
    """Parse the rename map riding a target schema's metadata:
    final name -> [old physical names] (reverse-mapped — see
    attach_renames)."""
    if schema.metadata and RENAMES_META_KEY in schema.metadata:
        return json.loads(schema.metadata[RENAMES_META_KEY])
    return {}


def attach_renames(schema: pa.Schema, ddls: list[dict[str, Any]]) -> pa.Schema:
    """Stamp the journal's rename map onto a target schema so every
    ``upcast_table`` call against it resolves renamed columns in old
    files — no signature changes anywhere in the merge path. The map
    rides schema metadata REVERSE-mapped ({final: [old names]}) so
    multi-table unions can merge maps without old-name key collisions;
    upcast_table strips it from its OUTPUT (a schema with metadata is
    unhashable and would disable Ray's block schema dedup)."""
    renames = journal_renames(ddls)
    if not renames:
        return schema
    rev: dict[str, list[str]] = {}
    for old, new in renames.items():
        rev.setdefault(new, []).append(old)
    return schema.with_metadata({RENAMES_META_KEY: json.dumps(rev)})


def lake_schema(ddls: list[dict[str, Any]]) -> pa.Schema:
    """v0 schema + replay of the DDL journal (TableMetaTSDB replay).
    A ``base_schema`` first entry replaces v0 with an arbitrary user
    table shape (see apply_ddl); anywhere else it is illegal — a
    mid-stream base swap would orphan every file already written."""
    s = LAKE_SCHEMA_V0
    dropped: set = set()
    for i, d in enumerate(ddls):
        if d["op"] == "base_schema" and i != 0:
            raise SchemaEvolutionError("base_schema is only legal as the first journal entry")
        s = apply_ddl(s, d, dropped)
    return attach_renames(s, ddls)


def widen_union(schemas: list[pa.Schema]) -> pa.Schema:
    """Field-name union of several table schemas, widening on type
    conflicts (the multi-table combine stage flattens every event to
    this; each partition's reducer casts down to its table's schema —
    lossless because only widening conflicts are legal). The inputs'
    rename maps (attach_renames metadata) are MERGED onto the output:
    the combine stage resolves renamed physical column names through
    it, and per-table down-casts drop any cross-table spillover."""
    fields: dict[str, pa.Field] = {}
    order: list[str] = []
    renames: dict[str, list[str]] = {}
    for s in schemas:
        for new, olds in reverse_renames_from_metadata(s).items():
            # a single table's rename CHAIN (a->b->c gives c: [a, b]) is
            # unambiguous — a file holds at most one of the chain names.
            # Only a CONFLICT across tables (same target, different
            # source sets) is ambiguous: per-row resolution over a
            # shared physical layout could pick another table's column.
            if new in renames and renames[new] != olds:
                raise SchemaEvolutionError(
                    f"ambiguous cross-table rename target {new!r}: "
                    f"sources {renames[new]} vs {olds}"
                )
            renames[new] = list(olds)
        for f in s:
            cur = fields.get(f.name)
            if cur is None:
                fields[f.name] = f
                order.append(f.name)
            elif cur.type != f.type:
                a, b = type_name(cur.type), type_name(f.type)
                if b in _WIDEN_OK.get(a, ()):
                    fields[f.name] = pa.field(f.name, f.type, nullable=cur.nullable or f.nullable)
                elif a in _WIDEN_OK.get(b, ()):
                    pass  # current is already the wider one
                else:
                    raise SchemaEvolutionError(
                        f"irreconcilable types for {f.name!r}: {a} vs {b}"
                    )
    out = pa.schema([fields[n] for n in order])
    if renames:
        out = out.with_metadata({RENAMES_META_KEY: json.dumps(renames)})
    return out


def upcast_table(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Up-cast a table written under an older schema version to ``target``.

    Missing columns are added as all-null; widened columns are cast;
    renamed columns resolve through the rename map riding ``target``'s
    metadata (attach_renames). Dropped columns simply aren't selected.
    This is the merge-on-read half of schema evolution: old Parquet
    files are never rewritten (FIXTURES.md §3 rules). The OUTPUT schema
    carries no metadata (a schema with metadata is unhashable and
    disables Ray's block-schema dedup).
    """
    rev = reverse_renames_from_metadata(target)
    out_schema = pa.schema(list(target))  # metadata stripped
    cols = []
    n = len(table)
    for f in target:
        # a renamed column COALESCES over [new name, old names]: a block
        # that passed through an engine schema-unification step (e.g.
        # Ray's groupby) may carry the new name as an all-null column
        # ALONGSIDE the old physical column — preferring the first
        # present name alone would null the pre-rename values
        candidates = [f.name] + rev.get(f.name, [])
        present = [
            table.column(i)
            for i in (table.schema.get_field_index(c) for c in candidates)
            if i != -1
        ]
        if not present:
            cols.append(pa.nulls(n, f.type))
            continue
        casted = [c if c.type == f.type else c.cast(f.type) for c in present]
        if len(casted) == 1:
            cols.append(casted[0])
        else:
            import pyarrow.compute as _pc

            cols.append(_pc.coalesce(*[c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in casted]))
    return pa.Table.from_arrays(cols, schema=out_schema)


def schema_to_json(schema: pa.Schema) -> str:
    """Serialize a schema snapshot (the MetaSnapshot analog)."""
    return json.dumps([{"name": f.name, "type": type_name(f.type), "nullable": f.nullable} for f in schema])


def schema_from_json(s: str) -> pa.Schema:
    return pa.schema(
        [pa.field(d["name"], type_from_name(d["type"]), nullable=d["nullable"]) for d in json.loads(s)]
    )


# --- change-event schema (the Entry/RowChange/RowData analog) -------------

EVENT_META_FIELDS = [
    ("segment_id", pa.int32()),  # journalName analog (EntryPosition.java:107-115)
    ("offset", pa.int64()),  # logfileOffset analog; monotone per segment
    ("txn_id", pa.int64()),  # TransactionBegin/End transactionId analog
    ("seq_in_txn", pa.int32()),
    ("txn_commit", pa.bool_()),  # True on the last event of a txn (TRANSACTION_END analog)
    ("execute_ts", pa.timestamp("ms")),  # Header.executeTime; may regress inside a txn
    ("op", pa.string()),  # "I" | "U" | "D" | "DDL" (EventType analog)
    ("table", pa.string()),  # schemaName.tableName analog
    ("doc_id", pa.string()),  # primary key of affected row (null for DDL)
    ("schema_version", pa.int32()),
    ("ddl", pa.string()),  # JSON DDL record for op=="DDL", else null
]


def event_schema(
    payload: pa.Schema,
    include_rekey: bool = False,
    include_xa: bool = False,
    include_patch: bool = False,
) -> pa.Schema:
    """Event-log schema for a given lake payload schema version.

    ``before``/``after`` are struct columns over the payload fields
    (RowData.beforeColumns/afterColumns analog, EntryProtocol.proto:154-161):
    before is null for I, after is null for D, both null for DDL.

    ``include_rekey`` adds the optional ``new_doc_id`` column: on an
    UPDATE whose primary key changed (``Column.isKey`` + before/after
    key diff, LogEventConvert.parseOneRow:536-802), ``doc_id`` holds
    the OLD key and ``new_doc_id`` the NEW one; apply = delete(old) +
    upsert(new) — how a Canal client applies a PK-change row. Null on
    every other event.

    ``include_xa`` adds the optional ``xa_id`` column — the
    distributed-transaction branch id (EntryProtocol.proto:26-59
    EventType XA_COMMIT=13/XA_ROLLBACK=14; LogEventConvert.java:78-119
    XA dispatch). A data event with non-null ``xa_id`` belongs to that
    XA branch and applies ONLY once an ``op="XC"`` (XA_COMMIT) control
    row for the branch is seen; ``op="XR"`` (XA_ROLLBACK) discards the
    branch. Binlog-order contract: the verdict row always FOLLOWS every
    event of its branch (XA PREPARE wrote them earlier in the log).
    """
    payload_struct = pa.struct(list(payload))
    fields = [pa.field(n, t) for n, t in EVENT_META_FIELDS]
    if include_rekey:
        fields.append(pa.field("new_doc_id", pa.string()))
    if include_xa:
        fields.append(pa.field("xa_id", pa.int64()))
    if include_patch:
        # partial-JSON update (JsonDiffConversion.java analog): a JSON
        # array of {"col","op","path","value"} ops applied to the row's
        # current value instead of a full after image (which is null on
        # patch rows) — see functions/json_patch.py for the semantics
        fields.append(pa.field("patch", pa.string()))
    fields.append(pa.field("before", payload_struct))
    fields.append(pa.field("after", payload_struct))
    return pa.schema(fields)


# position packing: (segment_id, offset) -> single orderable int64.
# offsets are < 2^40 by construction (generator); segment_id < 2^23.
POS_OFFSET_BITS = 40


def pack_position(segment_id, offset):
    """Vectorized or scalar (segment_id << 40) | offset."""
    import numpy as np

    seg = np.asarray(segment_id, dtype=np.int64)
    off = np.asarray(offset, dtype=np.int64)
    return (seg << POS_OFFSET_BITS) | off
