"""Serial-apply oracle: the ground truth for replay convergence.

Applies the change-event log one event at a time, in strict
``(segment_id, offset)`` order (EntryPosition total order,
EntryPosition.java:107-115), to an in-memory dict keyed by ``doc_id``
— exactly what a single-threaded Canal client consuming get/ack
batches would materialize. The Ray pipeline must reproduce this final
state under token-array equality per row (BASELINE.json north rule).

Apply convention (see fixtures/generator.py docstring): idempotent
upsert — I and U set the image, D tombstones, D on missing is a no-op.
DDL events evolve the schema (add/widen/rename/drop); rows written
before a DDL are up-cast (missing columns → null, ints widened
losslessly, renamed columns resolved through the journal's rename map).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from clever_canal_ray.schema import journal_renames, lake_schema, upcast_table


def apply_events_serial(lake_table: pa.Table, segment_tables: list[pa.Table]) -> pa.Table:
    """Replay all events over the initial lake; return final table.

    Output is sorted by doc_id and encoded in the final schema version.
    ``max_position`` semantics: the whole log is applied (tests slice
    segments themselves when simulating partial replay).
    """
    state: dict[str, dict] = {}
    base_cols = lake_table.column_names
    for row in lake_table.to_pylist():
        state[row["doc_id"]] = row

    ddls: list[dict] = []
    events = pa.concat_tables(segment_tables, promote_options="permissive")
    # strict global order
    order = np.lexsort(
        (events["offset"].to_numpy(zero_copy_only=False), events["segment_id"].to_numpy(zero_copy_only=False))
    )
    cols = events.to_pylist()
    # XA framing: a branch's events apply only if an op="XC" verdict
    # exists for its xa_id (XA_ROLLBACK or missing verdict = discard;
    # the engine's ack never passes an unresolved branch, and the full
    # log is applied here, so "missing" == never committed)
    xa_committed = {
        ev["xa_id"] for ev in cols if ev["op"] == "XC" and ev.get("xa_id") is not None
    }
    for i in order:
        ev = cols[i]
        op = ev["op"]
        if op == "DDL":
            ddls.append(json.loads(ev["ddl"]))
            continue
        if op == "T":  # TRUNCATE: wipe the table (EventType.TRUNCATE=8)
            state.clear()
            continue
        if op in ("XC", "XR"):  # XA verdict control rows
            continue
        if ev.get("xa_id") is not None and ev["xa_id"] not in xa_committed:
            continue  # rolled-back (or never-committed) XA branch event
        key = ev["doc_id"]
        if op == "D":
            state.pop(key, None)
        else:  # I or U -> upsert the after image
            after = ev["after"]
            img = {k: after[k] for k in after}
            new_key = ev.get("new_doc_id")
            if new_key is not None:  # PK-change: delete(old) + insert(new)
                state.pop(key, None)
                key = new_key
                img["doc_id"] = new_key
            state[key] = img

    final_schema = lake_schema(ddls)
    renames = journal_renames(ddls)  # old physical name -> final name
    rows = [state[k] for k in sorted(state)]

    def val(r: dict, name: str):
        if name in r:
            return r[name]
        for old, new in renames.items():
            if new == name and old in r:
                return r[old]
        return None  # written under an older version

    norm = [{f.name: val(r, f.name) for f in final_schema} for r in rows]
    t = pa.Table.from_pylist(norm, schema=pa.schema(list(final_schema)))
    return upcast_table(t, final_schema)
