"""MySQL partial-JSON update analog (JsonConversion.java:9 binary-JSON
decode; JsonDiffConversion.java:1 JSON_SET/JSON_REMOVE diff emission).

The reference decodes MySQL's binary-JSON column format and, for
partial (diff) updates in the binlog, emits JSON_SET / JSON_REMOVE
expressions instead of full images. This engine's analog: a JSON
payload column is a ``string`` column holding a JSON document, and an
event may carry a ``patch`` column — a JSON array of path ops applied
to the row's current value instead of replacing it:

    [{"col": "meta", "op": "set",    "path": "$.a.b", "value": 1},
     {"col": "meta", "op": "remove", "path": "$.k"}]

Semantics (MySQL JSON_SET / JSON_REMOVE parity, documented + pytest'd):

- ``set`` creates the LEAF key when its parent object exists; a missing
  intermediate parent makes that op a NO-OP (JSON_SET never creates
  paths);
- ``remove`` of a missing path is a no-op;
- a SQL-NULL column value stays NULL (``JSON_SET(NULL, ...) = NULL``);
- a patch on a missing or deleted ROW is a no-op — the UPDATE matched
  0 rows (how MySQL treats an UPDATE of a vanished key);
- patched output is CANONICAL JSON (sorted keys, compact separators),
  so byte-equality of results is well-defined.

Patch folding order (stages/reduce.fold_patch_rows): per doc in
position order, a full image or delete RESETS the state; patches after
a full image apply onto it; leading patches with no in-window image
form a RESIDUAL chain resolved against the partition's base rows at
apply time (partition-local read, no extra shuffle).
"""

from __future__ import annotations

import json
from typing import Any, Optional


def canonical(obj: Any) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


def _parse_path(path: str) -> list[str]:
    if not path.startswith("$.") or len(path) <= 2:
        raise ValueError(f"unsupported JSON path {path!r} (use $.key or $.a.b)")
    return path[2:].split(".")


def apply_ops_to_value(value: Optional[str], ops: list[dict]) -> Optional[str]:
    """Apply path ops to ONE JSON string value. None (SQL NULL) stays
    None; non-object documents reject set/remove below the root."""
    if value is None:
        return None  # JSON_SET(NULL, ...) = NULL
    doc = json.loads(value)
    for op in ops:
        keys = _parse_path(op["path"])
        node = doc
        # walk to the parent; a missing intermediate makes the op a no-op
        ok = True
        for k in keys[:-1]:
            if isinstance(node, dict) and k in node:
                node = node[k]
            else:
                ok = False
                break
        if not ok or not isinstance(node, dict):
            continue
        leaf = keys[-1]
        if op["op"] == "set":
            node[leaf] = op["value"]
        elif op["op"] == "remove":
            node.pop(leaf, None)
        else:
            raise ValueError(f"unknown patch op {op['op']!r}")
    return canonical(doc)


def apply_chain_to_row(row: dict[str, Any], ops: list[dict]) -> dict[str, Any]:
    """Apply a composed op chain to a row dict (payload column -> value);
    ops group by their ``col`` target. Unknown columns are rejected —
    a typo must not silently drop an update."""
    by_col: dict[str, list[dict]] = {}
    for op in ops:
        by_col.setdefault(op["col"], []).append(op)
    out = dict(row)
    for col, col_ops in by_col.items():
        if col not in out:
            raise ValueError(f"patch targets unknown payload column {col!r}")
        out[col] = apply_ops_to_value(out[col], col_ops)
    return out
