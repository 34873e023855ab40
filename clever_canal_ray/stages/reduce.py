"""Per-partition merge-on-read upsert reduce — the "apply" half of O9.

Runs inside ``groupby("pid").map_groups``: each call owns exactly one
lake partition for this micro-batch (single-writer-per-partition, the
reference's single-writer-per-destination invariant, SURVEY.md §3).

Steps (all vectorized):
1. global last-writer-wins per doc_id across the combined rows of every
   upstream block, ordered by packed ``(segment_id, offset)`` position —
   the total order the binlog guarantees (EntryPosition.java:107-115);
   timestamps deliberately play no role (TimelineBarrier regression
   rule: position wins, TimelineBarrier.java:114-125).
2. read the partition's current Parquet files (merge-on-read), up-cast
   to the batch's target schema version (TableMetaTSDB replay, T3);
3. drop lake rows whose key is touched, append final non-tombstone
   images (idempotent upsert — replaying identical events converges);
4. phase-1 write: a uniquely-named Parquet file under ``part=<pid>/``
   (invisible until the manifest references it), return a one-row
   metrics table (A1 counters) for the driver's phase-2 commit.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from clever_canal_ray.schema import upcast_table

METRICS_SCHEMA = pa.schema(
    [
        ("pid", pa.int32()),
        ("file", pa.string()),
        ("rows", pa.int64()),
        ("rows_upserted", pa.int64()),
        ("rows_deleted", pa.int64()),
        ("events_in", pa.int64()),
        ("mode", pa.string()),  # "replace" (compact) | "append" (delta)
    ]
)


def lww_reduce(group: pa.Table, payload_names: list[str]) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """Final LWW per doc_id; returns (winner rows, per-key event counts sum, positions)."""
    doc = group["doc_id"].to_numpy(zero_copy_only=False)
    pos = group["pos"].to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(doc)
    order = np.lexsort((pos, codes))
    last = np.ones(len(order), dtype=bool)
    last[:-1] = codes[order[:-1]] != codes[order[1:]]
    winners = order[last]
    ev_counts = np.bincount(codes, weights=group["n_events"].to_numpy(zero_copy_only=False))
    return group.take(pa.array(winners)), ev_counts[codes[winners]].astype(np.int64), pos[winners]


def fold_patch_rows(group: pa.Table, payload_names: list[str], read_base) -> pa.Table:
    """Fold partial-JSON patch rows (``__patch`` column — the
    JsonDiffConversion.java analog) into full rows, per doc in position
    order: a full image or delete RESETS state; patches after an image
    apply onto it; LEADING patches (no image in the window) form a
    residual chain resolved against the partition's base rows
    (``read_base()`` — lazy, partition-local, only called when residuals
    exist). A residual patch whose doc is absent from the base is an
    UPDATE matching 0 rows — dropped, never creates a row.

    Python-per-PATCH-DOC by design: docs without patch rows pass
    through untouched in one vectorized filter; partial-JSON events are
    the rare case (the reference emits them only for diff-logged JSON
    columns)."""
    import json as _json

    from clever_canal_ray.functions.json_patch import apply_chain_to_row

    patch_np = np.asarray(group["__patch"].to_numpy(zero_copy_only=False), dtype=object)
    g2 = group.drop_columns(["__patch"])
    has = np.array([p is not None for p in patch_np], dtype=bool)
    if not has.any():
        return g2
    doc = np.asarray(group["doc_id"].to_numpy(zero_copy_only=False), dtype=object)
    pos = group["pos"].to_numpy(zero_copy_only=False)
    is_del = group["is_del"].to_numpy(zero_copy_only=False).astype(bool)
    nev = group["n_events"].to_numpy(zero_copy_only=False)
    patch_docs = set(doc[has])
    in_pd = np.array([d in patch_docs for d in doc], dtype=bool)
    passthrough = g2.filter(pa.array(~in_pd))

    idxs = np.where(in_pd)[0]
    idxs = idxs[np.argsort(pos[idxs], kind="stable")]
    per_doc: dict = {}
    for i in idxs:
        per_doc.setdefault(doc[i], []).append(int(i))

    def row_payload(i: int) -> dict:
        return {
            n: (g2["doc_id"][i].as_py() if n == "doc_id" else g2[f"p_{n}"][i].as_py())
            for n in payload_names
        }

    base_map = None  # doc_id -> payload row dict, built on first residual
    out_rows: list[dict] = []
    for d, rows in per_doc.items():
        state, chain, n_ev = ("none", None), [], 0
        for i in rows:
            n_ev += int(nev[i])
            if patch_np[i] is not None:
                ops = _json.loads(patch_np[i])
                if state[0] == "del":
                    continue  # patch on a deleted row: UPDATE of 0 rows
                chain.extend(ops)
                if state[0] == "none":
                    state = ("residual", None)
            elif is_del[i]:
                state, chain = ("del", i), []
            else:
                state, chain = ("full", i), []
        last_i = rows[-1]
        meta = {"pid": g2["pid"][last_i].as_py(), "pos": int(pos[last_i]), "n_events": n_ev}
        if state[0] == "del":
            out_rows.append({**meta, "is_del": True, **row_payload(state[1]), "doc_id": d})
        elif state[0] == "full":
            payload = row_payload(state[1])
            if chain:
                payload = apply_chain_to_row(payload, chain)
            out_rows.append({**meta, "is_del": False, **payload})
        else:  # residual: resolve against the base partition state
            if base_map is None:
                base = read_base()
                base_map = {}
                if base is not None and base.num_rows:
                    bdoc = base["doc_id"].to_pylist()
                    bcols = {n: base[n].to_pylist() for n in payload_names if n != "doc_id"}
                    for j, bd in enumerate(bdoc):
                        base_map[bd] = {"doc_id": bd, **{n: v[j] for n, v in bcols.items()}}
            if d not in base_map:
                continue  # UPDATE matched 0 rows — no-op, no resurrection
            out_rows.append(
                {**meta, "is_del": False, **apply_chain_to_row(base_map[d], chain)}
            )
    if not out_rows:
        return passthrough
    # synthesized winners in the group's column layout
    synth = {name: [] for name in g2.column_names}
    for r in out_rows:
        for name in g2.column_names:
            if name in ("pid", "doc_id", "pos", "is_del", "n_events"):
                synth[name].append(r[name])
            else:
                synth[name].append(r[name[2:]])  # p_<payload col>
    synth_t = pa.Table.from_arrays(
        [pa.array(synth[n], g2.schema.field(n).type) for n in g2.column_names],
        schema=g2.schema,
    )
    return pa.concat_tables([passthrough, synth_t])


def make_desalt_fn(salt_factor: int):
    """Stage between the salted shuffle and the final merge: collapse
    salted sub-partitions back to the true pid with a partial LWW
    (skew path, SURVEY.md §4)."""

    def desalt(group: pa.Table) -> pa.Table:
        win, counts, _ = lww_reduce(group, [])
        pid = pc.cast(pc.divide(win["pid"], salt_factor), pa.int32())
        win = win.set_column(win.schema.get_field_index("pid"), "pid", pid)
        return win.set_column(
            win.schema.get_field_index("n_events"), "n_events", pa.array(counts, pa.int64())
        )

    return desalt


def _write_file(lake_dir: str, table: pa.Table, pid: int, batch_id: int) -> str:
    """Phase-1 write: unique name — task retries leave only orphans.

    Dictionary encoding is disabled: the token lists are
    high-cardinality random ints, and dict-encoding them costs ~2-5×
    the write CPU for no size win (measured: 160 vs 70 CPU-s across a
    2M-event batch)."""
    d = os.path.join(lake_dir, f"part={pid:05d}")
    os.makedirs(d, exist_ok=True)
    rel = f"part={pid:05d}/b{batch_id:08d}-{uuid.uuid4().hex}.parquet"
    pq.write_table(table, os.path.join(lake_dir, rel), use_dictionary=False)
    # key bloom sidecar for Lake.lookup file skipping (state/filestats):
    # one SipHash pass over the keys, ~10 bits/key — noise next to the
    # parquet encode above
    from clever_canal_ray.state import filestats

    filestats.write_sidecar(
        os.path.join(lake_dir, rel), table["doc_id"].to_numpy(zero_copy_only=False)
    )
    return rel


def make_partition_upsert_fn(
    lake_dir: str,
    part_files: dict[int, list[str]],
    target_payload: pa.Schema,
    batch_id: int,
    sink_mode: str = "compact",
    compact_threshold: int = 8,
    pid_schemas: dict[int, pa.Schema] | None = None,
    compact_mode: str = "major",
):
    """Build the map_groups body. ``part_files`` maps pid -> relative
    Parquet paths of the partition's current files (from the base
    manifest snapshot); small (P entries), shipped in the closure.

    sink_mode="delta": write ONLY the change file (winner images +
    tombstone rows, ``__deleted`` flag) — no read of the old partition
    at all; read-side merge-on-read resolves (see
    state/manifest.merge_partition_files). The partition auto-compacts
    (full merge+rewrite) once its file count reaches
    ``compact_threshold``, bounding read amplification.
    """
    from clever_canal_ray.state.manifest import ensure_helper_columns, merge_partition_files

    def upsert(group: pa.Table) -> pa.Table:
        pid = int(group["pid"][0].as_py())
        # multi-table lakes: the partition's table owns its own schema
        # (cast down from the union the combine stage shipped)
        tp = pid_schemas.get(pid, target_payload) if pid_schemas else target_payload
        # tp may carry the journal's rename map as metadata (merge-time
        # concern); data FILES are written with clean schemas — schema
        # metadata would make Ray block schemas unhashable on read
        tp_clean = pa.schema(list(tp))
        payload_names = [f.name for f in tp]
        # events_in BEFORE any patch fold: a patch matching 0 rows is an
        # applied (no-op) event, not a lost one
        events_in = int(np.asarray(group["n_events"]).sum())
        if "__patch" in group.column_names:
            existing_now = part_files.get(pid, [])

            def read_base():
                if not existing_now:
                    return None
                return merge_partition_files(
                    [pq.read_table(os.path.join(lake_dir, rel)) for rel in existing_now], tp
                )

            group = fold_patch_rows(group, payload_names, read_base)
            if group.num_rows == 0:  # every row was a 0-row-match patch
                return pa.Table.from_pydict(
                    {
                        "pid": pa.array([pid], pa.int32()),
                        "file": pa.array([None], pa.string()),
                        "rows": pa.array([0], pa.int64()),
                        "rows_upserted": pa.array([0], pa.int64()),
                        "rows_deleted": pa.array([0], pa.int64()),
                        "events_in": pa.array([events_in], pa.int64()),
                        "mode": pa.array(["noop"], pa.string()),
                    },
                    schema=METRICS_SCHEMA,
                )
        win, counts, _ = lww_reduce(group, payload_names)

        is_del = win["is_del"].to_numpy(zero_copy_only=False).astype(bool)

        def col(name: str):
            c = win["doc_id"] if name == "doc_id" else win[f"p_{name}"]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        payload_cols = [col(n) for n in payload_names]
        existing = part_files.get(pid, [])

        if sink_mode == "delta" and len(existing) + 1 < compact_threshold:
            # write-optimal path: winners + tombstones, old files untouched
            delta = pa.Table.from_arrays(payload_cols, schema=tp_clean)
            delta = ensure_helper_columns(delta, seq=batch_id, deleted=pa.array(is_del))
            rel = _write_file(lake_dir, delta, pid, batch_id)
            return pa.Table.from_pydict(
                {
                    "pid": pa.array([pid], pa.int32()),
                    "file": pa.array([rel], pa.string()),
                    "rows": pa.array([delta.num_rows], pa.int64()),
                    "rows_upserted": pa.array([int((~is_del).sum())], pa.int64()),
                    "rows_deleted": pa.array([int(is_del.sum())], pa.int64()),
                    "events_in": pa.array([events_in], pa.int64()),
                    "mode": pa.array(["append"], pa.string()),
                },
                schema=METRICS_SCHEMA,
            )

        if sink_mode == "delta" and compact_mode == "minor" and existing:
            # minor auto-compact: the threshold crossed, but instead of
            # rewriting the whole partition, fold the accumulated DELTA
            # files plus this batch's winners into one delta. The base
            # (files[0]) is never read — hot-path maintenance cost stays
            # O(delta bytes) regardless of partition size.
            from clever_canal_ray.state.manifest import merge_delta_files

            delta = pa.Table.from_arrays(payload_cols, schema=tp_clean)
            delta = ensure_helper_columns(delta, seq=batch_id, deleted=pa.array(is_del))
            olds = [pq.read_table(os.path.join(lake_dir, rel)) for rel in existing[1:]]
            merged = merge_delta_files(olds + [delta], tp)
            rel = _write_file(lake_dir, merged, pid, batch_id)
            base_rows = pq.read_metadata(os.path.join(lake_dir, existing[0])).num_rows
            return pa.Table.from_pydict(
                {
                    "pid": pa.array([pid], pa.int32()),
                    "file": pa.array([rel], pa.string()),
                    "rows": pa.array([base_rows + merged.num_rows], pa.int64()),
                    "rows_upserted": pa.array([int((~is_del).sum())], pa.int64()),
                    "rows_deleted": pa.array([int(is_del.sum())], pa.int64()),
                    "events_in": pa.array([events_in], pa.int64()),
                    "mode": pa.array(["replace_deltas"], pa.string()),
                },
                schema=METRICS_SCHEMA,
            )

        # compact path: merge-on-read the current partition state, drop
        # changed keys, append final images, rewrite one file
        images = pa.Table.from_arrays(payload_cols, schema=tp_clean).filter(pa.array(~is_del))
        changed_keys = win["doc_id"].combine_chunks() if isinstance(win["doc_id"], pa.ChunkedArray) else win["doc_id"]
        if existing:
            old = merge_partition_files(
                [pq.read_table(os.path.join(lake_dir, rel)) for rel in existing], tp
            )
            keep = pc.invert(pc.is_in(old["doc_id"], value_set=changed_keys))
            old_kept = old.filter(keep)
            del_keys = win.filter(pa.array(is_del))["doc_id"]
            del_keys = del_keys.combine_chunks() if isinstance(del_keys, pa.ChunkedArray) else del_keys
            n_deleted_existing = int(pc.sum(pc.is_in(old["doc_id"], value_set=del_keys)).as_py() or 0)
            new_part = pa.concat_tables([old_kept, images]).combine_chunks()
        else:
            n_deleted_existing = 0
            new_part = images
        new_part = ensure_helper_columns(new_part, seq=batch_id)
        rel = _write_file(lake_dir, new_part, pid, batch_id)

        return pa.Table.from_pydict(
            {
                "pid": pa.array([pid], pa.int32()),
                "file": pa.array([rel], pa.string()),
                "rows": pa.array([new_part.num_rows], pa.int64()),
                "rows_upserted": pa.array([images.num_rows], pa.int64()),
                "rows_deleted": pa.array([n_deleted_existing], pa.int64()),
                "events_in": pa.array([events_in], pa.int64()),
                "mode": pa.array(["replace"], pa.string()),
            },
            schema=METRICS_SCHEMA,
        )

    return upsert
