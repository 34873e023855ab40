"""Deterministic synthetic binlog-segment + lake generator (FIXTURES.md).

Generation is a pure function of the spec (seed + knobs) — no external
data. The shapes mirror the reference's data model flattened to one row
per changed row-image (Entry/Header/RowChange/RowData,
EntryProtocol.proto:80-183) with transaction framing *columns* instead
of framing rows, and offsets strictly monotone per segment
(EntryPosition total order, EntryPosition.java:107-115).

Apply semantics (documented deviation): Canal only *delivers* events —
clients apply them. We fix the idempotent-upsert apply convention:
INSERT and UPDATE both set the row image, DELETE tombstones, UPDATE on
a missing/deleted key upserts, DELETE on a missing key is a no-op.
This makes replay idempotent (the exactly-once foundation) and lets the
generator draw event targets without liveness constraints.

Event mix defaults (FIXTURES.md §2): 60% INSERT (new doc_ids),
30% UPDATE, 10% DELETE; hot-key skew: ``hot_mass`` of U/D events
target the ``hot_frac`` hottest doc_ids.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from clever_canal_ray.schema import (
    LAKE_SCHEMA_V0,
    event_schema,
    lake_schema,
    pack_position,
)

OPS = np.array(["I", "U", "D", "DDL"])


@dataclass(frozen=True)
class EventLogSpec:
    seed: int = 42
    n_initial_docs: int = 1_000
    n_events: int = 5_000
    n_segments: int = 4
    p_insert: float = 0.6
    p_update: float = 0.3
    p_delete: float = 0.1
    hot_frac: float = 0.001  # top fraction of initial keys is "hot"
    hot_mass: float = 0.30  # fraction of U/D aimed at the hot set
    mean_txn_size: int = 5
    vocab: int = 50257
    mean_tokens: int = 120  # lognormal-ish mean token-sequence length
    max_tokens: int = 2048
    include_before: bool = True  # before-images double payload; bench may disable
    # DDL scenario: [(position_fraction, ddl_record_dict), ...] in order
    ddls: tuple = ()
    # TRUNCATE events (EventType.TRUNCATE=8 analog): position fractions
    # (whole-table wipe at that position, its own txn, F9-style
    # isolation) — each entry is a fraction OR (fraction, table_name)
    # for multi-table streams (truncates only that table). Encoded as
    # op="T" rows. With include_before, a whole-stream truncate vacates
    # every key in the before-image chain (a U/D above it sees no
    # image); per-table truncate chains are exact only for the
    # untruncated tables (routing is applied downstream).
    truncates: tuple = ()
    # first segment_id of this journal (chained journals / soak runs use
    # disjoint ascending ranges so positions keep increasing)
    segment_base: int = 0
    # fraction of U events that are PRIMARY-KEY-CHANGE updates (the row
    # moves from doc_id to a fresh new_doc_id; apply = delete+insert —
    # LogEventConvert.parseOneRow key-diff analog). New keys come from a
    # disjoint id range and are never re-targeted, so before-image
    # chains stay exact for all other keys; the rekey event's own
    # before-image is the old key's image (correct).
    rekey_frac: float = 0.0

    def doc_id(self, i: int) -> str:
        return f"doc{i:012d}"


SOURCES = np.array(["web", "books", "code", "wiki"])
LANGS = np.array(["en", "de", "fr", "es", "zh"])


def _token_lengths(rng: np.random.Generator, n: int, spec: EventLogSpec) -> np.ndarray:
    # zipf-ish long-tailed lengths in [1, max_tokens]
    raw = rng.lognormal(mean=np.log(spec.mean_tokens), sigma=0.8, size=n)
    return np.clip(raw.astype(np.int64), 1, spec.max_tokens)


def _ragged_tokens(rng: np.random.Generator, lengths: np.ndarray, vocab: int):
    """Flat int32 token array + int64 offsets for a ListArray."""
    total = int(lengths.sum())
    flat = rng.integers(0, vocab, size=total, dtype=np.int32)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return flat, offsets


def generate_lake(spec: EventLogSpec) -> pa.Table:
    """Initial lake table (schema v0), first ``n_initial_docs`` doc_ids."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_initial_docs
    ids = np.array([spec.doc_id(i) for i in range(n)])
    lengths = _token_lengths(rng, n, spec)
    flat, offsets = _ragged_tokens(rng, lengths, spec.vocab)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(flat, pa.int32()))
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.string()),
            tokens,
            pa.array(lengths.astype(np.int32), pa.int32()),
            pa.array(SOURCES[rng.integers(0, len(SOURCES), n)], pa.string()),
        ],
        schema=LAKE_SCHEMA_V0,
    )


def _payload_struct(schema_payload: pa.Schema, arrays: dict[str, pa.Array], valid: np.ndarray):
    children = [arrays[f.name] for f in schema_payload]
    return pa.StructArray.from_arrays(
        children, fields=list(schema_payload), mask=pa.array(~valid)
    )


def _object_tokens_to_list_array(obj: np.ndarray, valid: np.ndarray, dtype: pa.DataType):
    """Object array of np int arrays (or None) -> Arrow ListArray."""
    lengths = np.array([len(a) if v else 0 for a, v in zip(obj, valid)], dtype=np.int64)
    offsets = np.zeros(len(obj) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    if offsets[-1] > 0:
        flat = np.concatenate([a for a, v in zip(obj, valid) if v and len(a)])
    else:
        flat = np.array([], dtype=np.int64)
    assert offsets[-1] <= 2**31 - 1, "segment token payload exceeds int32 list offsets"
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(flat, dtype.value_type)
    )


def _doc_id_strings(ids: np.ndarray) -> np.ndarray:
    """Vectorized doc-id formatting (pandas string kernels beat a
    16M-iteration Python f-string loop ~5x)."""
    return ("doc" + pd.Series(ids).astype(str).str.zfill(12)).to_numpy(dtype=object)


def _txn_framing_segment(rng, op_seg: np.ndarray, mean_txn: int):
    """Vectorized transaction framing for one segment: geometric txn
    sizes cut to the segment, DDL rows isolated as their own txns
    (MemoryEventStoreWithBuffer.java:389-417)."""
    n = len(op_seg)
    sizes = rng.geometric(1.0 / mean_txn, size=n).astype(np.int64)
    sizes = np.minimum(sizes, mean_txn * 8)
    cum = np.cumsum(sizes)
    k = int(np.searchsorted(cum, n)) + 1
    sizes = sizes[:k]
    sizes[-1] = n - (cum[k - 2] if k > 1 else 0)
    # split runs at DDL rows: a DDL becomes its own txn
    starts = np.zeros(k, dtype=np.int64)
    starts[1:] = np.cumsum(sizes)[:-1]
    is_ddl = op_seg == "DDL"
    if is_ddl.any():
        # fall back to cutting every DDL into its own boundary set
        bounds = set(starts.tolist())
        for i in np.where(is_ddl)[0]:
            bounds.add(int(i))
            bounds.add(int(i) + 1)
        starts = np.array(sorted(b for b in bounds if b < n), dtype=np.int64)
        sizes = np.diff(np.append(starts, n))
        k = len(starts)
    txn_local = np.repeat(np.arange(k, dtype=np.int64), sizes)
    seq = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
    commit = np.zeros(n, dtype=bool)
    commit[np.append(starts[1:] - 1, n - 1)] = True
    return txn_local, seq.astype(np.int32), commit, k


def _generate_events_fast(spec: EventLogSpec):
    """Fully-vectorized generator fast path (no before-images, no DDLs):
    no Python loop over events, per-segment tables built from flat
    token buffers — needed for bench-scale logs (16M+ events)."""
    rng = np.random.default_rng(spec.seed + 1)
    n = spec.n_events
    r0 = spec.n_initial_docs

    ops = rng.choice(np.array(["I", "U", "D"]), size=n, p=[spec.p_insert, spec.p_update, spec.p_delete])
    key_idx = np.zeros(n, dtype=np.int64)
    is_ins = ops == "I"
    key_idx[is_ins] = r0 + np.arange(int(is_ins.sum()))
    n_ud = int((~is_ins).sum())
    hot_n = max(1, int(r0 * spec.hot_frac))
    is_hot = rng.random(n_ud) < spec.hot_mass
    key_idx[~is_ins] = np.where(
        is_hot, rng.integers(0, hot_n, size=n_ud), rng.integers(0, r0, size=n_ud)
    )

    seg_bounds = np.linspace(0, n, spec.n_segments + 1).astype(np.int64)
    steps = rng.integers(1, 64, size=n)
    has_after = ops != "D"
    lengths = np.zeros(n, dtype=np.int64)
    lengths[has_after] = _token_lengths(rng, int(has_after.sum()), spec)
    offsets_all = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets_all[1:])
    base_ts = np.int64(1_700_000_000_000)
    ts_all = base_ts + np.cumsum(rng.integers(0, 20, size=n)) + rng.integers(-40, 40, size=n)
    doc_ids = _doc_id_strings(key_idx)

    payload_struct_fields = list(LAKE_SCHEMA_V0)
    ev_schema = event_schema(LAKE_SCHEMA_V0)
    segments = []
    next_txn = 0
    for s in range(spec.n_segments):
        lo, hi = int(seg_bounds[s]), int(seg_bounds[s + 1])
        m = hi - lo
        txn_local, seq, commit, k = _txn_framing_segment(rng, ops[lo:hi], spec.mean_txn_size)
        flat = rng.integers(0, spec.vocab, size=int(offsets_all[hi] - offsets_all[lo]), dtype=np.int32)
        offs = (offsets_all[lo : hi + 1] - offsets_all[lo]).astype(np.int32)
        ha = has_after[lo:hi]
        after = pa.StructArray.from_arrays(
            [
                pa.array(np.where(ha, doc_ids[lo:hi], None), pa.string()),
                pa.ListArray.from_arrays(pa.array(offs, pa.int32()), pa.array(flat, pa.int32())),
                pa.array(np.where(ha, lengths[lo:hi], 0), pa.int32()),
                pa.array(np.where(ha, SOURCES[rng.integers(0, len(SOURCES), m)], None), pa.string()),
            ],
            fields=payload_struct_fields,
            mask=pa.array(~ha),
        )
        t = pa.Table.from_arrays(
            [
                pa.array(np.full(m, s + spec.segment_base, np.int32), pa.int32()),
                pa.array(4 + np.cumsum(steps[lo:hi]), pa.int64()),
                pa.array(txn_local + next_txn, pa.int64()),
                pa.array(seq, pa.int32()),
                pa.array(commit, pa.bool_()),
                pa.array(ts_all[lo:hi], pa.timestamp("ms")),
                pa.array(ops[lo:hi], pa.string()),
                pa.array(np.full(m, "lake.sequences", dtype=object), pa.string()),
                pa.array(doc_ids[lo:hi], pa.string()),
                pa.array(np.zeros(m, np.int32), pa.int32()),
                pa.array(np.full(m, None, dtype=object), pa.string()),
                pa.nulls(m, pa.struct(payload_struct_fields)),
                after,
            ],
            schema=ev_schema,
        )
        next_txn += k
        segments.append(t)
    return segments, LAKE_SCHEMA_V0


def generate_events(spec: EventLogSpec):
    """Generate the change-event log.

    Returns ``(segments, final_payload_schema)`` where ``segments`` is a
    list of ``pa.Table`` (one per segment file, ordered by segment_id)
    encoded in the *final* schema version's physical layout (widenings
    are lossless, so encoding every segment at the widest version is
    semantically identical to per-epoch encoding; the logical epoch is
    the ``schema_version`` column — merge-on-read up-cast rule,
    FIXTURES.md §3).

    Without before-images or DDLs the fully-vectorized fast path runs
    (bench-scale logs; different rng stream than the general path —
    each spec is self-consistent with its oracle either way).
    """
    if not spec.include_before and not spec.ddls and not spec.truncates and spec.rekey_frac == 0:
        return _generate_events_fast(spec)
    rng = np.random.default_rng(spec.seed + 1)
    n = spec.n_events
    r0 = spec.n_initial_docs

    # ---- skeleton: ops + keys -------------------------------------------
    ops = rng.choice(
        np.array(["I", "U", "D"]), size=n, p=[spec.p_insert, spec.p_update, spec.p_delete]
    )
    key_idx = np.zeros(n, dtype=np.int64)
    is_ins = ops == "I"
    key_idx[is_ins] = r0 + np.arange(int(is_ins.sum()))
    n_ud = int((~is_ins).sum())
    hot_n = max(1, int(r0 * spec.hot_frac))
    is_hot = rng.random(n_ud) < spec.hot_mass
    ud_targets = np.where(
        is_hot,
        rng.integers(0, hot_n, size=n_ud),
        rng.integers(0, r0, size=n_ud),
    )
    key_idx[~is_ins] = ud_targets

    # PK-change updates: a rekey_frac slice of U events moves its row to
    # a fresh key from a disjoint range (never re-targeted by U/D)
    newkey_idx = np.full(n, -1, dtype=np.int64)
    if spec.rekey_frac > 0:
        upd = np.where(ops == "U")[0]
        n_rk = int(round(len(upd) * spec.rekey_frac))
        if n_rk:
            rk = rng.choice(upd, size=n_rk, replace=False)
            # rekey target base must be disjoint from the insert key
            # range [r0, r0 + n_inserts) and from the initial ids [0, r0)
            # — derived, so bench-scale specs (millions of inserts)
            # cannot silently collide with the 'fresh, never
            # re-targeted' invariant
            rk_base = max(2_000_000, r0 + int(is_ins.sum()))
            newkey_idx[rk] = rk_base + np.arange(n_rk)

    # ---- inject DDL / TRUNCATE rows at fixed fractional positions -------
    trunc_entries = [
        (tuple(t) + (None,))[:2] if isinstance(t, (tuple, list)) else (t, None)
        for t in spec.truncates
    ]
    injections = sorted(
        [(min(n - 1, int(frac * n)), "DDL", json.dumps(d)) for frac, d in spec.ddls]
        + [(min(n - 1, int(frac * n)), "T", tbl) for frac, tbl in trunc_entries],
        key=lambda x: x[0],
    )
    total = n + len(injections)
    op_all = np.empty(total, dtype=object)
    key_all = np.full(total, -1, dtype=np.int64)
    newkey_all = np.full(total, -1, dtype=np.int64)
    ddl_all = np.full(total, None, dtype=object)
    tbl_override = np.full(total, None, dtype=object)  # per-table TRUNCATE targets
    sv_all = np.zeros(total, dtype=np.int32)  # schema_version per event
    src_pos = 0
    version = 0
    inj_i = 0
    # merge skeleton with injection points (control row emitted just
    # before the skeleton event at its fractional position)
    for out_pos in range(total):
        emit = inj_i < len(injections) and (src_pos >= n or src_pos == injections[inj_i][0])
        if emit:
            _, kind, payload = injections[inj_i]
            op_all[out_pos] = kind
            if kind == "DDL":
                ddl_all[out_pos] = payload
                version += 1
            elif kind == "T" and payload is not None:
                tbl_override[out_pos] = payload
            sv_all[out_pos] = version
            inj_i += 1
        else:
            op_all[out_pos] = ops[src_pos]
            key_all[out_pos] = key_idx[src_pos]
            newkey_all[out_pos] = newkey_idx[src_pos]
            sv_all[out_pos] = version
            src_pos += 1
    # logical final schema (all DDLs; registry verbs live at the
    # manifest layer) vs PHYSICAL event layout: events encode under the
    # original column names with dropped columns retained (adds+widens
    # only) — a renamed/dropped column's pre-DDL events still carry its
    # values; the engine resolves names through the journal's rename
    # map at merge-on-read (schema.attach_renames)
    column_ddls = [
        d
        for _, d in spec.ddls
        if d["op"] not in ("create_table", "drop_table", "rename_table")
    ]
    final_payload = lake_schema(column_ddls)
    physical_payload = lake_schema(
        [d for d in column_ddls if d["op"] in ("add_column", "widen_type")]
    )

    # ---- positions: segments / offsets / txns ---------------------------
    seg_bounds = np.linspace(0, total, spec.n_segments + 1).astype(np.int64)
    segment_id = np.zeros(total, dtype=np.int32)
    offset = np.zeros(total, dtype=np.int64)
    txn_id = np.zeros(total, dtype=np.int64)
    seq_in_txn = np.zeros(total, dtype=np.int32)
    txn_commit = np.zeros(total, dtype=bool)
    steps = rng.integers(1, 64, size=total)
    next_txn = 0
    for s in range(spec.n_segments):
        lo, hi = int(seg_bounds[s]), int(seg_bounds[s + 1])
        segment_id[lo:hi] = s + spec.segment_base
        offset[lo:hi] = 4 + np.cumsum(steps[lo:hi])
        # transaction framing: consecutive runs; DDL rows are isolated
        # transactions of their own (DDL-isolation analog,
        # MemoryEventStoreWithBuffer.java:389-417).
        i = lo
        while i < hi:
            if op_all[i] in ("DDL", "T"):
                size = 1
            else:
                size = int(rng.geometric(1.0 / spec.mean_txn_size))
                size = max(1, min(size, hi - i))
                # cut at the next DDL if one falls inside the run
                for j in range(i, i + size):
                    if op_all[j] in ("DDL", "T"):
                        size = max(1, j - i)
                        break
            txn_id[i : i + size] = next_txn
            seq_in_txn[i : i + size] = np.arange(size, dtype=np.int32)
            txn_commit[i + size - 1] = True
            next_txn += 1
            i += size

    # execute_ts: increasing with jitter; may regress inside a txn
    # (TimelineBarrier.java:114-125 tolerance — (segment,offset) wins).
    base = np.int64(1_700_000_000_000)
    ts = base + np.cumsum(rng.integers(0, 20, size=total)) + rng.integers(-40, 40, size=total)

    # ---- after images ----------------------------------------------------
    has_after = (op_all == "I") | (op_all == "U")
    n_img = int(has_after.sum())
    lengths = np.zeros(total, dtype=np.int64)
    lengths[has_after] = _token_lengths(rng, n_img, spec)
    flat, offsets_arr = _ragged_tokens(rng, lengths, spec.vocab)
    after_tokens_obj = np.empty(total, dtype=object)
    img_idx = np.where(has_after)[0]
    for k, i in enumerate(img_idx):
        after_tokens_obj[i] = flat[offsets_arr[i] : offsets_arr[i + 1]]
    after_source = np.empty(total, dtype=object)
    after_source[has_after] = SOURCES[rng.integers(0, len(SOURCES), n_img)]
    # extra (DDL-added) string columns get values only for events at or
    # after the version that introduced them
    extra_vals: dict[str, np.ndarray] = {}
    extra_since: dict[str, int] = {}
    v = 0
    for _, d in spec.ddls:
        v += 1
        if d["op"] == "add_column":
            name = d["name"]
            extra_since[name] = v
            vals = np.empty(total, dtype=object)
            m = has_after & (sv_all >= v)
            vals[m] = LANGS[rng.integers(0, len(LANGS), int(m.sum()))]
            extra_vals[name] = vals

    # ---- before images (per-key lag of after image / lake image) --------
    before_tokens_obj = np.full(total, None, dtype=object)
    before_source = np.full(total, None, dtype=object)
    before_ntok = np.full(total, -1, dtype=np.int64)
    before_extra = {name: np.full(total, None, dtype=object) for name in extra_vals}
    has_before = np.zeros(total, dtype=bool)
    if spec.include_before:
        pos64 = pack_position(segment_id, offset)
        row_ev = (op_all == "U") | (op_all == "D") | (op_all == "I")
        df = pd.DataFrame(
            {
                "i": np.arange(total)[row_ev],
                "key": key_all[row_ev],
                "op": op_all[row_ev],
                "pos": pos64[row_ev],
                # a rekey U VACATES its old key (delete+insert): the next
                # event at the old key must see NO image there
                "rk": newkey_all[row_ev] >= 0,
            }
        ).sort_values(["key", "pos"], kind="stable")
        g = df.groupby("key", sort=False)
        prev_i = g["i"].shift(1)
        prev_op = g["op"].shift(1)
        prev_rk = g["rk"].shift(1)
        prev_pos = g["pos"].shift(1)
        cur_i = df["i"].to_numpy()
        cur_op = df["op"].to_numpy()
        cur_key = df["key"].to_numpy()
        cur_pos = df["pos"].to_numpy()
        pi = prev_i.to_numpy()
        po = prev_op.to_numpy()
        prk = prev_rk.to_numpy()
        pp = prev_pos.to_numpy()
        # a whole-stream TRUNCATE vacates EVERY key at its position: an
        # image set below it is gone for events above it. (Per-table
        # truncates are resolved downstream by retable_by_key's key-mod
        # routing, unknowable here — include_before + per-table
        # truncates keeps the pre-truncate image for the OTHER tables'
        # rows correct and is inexact only for the truncated table.)
        tr_pos = np.sort(
            pos64[(op_all == "T") & (tbl_override == None)]  # noqa: E711 — elementwise
        )
        no_trunc_between = np.searchsorted(tr_pos, np.where(pd.isna(pp), 0, pp)) == (
            np.searchsorted(tr_pos, cur_pos)
        )
        # case 1: previous event set an image at THIS key (a rekey U
        # behaves like a 'D' for the old key — it removed the row)
        m1 = (
            pd.notna(pi)
            & ((po == "I") | (po == "U"))
            & (prk != True)  # noqa: E712
            & (cur_op != "I")
            & no_trunc_between
        )
        src = pi[m1].astype(np.int64)
        dst = cur_i[m1]
        before_tokens_obj[dst] = after_tokens_obj[src]
        before_source[dst] = after_source[src]
        before_ntok[dst] = lengths[src]
        for name, vals in extra_vals.items():
            before_extra[name][dst] = vals[src]
        has_before[dst] = True
        # case 2: no previous event, key in the initial lake — and no
        # whole-stream truncate below this event (it wiped the lake row)
        m2 = (
            pd.isna(pi)
            & (cur_key < r0)
            & (cur_op != "I")
            & (np.searchsorted(tr_pos, cur_pos) == 0)
        )
        dst2 = cur_i[m2]
        if len(dst2):
            lake_rng = np.random.default_rng(spec.seed)
            lake_lengths = _token_lengths(lake_rng, r0, spec)
            lake_flat, lake_off = _ragged_tokens(lake_rng, lake_lengths, spec.vocab)
            lake_sources = SOURCES[lake_rng.integers(0, len(SOURCES), r0)]
            for i in dst2:
                k = key_all[i]
                before_tokens_obj[i] = lake_flat[lake_off[k] : lake_off[k + 1]]
                before_source[i] = lake_sources[k]
                before_ntok[i] = lake_lengths[k]
            has_before[dst2] = True

    # ---- assemble arrow tables per segment ------------------------------
    doc_ids = np.full(total, None, dtype=object)
    m = key_all >= 0
    doc_ids[m] = np.array([spec.doc_id(int(k)) for k in key_all[m]], dtype=object)
    new_doc_ids = np.full(total, None, dtype=object)
    m_rk = newkey_all >= 0
    if m_rk.any():
        new_doc_ids[m_rk] = np.array(
            [spec.doc_id(int(k)) for k in newkey_all[m_rk]], dtype=object
        )

    tok_type = physical_payload.field("tokens").type
    ntok_type = physical_payload.field("n_tok").type

    # the AFTER image's key is the post-image pk: the NEW key on a
    # rekey row (RowData.afterColumns semantics); before keeps the old
    after_ids = np.where(m_rk, new_doc_ids, doc_ids)

    def payload_arrays(tokens_obj, source_obj, ntok_np, valid, extra, ids=doc_ids):
        arrays = {
            "doc_id": pa.array(np.where(valid, ids, None), pa.string()),
            "tokens": _object_tokens_to_list_array(tokens_obj, valid, tok_type),
            "n_tok": pa.array(
                np.where(valid, ntok_np, 0), ntok_type
            ),
            "source": pa.array(np.where(valid, source_obj, None), pa.string()),
        }
        for f in physical_payload:
            if f.name in arrays:
                continue
            arrays[f.name] = pa.array(extra.get(f.name, np.full(total, None, dtype=object)), f.type)
        return arrays

    after_struct = _payload_struct(
        physical_payload,
        payload_arrays(after_tokens_obj, after_source, lengths, has_after, extra_vals, ids=after_ids),
        has_after,
    )
    before_struct = _payload_struct(
        physical_payload,
        payload_arrays(before_tokens_obj, before_source, before_ntok, has_before, before_extra),
        has_before,
    )

    include_rekey = bool(m_rk.any())
    ev_schema = event_schema(physical_payload, include_rekey=include_rekey)
    arrays = [
        pa.array(segment_id, pa.int32()),
        pa.array(offset, pa.int64()),
        pa.array(txn_id, pa.int64()),
        pa.array(seq_in_txn, pa.int32()),
        pa.array(txn_commit, pa.bool_()),
        pa.array(ts, pa.timestamp("ms")),
        pa.array(op_all, pa.string()),
        pa.array(
            np.where(
                tbl_override != None,  # noqa: E711 — elementwise
                tbl_override,
                np.full(total, "lake.sequences", dtype=object),
            ),
            pa.string(),
        ),
        pa.array(doc_ids, pa.string()),
        pa.array(sv_all, pa.int32()),
        pa.array(ddl_all, pa.string()),
    ]
    if include_rekey:
        arrays.append(pa.array(new_doc_ids, pa.string()))
    arrays += [before_struct, after_struct]
    full = pa.Table.from_arrays(arrays, schema=ev_schema)
    segments = [
        full.filter(pa.compute.equal(full["segment_id"], s + spec.segment_base))
        for s in range(spec.n_segments)
    ]
    return segments, final_payload


def _ts_ms(v) -> int | None:
    """np.datetime64 → epoch ms, or None for NaT."""
    import numpy as np

    if np.isnat(np.datetime64(v)):
        return None
    return int(np.datetime64(v).astype("datetime64[ms]").astype("int64"))


def segment_plan_metadata(t: pa.Table) -> str:
    """Footer plan metadata — the binlog *index file* analog: lets the
    driver plan a micro-batch (ack position, DDL list, liveness ts)
    from parquet footers alone instead of scanning the position columns
    of every event (pipelines/replay.plan_batch fast path)."""
    import numpy as np

    seg = t["segment_id"].to_numpy(zero_copy_only=False)
    off = t["offset"].to_numpy(zero_copy_only=False)
    pos = pack_position(seg, off)
    commit = t["txn_commit"].to_numpy(zero_copy_only=False).astype(bool)
    op = np.asarray(t["op"].to_numpy(zero_copy_only=False), dtype=object)
    ddls = []
    for i in np.where(op == "DDL")[0]:
        ddls.append({"position": [int(seg[i]), int(off[i])], "ddl": json.loads(t["ddl"][int(i)].as_py())})
    # [seg, off, table, txn_id] — table routes per-table truncates in
    # multi-table lakes; txn_id lets truncate commits advance the GTID
    # watermark over the truncated window
    txn = t["txn_id"].to_numpy(zero_copy_only=False)
    truncates = [
        [int(seg[i]), int(off[i]), t["table"][int(i)].as_py(), int(txn[i])]
        for i in np.where(op == "T")[0]
    ]
    ack_i = int(np.argmax(np.where(commit, pos, -1))) if commit.any() else None
    ts = t["execute_ts"].to_numpy(zero_copy_only=False)
    has_xa = bool(
        ("xa_id" in t.column_names and t["xa_id"].null_count < len(t))
        or np.isin(op, ["XC", "XR"]).any()
    )
    # XA plan block (round-4): per-branch packed data-event positions,
    # the greatest commit position strictly below each (within THIS
    # file; cross-file candidates are the other files' acks), and the
    # first verdict — everything plan_batch's ack fixpoint needs, so
    # XA streams keep O(files) planning instead of a per-micro-batch
    # driver column scan. Legacy sidecars (has_xa without "xa") still
    # force the fallback scan.
    xa_block = None
    if has_xa and "xa_id" in t.column_names:
        xa_f = t["xa_id"].to_numpy(zero_copy_only=False).astype(np.float64)
        xa_valid = ~np.isnan(xa_f)
        is_verdict = (op == "XC") | (op == "XR")
        commit_pos = np.sort(pos[commit])
        xa_block = {}
        for i in np.where(xa_valid & ~is_verdict)[0]:
            e = xa_block.setdefault(str(int(xa_f[i])), {"data": [], "cb": [], "verdict": None})
            p_i = int(pos[i])
            e["data"].append(p_i)
            j = int(np.searchsorted(commit_pos, p_i)) - 1  # greatest commit < p_i
            e["cb"].append(int(commit_pos[j]) if j >= 0 else -1)
        for i in np.where(xa_valid & is_verdict)[0]:
            e = xa_block.setdefault(str(int(xa_f[i])), {"data": [], "cb": [], "verdict": None})
            p_i = int(pos[i])
            if e["verdict"] is None or p_i < e["verdict"][0]:
                e["verdict"] = [p_i, str(op[i])]
    return json.dumps(
        {
            "has_xa": has_xa,  # legacy readers: forces the plan fallback scan
            "xa": xa_block,  # new readers: sidecar XA fixpoint (O(files) planning)
            "n_events": len(t),
            "min_pos": [int(seg[0]), int(off[0])] if len(t) else None,
            "max_pos": [int(seg[-1]), int(off[-1])] if len(t) else None,
            "ack": [int(seg[ack_i]), int(off[ack_i])] if ack_i is not None else None,
            "ddls": ddls,
            "truncates": truncates,
            # NaT-guarded: an all-null execute_ts column (streams with
            # no timestamp source, e.g. FlatMessage files without `es`)
            # must record null, not INT64_MIN
            "max_ts": _ts_ms(ts.max()) if len(t) else None,
            "min_ts": _ts_ms(ts.min()) if len(t) else None,
            # logical txn-id bounds — the GTID-set building block: txn
            # ids survive re-segmentation (mirror/archive sources), file
            # positions don't
            "max_txn": int(txn.max()) if len(t) else None,
            "min_txn": int(txn.min()) if len(t) else None,
        }
    )


def retable_by_key(t: pa.Table, n_tables: int, prefix: str = "lake.t") -> pa.Table:
    """Reassign the ``table`` column of one segment so every doc routes
    deterministically to ``f"{prefix}{key % n_tables}"`` (key = the
    numeric part of doc_id) — a doc-functional multi-table stream whose
    per-table final state equals the single-table oracle partitioned by
    the same rule. DDL rows route to the table their ddl record names
    (``{"table": ...}`` required — Header.schemaName/tableName analog)."""
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    op = np.asarray(t["op"].to_numpy(zero_copy_only=False), dtype=object)
    tbl = np.asarray(t["table"].to_numpy(zero_copy_only=False), dtype=object).copy()
    row = (op == "I") | (op == "U") | (op == "D")
    if row.any():
        keys = pd.Series(doc[row]).str.slice(3).astype(np.int64) % n_tables
        tbl[row] = (prefix + keys.astype(str)).to_numpy(dtype=object)
    for i in np.where(op == "DDL")[0]:
        d = json.loads(t["ddl"][int(i)].as_py())
        if "table" not in d:
            raise ValueError("multi-table fixture: every DDL record needs a 'table' key")
        tbl[i] = d["table"]
    # TRUNCATE rows keep the table their spec entry targeted
    # ((fraction, table) form required for multi-table streams)
    for i in np.where(op == "T")[0]:
        if tbl[i] is None or not str(tbl[i]).startswith(prefix):
            raise ValueError(
                "multi-table fixture: TRUNCATE entries must name a table: "
                "spec.truncates=((fraction, 'lake.tN'), ...)"
            )
    idx = t.schema.get_field_index("table")
    return t.set_column(idx, "table", pa.array(tbl, pa.string()))


def split_lake_by_key(table: pa.Table, n_tables: int, prefix: str = "lake.t") -> dict[str, pa.Table]:
    """Split an initial lake table into per-table initials with the same
    key % n_tables routing rule as ``retable_by_key``."""
    keys = pd.Series(table["doc_id"].to_numpy(zero_copy_only=False)).str.slice(3).astype(np.int64)
    return {
        f"{prefix}{i}": table.filter(pa.array((keys % n_tables == i).to_numpy()))
        for i in range(n_tables)
    }


def write_multi_table_fixture(
    spec: EventLogSpec, root: str, n_tables: int = 2, prefix: str = "lake.t"
) -> dict:
    """Multi-table variant of ``write_fixture``: ONE mixed stream whose
    row events route across ``n_tables`` tables; returns per-table
    initial lakes for ``Lake.create_multi``."""
    seg_dir = os.path.join(root, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    segments, payload = generate_events(spec)
    segments = [retable_by_key(t, n_tables, prefix) for t in segments]
    paths = [
        _write_segment(t, seg_dir, s + spec.segment_base) for s, t in enumerate(segments)
    ]
    initials = split_lake_by_key(generate_lake(spec), n_tables, prefix)
    return {
        "segment_paths": paths,
        "payload_schema": payload,
        "n_events": sum(len(t) for t in segments),
        "initials": initials,
        "tables": sorted(initials),
    }


def write_fixture(spec: EventLogSpec, root: str) -> dict:
    """Write ``root/segments/segment-%05d.parquet`` + return metadata.

    One Parquet file = one binlog "journal" segment (S2 source analog,
    LocalBinLogConnection.java:75-120). The initial lake table is
    returned for the engine to load via ``Lake.create``.
    """
    seg_dir = os.path.join(root, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    segments, payload = generate_events(spec)
    paths = [
        _write_segment(t, seg_dir, s + spec.segment_base) for s, t in enumerate(segments)
    ]
    return {"segment_paths": paths, "payload_schema": payload, "n_events": sum(len(t) for t in segments)}


def _write_segment(t: pa.Table, seg_dir: str, segment_id: int) -> str:
    """Write one segment file + its ``.plan.json`` sidecar (the binlog
    index-file analog). The plan lives in a SIDECAR, not parquet schema
    metadata: a pa.Schema carrying metadata is unhashable, which
    disables Ray's block-schema deduplication and spams every worker
    with 'Failed to hash the schemas' warnings (transform_pyarrow
    unify_schemas) — clean schemas keep block bundling cheap."""
    p = os.path.join(seg_dir, f"segment-{segment_id:05d}.parquet")
    # dict-encode only the low-cardinality string columns; dict on
    # the random token lists costs 2-5x en/decode CPU for nothing.
    # Bounded row groups: Ray parallelizes parquet reads PER ROW GROUP,
    # and a 500k-row single-group file decodes on one core (~2.4 s) —
    # 64k-row groups took the 8-file batch read from 3.8 s to 1.5 s at
    # 32 cpus (measured).
    pq.write_table(
        t, p, use_dictionary=["op", "table", "segment_id"], row_group_size=65536
    )
    with open(p + ".plan.json", "w") as f:
        f.write(segment_plan_metadata(t))
    return p
