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
for add/widen (FIXTURES.md §3) and name-resolved through the journal's
rename map for rename/drop (schema.attach_renames).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.dataset as pds

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.schema import lake_schema, pack_position, widen_union
from clever_canal_ray.stages.combine import combine_read_columns, make_combine_fn
from clever_canal_ray.stages.reduce import make_desalt_fn, make_partition_upsert_fn
from clever_canal_ray.state.manifest import DuplicateCommitError, Lake, Manifest, route_ddls

import threading

_DATASET_BUILD_LOCK = threading.Lock()


@dataclass
class BatchPlan:
    ack: tuple[int, int] | None  # None = nothing committable in window
    new_ddls: list[dict]  # journal entries [{"position": [s,o], "ddl": {...}}]
    n_candidate_events: int
    max_execute_ts: int | None = None  # ms; source-side liveness (F8 analog)
    n_seen_events: int = 0  # all events above HWM in the window (incl. past ack)
    # highest logical txn id fully committed at the ack (GTID watermark
    # input; exact — ack is a txn boundary so every event of txns up to
    # it lies at or below the ack position)
    max_txn_at_ack: int | None = None
    # lowest txn id in the (hwm, ack] window — the gtid_executed
    # interval's lower bound for a lake whose txn_hwm is still unset
    # (mid-stream start must not claim earlier txns as executed). The
    # window min sits at the window START, so the same value is exact
    # for any prefix cut (truncate/DDL) of the window.
    min_txn_at_ack: int | None = None
    # TRUNCATE positions in (hwm, ack] (EventType.TRUNCATE=8 analog),
    # ascending; handled by replay_batch as whole-table resets
    truncates: list = field(default_factory=list)
    # XA branch ids whose XA_COMMIT (op="XC") lies at/below the ack —
    # their data events apply; rolled-back (op="XR") branch events are
    # dropped in combine; UNRESOLVED branches never exist at/below the
    # ack (plan_batch pulls the ack below the first unresolved XA event
    # — the distributed-txn analog of the ack-at-txn-boundary rule)
    xa_commits: tuple = ()


def plan_batch(
    segment_paths: list[str], hwm: tuple[int, int], want_min_txn: bool = False
) -> BatchPlan:
    """Driver-side planning: ack position + DDL extraction.

    Fast path: segment writers embed plan metadata (ack, DDLs, max
    position — the binlog index-file analog) in the parquet footer
    (fixtures/generator.segment_plan_metadata); planning then reads
    only footers — O(files), not O(events). Fallback: a light column
    scan of (segment_id, offset, txn_commit, op, ddl) with the position
    filter pushed into row-group pruning.
    """
    fast = _plan_from_footers(segment_paths, hwm, want_min_txn=want_min_txn)
    if fast is not None:
        return fast
    dset = pds.dataset(segment_paths)
    has_xa = "xa_id" in dset.schema.names
    flt = (pds.field("segment_id") > hwm[0]) | (
        (pds.field("segment_id") == hwm[0]) & (pds.field("offset") > hwm[1])
    )
    meta = dset.to_table(
        columns=[
            "segment_id", "offset", "txn_commit", "op", "ddl", "execute_ts", "txn_id", "table",
        ]
        + (["xa_id"] if has_xa else []),
        filter=flt,
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
    xa_commits: tuple = ()
    if has_xa:
        # XA framing (XA_COMMIT=13/XA_ROLLBACK=14 analog): the ack may
        # not pass a data event whose XA verdict lies ABOVE it — apply
        # is irreversible, so unresolved branches defer like incomplete
        # transactions. Fixpoint: lower the ack to the greatest txn
        # boundary below the first unresolved XA event until every XA
        # event at/below the ack is resolved at/below it.
        xa_f = meta["xa_id"].to_numpy(zero_copy_only=False).astype(np.float64)
        xa_valid = ~np.isnan(xa_f)
        is_verdict = (op == "XC") | (op == "XR")
        data_xa = xa_valid & ~is_verdict
        verdicts: dict[int, tuple[int, str]] = {}
        for i in np.where(is_verdict & xa_valid)[0]:
            b = int(xa_f[i])
            if b not in verdicts or pos[i] < verdicts[b][0]:
                verdicts[b] = (int(pos[i]), str(op[i]))
        commit_pos_sorted = np.sort(pos[commit])
        while True:
            m = data_xa & (pos <= ack_pos)
            unresolved = [
                int(p)
                for p, b in zip(pos[m], xa_f[m])
                if int(b) not in verdicts or verdicts[int(b)][0] > ack_pos
            ]
            if not unresolved:
                break
            i = int(np.searchsorted(commit_pos_sorted, min(unresolved))) - 1
            if i < 0:
                return BatchPlan(
                    ack=None, new_ddls=[], n_candidate_events=int(meta.num_rows),
                    n_seen_events=int(meta.num_rows),
                )
            ack_pos = int(commit_pos_sorted[i])
        ack = (int(ack_pos >> 40), int(ack_pos & ((1 << 40) - 1)))
        xa_commits = tuple(
            sorted(b for b, (p, k) in verdicts.items() if k == "XC" and p <= ack_pos)
        )

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
    txn = meta["txn_id"].to_numpy(zero_copy_only=False)
    max_txn = int(txn[pos <= ack_pos].max()) if n_cand else None
    min_txn = int(txn[pos <= ack_pos].min()) if n_cand else None
    t_idx = np.where((op == "T") & (pos <= ack_pos))[0]
    t_idx = t_idx[np.argsort(pos[t_idx])]
    tbl_np = np.asarray(meta["table"].to_numpy(zero_copy_only=False), dtype=object)
    truncates = [(int(seg[i]), int(off[i]), tbl_np[i], int(txn[i])) for i in t_idx]
    return BatchPlan(
        ack=ack,
        new_ddls=ddls,
        n_candidate_events=n_cand,
        max_execute_ts=max_ts,
        n_seen_events=int(meta.num_rows),
        truncates=truncates,
        max_txn_at_ack=max_txn,
        min_txn_at_ack=min_txn,
        xa_commits=xa_commits,
    )


def _plan_from_footers(
    segment_paths: list[str], hwm: tuple[int, int], want_min_txn: bool = False
) -> BatchPlan | None:
    """Plan from the ``.plan.json`` sidecar (binlog index-file analog;
    legacy fallback: parquet footer ``ccr_plan`` metadata). None if any
    file lacks both — caller falls back to the light column scan."""
    from clever_canal_ray.sources.segments import load_segment_plan

    hwm_pos = int(pack_position(hwm[0], hwm[1])) if hwm[0] >= 0 else -1
    acks, metas = [], []
    for p in segment_paths:
        m = load_segment_plan(p)
        if m is None:
            return None
        if m.get("has_xa") and not m.get("xa"):
            # legacy XA sidecar (presence flag only, no per-branch plan
            # block) — the verdict fixpoint needs raw positions; fall
            # back to the scan
            return None
        metas.append(m)
        if m["ack"] is not None:
            acks.append(tuple(m["ack"]))
    acks = [a for a in acks if int(pack_position(a[0], a[1])) > hwm_pos]
    n_seen = 0
    max_seen = -1
    for m in metas:
        if m["max_pos"] is not None:
            mp = int(pack_position(m["max_pos"][0], m["max_pos"][1]))
            max_seen = max(max_seen, mp)
            if mp > hwm_pos:
                # approximate: counts whole files (partial files only
                # affect metrics, never correctness)
                n_seen += m["n_events"]
    if not acks:
        return BatchPlan(ack=None, new_ddls=[], n_candidate_events=n_seen, n_seen_events=n_seen)
    ack = max(acks, key=lambda a: int(pack_position(a[0], a[1])))
    ack_pos = int(pack_position(ack[0], ack[1]))
    xa_commits: tuple = ()
    if any(m.get("has_xa") for m in metas):
        # XA ack fixpoint over sidecar data (mirrors plan_batch's scan
        # fixpoint exactly, restricted — like the scan's position
        # filter — to the (hwm, ·] window): the ack may not pass a data
        # event whose branch verdict lies above it; lower the ack to
        # the greatest commit below the first unresolved XA event until
        # every XA event at/below the ack is resolved at/below it.
        import bisect

        data: dict[int, list[int]] = {}
        verdicts: dict[int, tuple[int, str]] = {}
        cb: dict[int, int] = {}
        for m in metas:
            for b, e in (m.get("xa") or {}).items():
                bi = int(b)
                for p_, c_ in zip(e["data"], e["cb"]):
                    if p_ > hwm_pos:
                        data.setdefault(bi, []).append(int(p_))
                        cb[int(p_)] = int(c_)
                v = e.get("verdict")
                if v and int(v[0]) > hwm_pos:
                    if bi not in verdicts or int(v[0]) < verdicts[bi][0]:
                        verdicts[bi] = (int(v[0]), str(v[1]))
        for ps in data.values():
            ps.sort()
        # per-file max-commit positions in the window — the cross-file
        # ack-lowering candidates (a file wholly below the unresolved
        # event contributes its own ack; within-file candidates come
        # from the sidecar's per-event greatest-commit-below)
        ack_list = sorted(int(pack_position(a[0], a[1])) for a in acks)
        while True:
            unresolved = [
                ps[0]
                for bi, ps in data.items()
                if ps
                and ps[0] <= ack_pos
                and (bi not in verdicts or verdicts[bi][0] > ack_pos)
            ]
            if not unresolved:
                break
            q = min(unresolved)
            j = bisect.bisect_left(ack_list, q) - 1
            cands = [ack_list[j]] if j >= 0 else []
            c = cb.get(q, -1)
            if c > hwm_pos:
                cands.append(c)
            if not cands:
                return BatchPlan(
                    ack=None, new_ddls=[], n_candidate_events=n_seen, n_seen_events=n_seen
                )
            ack_pos = max(cands)
        ack = (int(ack_pos >> 40), int(ack_pos & ((1 << 40) - 1)))
        xa_commits = tuple(
            sorted(b for b, (p, k) in verdicts.items() if k == "XC" and p <= ack_pos)
        )
    ddls = []
    for m in metas:
        for d in m["ddls"]:
            dp = int(pack_position(d["position"][0], d["position"][1]))
            if hwm_pos < dp <= ack_pos:
                ddls.append(d)
    ddls.sort(key=lambda d: int(pack_position(d["position"][0], d["position"][1])))
    truncates = []
    for m in metas:
        for tp in m.get("truncates", []):
            tpp = int(pack_position(tp[0], tp[1]))
            if hwm_pos < tpp <= ack_pos:
                truncates.append(
                    (
                        tp[0],
                        tp[1],
                        tp[2] if len(tp) > 2 else None,
                        tp[3] if len(tp) > 3 else None,
                    )
                )
    truncates.sort(key=lambda t: int(pack_position(t[0], t[1])))
    max_ts = max((m["max_ts"] for m in metas if m["max_ts"] is not None), default=None)
    n_cand = sum(
        m["n_events"]
        for m in metas
        if m["max_pos"] is not None
        and hwm_pos < int(pack_position(m["max_pos"][0], m["max_pos"][1])) <= ack_pos
    )
    # GTID watermark: whole files at/below the ack contribute their
    # footer max_txn; a file straddling the ack gets one light scan
    max_txn = -1
    exact = True
    for p, m in zip(segment_paths, metas):
        if m["max_pos"] is None:
            continue
        lo = int(pack_position(m["min_pos"][0], m["min_pos"][1]))
        hi = int(pack_position(m["max_pos"][0], m["max_pos"][1]))
        if hi <= ack_pos:
            if m.get("max_txn") is None:
                exact = False
                break
            max_txn = max(max_txn, int(m["max_txn"]))
        elif lo <= ack_pos < hi:
            import numpy as np

            t = pds.dataset([p]).to_table(columns=["segment_id", "offset", "txn_id"])
            pos = pack_position(
                t["segment_id"].to_numpy(zero_copy_only=False),
                t["offset"].to_numpy(zero_copy_only=False),
            )
            inside = pos <= ack_pos
            if inside.any():
                max_txn = max(
                    max_txn,
                    int(t["txn_id"].to_numpy(zero_copy_only=False)[inside].max()),
                )
    # gtid lower bound (only computed when the caller will use it —
    # at most the FIRST commit of a fresh lake): the window-start file
    # is the first with max_pos > hwm; its footer min_txn is exact when
    # the file lies wholly above the hwm, else one light scan
    min_txn = None
    if want_min_txn:
        for p, m in zip(segment_paths, metas):
            if m["max_pos"] is None:
                continue
            hi = int(pack_position(m["max_pos"][0], m["max_pos"][1]))
            if hi <= hwm_pos:
                continue
            lo = int(pack_position(m["min_pos"][0], m["min_pos"][1]))
            if lo > hwm_pos and m.get("min_txn") is not None:
                min_txn = int(m["min_txn"])
            else:
                import numpy as np

                t = pds.dataset([p]).to_table(columns=["segment_id", "offset", "txn_id"])
                pos = pack_position(
                    t["segment_id"].to_numpy(zero_copy_only=False),
                    t["offset"].to_numpy(zero_copy_only=False),
                )
                inside = (pos > hwm_pos) & (pos <= ack_pos)
                if inside.any():
                    min_txn = int(t["txn_id"].to_numpy(zero_copy_only=False)[inside].min())
            break
    return BatchPlan(
        ack=ack,
        new_ddls=ddls,
        n_candidate_events=max(n_cand, 1),
        max_execute_ts=max_ts,
        n_seen_events=n_seen if max_seen > ack_pos else n_cand,
        truncates=truncates,
        max_txn_at_ack=(max_txn if (exact and max_txn >= 0) else None),
        min_txn_at_ack=min_txn,
        xa_commits=xa_commits,
    )


def _execute_batch(
    lake: Lake,
    segment_paths: list[str],
    plan: BatchPlan,
    hwm: tuple[int, int],
    journal: list[dict],
    cfg: ReplayConfig,
    batch_id: int,
    part_files: dict[int, list[str]],
    force_pure_delta: bool = False,
    tables_meta: dict[str, dict] | None = None,
    txn_hwm: int = -1,
) -> dict[int, dict]:
    """Phase-1 of one micro-batch: run the Dataset pipeline, write the
    (invisible) partition files, return the ``touched`` map for the
    phase-2 commit. Thread-safe: builds and consumes its own Dataset.

    ``tables_meta``: multi-table lakes — the post-DDL per-table meta
    (name -> {"base_pid","num_partitions","ddl_journal"}); events route
    by their ``table`` column (one shuffle still) and each partition
    casts down to its table's schema."""
    import ray.data as rd

    routing = None
    pid_schemas = None
    if tables_meta is not None:
        routing = {n: (t["base_pid"], t["num_partitions"]) for n, t in tables_meta.items()}
        per_table = {
            n: lake_schema([e["ddl"] for e in t["ddl_journal"]]) for n, t in tables_meta.items()
        }
        target_payload = widen_union([per_table[n] for n in sorted(per_table)])
        pid_schemas = {
            t["base_pid"] + i: per_table[n]
            for n, t in tables_meta.items()
            for i in range(t["num_partitions"])
        }
    else:
        target_payload = lake_schema([e["ddl"] for e in journal])
    flt = (pds.field("segment_id") > hwm[0]) | (
        (pds.field("segment_id") == hwm[0]) & (pds.field("offset") > hwm[1])
    )
    # prune at the read: the (large) `before` struct and txn-framing
    # columns never leave storage; the full schema is read only when a
    # user predicate (F4) may reference arbitrary columns.
    # _DATASET_BUILD_LOCK: read_parquet's path resolution lazily imports
    # fsspec implementations, which is not thread-safe under pipelined
    # replay — construction is serialized, execution overlaps.
    with _DATASET_BUILD_LOCK:
        if cfg.predicate is None:
            need_table = bool(
                cfg.table_whitelist_regex
                or cfg.table_blacklist_regex
                or cfg.table_list is not None
                or routing is not None
                or isinstance(cfg.column_projection, dict)
            )
            # PK-change streams carry new_doc_id, XA streams carry
            # xa_id. Every file's footer is checked (chained journals
            # may mix schemas per journal): a batch whose files DISAGREE
            # is rejected loudly — projecting an optional column over a
            # file lacking it would error, and skipping it would
            # silently drop rekey/XA semantics.
            import pyarrow.parquet as pq

            names = [set(pq.read_schema(p).names) for p in segment_paths]
            need_rekey, need_xa, need_patch = False, False, False
            for col in ("new_doc_id", "xa_id", "patch"):
                has = [col in ns for ns in names]
                if any(has) and not all(has):
                    raise ValueError(
                        f"mixed segment schemas in one micro-batch: some files carry "
                        f"{col!r} and some don't — replay chained journals with "
                        "uniform schemas (or align segments_per_batch to journal "
                        f"boundaries); files={segment_paths}"
                    )
                if col == "new_doc_id":
                    need_rekey = all(has)
                elif col == "xa_id":
                    need_xa = all(has)
                else:
                    need_patch = all(has)
            if need_patch and (cfg.salt_factor > 1 or cfg.pipeline_depth > 1):
                # patch folding needs every row of a doc in ONE apply
                # group (salting scatters them) and an up-to-date base
                # for residual chains (pipelined batches see a stale
                # part_files snapshot)
                raise ValueError(
                    "partial-JSON patch streams require salt_factor=1 and "
                    "pipeline_depth=1 (patch rows fold per doc against the "
                    "current base partition state)"
                )
            columns = combine_read_columns(
                need_table_col=need_table,
                need_txn=cfg.gtid_dedup,
                need_rekey=need_rekey,
                need_xa=need_xa,
                need_patch=need_patch,
            )
            ds = rd.read_parquet(segment_paths, filter=flt, columns=columns)
        else:
            ds = rd.read_parquet(segment_paths, filter=flt)
    has_patch = "patch" in (ds.schema().names or [])
    combine = make_combine_fn(
        cfg, target_payload, hwm, plan.ack, routing=routing, txn_hwm=txn_hwm,
        xa_commits=plan.xa_commits, has_patch=has_patch,
    )
    ds = ds.map_batches(combine, batch_format="pyarrow", batch_size=cfg.batch_size)
    if cfg.salt_factor > 1:
        ds = ds.groupby("pid").map_groups(make_desalt_fn(cfg.salt_factor), batch_format="pyarrow")
    upsert = make_partition_upsert_fn(
        lake.dir,
        part_files,
        target_payload,
        batch_id,
        sink_mode=cfg.sink_mode,
        # pipelined batches see a stale part_files snapshot, so the
        # reducer-side auto-compact (which merges that snapshot) must
        # not fire; the driver compacts after the commits instead
        compact_threshold=10**9 if force_pure_delta else cfg.compact_threshold,
        pid_schemas=pid_schemas,
        compact_mode=cfg.compact_mode,
    )
    metrics_rows = ds.groupby("pid").map_groups(upsert, batch_format="pyarrow").take_all()
    return {
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


def _table_subscribed(cfg: ReplayConfig, name) -> bool:
    """Does a table name pass the F1-F3 subscription filters? (Used to
    decide whether a TRUNCATE control event applies to this consumer —
    an unsubscribed table's truncate must never wipe subscribed state.)
    A None name (legacy plan metadata) counts as subscribed. Pattern
    construction is shared with the row path (combine._anchor_regex);
    note the row path evaluates via Arrow RE2 while this single-name
    check uses Python re — stick to the common regex subset."""
    from clever_canal_ray.stages.combine import _anchor_regex

    if name is None:
        return True
    if cfg.table_whitelist_regex and not _anchor_regex(cfg.table_whitelist_regex).search(name):
        return False
    if cfg.table_blacklist_regex and _anchor_regex(cfg.table_blacklist_regex).search(name):
        return False
    if cfg.table_list is not None and name not in cfg.table_list:
        return False
    return True


def replay_batch(
    lake: Lake,
    segment_paths: list[str],
    cfg: ReplayConfig | None = None,
    batch_id: int | None = None,
    _info: dict | None = None,
) -> Manifest:
    """Process one micro-batch of segment files; returns the committed
    (or unchanged, if nothing to do / duplicate) manifest.

    ``_info`` (out-param): {"deferred": bool} — whether events past the
    ack (incomplete trailing txn) were left for the next batch."""
    import ray.data as rd

    import dataclasses

    cfg = cfg or ReplayConfig()
    base = lake.current()
    # the lake's partition count is authoritative: routing with a
    # mismatched config would write rows into pids the readers filter
    # out (invisible data) and strand stale images in old pids
    if base.tables is None and cfg.num_partitions != base.num_partitions:
        cfg = dataclasses.replace(cfg, num_partitions=base.num_partitions)
    if batch_id is None:
        batch_id = base.last_batch_id + 1
    if batch_id <= base.last_batch_id:
        # D2: duplicate batch replay is a no-op
        return base

    plan = plan_batch(
        segment_paths, base.hwm,
        want_min_txn=cfg.source_uuid is not None and base.txn_hwm < 0,
    )
    if _info is not None:
        _info["deferred"] = plan.ack is None or plan.n_candidate_events < plan.n_seen_events
    if plan.ack is None:
        return base

    # a filtered-out TRUNCATE must not wipe this consumer's state —
    # drop it like any other filtered event: F1-F3 table filters AND
    # the F6 event-class filter (drop_ops containing "T")
    if plan.truncates:
        if "T" in cfg.drop_ops:
            plan.truncates = []
        else:
            plan.truncates = [
                t
                for t in plan.truncates
                if _table_subscribed(cfg, t[2] if len(t) > 2 else None)
            ]

    if plan.truncates and base.tables is not None:
        # per-table TRUNCATE (multi-table lakes): the window (hwm, t]
        # applies normally for OTHER tables; the target table's rows in
        # the window die at t (excluded from the apply) and its
        # partitions are wiped by the commit; replay continues past t.
        t = plan.truncates[0]
        t_pos = int(pack_position(t[0], t[1]))
        t_table = t[2] if len(t) > 2 else None
        if t_table is None:
            # a silent no-op here would permanently lose the wipe (the
            # commit advances the HWM past it) — refuse loudly instead
            raise ValueError(
                "multi-table lake: TRUNCATE event carries no table name "
                "(legacy plan sidecar? regenerate segment plan metadata)"
            )
        ddls_before = [
            d
            for d in plan.new_ddls
            if int(pack_position(d["position"][0], d["position"][1])) <= t_pos
        ]
        tables_meta = route_ddls(base.tables, ddls_before, min_new_base=base.next_base_pid())
        # exclude the truncated table from the apply (combine drops
        # unregistered tables) — its window rows die at t anyway.
        # Resolution runs against the POST-DDL registry so a truncate
        # may target a table created/renamed earlier in the window; a
        # genuinely unregistered table (unsubscribed) is a no-op wipe.
        exec_tables = {k: v for k, v in tables_meta.items() if k != t_table}
        sub_plan = BatchPlan(
            ack=(t[0], t[1]),
            new_ddls=ddls_before,
            n_candidate_events=plan.n_candidate_events,
            xa_commits=plan.xa_commits,
        )
        part_files = {int(pid): info["files"] for pid, info in base.partitions.items()}
        touched = _execute_batch(
            lake, segment_paths, sub_plan, base.hwm, [], cfg, batch_id, part_files,
            tables_meta=exec_tables, txn_hwm=base.txn_hwm,
        )
        lake.commit_batch(
            base,
            batch_id=batch_id,
            new_hwm=(t[0], t[1]),
            touched=touched,
            new_ddls=ddls_before,
            metrics={"truncate": t_table},
            truncate=t_table if (t_table in tables_meta) else False,
            new_txn_hwm=t[3] if len(t) > 3 and t[3] is not None else None,
            source_uuid=cfg.source_uuid,
            min_txn_applied=plan.min_txn_at_ack,
        )
        if cfg.after_commit is not None:
            cfg.after_commit(lake.current())
        return replay_batch(lake, segment_paths, cfg, _info=_info)
    if plan.truncates:
        # TRUNCATE at position t: every row ≤ t dies, so the window
        # (hwm, t] commits directly as an empty lake (schema/journal
        # survives — DDLs up to t are applied); replay then continues
        # past t (the F9-style isolation cut for table-wide resets).
        t = plan.truncates[0]
        t_pos = int(pack_position(t[0], t[1]))
        ddls_before = [
            d
            for d in plan.new_ddls
            if int(pack_position(d["position"][0], d["position"][1])) <= t_pos
        ]
        lake.commit_batch(
            base,
            batch_id=batch_id,
            new_hwm=(t[0], t[1]),
            touched={},
            new_ddls=ddls_before,
            metrics={"truncate": True},
            truncate=True,
            new_txn_hwm=t[3] if len(t) > 3 and t[3] is not None else None,
            source_uuid=cfg.source_uuid,
            min_txn_applied=plan.min_txn_at_ack,
        )
        if cfg.after_commit is not None:
            cfg.after_commit(lake.current())
        return replay_batch(lake, segment_paths, cfg, _info=_info)

    journal = base.ddl_journal + plan.new_ddls
    tables_meta = (
        route_ddls(base.tables, plan.new_ddls, min_new_base=base.next_base_pid())
        if base.tables is not None
        else None
    )
    part_files = {int(pid): info["files"] for pid, info in base.partitions.items()}
    touched = _execute_batch(
        lake, segment_paths, plan, base.hwm, journal, cfg, batch_id, part_files,
        tables_meta=tables_meta, txn_hwm=base.txn_hwm,
    )
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
            new_txn_hwm=plan.max_txn_at_ack,
            source_uuid=cfg.source_uuid,
            min_txn_applied=plan.min_txn_at_ack,
        )
    except DuplicateCommitError:
        return lake.current()
    if cfg.after_commit is not None:
        cfg.after_commit(m)
    return m


def replay(lake: Lake, segment_paths: list[str], cfg: ReplayConfig | None = None) -> Manifest:
    """Replay a whole segment log as consecutive micro-batches.

    ``segment_paths`` MUST be in ascending (segment_id) order and
    CONTIGUOUS (no gaps) — the binlog-stream contract. Use
    ``sources.discover_segments`` for multi-directory group sources; a
    lexicographic path sort would interleave shard directories out of
    position order and events behind an already-advanced HWM would be
    (correctly, but surprisingly) skipped as replayed. A gap in the
    offered range could place a later transaction boundary above an
    earlier segment's incomplete tail and admit a partial transaction —
    contiguous streams (what a binlog is) cannot produce that shape.

    Each micro-batch re-reads the previous batch's final file too, so a
    transaction tail deferred past the previous ack is picked up (the
    position filter makes the overlap cheap — replay-from-cursor).
    """
    cfg = cfg or ReplayConfig()
    if cfg.compact_mode not in ("major", "minor"):
        raise ValueError(f"compact_mode must be 'major' or 'minor', got {cfg.compact_mode!r}")
    paths = list(segment_paths)
    if cfg.pipeline_depth > 1 and cfg.sink_mode == "delta":
        return _replay_pipelined(lake, paths, cfg)
    return _replay_serial(lake, paths, cfg)


def follow(
    lake: Lake,
    journal_dirs: list[str] | str,
    cfg: ReplayConfig | None = None,
    poll_interval: float = 1.0,
    max_rounds: int | None = None,
    idle_rounds_to_stop: int | None = None,
    unsettled_poll_limit: int = 30,
) -> Manifest:
    """Tail-follow mode — the LocalBinLogConnection tail-wait analog
    (LocalBinLogConnection.java:75-120 file-rotation follow): poll the
    journal dirs, replay any segments that may hold events above the
    HWM, sleep, repeat. Stops after ``max_rounds`` polls or after
    ``idle_rounds_to_stop`` consecutive polls with no progress (both
    None = run forever, the daemon mode).

    A segment observed mid-write defers to the next poll; one that
    stays unreadable for ``unsettled_poll_limit`` consecutive polls is
    treated as CORRUPT and raised — silent idling (or a "caught up"
    return) over a truncated file would be data loss with no error.

    ``journal_dirs`` may instead be a queue object (anything with
    ``pending(hwm_segment_id) -> [local paths]``) — e.g.
    :class:`~clever_canal_ray.sources.segments.ColdSegmentQueue`, the
    BinlogDownloadQueue analog that fetches archived segments with a
    bounded prefetch window; its ``evict`` (delete-after-consume) is
    called as the HWM advances.
    """
    import time as _time

    from clever_canal_ray.sources.segments import SegmentQueue, settled_prefix

    cfg = cfg or ReplayConfig()
    if hasattr(journal_dirs, "pending"):
        q = journal_dirs
    else:
        q = SegmentQueue([journal_dirs] if isinstance(journal_dirs, str) else list(journal_dirs))
    m = lake.current()
    rounds = 0
    idle = 0
    stuck_on: str | None = None
    stuck_polls = 0
    while True:
        # consume only the settled prefix: a segment observed mid-write
        # is deferred (with everything after it) to the next poll
        raw = q.pending(hwm_segment_id=m.hwm[0])
        pending = settled_prefix(raw)
        blocker = raw[len(pending)] if len(pending) < len(raw) else None
        if blocker is not None and blocker == stuck_on:
            stuck_polls += 1
            if stuck_polls >= unsettled_poll_limit:
                raise RuntimeError(
                    f"segment {blocker} has stayed unreadable (truncated/invalid "
                    f"parquet footer) for {stuck_polls} consecutive polls — "
                    "corrupt publisher output, refusing to skip or idle past it"
                )
        else:
            stuck_on, stuck_polls = blocker, (1 if blocker is not None else 0)
        if pending:
            m2 = replay(lake, pending, cfg)
            if m2.version != m.version:
                idle = 0
                if hasattr(q, "evict"):
                    q.evict(m2.hwm[0])  # delete-after-consume
            else:
                idle += 1
            m = m2
        else:
            idle += 1
        rounds += 1
        if max_rounds is not None and rounds >= max_rounds:
            return m
        if idle_rounds_to_stop is not None and idle >= idle_rounds_to_stop:
            return m
        _time.sleep(poll_interval)


def _files_past_position(group: list[str], pos: tuple[int, int]) -> list[str]:
    """Files of ``group`` that may still hold events ABOVE ``pos`` —
    the deferred-transaction tail carried into the next micro-batch.
    Uses plan metadata (max_pos) when available; files without it are
    kept conservatively (the position filter makes re-reads cheap).
    A transaction tail may span SEVERAL files, so the carry must be
    position-based, not a fixed one-file overlap."""
    from clever_canal_ray.sources.segments import load_segment_plan

    p64 = int(pack_position(pos[0], pos[1])) if pos[0] >= 0 else -1
    out = []
    for p in group:
        meta = load_segment_plan(p)
        if meta is None or meta.get("max_pos") is None:
            out.append(p)
        elif int(pack_position(meta["max_pos"][0], meta["max_pos"][1])) > p64:
            out.append(p)
    return out


def _replay_serial(lake: Lake, paths: list[str], cfg: ReplayConfig) -> Manifest:
    n = cfg.segments_per_batch
    m = lake.current()
    i = 0
    pending: list[str] = []  # files that may hold events above the HWM
    while i < len(paths):
        group = pending + paths[i : i + n]
        i += n
        m2 = replay_batch(lake, group, cfg)
        if m2.version != m.version:
            pending = _files_past_position(group, m2.hwm)
        else:
            # no txn boundary in this window yet: the WHOLE group stays
            # pending (a txn may span many files — a one-file overlap
            # would orphan its middle files)
            pending = group
        m = m2
    # drain any committable tail left pending
    while pending:
        m2 = replay_batch(lake, pending, cfg)
        if m2.version == m.version:
            break
        m = m2
        pending = _files_past_position(pending, m2.hwm)
    return m


def _run_chain(lake: Lake, batches: list, cfg: ReplayConfig, start: Manifest) -> Manifest:
    """Execute one planned chain of micro-batches: concurrent phase-1,
    strictly in-order phase-2 commits (the FIFO-ack rule,
    MemoryMetaManager.java:236-247, is about commit order, not compute
    order; phase-1 files are invisible until their commit)."""
    from concurrent.futures import ThreadPoolExecutor

    part_files = {int(pid): info["files"] for pid, info in start.partitions.items()}
    first_id = start.last_batch_id + 1
    m = start
    with ThreadPoolExecutor(max_workers=cfg.pipeline_depth) as ex:
        futures = [
            ex.submit(
                _execute_batch,
                lake,
                group,
                plan,
                h,
                j + plan.new_ddls,
                cfg,
                first_id + k,
                part_files,
                True,  # force_pure_delta
                tmk,
                start.txn_hwm,
            )
            for k, (group, plan, h, j, tmk) in enumerate(batches)
        ]
        for k, fut in enumerate(futures):
            touched = fut.result()
            group, plan, h, j, tmk = batches[k]
            if cfg.before_commit is not None:
                cfg.before_commit(first_id + k, plan, touched)
            m = lake.commit_batch(
                m,
                batch_id=first_id + k,
                new_hwm=plan.ack,
                touched=touched,
                new_ddls=plan.new_ddls,
                metrics={"max_execute_ts": plan.max_execute_ts} if plan.max_execute_ts else None,
                new_txn_hwm=plan.max_txn_at_ack,
                source_uuid=cfg.source_uuid,
                min_txn_applied=plan.min_txn_at_ack,
            )
            if cfg.after_commit is not None:
                cfg.after_commit(m)
    return m


def _replay_pipelined(lake: Lake, paths: list[str], cfg: ReplayConfig) -> Manifest:
    """Pipelined micro-batches (delta sink only).

    The plan chain (hwm_k -> ack_k, DDL epochs) is computed upfront —
    footer-metadata fast when available — so up to ``pipeline_depth``
    batch pipelines execute CONCURRENTLY while phase-2 commits stay
    strictly in batch order. Groups whose window holds no transaction
    boundary are merged into the next group so no events are orphaned.

    CONTROL EVENTS (TRUNCATE, registry DDLs like create/drop/rename_
    table) cannot ride a concurrent chain — a truncate cuts the window
    and a create_table needs next_base_pid from the COMMITTED manifest.
    Instead of collapsing the whole replay to serial (one create_table
    in a 10^10-event stream would serialize everything), the chain is
    SPLIT at the control group: batches before it run pipelined, the
    control group itself runs through the serial ``replay_batch``
    semantics, then planning resumes pipelined from the refreshed
    manifest — each SIDE of a control event keeps full overlap.

    Driver-side compaction after the commits replaces the reducer-side
    auto-compact (which would act on a stale file-list snapshot under
    concurrency).
    """
    import dataclasses

    base = lake.current()
    if base.tables is None and cfg.num_partitions != base.num_partitions:
        cfg = dataclasses.replace(cfg, num_partitions=base.num_partitions)
    n = cfg.segments_per_batch

    m = base
    i = 0
    pending: list[str] = []
    while i < len(paths):
        # --- plan one chain segment: up to a control event or the end
        batches: list[tuple[list[str], BatchPlan, tuple[int, int], list[dict], dict | None]] = []
        hwm = m.hwm
        journal = list(m.ddl_journal)
        tm = m.tables  # multi-table: per-table journals evolve along the chain
        control_group: list[str] | None = None
        while i < len(paths):
            group = pending + paths[max(0, i - 1) if not pending else i : i + n]
            i += n
            plan = plan_batch(
                group, hwm,
                want_min_txn=cfg.source_uuid is not None and m.txn_hwm < 0 and not batches,
            )
            if plan.ack is None:
                pending = group  # no txn boundary yet: widen the window
                continue
            if plan.truncates or (
                tm is not None
                and any(
                    e["ddl"]["op"] in ("create_table", "drop_table", "rename_table")
                    for e in plan.new_ddls
                )
            ):
                control_group = group
                break
            tm_next = route_ddls(tm, plan.new_ddls) if tm is not None else None
            batches.append((group, plan, hwm, list(journal), tm_next))
            journal.extend(plan.new_ddls)
            tm = tm_next
            hwm = plan.ack
            # carry every file that may hold events above the ack — a
            # deferred txn tail can span several files
            pending = _files_past_position(group, plan.ack)
        # events past the final ack belong to an incomplete trailing
        # transaction: they are deliberately NOT committable (ack-at-
        # txn-boundary rule) and are picked up when their commit arrives.

        if batches:
            m = _run_chain(lake, batches, cfg, m)
        if control_group is not None:
            # serial cut: replay_batch applies the window up to (and
            # through) the control event(s), committing via the same
            # two-phase manifest path; recursion inside replay_batch
            # drains the rest of the group
            m = replay_batch(lake, control_group, cfg)
            pending = _files_past_position(control_group, m.hwm)

    # driver-side compaction for partitions past the threshold (minor
    # mode folds deltas only — the base file is never rewritten here)
    over = [int(p) for p, info in m.partitions.items() if len(info["files"]) > cfg.compact_threshold]
    if over:
        m = lake.compact(pids=over, mode=cfg.compact_mode)
    return m
