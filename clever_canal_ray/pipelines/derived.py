"""Incremental derived-aggregate maintenance over the change stream.

The classic Canal-client downstream: a consumer that keeps a
materialized ``GROUP BY`` in lockstep with the source table by applying
retraction deltas from the change events, instead of recomputing the
aggregate from the full table. This is the capability Canal *delivers
to* (clients apply I/U/D into warehouses / caches / aggregates,
SURVEY.md §2.5 O9 "Canal itself only delivers"), built on the same
get/ack cursor protocol (CanalServerWithEmbedded.java:202-400) with
exactly-once resume.

Delta rules (requires before-images — ``include_before`` streams —
because a retraction must know the row's current image):

- INSERT:  +after
- DELETE:  -before            (null before-image = delete of a missing
                               row, a no-op, matching the serial oracle)
- UPDATE:  -before, +after    (a key-column change moves the row
                               between groups; a rekey — ``new_doc_id``
                               — is the same delta, count unchanged)
- TRUNCATE: reset every group to zero, then apply deltas above it
- DDL / txn framing rows: position-advancing no-ops

Exactly-once: the aggregate state file records ``applied_pos`` (packed
ack position of the last batch folded in) and is replaced atomically
BEFORE the ack. A crash between apply and ack redelivers the batch on
resume; its ack position is ≤ ``applied_pos`` so it is skipped and
re-acked (the D3 ``offset > hwm`` rule applied consumer-side). A crash
between get and apply just rolls back and redelivers.

XA streams are not consumable here in raw form: a branch's verdict
(XC/XR) arrives later in the stream, so a raw-journal consumer cannot
know whether to fold a branch's deltas. Feed an XA stream through
``replay`` (whose ack fixpoint resolves branches) or pre-filter; this
maintainer raises on an unresolved branch row rather than guessing.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from clever_canal_ray.client import ChangeConsumer
from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.schema import pack_position

_NULL_KEY = "\x00<null>"  # JSON-safe stand-in for a NULL group key


class AggregateMaintainer:
    """Maintain ``SELECT key_col, count(*) AS n_docs, sum(c) AS sum_<c>...
    GROUP BY key_col`` over the live rows of a change-event stream.

    Group cardinality is assumed small (a dimension column: source,
    language, shard...) — state lives in one JSON file; the per-batch
    delta computation is vectorized and the stream is consumed through
    the FIFO get/ack ledger, so the maintainer inherits the consumer's
    ordering and resume guarantees.
    """

    def __init__(
        self,
        journal_dirs: list[str] | str,
        state_dir: str,
        key_col: str = "source",
        sum_cols: tuple[str, ...] = ("n_tok",),
        client_id: str = "agg",
        cfg: Optional[ReplayConfig] = None,
        consumer=None,
    ):
        """``consumer``: injectable get/ack source — anything with the
        ChangeConsumer method surface (subscribe / get_without_ack /
        ack / rollback / delivered_position), e.g. a
        ``server.WireConsumer``, so the maintainer can run in a remote
        process against a served journal. Default: an in-process
        ChangeConsumer over ``journal_dirs`` (pass journal_dirs=None
        only with an explicit consumer)."""
        if consumer is not None and (cfg is not None or journal_dirs is not None):
            # cfg/journal_dirs configure the in-process consumer this
            # constructor builds; silently dropping them under an
            # injected consumer would fold an unfiltered stream
            raise ValueError(
                "consumer= is exclusive with journal_dirs/cfg — pass "
                "journal_dirs=None and configure filters on the injected "
                "consumer (e.g. WireConsumer.subscribe(cfg))"
            )
        self.key_col = key_col
        self.sum_cols = tuple(sum_cols)
        os.makedirs(state_dir, exist_ok=True)
        from clever_canal_ray.state.storage import storage_for_state

        self.storage = storage_for_state(state_dir)  # posix or objectstore
        self._state_path = os.path.join(state_dir, f"agg-{client_id}.json")
        self.consumer = consumer if consumer is not None else ChangeConsumer(
            journal_dirs, state_dir, client_id=f"c-{client_id}", cfg=cfg
        )
        # groups: key -> [n_docs, sum_0, sum_1, ...]
        self._groups: dict[str, list] = {}
        self._applied_pos = -1  # packed ack position of last folded batch
        # stripped-stream guard counters (cumulative across batches)
        self._ud_seen = 0
        self._ud_with_before = 0
        self._load()

    # -- persistence -------------------------------------------------------

    def _load(self) -> None:
        if self.storage.exists(self._state_path):
            d = json.loads(self.storage.get_text(self._state_path))
            if d["key_col"] != self.key_col or tuple(d["sum_cols"]) != self.sum_cols:
                raise ValueError(
                    f"state at {self._state_path} maintains "
                    f"({d['key_col']}, {d['sum_cols']}), not "
                    f"({self.key_col}, {list(self.sum_cols)})"
                )
            self._groups = {k: list(v) for k, v in d["groups"].items()}
            self._applied_pos = int(d["applied_pos"])
            self._ud_seen = int(d.get("ud_seen", 0))
            self._ud_with_before = int(d.get("ud_with_before", 0))

    def _persist(self) -> None:
        # atomic full-object PUT through the pluggable backend (posix:
        # tmp+rename; object store: native PUT atomicity)
        self.storage.put_text(
            self._state_path,
            json.dumps(
                {
                    "key_col": self.key_col,
                    "sum_cols": list(self.sum_cols),
                    "groups": self._groups,
                    "applied_pos": self._applied_pos,
                    "ud_seen": self._ud_seen,
                    "ud_with_before": self._ud_with_before,
                }
            ),
        )

    def seed(self, table: pa.Table) -> None:
        """Fold the table's rows in as inserts — bootstrap the aggregate
        from the lake's initial state before consuming the stream (the
        aggregate-side analog of the snapshot half of bootstrap+replay).
        Only valid before any batch has been folded."""
        if self._applied_pos != -1 or self._groups:
            raise RuntimeError("seed() must run before any batch is folded")
        key = table[self.key_col].to_pandas()
        cols = {"__key": key.where(key.notna(), _NULL_KEY), "__n": 1}
        for c in self.sum_cols:
            cols[c] = table[c].to_pandas().fillna(0)
        delta = pd.DataFrame(cols).groupby("__key", sort=False, dropna=False).sum()
        for k, row in delta.iterrows():
            self._groups[str(k)] = [int(row["__n"])] + [int(row[c]) for c in self.sum_cols]
        self._persist()

    # -- the consume loop --------------------------------------------------

    def run_to_end(self, batch_size: int = 50_000) -> int:
        """Drain the stream; returns the number of batches folded in.
        Safe to call repeatedly and after a crash at any point."""
        return self.run_follow(batch_size, poll_ms=0, idle_rounds=1)

    def run_follow(
        self,
        batch_size: int = 50_000,
        poll_ms: int = 1_000,
        idle_rounds: int = 3,
        stop=None,
    ) -> int:
        """Live downstream: keep folding as segments arrive, long-polling
        the consumer ``poll_ms`` per get (getWithoutAck(timeout)
        semantics — works over both ChangeConsumer and WireConsumer).
        Returns the number of batches folded, after ``idle_rounds``
        consecutive empty polls or when ``stop()`` turns truthy."""
        self.consumer.subscribe()
        # a previous crash may have left in-flight batches: redeliver
        self.consumer.rollback()
        folded = 0
        idle = 0
        while idle < idle_rounds and not (stop is not None and stop()):
            if poll_ms:
                got = self.consumer.get_without_ack(batch_size, timeout_ms=poll_ms)
            else:  # plain drain — injected consumers need only the 1-arg surface
                got = self.consumer.get_without_ack(batch_size)
            if got is None:
                idle += 1
                continue
            idle = 0
            folded += self._apply_batch(got)
        return folded

    def _apply_batch(self, got: tuple) -> int:
        """Fold one delivered batch (exactly-once), ack it; returns 1 if
        it was fresh, 0 if it was an already-folded redelivery."""
        batch_id, events = got
        ack = self.consumer.delivered_position
        ack_pos = int(pack_position(ack[0], ack[1]))
        folded = 0
        if ack_pos > self._applied_pos:
            # row-level D3 rule, not a whole-batch skip: a resume
            # with a different batch_size re-cuts the stream, so a
            # redelivered batch may STRADDLE applied_pos — fold only
            # rows strictly above it
            pos = pack_position(
                events["segment_id"].to_numpy(zero_copy_only=False),
                events["offset"].to_numpy(zero_copy_only=False),
            )
            fresh = pos > self._applied_pos
            self._fold(events.filter(pa.array(fresh)) if not fresh.all() else events)
            self._applied_pos = ack_pos
            self._persist()  # phase 1: state durable before the ack
            folded = 1
        # else: redelivered batch already folded — just re-ack
        self.consumer.ack(batch_id)
        return folded

    # -- delta application -------------------------------------------------

    def _fold(self, events: pa.Table) -> None:
        op = events["op"].to_numpy(zero_copy_only=False).astype(str)
        data_mask = np.isin(op, ("I", "U", "D"))
        if "xa_id" in events.column_names:
            xa_valid = np.asarray(
                pc.is_valid(events["xa_id"]).to_numpy(zero_copy_only=False), dtype=bool
            )
            if xa_valid[data_mask].any():
                raise ValueError(
                    "raw XA branch events cannot be folded incrementally "
                    "(verdict arrives later in the stream); replay the "
                    "stream through the engine or pre-resolve branches"
                )
        # the aggregate has no table dimension: a multi-table stream is
        # ill-defined here (and a per-table TRUNCATE must not reset the
        # other tables) — consume ONE table, filtered via ReplayConfig
        if "table" in events.column_names:
            tables = set(
                np.asarray(events["table"].to_numpy(zero_copy_only=False), dtype=object)[
                    data_mask | (op == "T")
                ]
            ) - {None}
            if len(tables) > 1:
                raise ValueError(
                    f"stream carries multiple tables {sorted(tables)}: maintain "
                    "one aggregate per table (subscribe with a ReplayConfig "
                    "table filter)"
                )
        # TRUNCATE: reset, then only deltas ABOVE the last T row apply
        # (events arrive position-sorted from the consumer)
        t_idx = np.flatnonzero(op == "T")
        lo = 0
        if t_idx.size:
            self._groups = {}
            lo = int(t_idx[-1]) + 1
            events = events.slice(lo)
            op = op[lo:]

        is_i = op == "I"
        is_u = op == "U"
        is_d = op == "D"
        if not (is_i.any() or is_u.any() or is_d.any()):
            return
        after = events["after"]
        after = after.combine_chunks() if isinstance(after, pa.ChunkedArray) else after
        if "before" in events.column_names:
            before = events["before"]
            before = before.combine_chunks() if isinstance(before, pa.ChunkedArray) else before
        else:
            before = pa.nulls(events.num_rows, after.type)
        need_before = is_u | is_d
        before_valid = np.asarray(
            pc.is_valid(before).to_numpy(zero_copy_only=False), dtype=bool
        )
        # a null before-image on U/D means the target row did not exist:
        # U degenerates to insert (the oracle's upsert rule), D to a
        # no-op. A stream written WITHOUT before-images (include_before
        # =False) is indistinguishable per-row and would overcount —
        # guard: once CUMULATIVELY (across batches, so small batch
        # sizes can't dodge it) ≥20 U/D rows passed with not a single
        # before image, this is a stripped stream, not a run of
        # missing-key updates (one image ever seen disarms the guard).
        self._ud_seen += int(need_before.sum())
        self._ud_with_before += int(before_valid[need_before].sum())
        if self._ud_seen >= 20 and self._ud_with_before == 0:
            raise ValueError(
                "stream carries no before-images: incremental aggregate "
                "maintenance needs include_before streams (a retraction "
                "must know the current row image)"
            )

        def side(struct_arr, mask):
            key = pc.struct_field(struct_arr, self.key_col).to_pandas()[mask]
            cols = {"__key": key.where(key.notna(), _NULL_KEY)}
            for c in self.sum_cols:
                cols[c] = pc.struct_field(struct_arr, c).to_pandas()[mask].fillna(0)
            return pd.DataFrame(cols)

        plus = side(after, is_i | is_u)
        plus["__n"] = 1
        minus = side(before, need_before & before_valid)
        minus["__n"] = -1
        for c in self.sum_cols:
            minus[c] = -minus[c]
        delta = (
            pd.concat([plus, minus], ignore_index=True)
            .groupby("__key", sort=False, dropna=False)
            .sum()
        )
        for key, row in delta.iterrows():
            g = self._groups.setdefault(str(key), [0] + [0] * len(self.sum_cols))
            g[0] += int(row["__n"])
            for j, c in enumerate(self.sum_cols):
                g[1 + j] += int(row[c])
        # groups with no live rows leave the aggregate (GROUP BY over
        # live rows has no such group)
        self._groups = {k: v for k, v in self._groups.items() if v[0] != 0}

    # -- results -----------------------------------------------------------

    def table(self) -> pa.Table:
        keys = sorted(self._groups)
        names = [None if k == _NULL_KEY else k for k in keys]
        cols = {
            self.key_col: pa.array(names, pa.string()),
            "n_docs": pa.array([self._groups[k][0] for k in keys], pa.int64()),
        }
        for j, c in enumerate(self.sum_cols):
            cols[f"sum_{c}"] = pa.array([self._groups[k][1 + j] for k in keys], pa.int64())
        return pa.Table.from_pydict(cols)
