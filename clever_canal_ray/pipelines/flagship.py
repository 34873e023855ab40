"""Flagship demo pipeline over the driver's TPC-H-ish testdata.

Derives a deterministic CDC workload from the generic test tables and
runs it through the REAL engine (Lake.create + replay + manifest):

- initial lake = ``documents``: doc_id -> ``doc%012d``, tokens =
  stable-hashed words (vocab 50257), n_tok = whitespace token count,
  source carried over;
- change events = ``events``: op mapped from event_type
  (signup→I, error→D, else U), position = event_id, INSERTs create new
  doc_ids in the 1_000_000+event_id namespace, UPDATE/DELETE target
  ``(user_id*7919 + event_id*31) % n_docs``; after-images have
  n_tok = 16 + event_id % 64 and source = 'cdc'.

Every rule above is mirrored exactly in ``__ray_entry__.oracle_sql``
["cdc_upsert_lake"], which recomputes the final lake state with SQL
window functions — the engine's end-to-end correctness gate on driver
data.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.schema import LAKE_SCHEMA_V0, event_schema
from clever_canal_ray.state.manifest import Lake
from clever_canal_ray.state.partitioning import stable_hash

VOCAB = 50257
NEW_ID_BASE = 1_000_000


def tokenize_documents(sf_dir: str) -> pa.Table:
    """documents -> lake-shaped table (deterministic word-hash tokens)."""
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "source"])
    ids = docs["doc_id"].to_numpy(zero_copy_only=False)
    texts = docs["text"].to_pylist()
    words_per_doc = [t.split(" ") for t in texts]
    lengths = np.array([len(w) for w in words_per_doc], dtype=np.int64)
    flat_words = np.concatenate([np.asarray(w, dtype=object) for w in words_per_doc])
    flat_tokens = (stable_hash(flat_words) % np.uint64(VOCAB)).astype(np.int32)
    offsets = np.zeros(len(ids) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    return pa.Table.from_arrays(
        [
            pa.array([f"doc{int(i):012d}" for i in ids], pa.string()),
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(flat_tokens, pa.int32())),
            pa.array(lengths.astype(np.int32), pa.int32()),
            docs["source"].combine_chunks(),
        ],
        schema=LAKE_SCHEMA_V0,
    )


def derive_change_events(sf_dir: str, n_docs: int, with_index_verb: bool = False) -> pa.Table:
    """events -> one binlog segment of canonical change events.

    ``with_index_verb``: append one CREATE INDEX DDL row at the stream
    tail (schema no-op; exercised by the flagship gate only — streams
    consumed by the multi-table / consumer gates keep the plain shape).
    """
    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts", "user_id", "event_type"])
    df = ev.to_pandas().sort_values("event_id").reset_index(drop=True)
    n = len(df)
    etype = df["event_type"].to_numpy()
    op = np.select([etype == "signup", etype == "error"], ["I", "D"], default="U")
    eid = df["event_id"].to_numpy().astype(np.int64)
    uid = df["user_id"].to_numpy().astype(np.int64)
    target = (uid * 7919 + eid * 31) % n_docs
    doc_idx = np.where(op == "I", NEW_ID_BASE + eid, target)
    doc_ids = np.array([f"doc{int(i):012d}" for i in doc_idx], dtype=object)

    has_after = op != "D"
    n_tok = (16 + eid % 64).astype(np.int64)
    lengths = np.where(has_after, n_tok, 0)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    starts = (eid * 1_000_003) % VOCAB
    total = int(lengths.sum())
    if total:
        # tokens[i][j] = (start_i + j) % VOCAB, flattened — one
        # repeat/arange pass, no per-event loop
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            offsets[:-1].astype(np.int64), lengths
        )
        flat = ((np.repeat(starts, lengths) + pos) % VOCAB).astype(np.int32)
    else:
        flat = np.array([], dtype=np.int32)

    payload = pa.struct(list(LAKE_SCHEMA_V0))
    after = pa.StructArray.from_arrays(
        [
            pa.array(np.where(has_after, doc_ids, None), pa.string()),
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(flat, pa.int32())),
            pa.array(np.where(has_after, n_tok, 0), pa.int32()),
            pa.array(np.where(has_after, "cdc", None), pa.string()),
        ],
        fields=list(LAKE_SCHEMA_V0),
        mask=pa.array(~has_after),
    )
    before = pa.nulls(n, payload)
    txn = eid // 8
    last_of_txn = np.ones(n, dtype=bool)
    last_of_txn[:-1] = txn[:-1] != txn[1:]
    data = pa.Table.from_arrays(
        [
            pa.array(np.zeros(n, np.int32), pa.int32()),
            pa.array(eid + 1, pa.int64()),
            pa.array(txn, pa.int64()),
            pa.array((eid % 8).astype(np.int32), pa.int32()),
            pa.array(last_of_txn, pa.bool_()),
            pa.array(df["ts"].to_numpy().astype("datetime64[ms]"), pa.timestamp("ms")),
            pa.array(op, pa.string()),
            pa.array(np.full(n, "lake.sequences", dtype=object), pa.string()),
            pa.array(doc_ids, pa.string()),
            pa.array(np.zeros(n, np.int32), pa.int32()),
            pa.array(np.full(n, None, dtype=object), pa.string()),
            before,
            after,
        ],
        schema=event_schema(LAKE_SCHEMA_V0),
    )
    if not with_index_verb:
        return data
    # one CREATE INDEX verb (DruidDdlParser C_INDEX analog):
    # journal-recorded schema NO-OP — the gate oracle is unaffected by
    # design; this keeps the ignore-verb path exercised in a
    # hash-checked gate stream (index verbs must not stall replay)
    import json as _json

    idx_ddl = _json.dumps({"op": "create_index", "name": "idx_source", "columns": ["source"]})
    ddl_row = pa.Table.from_arrays(
        [
            pa.array([0], pa.int32()),
            pa.array([int(eid.max()) + 2 if n else 1], pa.int64()),
            pa.array([int(txn.max()) + 1 if n else 0], pa.int64()),
            pa.array([0], pa.int32()),
            pa.array([True], pa.bool_()),
            pa.array([df["ts"].to_numpy().astype("datetime64[ms]").max() if n else np.datetime64(0, "ms")], pa.timestamp("ms")),
            pa.array(["DDL"], pa.string()),
            pa.array(["lake.sequences"], pa.string()),
            pa.array([None], pa.string()),
            pa.array([0], pa.int32()),
            pa.array([idx_ddl], pa.string()),
            pa.nulls(1, payload),
            pa.nulls(1, payload),
        ],
        schema=event_schema(LAKE_SCHEMA_V0),
    )
    return pa.concat_tables([data, ddl_row])


def run_flagship(sf_dir: str, work_dir: str | None = None, num_partitions: int = 8):
    """Full engine run over sf_dir; returns the final lake Dataset."""
    work_dir = work_dir or os.path.join("/tmp", f"ccr_flagship_{uuid.uuid4().hex}")
    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(work_dir)
    lake_tbl = tokenize_documents(sf_dir)
    events = derive_change_events(sf_dir, lake_tbl.num_rows, with_index_verb=True)
    seg_path = os.path.join(work_dir, "segment-00000.parquet")
    pq.write_table(events, seg_path)
    lake = Lake.create(os.path.join(work_dir, "lake"), lake_tbl, num_partitions=num_partitions)
    from clever_canal_ray.pipelines.replay import replay

    # production configuration: delta sink + pipelined micro-batches —
    # the same path the SQL oracle then validates end-to-end
    replay(
        lake,
        [seg_path],
        ReplayConfig(num_partitions=num_partitions, sink_mode="delta", pipeline_depth=2),
    )
    lake.compact()
    return lake.read_dataset()
