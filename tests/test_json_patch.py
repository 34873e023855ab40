"""Partial-JSON updates (JsonConversion.java:9 / JsonDiffConversion.java
analog): a JSON payload column patched by path ops riding the event
stream's ``patch`` column, folded per doc in position order — in-window
images patched directly, leading (residual) chains resolved against the
base partition state, 0-row-match patches dropped."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.functions.json_patch import apply_ops_to_value, canonical
from clever_canal_ray.pipelines.replay import replay, replay_batch
from clever_canal_ray.schema import event_schema, lake_schema
from clever_canal_ray.state.manifest import Lake

BASE = {
    "op": "base_schema",
    "fields": [["doc_id", "string"], ["meta", "string"], ["kind", "string"]],
}
PAYLOAD = lake_schema([BASE])


def _set(col, path, value):
    return {"col": col, "op": "set", "path": path, "value": value}


def _rm(col, path):
    return {"col": col, "op": "remove", "path": path}


# -- kernel semantics (MySQL JSON_SET/JSON_REMOVE parity) -------------------


def test_apply_ops_semantics():
    v = canonical({"a": 1, "nested": {"x": 0}})
    assert apply_ops_to_value(v, [_set("meta", "$.q", 7)]) == canonical(
        {"a": 1, "nested": {"x": 0}, "q": 7}
    )
    # set below a MISSING parent: no-op (JSON_SET never creates paths)
    assert apply_ops_to_value(v, [_set("meta", "$.ghost.x", 1)]) == v
    # set below an existing parent: creates the leaf
    assert apply_ops_to_value(v, [_set("meta", "$.nested.y", 2)]) == canonical(
        {"a": 1, "nested": {"x": 0, "y": 2}}
    )
    # remove missing key: no-op; remove existing: removes
    assert apply_ops_to_value(v, [_rm("meta", "$.zz")]) == v
    assert apply_ops_to_value(v, [_rm("meta", "$.a")]) == canonical({"nested": {"x": 0}})
    # SQL NULL stays NULL (JSON_SET(NULL, ...) = NULL)
    assert apply_ops_to_value(None, [_set("meta", "$.a", 1)]) is None
    # ops apply in order within a chain
    assert apply_ops_to_value(v, [_set("meta", "$.b", 1), _rm("meta", "$.b")]) == v


# -- end-to-end through replay ----------------------------------------------


def _seg(rows, seg_id=0):
    sch = event_schema(PAYLOAD, include_patch=True)
    n = len(rows)
    payload_t = pa.struct(list(PAYLOAD))

    def arr(name, typ, default=None):
        return pa.array([r.get(name, default) for r in rows], typ)

    return pa.Table.from_arrays(
        [
            pa.array([seg_id] * n, pa.int32()),
            arr("offset", pa.int64()),
            arr("txn_id", pa.int64(), 0),
            pa.array([0] * n, pa.int32()),
            arr("txn_commit", pa.bool_(), True),
            pa.array([1_700_000_000_000 + i for i in range(n)], pa.timestamp("ms")),
            arr("op", pa.string()),
            pa.array(["lake.j"] * n, pa.string()),
            arr("doc_id", pa.string()),
            pa.array([0] * n, pa.int32()),
            pa.array([None] * n, pa.string()),
            arr("patch", pa.string()),
            pa.nulls(n, payload_t),
            pa.array([r.get("after") for r in rows], payload_t),
        ],
        schema=sch,
    )


def _img(doc, meta_obj, kind):
    return {"doc_id": doc, "meta": canonical(meta_obj) if meta_obj is not None else None, "kind": kind}


def _lake(tmp_path, metas):
    tbl = pa.Table.from_pylist(
        [_img(d, m, "base") for d, m in metas.items()], schema=pa.schema(list(PAYLOAD))
    )
    return Lake.create(str(tmp_path / "lake"), tbl, num_partitions=4, ddl_journal=[BASE])


def _state(lake):
    t = lake.read_table()
    return {
        d: (m, k)
        for d, m, k in zip(
            t["doc_id"].to_pylist(), t["meta"].to_pylist(), t["kind"].to_pylist()
        )
    }


def _p(doc, offset, *ops):
    return dict(op="U", offset=offset, doc_id=doc, patch=json.dumps(list(ops)))


@pytest.mark.parametrize("sink_mode", ["compact", "delta"])
def test_patch_fold_through_replay(ray_session, tmp_path, sink_mode):
    lake = _lake(
        tmp_path,
        {
            "d_res": {"a": 1},          # leading (residual) patch vs base
            "d_img": {"a": 2},          # full image then patch in-window
            "d_del": {"a": 3},          # delete then patch: stays deleted
            "d_par": {"a": 4},          # patch below missing parent: no-op op
            "d_keep": {"a": 5},         # untouched
            "d_null": None,             # SQL-NULL json: patch keeps NULL
        },
    )
    rows = [
        _p("d_res", 10, _set("meta", "$.q", 7), _rm("meta", "$.a")),
        dict(op="U", offset=11, doc_id="d_img", after=_img("d_img", {"r": 1}, "upd")),
        _p("d_img", 12, _set("meta", "$.k", 99)),
        dict(op="D", offset=13, doc_id="d_del"),
        _p("d_del", 14, _set("meta", "$.z", 1)),
        _p("d_par", 15, _set("meta", "$.ghost.x", 1)),
        _p("d_ghost", 16, _set("meta", "$.a", 1)),  # doc never existed: 0-row match
        _p("d_null", 17, _set("meta", "$.a", 1)),
    ]
    p = str(tmp_path / "s0.parquet")
    pq.write_table(_seg(rows), p)
    m = replay_batch(lake, [p], ReplayConfig(num_partitions=4, sink_mode=sink_mode))
    assert m.hwm == (0, 17)
    st = _state(lake)
    assert st["d_res"] == (canonical({"q": 7}), "base")
    assert st["d_img"] == (canonical({"r": 1, "k": 99}), "upd")
    assert "d_del" not in st
    assert st["d_par"] == (canonical({"a": 4}), "base")
    assert "d_ghost" not in st  # a 0-row-match UPDATE creates nothing
    assert st["d_null"] == (None, "base")
    assert st["d_keep"] == (canonical({"a": 5}), "base")
    # events_in counts no-op patches as applied events
    assert sum(r["events_in"] for r in lake.full_ledger()) == len(rows)
    # duplicate replay is a no-op (D2)
    m2 = replay_batch(lake, [p], ReplayConfig(num_partitions=4, sink_mode=sink_mode))
    assert m2.version == m.version and _state(lake) == st


def test_patch_residual_across_micro_batches(ray_session, tmp_path):
    """Batch 1 updates a doc; batch 2's leading patch must resolve
    against the batch-1 state, not the original base (the stale-base
    hazard the pipeline_depth=1 guard exists for)."""
    lake = _lake(tmp_path, {"d": {"a": 1}})
    s0 = _seg([dict(op="U", offset=10, doc_id="d", after=_img("d", {"b": 2}, "v1"))], 0)
    s1 = _seg([_p("d", 20, _set("meta", "$.c", 3))], 1)
    p0, p1 = str(tmp_path / "s0.parquet"), str(tmp_path / "s1.parquet")
    pq.write_table(s0, p0)
    pq.write_table(s1, p1)
    replay(lake, [p0, p1], ReplayConfig(num_partitions=4, segments_per_batch=1, sink_mode="delta"))
    assert _state(lake)["d"] == (canonical({"b": 2, "c": 3}), "v1")


def test_patch_guards(ray_session, tmp_path):
    lake = _lake(tmp_path, {"d": {"a": 1}})
    p = str(tmp_path / "s0.parquet")
    pq.write_table(_seg([_p("d", 10, _set("meta", "$.q", 1))]), p)
    with pytest.raises(ValueError, match="salt_factor=1"):
        replay_batch(lake, [p], ReplayConfig(num_partitions=4, salt_factor=2))
    with pytest.raises(ValueError, match="pipeline_depth=1"):
        replay(
            lake, [p], ReplayConfig(num_partitions=4, sink_mode="delta", pipeline_depth=2)
        )
