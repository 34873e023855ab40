"""XA distributed-transaction framing (EntryProtocol.proto:26-59
XA_COMMIT=13/XA_ROLLBACK=14; LogEventConvert.java:78-119 dispatch):
data events carrying xa_id apply only once their branch's op="XC"
verdict is seen; op="XR" discards the branch; the ack never passes an
unresolved branch (the distributed-txn ack-at-boundary rule)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.pipelines.replay import plan_batch, replay, replay_batch
from clever_canal_ray.schema import LAKE_SCHEMA_V0, event_schema
from clever_canal_ray.state.manifest import Lake


def _img(doc, tokens, src):
    return {"doc_id": doc, "tokens": tokens, "n_tok": len(tokens), "source": src}


def _seg(rows, seg_id=0):
    """rows: dicts with op, offset, doc_id, xa_id, after, txn_commit."""
    sch = event_schema(LAKE_SCHEMA_V0, include_xa=True)
    n = len(rows)
    payload = pa.struct(list(LAKE_SCHEMA_V0))

    def arr(name, typ, default=None):
        return pa.array([r.get(name, default) for r in rows], typ)

    after_rows = [r.get("after") for r in rows]
    after = pa.array(after_rows, payload)
    return pa.Table.from_arrays(
        [
            pa.array([seg_id] * n, pa.int32()),
            arr("offset", pa.int64()),
            arr("txn_id", pa.int64(), 0),
            pa.array([0] * n, pa.int32()),
            arr("txn_commit", pa.bool_(), True),
            pa.array([1_700_000_000_000 + i for i in range(n)], pa.timestamp("ms")),
            arr("op", pa.string()),
            pa.array(["lake.sequences"] * n, pa.string()),
            arr("doc_id", pa.string()),
            pa.array([0] * n, pa.int32()),
            pa.array([None] * n, pa.string()),
            arr("xa_id", pa.int64()),
            pa.nulls(n, payload),
            after,
        ],
        schema=sch,
    )


def _lake(tmp_path, docs):
    tbl = pa.Table.from_pylist(
        [_img(d, [1], "base") for d in docs], schema=LAKE_SCHEMA_V0
    )
    return Lake.create(str(tmp_path / "lake"), tbl, num_partitions=4)


def _write(tmp_path, name, tbl):
    p = str(tmp_path / name)
    pq.write_table(tbl, p)
    return p


def _state(lake):
    t = lake.read_table()
    return {d: (s, n) for d, s, n in zip(t["doc_id"].to_pylist(), t["source"].to_pylist(), t["n_tok"].to_pylist())}


def test_xa_commit_applies_rollback_discards(ray_session, tmp_path):
    rows = [
        dict(op="U", offset=10, doc_id="doc0", xa_id=1, after=_img("doc0", [2, 2], "A")),
        dict(op="I", offset=11, doc_id="doc1", after=_img("doc1", [3], "B")),
        dict(op="U", offset=12, doc_id="doc2", xa_id=2, after=_img("doc2", [4], "C")),
        dict(op="XC", offset=13, xa_id=1),
        dict(op="XR", offset=14, xa_id=2),
    ]
    seg = _seg(rows)
    lake = _lake(tmp_path, ["doc0", "doc2"])
    p = _write(tmp_path, "s0.parquet", seg)
    m = replay_batch(lake, [p], ReplayConfig(num_partitions=4))
    assert m.hwm == (0, 14)
    st = _state(lake)
    assert st["doc0"] == ("A", 2)  # committed branch applied
    assert st["doc1"] == ("B", 1)
    assert st["doc2"] == ("base", 1)  # rolled-back branch discarded


def test_xa_unresolved_branch_holds_ack(ray_session, tmp_path):
    rows = [
        dict(op="I", offset=10, doc_id="doc5", after=_img("doc5", [1], "X")),
        dict(op="U", offset=12, doc_id="doc5", xa_id=7, after=_img("doc5", [9, 9], "Y")),
        dict(op="I", offset=13, doc_id="doc8", after=_img("doc8", [5], "Z")),
    ]
    seg = _seg(rows)
    plan = plan_batch([_write(tmp_path, "s0.parquet", seg)], (-1, -1))
    # ack must stop BELOW the unresolved xa event at offset 12 — the
    # committed event at 13 after it must also wait (single watermark)
    assert plan.ack == (0, 10)
    assert plan.xa_commits == ()


@pytest.mark.parametrize("verdict,expect", [("XC", ("Y", 2)), ("XR", ("X", 1))])
def test_xa_verdict_spanning_micro_batches(ray_session, tmp_path, verdict, expect):
    """Branch events in batch k, verdict in batch k+1: nothing of the
    branch may apply in batch k; the verdict batch applies or discards."""
    s0 = _seg(
        [
            dict(op="I", offset=10, doc_id="doc5", after=_img("doc5", [1], "X")),
            dict(op="U", offset=12, doc_id="doc5", xa_id=7, after=_img("doc5", [9, 9], "Y")),
        ]
    )
    s1 = _seg(
        [
            dict(op=verdict, offset=20, xa_id=7),
            dict(op="I", offset=21, doc_id="doc6", after=_img("doc6", [3], "W")),
        ]
    )
    lake = _lake(tmp_path, [])
    p0 = _write(tmp_path, "s0.parquet", s0)
    p1 = _write(tmp_path, "s1.parquet", s1)
    m1 = replay_batch(lake, [p0], ReplayConfig(num_partitions=4))
    assert m1.hwm == (0, 10)  # held below the unresolved branch
    assert _state(lake)["doc5"] == ("X", 1)
    m2 = replay_batch(lake, [p0, p1], ReplayConfig(num_partitions=4))
    assert m2.hwm == (0, 21)
    st = _state(lake)
    assert st["doc5"] == expect
    assert st["doc6"] == ("W", 1)
    # duplicate replay is a no-op (D2)
    m3 = replay_batch(lake, [p0, p1], ReplayConfig(num_partitions=4))
    assert m3.version == m2.version and _state(lake)["doc5"] == expect


def test_xa_full_replay_matches_serial_oracle(ray_session, tmp_path):
    """Mixed committed/rolled-back/unverdicted branches through the
    multi-batch replay loop == the serial oracle."""
    from clever_canal_ray.oracle import apply_events_serial

    rng = np.random.default_rng(7)
    rows = []
    off = 10
    docs = [f"doc{i}" for i in range(20)]
    for i in range(300):
        d = docs[int(rng.integers(0, 20))]
        r = dict(
            op=str(rng.choice(["I", "U", "D"], p=[0.3, 0.5, 0.2])),
            offset=off,
            doc_id=d,
        )
        if r["op"] != "D":
            r["after"] = _img(d, [int(x) for x in rng.integers(0, 99, 1 + i % 4)], f"s{i}")
        if i % 5 == 2:
            r["xa_id"] = int(i // 30)  # branches 0..9
        rows.append(r)
        off += int(rng.integers(1, 4))
    # verdicts for every branch at the tail (the unresolved-branch hold
    # is covered by test_xa_unresolved_branch_holds_ack — here the full
    # log must drain)
    for b in range(10):
        rows.append(dict(op=("XR" if b % 3 == 0 else "XC"), offset=off, xa_id=b))
        off += 1
    seg = _seg(rows)
    # split into 3 files to force verdict-after-branch deferrals
    k = len(rows) // 3
    paths = [
        _write(tmp_path, f"s{i}.parquet", seg.slice(i * k, k if i < 2 else len(rows) - 2 * k))
        for i in range(3)
    ]
    lake = _lake(tmp_path, docs)
    replay(lake, paths, ReplayConfig(num_partitions=4, segments_per_batch=1))
    expect = apply_events_serial(
        pa.Table.from_pylist([_img(d, [1], "base") for d in docs], schema=LAKE_SCHEMA_V0),
        [seg],
    )
    got = lake.read_table().sort_by("doc_id")
    assert got["doc_id"].to_pylist() == expect["doc_id"].to_pylist()
    assert got["source"].to_pylist() == expect["source"].to_pylist()
    assert got["tokens"].to_pylist() == expect["tokens"].to_pylist()
