"""XA-aware plan sidecars (round-4): the `.plan.json` sidecar carries
per-branch data positions + verdicts so `plan_batch`'s XA ack fixpoint
runs over sidecar data — O(files) planning — instead of falling back
to a driver column scan of the whole window on every micro-batch.
Legacy sidecars (has_xa flag without the "xa" block) still force the
scan (fallback retained, exercised by tests/test_xa.py's raw files).
"""

import json

import numpy as np
import pyarrow.parquet as pq
import pytest

from test_xa import _img, _lake, _seg, _state

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import segment_plan_metadata
import sys

from clever_canal_ray.pipelines.replay import plan_batch, replay

replay_mod = sys.modules["clever_canal_ray.pipelines.replay"]


def _write_with_sidecar(tmp_path, name, tbl):
    p = str(tmp_path / name)
    pq.write_table(tbl, p)
    with open(p + ".plan.json", "w") as f:
        f.write(segment_plan_metadata(tbl))
    return p


def _mixed_xa_segments(tmp_path, n_files=3, legacy=False):
    """300-event stream over 20 docs, branches 0..9, verdicts at the
    tail (XR for b%3==0), split so branch events land files before
    their verdicts."""
    rng = np.random.default_rng(7)
    rows, off = [], 10
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
            r["xa_id"] = int(i // 30)
        rows.append(r)
        off += int(rng.integers(1, 4))
    for b in range(10):
        rows.append(dict(op=("XR" if b % 3 == 0 else "XC"), offset=off, xa_id=b))
        off += 1
    seg = _seg(rows)
    k = len(rows) // n_files
    paths = []
    for i in range(n_files):
        part = seg.slice(i * k, k if i < n_files - 1 else len(rows) - (n_files - 1) * k)
        p = _write_with_sidecar(tmp_path, f"s{i}.parquet", part)
        if legacy:
            # strip the round-4 xa block: the legacy presence-flag form
            with open(p + ".plan.json") as f:
                m = json.load(f)
            m.pop("xa", None)
            with open(p + ".plan.json", "w") as f:
                json.dump(m, f)
        paths.append(p)
    return paths, seg, docs


def test_sidecar_xa_plan_matches_scan(ray_session, tmp_path, monkeypatch):
    """The sidecar fixpoint must produce the identical plan (ack,
    xa_commits, ddls, truncates) as the fallback column scan, at the
    fresh HWM and at mid-stream HWMs (prefix-replay positions)."""
    paths, seg, _ = _mixed_xa_segments(tmp_path)
    probe_hwms = [(-1, -1)]
    # a few real positions from the stream as resume points
    offs = sorted(seg["offset"].to_pylist())
    probe_hwms += [(0, offs[len(offs) // 3]), (0, offs[2 * len(offs) // 3])]
    for hwm in probe_hwms:
        fast = plan_batch(paths, hwm)
        with monkeypatch.context() as mctx:
            mctx.setattr(
                "clever_canal_ray.sources.segments.load_segment_plan", lambda p: None
            )
            scan = plan_batch(paths, hwm)
        assert fast.ack == scan.ack, hwm
        assert fast.xa_commits == scan.xa_commits, hwm
        assert fast.new_ddls == scan.new_ddls, hwm
        assert fast.truncates == scan.truncates, hwm


def test_sidecar_xa_no_full_scan(ray_session, tmp_path, monkeypatch):
    """Planning a sidecar-bearing XA stream must never open the
    multi-file dataset scan (the O(events) fallback). Straddle scans of
    a single file (GTID watermark) remain allowed — they are O(1 file)."""
    paths, _, _ = _mixed_xa_segments(tmp_path)
    real_dataset = replay_mod.pds.dataset
    calls = []

    def counting_dataset(src, *a, **kw):
        if isinstance(src, (list, tuple)) and len(src) > 1:
            calls.append(src)
        return real_dataset(src, *a, **kw)

    monkeypatch.setattr(replay_mod.pds, "dataset", counting_dataset)
    plan = plan_batch(paths, (-1, -1))
    assert plan.ack is not None
    assert calls == [], "sidecar XA stream fell back to the multi-file scan"


def test_sidecar_xa_legacy_falls_back(ray_session, tmp_path, monkeypatch):
    """has_xa sidecars without the xa block (legacy writers) still plan
    correctly via the fallback scan."""
    paths, _, _ = _mixed_xa_segments(tmp_path, legacy=True)
    real_dataset = replay_mod.pds.dataset
    calls = []

    def counting_dataset(src, *a, **kw):
        if isinstance(src, (list, tuple)) and len(src) > 1:
            calls.append(src)
        return real_dataset(src, *a, **kw)

    monkeypatch.setattr(replay_mod.pds, "dataset", counting_dataset)
    plan = plan_batch(paths, (-1, -1))
    assert plan.ack is not None
    assert len(calls) >= 1  # the scan ran — fallback retained


def test_sidecar_xa_unresolved_holds_ack(ray_session, tmp_path):
    rows = [
        dict(op="I", offset=10, doc_id="doc5", after=_img("doc5", [1], "X")),
        dict(op="U", offset=12, doc_id="doc5", xa_id=7, after=_img("doc5", [9, 9], "Y")),
        dict(op="I", offset=13, doc_id="doc8", after=_img("doc8", [5], "Z")),
    ]
    p = _write_with_sidecar(tmp_path, "s0.parquet", _seg(rows))
    plan = plan_batch([p], (-1, -1))
    assert plan.ack == (0, 10)
    assert plan.xa_commits == ()


def test_sidecar_xa_replay_matches_serial_oracle(ray_session, tmp_path):
    """Full multi-batch replay over sidecar-bearing XA segments == the
    serial oracle (same stream as test_xa_full_replay_matches_serial_oracle,
    planned via sidecars instead of the scan)."""
    import pyarrow as pa

    from clever_canal_ray.oracle import apply_events_serial
    from clever_canal_ray.schema import LAKE_SCHEMA_V0

    paths, seg, docs = _mixed_xa_segments(tmp_path)
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
