"""Primary-key-change updates (new_doc_id): a U event whose key changed
applies as delete(old) + upsert(new) — LogEventConvert.parseOneRow
key-diff / Column.isKey analog. Covers a hand-built minimal stream
(rekey, rekey-then-resurrect-old, rekey-then-update-new) and full
replay convergence vs the serial oracle under rekey_frac."""

import numpy as np
import pyarrow as pa
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_lake, write_fixture
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.schema import LAKE_SCHEMA_V0, event_schema
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


def _hand_stream(tmp_path):
    """doc0 exists in the lake. Events (one txn):
    off 10: U doc0 -> doc9 (rekey, payload A)
    off 11: I doc1           (plain insert)
    off 12: U doc9 (payload B)   — update the NEW key
    off 13: I doc0 (payload C)   — resurrect the OLD key
    Final: doc0=C, doc1, doc9=B.
    """
    sch = event_schema(LAKE_SCHEMA_V0, include_rekey=True)

    def img(doc, tokens, src):
        # after.doc_id carries the post-image key (for a rekey row,
        # the NEW pk — RowData.afterColumns semantics); doc_id is
        # non-nullable in the payload schema
        return {"doc_id": doc, "tokens": tokens, "n_tok": len(tokens), "source": src}

    rows = [
        dict(op="U", doc_id="doc0", new_doc_id="doc9", after=img("doc9", [1, 2], "A")),
        dict(op="I", doc_id="doc1", new_doc_id=None, after=img("doc1", [3], "web")),
        dict(op="U", doc_id="doc9", new_doc_id=None, after=img("doc9", [4, 5, 6], "B")),
        dict(op="I", doc_id="doc0", new_doc_id=None, after=img("doc0", [7], "C")),
    ]
    n = len(rows)
    full = [
        {
            "segment_id": 0,
            "offset": 10 + i,
            "txn_id": 0,
            "seq_in_txn": i,
            "txn_commit": i == n - 1,
            "execute_ts": 1_700_000_000_000 + i,
            "op": r["op"],
            "table": "lake.sequences",
            "doc_id": r["doc_id"],
            "schema_version": 0,
            "ddl": None,
            "new_doc_id": r["new_doc_id"],
            "before": None,
            "after": r["after"],
        }
        for i, r in enumerate(rows)
    ]
    t = pa.Table.from_pylist(full, schema=sch)
    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    import pyarrow.parquet as pq

    path = str(seg_dir / "segment-00000.parquet")
    pq.write_table(t, path)
    return t, path


def test_rekey_hand_stream_semantics(ray_session, tmp_path):
    lake_tbl = pa.Table.from_pylist(
        [{"doc_id": "doc0", "tokens": [9], "n_tok": 1, "source": "init"}],
        schema=LAKE_SCHEMA_V0,
    )
    t, path = _hand_stream(tmp_path)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    replay(lake, [path], ReplayConfig(num_partitions=4))
    got = lake.read_table().sort_by("doc_id")
    assert got["doc_id"].to_pylist() == ["doc0", "doc1", "doc9"]
    assert got["source"].to_pylist() == ["C", "web", "B"]
    assert got["tokens"].to_pylist() == [[7], [3], [4, 5, 6]]
    # engine result == serial oracle on the same stream
    assert_tables_equal(lake.read_table(), apply_events_serial(lake_tbl, [t]))


@pytest.mark.parametrize("sink_mode", ["compact", "delta"])
def test_rekey_replay_converges(ray_session, tmp_path, sink_mode):
    spec = EventLogSpec(
        seed=77,
        n_initial_docs=200,
        n_events=1500,
        n_segments=4,
        rekey_frac=0.15,
        include_before=False,
    )
    info = write_fixture(spec, str(tmp_path / "fx"))
    lake_tbl = generate_lake(spec)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode=sink_mode)
    replay(lake, info["segment_paths"], cfg)
    if sink_mode == "delta":
        lake.compact()
    from clever_canal_ray.fixtures.generator import generate_events

    segs, _ = generate_events(spec)
    # the fixture really exercised the path
    n_rekey = sum(
        1 for s in segs for v in s["new_doc_id"].to_pylist() if v is not None
    )
    assert n_rekey > 10
    assert_tables_equal(lake.read_table(), apply_events_serial(lake_tbl, segs))


def test_rekey_duplicate_replay_noop(ray_session, tmp_path):
    spec = EventLogSpec(
        seed=78, n_initial_docs=100, n_events=600, n_segments=3, rekey_frac=0.2,
        include_before=False,
    )
    info = write_fixture(spec, str(tmp_path / "fx"))
    lake_tbl = generate_lake(spec)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=3)
    m1 = replay(lake, info["segment_paths"], cfg)
    rows1 = lake.read_table().sort_by("doc_id")
    m2 = replay(lake, info["segment_paths"], cfg)
    assert m2.version == m1.version
    assert_tables_equal(lake.read_table(), rows1)


def test_before_image_chain_respects_rekey_vacancy():
    """ADVICE r2 regression: with include_before=True and rekey_frac>0, a
    rekey U vacates its OLD key — any later event re-targeting that old
    key must carry NO before-image (the row was removed), and an event
    at a key whose last writer was a plain I/U must carry exactly that
    writer's image."""
    from clever_canal_ray.fixtures.generator import generate_events
    from clever_canal_ray.schema import pack_position

    spec = EventLogSpec(
        seed=91, n_initial_docs=40, n_events=1500, n_segments=2,
        rekey_frac=0.4, include_before=True, p_insert=0.2, p_update=0.6,
        p_delete=0.2, hot_frac=0.2, hot_mass=0.9,  # heavy re-targeting
    )
    segs, _ = generate_events(spec)
    t = pa.concat_tables(segs)
    pos = pack_position(
        t["segment_id"].to_numpy(zero_copy_only=False),
        t["offset"].to_numpy(zero_copy_only=False),
    )
    order = np.argsort(pos)
    ops = np.asarray(t["op"].to_numpy(zero_copy_only=False), dtype=object)[order]
    docs = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=object)[order]
    newdocs = np.asarray(t["new_doc_id"].to_numpy(zero_copy_only=False), dtype=object)[order]
    before_valid = pa.compute.is_valid(t["before"].combine_chunks()).to_numpy(
        zero_copy_only=False
    )[order]
    n_rekey = int(sum(v is not None for v in newdocs))
    assert n_rekey > 20  # the fixture exercises the path

    # walk the stream keeping the live image state per key
    live: dict = {}  # doc -> True if an image exists at that key
    checked_vacated = 0
    for op, d, nd, bv in zip(ops, docs, newdocs, before_valid):
        if op not in ("I", "U", "D"):
            continue
        expect_before = live.get(d, d.startswith("doc0000000000"))  # initial keys < 40
        if op != "I":
            if not expect_before:
                assert not bv, f"stale before-image at vacated/missing key {d}"
                checked_vacated += 1
            else:
                assert bv, f"missing before-image at live key {d}"
        if nd is not None:  # rekey: old key vacated, new key live
            live[d] = False
            live[nd] = True
        elif op == "D":
            live[d] = False
        else:
            live[d] = True
    assert checked_vacated > 0  # at least one re-targeted vacated key
