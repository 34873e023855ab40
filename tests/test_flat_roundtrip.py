"""FlatMessage round trip: events → write_flat_messages JSONL →
flat_messages_to_segments → replay converges to the same final state
as replaying the original segments (rekey reconstruction from the
change mask; DDL replay from FlatMessage.sql)."""

import pyarrow as pa
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_events, generate_lake, write_fixture
from clever_canal_ray.functions.cdc_ops import write_flat_messages
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.schema import lake_schema
from clever_canal_ray.sources.flat_json import flat_messages_to_segments
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


def _roundtrip(spec, tmp_path, payload):
    import ray

    root = tmp_path / "fx"
    write_fixture(spec, str(root))
    segs, _ = generate_events(spec)

    # produce the MQ-side JSONL (one file per segment, ordered names)
    json_dir = tmp_path / "flat"
    for i, seg in enumerate(segs):
        d = json_dir / f"seg-{i:05d}"
        write_flat_messages(ray.data.from_arrow(seg), str(d))
        # write_json emits one or more files per dir; re-join to one
        # ordered file per segment for deterministic MQ-order replay
        import os

        parts = sorted(os.listdir(d))
        with open(json_dir / f"{i:05d}.jsonl", "w") as out:
            for p in parts:
                with open(d / p) as f:
                    out.write(f.read())
        import shutil

        shutil.rmtree(d)

    seg_paths = flat_messages_to_segments(
        str(json_dir), str(tmp_path / "segments2"), payload=payload
    )
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    replay(lake, seg_paths, ReplayConfig(num_partitions=4, segments_per_batch=2))
    return lake.read_table(), apply_events_serial(generate_lake(spec), segs)


def test_flat_roundtrip_with_rekeys(ray_session, tmp_path):
    spec = EventLogSpec(
        seed=31, n_initial_docs=150, n_events=1200, n_segments=4, rekey_frac=0.06
    )
    got, expect = _roundtrip(spec, tmp_path, payload=lake_schema([]))
    assert_tables_equal(got, expect)


def test_flat_roundtrip_with_ddl_auto_payload(ray_session, tmp_path):
    """payload=None: the physical layout derives from the stream's OWN
    DDL records — values written into the added column survive."""
    ddl = {"op": "add_column", "name": "lang", "type": "string"}
    spec = EventLogSpec(
        seed=32, n_initial_docs=100, n_events=800, n_segments=4, ddls=((0.5, ddl),)
    )
    got, expect = _roundtrip(spec, tmp_path, payload=None)
    assert_tables_equal(got, expect)


def test_flat_roundtrip_with_truncate(ray_session, tmp_path):
    spec = EventLogSpec(
        seed=33, n_initial_docs=120, n_events=900, n_segments=4, truncates=(0.5,)
    )
    got, expect = _roundtrip(spec, tmp_path, payload=None)
    assert_tables_equal(got, expect)


def test_flat_rekey_schema_uniform_across_segments(ray_session, tmp_path):
    """include_rekey is decided stream-wide: a file WITHOUT PK-change
    rows still gets the new_doc_id column when any other file has one
    (mixed segment schemas would be rejected by replay)."""
    import pyarrow.parquet as pq

    from clever_canal_ray.sources.flat_json import flat_messages_to_segments

    d = tmp_path / "flat"
    d.mkdir()
    row = '{{"database":"lake","table":"sequences","type":"{op}","es":1,"sql":null,"data":{data},"old":{old}}}\n'
    img = '{{"doc_id":"{k}","tokens":[1],"n_tok":1,"source":"s"}}'
    (d / "00000.jsonl").write_text(
        row.format(op="U", data=img.format(k="docB"), old=img.format(k="docA"))  # rekey
    )
    (d / "00001.jsonl").write_text(
        row.format(op="I", data=img.format(k="docC"), old="null")
    )
    paths = flat_messages_to_segments(str(d), str(tmp_path / "seg"))
    for p in paths:
        assert "new_doc_id" in pq.read_schema(p).names


def test_flat_rejects_stripped_stream_directory_level(ray_session, tmp_path):
    """Every DELETE keyless across MANY SMALL files (each under any
    per-file threshold) still trips the stripped-stream refusal."""
    from clever_canal_ray.sources.flat_json import flat_messages_to_segments

    d = tmp_path / "flat"
    d.mkdir()
    del_row = '{"database":"lake","table":"sequences","type":"D","es":1,"sql":null,"data":null,"old":null}\n'
    ins_row = '{"database":"lake","table":"sequences","type":"I","es":1,"sql":null,"data":{"doc_id":"a","tokens":[1],"n_tok":1,"source":"s"},"old":null}\n'
    for i in range(4):
        (d / f"{i:05d}.jsonl").write_text(ins_row + del_row * 2)  # 2 deletes/file
    with pytest.raises(ValueError, match="without before-images"):
        flat_messages_to_segments(str(d), str(tmp_path / "seg"))


def test_flat_rejects_unknown_types(ray_session, tmp_path):
    from clever_canal_ray.sources.flat_json import flat_file_to_events

    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"database":"lake","table":"sequences","type":"XR","es":0,"data":null,"old":null}\n'
    )
    with pytest.raises(ValueError, match="unsupported types"):
        flat_file_to_events(str(p), 0)


def test_producer_refuses_unresolved_xa(ray_session, tmp_path):
    import ray

    from clever_canal_ray.functions.cdc_ops import write_flat_messages

    spec = EventLogSpec(seed=34, n_initial_docs=40, n_events=200, n_segments=2)
    segs, _ = generate_events(spec)
    seg = segs[0]
    xa = pa.array([7] + [None] * (seg.num_rows - 1), pa.int64())
    seg = seg.append_column("xa_id", xa)
    with pytest.raises(Exception, match="XA"):
        write_flat_messages(ray.data.from_arrow(seg), str(tmp_path / "o"))
