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


def test_flat_roundtrip_with_ddl(ray_session, tmp_path):
    ddl = {"op": "add_column", "name": "lang", "type": "string"}
    spec = EventLogSpec(
        seed=32, n_initial_docs=100, n_events=800, n_segments=4, ddls=((0.5, ddl),)
    )
    got, expect = _roundtrip(spec, tmp_path, payload=lake_schema([ddl]))
    assert_tables_equal(got, expect)


def test_flat_rejects_unknown_types(ray_session, tmp_path):
    from clever_canal_ray.sources.flat_json import flat_file_to_events

    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"database":"lake","table":"sequences","type":"XR","es":0,"data":null,"old":null}\n'
    )
    with pytest.raises(ValueError, match="unsupported types"):
        flat_file_to_events(str(p), 0)
