"""Schema evolution (T3): add_column + widen_type mid-stream; old rows
up-cast on read, new rows native; oracle agrees (FIXTURES.md §5)."""

import pyarrow as pa
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_events, generate_lake, write_fixture
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.schema import SchemaEvolutionError, apply_ddl, lake_schema
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal

DDLS = (
    (0.4, {"op": "add_column", "table": "lake.sequences", "name": "lang", "type": "string", "nullable": True, "default": None}),
    (0.6, {"op": "widen_type", "table": "lake.sequences", "name": "tokens", "from": "list<int32>", "to": "list<int64>"}),
    (0.8, {"op": "widen_type", "table": "lake.sequences", "name": "n_tok", "from": "int32", "to": "int64"}),
)


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(seed=11, n_initial_docs=150, n_events=1200, n_segments=4, ddls=DDLS)
    root = tmp_path_factory.mktemp("fx_ddl")
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    return spec, info, lake_tbl, oracle


def test_schema_evolution_replay(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2)
    m = replay(lake, info["segment_paths"], cfg)
    assert m.schema_version == 3
    final = lake.read_table()
    assert final.schema.field("tokens").type == pa.list_(pa.int64())
    assert final.schema.field("n_tok").type == pa.int64()
    assert final.schema.field("lang").type == pa.string()
    assert_tables_equal(final, oracle)
    # journal replay reproduces the schema (TableMetaTSDB snapshot+replay)
    assert m.payload_schema == lake_schema([e["ddl"] for e in m.ddl_journal])


def test_old_rows_upcast_new_rows_native(ray_session, fx, tmp_path):
    spec, info, lake_tbl, oracle = fx
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=2)
    replay(lake, info["segment_paths"], ReplayConfig(num_partitions=2, segments_per_batch=4))
    final = lake.read_table()
    by_id = {r["doc_id"]: r for r in final.to_pylist()}
    # an untouched initial-lake row survives with lang=None (up-cast)
    oracle_rows = {r["doc_id"]: r for r in oracle.to_pylist()}
    untouched = [k for k in oracle_rows if k in by_id and oracle_rows[k].get("lang") is None]
    assert untouched, "expected some rows without the added column"
    assert by_id[untouched[0]]["lang"] is None


def test_illegal_ddl_rejected():
    s = lake_schema([])
    with pytest.raises(SchemaEvolutionError):
        apply_ddl(s, {"op": "widen_type", "name": "tokens", "from": "list<int64>", "to": "list<int32>"})
    with pytest.raises(SchemaEvolutionError):
        apply_ddl(s, {"op": "add_column", "name": "doc_id", "type": "string"})
    # drop_column became a supported verb (tests/test_ddl_verbs.py);
    # unknown verbs and PK drops stay rejected
    with pytest.raises(SchemaEvolutionError):
        apply_ddl(s, {"op": "drop_column", "name": "doc_id"})
    with pytest.raises(SchemaEvolutionError):
        apply_ddl(s, {"op": "alter_engine", "name": "source"})


def test_base_schema_seed_replaces_v0():
    """base_schema (RowsLogBuffer.fetchValue type-family analog): a
    first-entry seed replaces the v0 tokenized base with an arbitrary
    user-table shape; downstream widen/rename machinery applies on top;
    anywhere but first is illegal."""
    import pyarrow as pa

    base = {
        "op": "base_schema",
        "fields": [
            ["doc_id", "string"],
            ["bal", "int64"],
            ["updated_at", "timestamp[s]"],
            ["payload", "binary"],
        ],
    }
    s = lake_schema([base])
    assert s.field("doc_id").type == pa.string() and not s.field("doc_id").nullable
    assert s.field("bal").type == pa.int64()
    assert s.field("payload").type == pa.binary()
    s2 = lake_schema(
        [
            base,
            {"op": "widen_type", "name": "bal", "to": "decimal"},
            {"op": "widen_type", "name": "updated_at", "to": "timestamp[ms]"},
            {"op": "add_column", "name": "note", "type": "string"},
        ]
    )
    assert s2.field("bal").type == pa.decimal128(38, 0)
    assert s2.field("updated_at").type == pa.timestamp("ms")
    assert s2.field("note").type == pa.string()
    with pytest.raises(SchemaEvolutionError):
        lake_schema([{"op": "add_column", "name": "x", "type": "int32"}, base])
    with pytest.raises(SchemaEvolutionError):
        lake_schema([{"op": "base_schema", "fields": [["bal", "int64"]]}])  # no doc_id
    with pytest.raises(SchemaEvolutionError):
        lake_schema([{"op": "base_schema", "fields": [["doc_id", "string"], ["doc_id", "string"]]}])
