"""DDL verb coverage beyond add/widen (DruidDdlParser.parse:22-160
classification): rename_column / drop_column with merge-on-read rename
resolution, and the registry verbs create/drop/rename_table on
multi-table lakes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import (
    EventLogSpec,
    generate_events,
    generate_lake,
    write_fixture,
    write_multi_table_fixture,
)
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.schema import (
    SchemaEvolutionError,
    apply_ddl,
    journal_renames,
    lake_schema,
)
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


def test_apply_ddl_rename_drop_rules():
    s = lake_schema([])
    s2 = apply_ddl(s, {"op": "rename_column", "from": "source", "to": "origin"})
    assert [f.name for f in s2] == ["doc_id", "tokens", "n_tok", "origin"]
    s3 = apply_ddl(s2, {"op": "drop_column", "name": "origin"})
    assert [f.name for f in s3] == ["doc_id", "tokens", "n_tok"]
    with pytest.raises(SchemaEvolutionError):
        apply_ddl(s, {"op": "rename_column", "from": "doc_id", "to": "pk"})
    with pytest.raises(SchemaEvolutionError):
        apply_ddl(s, {"op": "drop_column", "name": "doc_id"})
    with pytest.raises(SchemaEvolutionError):
        apply_ddl(s, {"op": "rename_column", "from": "nope", "to": "x"})
    # re-adding a dropped column is rejected (old files could resurrect it)
    with pytest.raises(SchemaEvolutionError):
        lake_schema(
            [
                {"op": "drop_column", "name": "source"},
                {"op": "add_column", "name": "source", "type": "string"},
            ]
        )


def test_journal_renames_chains():
    j = [
        {"op": "rename_column", "from": "a", "to": "b"},
        {"op": "rename_column", "from": "b", "to": "c"},
        {"op": "rename_column", "from": "x", "to": "y"},
        {"op": "drop_column", "name": "y"},
    ]
    assert journal_renames(j) == {"a": "c", "b": "c"}


def test_replay_with_rename_and_drop_matches_oracle(ray_session, tmp_path):
    """Mid-stream rename_column + drop_column over multi-batch replay:
    files written before each DDL resolve through the rename map at
    merge-on-read; final state equals the serial oracle."""
    spec = EventLogSpec(
        seed=31,
        n_initial_docs=150,
        n_events=1200,
        n_segments=6,
        ddls=(
            (0.3, {"op": "rename_column", "from": "source", "to": "origin"}),
            (0.7, {"op": "drop_column", "name": "n_tok"}),
        ),
    )
    root = tmp_path / "fx"
    info = write_fixture(spec, str(root))
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    m = replay(lake, info["segment_paths"], ReplayConfig(num_partitions=4, segments_per_batch=2))
    assert [f.name for f in m.payload_schema] == ["doc_id", "tokens", "origin"]
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(generate_lake(spec), segs)
    assert [f.name for f in oracle.schema] == ["doc_id", "tokens", "origin"]
    assert_tables_equal(lake.read_table(), oracle)
    # origin values survive the rename for rows written before it
    assert lake.read_table()["origin"].null_count < lake.read_table().num_rows


def test_registry_verbs_create_rename_drop_table(ray_session, tmp_path):
    """create_table registers a fresh pid range mid-stream; rename_table
    moves the registry entry; drop_table removes the table and its
    partitions from the manifest."""
    spec = EventLogSpec(seed=33, n_initial_docs=200, n_events=1500, n_segments=6)
    root = tmp_path / "fx"
    info = write_multi_table_fixture(spec, str(root), n_tables=2)
    lake = Lake.create_multi(str(tmp_path / "lake"), info["initials"], partitions_per_table=4)
    replay(lake, info["segment_paths"], ReplayConfig(segments_per_batch=3))
    base_rows_t1 = lake.read_table(table="lake.t1").num_rows

    # registry DDLs applied via a direct commit (control events)
    m = lake.current()
    m = lake.commit_batch(
        m,
        batch_id=m.last_batch_id + 1,
        new_hwm=(m.hwm[0], m.hwm[1] + 1),
        touched={},
        new_ddls=[
            {"position": [m.hwm[0], m.hwm[1] + 1],
             "ddl": {"op": "create_table", "table": "lake.t2", "num_partitions": 4}},
            {"position": [m.hwm[0], m.hwm[1] + 1],
             "ddl": {"op": "rename_table", "table": "lake.t0", "to": "lake.t0_renamed"}},
        ],
    )
    assert set(m.tables) == {"lake.t0_renamed", "lake.t1", "lake.t2"}
    # t2's range is beyond every existing pid
    t2 = m.tables["lake.t2"]
    assert t2["base_pid"] >= 8
    assert m.num_partitions >= t2["base_pid"] + t2["num_partitions"]
    # renamed table keeps its state
    assert lake.read_table(table="lake.t0_renamed").num_rows > 0

    m2 = lake.commit_batch(
        m,
        batch_id=m.last_batch_id + 1,
        new_hwm=(m.hwm[0], m.hwm[1] + 1),
        touched={},
        new_ddls=[{"position": [m.hwm[0], m.hwm[1] + 1],
                   "ddl": {"op": "drop_table", "table": "lake.t0_renamed"}}],
    )
    assert set(m2.tables) == {"lake.t1", "lake.t2"}
    lo, hi = 0, 4  # t0's old range
    assert not any(lo <= int(p) < hi for p in m2.partitions)
    # survivors untouched
    assert lake.read_table(table="lake.t1").num_rows == base_rows_t1
    # a later create does NOT reuse the dropped range (files may survive)
    m3 = lake.commit_batch(
        m2,
        batch_id=m2.last_batch_id + 1,
        new_hwm=(m2.hwm[0], m2.hwm[1] + 1),
        touched={},
        new_ddls=[{"position": [m2.hwm[0], m2.hwm[1] + 1],
                   "ddl": {"op": "create_table", "table": "lake.t3", "num_partitions": 2}}],
    )
    assert m3.tables["lake.t3"]["base_pid"] >= 12


def test_retired_name_reuse_rejected():
    """A renamed-away source name is retired like a dropped one: re-add
    or rename-target reuse would resurrect old files' physical values
    (code-review regression)."""
    with pytest.raises(SchemaEvolutionError):
        lake_schema(
            [
                {"op": "rename_column", "from": "source", "to": "origin"},
                {"op": "add_column", "name": "source", "type": "string"},
            ]
        )
    with pytest.raises(SchemaEvolutionError):
        lake_schema(
            [
                {"op": "rename_column", "from": "source", "to": "origin"},
                {"op": "rename_column", "from": "n_tok", "to": "source"},
            ]
        )


def test_multi_table_rename_column_keeps_values(ray_session, tmp_path):
    """rename_column in a MULTI-table journal: the union schema must
    carry the rename map (widen_union merges metadata) so events —
    physically under the original name — keep their values
    (code-review regression: values were silently nulled)."""
    import pyarrow.compute as pc

    from clever_canal_ray.fixtures.generator import retable_by_key, split_lake_by_key

    spec = EventLogSpec(
        seed=37, n_initial_docs=150, n_events=1200, n_segments=5,
        ddls=((0.4, {"op": "rename_column", "from": "source", "to": "origin",
                     "table": "lake.t0"}),),
    )
    info = write_multi_table_fixture(spec, str(tmp_path / "fx"), n_tables=2)
    lake = Lake.create_multi(str(tmp_path / "lake"), info["initials"], partitions_per_table=4)
    m = replay(lake, info["segment_paths"], ReplayConfig(segments_per_batch=2))
    assert [f.name for f in m.schema_of_table("lake.t0")] == ["doc_id", "tokens", "n_tok", "origin"]

    segs, _ = generate_events(spec)
    retabled = [retable_by_key(t, 2) for t in segs]
    initials = split_lake_by_key(generate_lake(spec), 2)
    for name in ("lake.t0", "lake.t1"):
        sub = [t.filter(pc.equal(t["table"], name)) for t in retabled]
        oracle = apply_events_serial(initials[name], sub)
        assert_tables_equal(lake.read_table(table=name), oracle)
    # the renamed column genuinely carries post-rename event values
    t0 = lake.read_table(table="lake.t0")
    assert t0["origin"].null_count < t0.num_rows


def test_index_and_dcl_verbs_are_journaled_noops():
    """CREATE/DROP INDEX and DCL verbs (DruidDdlParser C_INDEX/D_INDEX/
    DCL) must not change the schema and must not halt journal replay."""
    from clever_canal_ray.schema import LAKE_SCHEMA_V0, apply_ddl, lake_schema

    s = apply_ddl(LAKE_SCHEMA_V0, {"op": "create_index", "name": "i1", "columns": ["source"]})
    assert s == LAKE_SCHEMA_V0
    s = apply_ddl(s, {"op": "drop_index", "name": "i1"})
    assert s == LAKE_SCHEMA_V0
    s = apply_ddl(s, {"op": "dcl", "sql": "GRANT SELECT ON lake.sequences TO ro"})
    assert s == LAKE_SCHEMA_V0
    # mixed journal: index verbs interleaved with real column DDLs
    j = [
        {"op": "create_index", "name": "i1", "columns": ["source"]},
        {"op": "add_column", "name": "lang", "type": "string"},
        {"op": "drop_index", "name": "i1"},
        {"op": "widen_type", "name": "n_tok", "to": "int64"},
    ]
    out = lake_schema(j)
    assert out.field("lang").type == pa.string()
    assert out.field("n_tok").type == pa.int64()


def test_decimal_and_timestamp_widenings():
    """int64→decimal (unsigned-BIGINT promotion endpoint) and timestamp
    unit widenings are legal; narrowing / cross-kind stays illegal."""
    from clever_canal_ray.schema import (
        LAKE_SCHEMA_V0,
        SchemaEvolutionError,
        apply_ddl,
        upcast_table,
    )

    s = apply_ddl(LAKE_SCHEMA_V0, {"op": "widen_type", "name": "n_tok", "to": "int64"})
    s = apply_ddl(s, {"op": "widen_type", "name": "n_tok", "to": "decimal"})
    assert s.field("n_tok").type == pa.decimal128(38, 0)
    s = apply_ddl(s, {"op": "add_column", "name": "seen_at", "type": "timestamp[s]"})
    s = apply_ddl(s, {"op": "widen_type", "name": "seen_at", "to": "timestamp[ms]"})
    assert s.field("seen_at").type == pa.timestamp("ms")
    with pytest.raises(SchemaEvolutionError):
        apply_ddl(s, {"op": "widen_type", "name": "seen_at", "to": "timestamp[s]"})
    with pytest.raises(SchemaEvolutionError):
        apply_ddl(s, {"op": "widen_type", "name": "source", "to": "decimal"})
    # merge-on-read up-cast of a v0 file to the widened schema
    old = pa.Table.from_pydict(
        {"doc_id": ["a"], "tokens": [[1, 2]], "n_tok": [2], "source": ["web"]},
        schema=LAKE_SCHEMA_V0,
    )
    up = upcast_table(old, s)
    assert up["n_tok"].type == pa.decimal128(38, 0)
    assert up["n_tok"].to_pylist()[0] == 2
    assert up["seen_at"].null_count == 1


def test_replay_green_through_index_verb(ray_session, tmp_path):
    """A stream carrying a CREATE INDEX event replays end-to-end and
    converges to the serial oracle (the verb must not stall replay)."""
    from clever_canal_ray.fixtures.generator import (
        EventLogSpec,
        generate_events,
        generate_lake,
        write_fixture,
    )
    from clever_canal_ray.oracle import apply_events_serial
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake
    from tests.util import assert_tables_equal

    spec = EventLogSpec(
        seed=31, n_initial_docs=80, n_events=900, n_segments=3,
        include_before=False,
        ddls=(
            (0.3, {"op": "create_index", "name": "idx", "columns": ["source"]}),
            (0.6, {"op": "add_column", "name": "lang", "type": "string"}),
            (0.8, {"op": "drop_index", "name": "idx"}),
        ),
    )
    info = write_fixture(spec, str(tmp_path / "fx"))
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    from clever_canal_ray.config import ReplayConfig

    m = replay(lake, info["segment_paths"], ReplayConfig(num_partitions=4, segments_per_batch=2))
    assert len(m.ddl_journal) == 3  # all three verbs journaled
    segs, _ = generate_events(spec)
    assert_tables_equal(lake.read_table(), apply_events_serial(generate_lake(spec), segs))
