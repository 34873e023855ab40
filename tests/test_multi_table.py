"""Multi-table lakes: one mixed stream routed by the ``table`` column
into per-table partitioned state under ONE manifest (reference routing:
Header.schemaName/tableName, EntryProtocol.proto:80-113; per-table meta
TableMetaCache.java:45-76). The fixture routes doc key % N so each
table's final state equals the single-table serial oracle partitioned
by the same rule."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import (
    EventLogSpec,
    generate_events,
    generate_lake,
    write_multi_table_fixture,
)
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal

DDL_T0 = {"op": "add_column", "name": "lang", "type": "string", "table": "lake.t0"}


def _keys_mod(table: pa.Table, n: int) -> np.ndarray:
    return (
        pd.Series(table["doc_id"].to_numpy(zero_copy_only=False)).str.slice(3).astype(np.int64) % n
    ).to_numpy()


def _oracle_split(spec: EventLogSpec, n_tables: int):
    """Serial single-table oracle partitioned by key % n_tables; table
    t_i keeps only the columns its own journal evolved."""
    segs, _ = generate_events(spec)
    full = apply_events_serial(generate_lake(spec), segs)
    km = _keys_mod(full, n_tables)
    return {i: full.filter(pa.array(km == i)) for i in range(n_tables)}


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(
        seed=23, n_initial_docs=300, n_events=2500, n_segments=6, ddls=((0.5, DDL_T0),)
    )
    root = tmp_path_factory.mktemp("fx_multi")
    info = write_multi_table_fixture(spec, str(root), n_tables=2)
    return spec, info


def test_multi_table_replay_matches_partitioned_oracle(ray_session, fx, tmp_path):
    spec, info = fx
    lake = Lake.create_multi(str(tmp_path / "lake"), info["initials"], partitions_per_table=4)
    m = replay(lake, info["segment_paths"], ReplayConfig(segments_per_batch=2))
    oracles = _oracle_split(spec, 2)

    # t0 got the DDL: schema has `lang`; t1 stayed at v0
    assert [f.name for f in m.schema_of_table("lake.t0")] == ["doc_id", "tokens", "n_tok", "source", "lang"]
    assert [f.name for f in m.schema_of_table("lake.t1")] == ["doc_id", "tokens", "n_tok", "source"]

    t0 = lake.read_table(table="lake.t0")
    assert_tables_equal(t0, oracles[0])
    t1 = lake.read_table(table="lake.t1")
    assert_tables_equal(t1, oracles[1].drop_columns(["lang"]))
    # the per-table DDL journal routed only to its target
    assert len(m.tables["lake.t0"]["ddl_journal"]) == 1
    assert len(m.tables["lake.t1"]["ddl_journal"]) == 0


def test_multi_table_pipelined_delta_converges(ray_session, fx, tmp_path):
    spec, info = fx
    lake = Lake.create_multi(str(tmp_path / "lake"), info["initials"], partitions_per_table=4)
    replay(
        lake,
        info["segment_paths"],
        ReplayConfig(segments_per_batch=2, sink_mode="delta", pipeline_depth=3),
    )
    lake.compact()
    m = lake.current()
    assert all(len(i["files"]) == 1 for i in m.partitions.values())
    oracles = _oracle_split(spec, 2)
    assert_tables_equal(lake.read_table(table="lake.t0"), oracles[0])
    assert_tables_equal(lake.read_table(table="lake.t1"), oracles[1].drop_columns(["lang"]))


def test_multi_table_read_dataset_matches_read_table(ray_session, fx, tmp_path):
    spec, info = fx
    lake = Lake.create_multi(str(tmp_path / "lake"), info["initials"], partitions_per_table=4)
    replay(lake, info["segment_paths"], ReplayConfig(segments_per_batch=3, sink_mode="delta"))
    for name in ("lake.t0", "lake.t1"):
        got = lake.read_dataset(table=name).to_pandas()
        want = lake.read_table(table=name).to_pandas()
        assert len(got) == len(want)
        assert sorted(got.columns) == sorted(want.columns)
        a = got.sort_values("doc_id").reset_index(drop=True)
        b = want.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_series_equal(a["n_tok"], b["n_tok"], check_dtype=False)
    # union read covers both tables at the union schema
    union = lake.read_dataset()
    total = union.count()
    assert total == lake.read_table(table="lake.t0").num_rows + lake.read_table(table="lake.t1").num_rows


def test_unregistered_table_events_dropped(ray_session, fx, tmp_path):
    """Events of tables not registered in the lake are dropped (the
    unsubscribed-destination rule) without disturbing registered state."""
    spec, info = fx
    initials = {"lake.t0": info["initials"]["lake.t0"]}  # register only t0
    lake = Lake.create_multi(str(tmp_path / "lake"), initials, partitions_per_table=4)
    # the stream's t0 DDL still applies; t1 rows vanish
    replay(lake, info["segment_paths"], ReplayConfig(segments_per_batch=3))
    oracles = _oracle_split(spec, 2)
    assert_tables_equal(lake.read_table(table="lake.t0"), oracles[0])
    m = lake.current()
    assert set(m.tables) == {"lake.t0"}


def test_per_table_column_projection(ray_session, fx, tmp_path):
    """F5 per-table: {table: keep-list} — t0 drops `source`, t1 keeps
    everything (parseFieldFilterMap analog)."""
    spec, info = fx
    lake = Lake.create_multi(str(tmp_path / "lake"), info["initials"], partitions_per_table=4)
    cfg = ReplayConfig(
        segments_per_batch=3,
        column_projection={"lake.t0": ("doc_id", "tokens", "n_tok", "lang")},
    )
    replay(lake, info["segment_paths"], cfg)
    oracles = _oracle_split(spec, 2)
    t0 = lake.read_table(table="lake.t0")
    # rows touched by the stream have source nulled; untouched initial rows keep it
    touched = oracles[0].filter(pa.compute.equal(oracles[0]["source"], "cdc"))
    if touched.num_rows == 0:
        # fixture uses generator sources; instead assert: every t0 row whose
        # n_tok differs from the initial lake (i.e. was rewritten) has null source
        pass
    # weaker but deterministic: t1 is unaffected by t0's projection
    assert_tables_equal(lake.read_table(table="lake.t1"), oracles[1].drop_columns(["lang"]))
    # and t0's row set (keys) still matches the oracle's
    assert sorted(t0["doc_id"].to_pylist()) == sorted(oracles[0]["doc_id"].to_pylist())
    # every t0 row written by the replay (lang non-null or updated image)
    # must have source null — check via: rows whose doc_id was inserted by
    # the stream (key >= n_initial_docs) were all written post-projection
    km = pd.Series(t0["doc_id"].to_pylist()).str.slice(3).astype(np.int64)
    inserted = t0.filter(pa.array((km >= spec.n_initial_docs).to_numpy()))
    assert inserted.num_rows > 0
    assert inserted["source"].null_count == inserted.num_rows


def test_multi_table_truncate_targets_one_table(ray_session, tmp_path):
    """Per-table TRUNCATE (EventType.TRUNCATE=8 routed by table): t0's
    rows die at the truncate position while t1's stream applies
    untouched; replay continues past the cut. Oracle: serial apply on
    each table's filtered sub-stream."""
    import pyarrow.compute as pc

    from clever_canal_ray.fixtures.generator import (
        generate_events,
        retable_by_key,
        split_lake_by_key,
    )

    spec = EventLogSpec(
        seed=29, n_initial_docs=200, n_events=2000, n_segments=5,
        truncates=((0.5, "lake.t0"),),
    )
    root = tmp_path / "fx"
    info = write_multi_table_fixture(spec, str(root), n_tables=2)
    lake = Lake.create_multi(str(tmp_path / "lake"), info["initials"], partitions_per_table=4)
    m = replay(lake, info["segment_paths"], ReplayConfig(segments_per_batch=2))
    assert any(r.get("truncate") for r in lake.full_ledger())

    segs, _ = generate_events(spec)
    retabled = [retable_by_key(t, 2) for t in segs]
    initials = split_lake_by_key(generate_lake(spec), 2)
    for name in ("lake.t0", "lake.t1"):
        sub = [t.filter(pc.equal(t["table"], name)) for t in retabled]
        oracle = apply_events_serial(initials[name], sub)
        assert_tables_equal(lake.read_table(table=name), oracle)
    # the truncate really bit: t0 lost its pre-truncate rows
    t0 = lake.read_table(table="lake.t0")
    km = _keys_mod(t0, 2)
    assert (km == 0).all()
    full_no_trunc = _oracle_split(
        EventLogSpec(seed=29, n_initial_docs=200, n_events=2000, n_segments=5), 2
    )
    assert t0.num_rows < full_no_trunc[0].num_rows


def test_multi_table_salted_reduce_converges(ray_session, fx, tmp_path):
    """Skew path x multi-table: salted two-stage reduce (salt_factor>1)
    with table-routed global pids still converges to the partitioned
    oracle (desalt divides the salted pid back to the true global pid)."""
    spec, info = fx
    lake = Lake.create_multi(str(tmp_path / "lake"), info["initials"], partitions_per_table=4)
    replay(
        lake,
        info["segment_paths"],
        ReplayConfig(segments_per_batch=2, salt_factor=3),
    )
    oracles = _oracle_split(spec, 2)
    assert_tables_equal(lake.read_table(table="lake.t0"), oracles[0])
    assert_tables_equal(lake.read_table(table="lake.t1"), oracles[1].drop_columns(["lang"]))


def test_multi_table_gtid_failover(ray_session, tmp_path):
    """GTID dedup x multi-table: a mirror journal (re-segmented, same
    logical txns) fails over into a multi-table lake exactly-once."""
    import dataclasses

    from clever_canal_ray.fixtures.generator import write_multi_table_fixture

    spec_a = EventLogSpec(seed=47, n_initial_docs=150, n_events=1200, n_segments=4)
    spec_b = dataclasses.replace(spec_a, segment_base=40)
    ia = write_multi_table_fixture(spec_a, str(tmp_path / "a"), n_tables=2)
    ib = write_multi_table_fixture(spec_b, str(tmp_path / "b"), n_tables=2)
    cfg = ReplayConfig(segments_per_batch=2, gtid_dedup=True)
    lake = Lake.create_multi(str(tmp_path / "lake"), ia["initials"], partitions_per_table=3)
    replay(lake, ia["segment_paths"][:2], cfg)  # source A dies mid-stream
    replay(lake, ib["segment_paths"], cfg)  # mirror offers everything
    applied = sum(r["events_in"] for r in lake.full_ledger())
    assert applied == spec_a.n_events
    oracles = _oracle_split(spec_a, 2)
    assert_tables_equal(lake.read_table(table="lake.t0"), oracles[0])
    assert_tables_equal(lake.read_table(table="lake.t1"), oracles[1])
