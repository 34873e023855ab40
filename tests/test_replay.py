"""Plain replay convergence: Ray pipeline final lake == serial oracle.

The FIXTURES.md §5 "plain replay convergence" scenario plus variants
with multiple micro-batches and partition counts.
"""

import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_lake, write_fixture
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


@pytest.fixture(scope="module")
def spec():
    return EventLogSpec(seed=42, n_initial_docs=300, n_events=2000, n_segments=6)


@pytest.fixture(scope="module")
def fixture(spec, tmp_path_factory):
    root = tmp_path_factory.mktemp("fx")
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    return spec, info, lake_tbl, root


def _oracle(spec, lake_tbl):
    import pyarrow.parquet as pq

    from clever_canal_ray.fixtures.generator import generate_events

    segs, _ = generate_events(spec)
    return apply_events_serial(lake_tbl, segs)


def test_replay_converges_single_batch(ray_session, fixture, tmp_path):
    spec, info, lake_tbl, _ = fixture
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=8)
    cfg = ReplayConfig(num_partitions=8, segments_per_batch=len(info["segment_paths"]))
    m = replay(lake, info["segment_paths"], cfg)
    assert m.last_batch_id >= 0
    assert_tables_equal(lake.read_table(), _oracle(spec, lake_tbl))


def test_replay_converges_micro_batches(ray_session, fixture, tmp_path):
    spec, info, lake_tbl, _ = fixture
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2)
    m = replay(lake, info["segment_paths"], cfg)
    assert m.last_batch_id >= 1  # several commits
    assert_tables_equal(lake.read_table(), _oracle(spec, lake_tbl))
    # ledger is FIFO-monotone
    ids = [r["batch_id"] for r in m.ledger]
    assert ids == sorted(ids)
    # metrics recorded per batch
    assert all(r["events_in"] > 0 for r in m.ledger)


def test_manifest_hwm_advances_to_txn_boundary(ray_session, fixture, tmp_path):
    spec, info, lake_tbl, _ = fixture
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=3)
    m = replay(lake, info["segment_paths"], cfg)
    # hwm must sit on a txn_commit row
    import pyarrow.dataset as pds

    meta = pds.dataset(info["segment_paths"]).to_table(
        columns=["segment_id", "offset", "txn_commit"]
    )
    rows = {(r["segment_id"], r["offset"]): r["txn_commit"] for r in meta.to_pylist()}
    assert rows[m.hwm] is True


def test_fast_generator_path_converges(ray_session, tmp_path):
    """The vectorized no-before-image generator (bench path) also
    converges: engine final state == serial oracle."""
    from clever_canal_ray.fixtures.generator import generate_events, write_fixture

    spec = EventLogSpec(seed=9, n_initial_docs=150, n_events=1200, n_segments=4, include_before=False)
    info = write_fixture(spec, str(tmp_path / "fx"))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    lake = Lake.create(str(tmp_path / "lake"), lake_tbl, num_partitions=4)
    replay(lake, info["segment_paths"], ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta", pipeline_depth=2))
    assert_tables_equal(lake.read_table(), apply_events_serial(lake_tbl, segs))


def test_transaction_spanning_many_files_not_orphaned(ray_session, tmp_path):
    """A committed transaction whose events span MORE files than the
    micro-batch window must still apply completely: the deferred-tail
    carry is position-based, not a one-file overlap (code-review
    regression: middle files of the spanning txn were silently lost
    while the HWM advanced past them)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clever_canal_ray.schema import LAKE_SCHEMA_V0, event_schema

    ev_schema = event_schema(LAKE_SCHEMA_V0)

    def seg(seg_id, rows):
        recs = []
        for off, txn, commit, doc in rows:
            recs.append(
                {
                    "segment_id": seg_id,
                    "offset": off,
                    "txn_id": txn,
                    "seq_in_txn": 0,
                    "txn_commit": commit,
                    "execute_ts": 1_700_000_000_000 + off,
                    "op": "I",
                    "table": "lake.sequences",
                    "doc_id": doc,
                    "schema_version": 0,
                    "ddl": None,
                    "before": None,
                    "after": {"doc_id": doc, "tokens": [1, 2], "n_tok": 2, "source": "s"},
                }
            )
        t = pa.Table.from_pylist(recs, schema=ev_schema)
        p = str(tmp_path / f"segment-{seg_id:05d}.parquet")
        pq.write_table(t, p)  # deliberately NO plan sidecar (scan path)
        return p

    # s0 ends txn1; txn2 spans s1..s3 with its commit ONLY in s3
    paths = [
        seg(0, [(10, 1, True, "docA")]),
        seg(1, [(10, 2, False, "docB")]),
        seg(2, [(10, 2, False, "docC")]),
        seg(3, [(10, 2, True, "docD")]),
    ]
    base = LAKE_SCHEMA_V0.empty_table()
    lake = Lake.create(str(tmp_path / "lake"), base, num_partitions=2)
    replay(lake, paths, ReplayConfig(num_partitions=2, segments_per_batch=1))
    got = sorted(lake.read_table()["doc_id"].to_pylist())
    assert got == ["docA", "docB", "docC", "docD"]


def test_delta_read_dataset_after_rename_keeps_values(ray_session, tmp_path):
    """Delta-mode read_dataset after a mid-stream rename_column: Ray's
    groupby unifies block schemas (old files gain an all-null new-name
    column), so the up-cast must COALESCE new+old names (code-review
    regression: pre-rename values read as null)."""
    spec = EventLogSpec(
        seed=67, n_initial_docs=150, n_events=900, n_segments=4,
        ddls=((0.5, {"op": "rename_column", "from": "source", "to": "origin"}),),
    )
    info = write_fixture(spec, str(tmp_path / "fx"))
    lake = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    replay(
        lake, info["segment_paths"],
        ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta"),
    )
    via_table = lake.read_table()
    via_ds = lake.read_dataset().to_pandas()
    assert via_table["origin"].null_count == int(via_ds["origin"].isna().sum())
    a = sorted(x for x in via_ds["origin"].tolist() if isinstance(x, str))
    b = sorted(x for x in via_table["origin"].to_pylist() if isinstance(x, str))
    assert a == b and len(a) > 0
