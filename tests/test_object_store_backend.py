"""The manifest commit protocol on a NON-POSIX backend: the
object-store contract (atomic PUT, CAS pointer swap, per-record
journal objects, no append/rename of committed objects) — plus the
two-writer pointer race on BOTH backends.

Proves the claim in state/manifest.py's module docstring: the
two-phase commit is storage-agnostic, with the pointer swap mapping
to a conditional PUT on object stores (state/storage.py).
"""

import json
import os
import threading

import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import (
    EventLogSpec,
    generate_events,
    generate_lake,
    write_fixture,
)
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.state.manifest import CommitConflictError, DuplicateCommitError, Lake
from clever_canal_ray.state.storage import (
    ObjectStoreStorage,
    PosixStorage,
    StorageCASError,
    storage_for,
)
from tests.util import assert_tables_equal


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(seed=31, n_initial_docs=150, n_events=1200, n_segments=4)
    root = tmp_path_factory.mktemp("fx_os")
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    return spec, info, lake_tbl, oracle


def _mk_lake(tmp_path, lake_tbl, backend: str, n_parts: int = 4) -> Lake:
    d = str(tmp_path / f"lake_{backend}")
    if backend == "objectstore":
        ObjectStoreStorage.format(d)
    return Lake.create(d, lake_tbl, num_partitions=n_parts)


# --- end-to-end on the object-store contract ------------------------------


def test_replay_on_object_store_backend(ray_session, fx, tmp_path):
    """Full replay converges to the serial oracle on the object-store
    backend; a duplicate replay is a no-op; the ledger is per-record
    immutable objects (never an appended file)."""
    spec, info, lake_tbl, oracle = fx
    lake = _mk_lake(tmp_path, lake_tbl, "objectstore")
    assert lake.storage.name == "objectstore"
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2)
    m = replay(lake, info["segment_paths"], cfg)
    assert_tables_equal(lake.read_table(), oracle)

    # duplicate replay: no-op at the same version
    m2 = replay(lake, info["segment_paths"], cfg)
    assert m2.version == m.version and m2.hwm == m.hwm

    # the backend stamp resolves for ANY later handle (workers, CLI)
    again = Lake(lake.dir)
    assert again.storage.name == "objectstore"
    assert again.current().version == m.version

    # object-store discipline: no appendable ledger file; one immutable
    # object per committed batch; manifests uniquely named
    assert not os.path.exists(os.path.join(lake.manifest_dir, "ledger.jsonl"))
    led_dir = os.path.join(lake.manifest_dir, "ledger.jsonl.d")
    assert len(os.listdir(led_dir)) == len(lake.full_ledger()) >= 2
    names = [f for f in os.listdir(lake.manifest_dir) if f.startswith("manifest-")]
    assert all(len(n.split("-")) == 3 for n in names)  # manifest-<v>-<uuid>.json


def test_exactly_once_on_object_store_backend(ray_session, fx, tmp_path):
    """Kill & resume + rollback-redeliver on the object-store backend:
    a fresh handle resumes from the CAS-committed manifest; rollback
    branches a new uniquely-named timeline and replay converges."""
    spec, info, lake_tbl, oracle = fx
    lake = _mk_lake(tmp_path, lake_tbl, "objectstore")
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2)
    paths = info["segment_paths"]
    m1 = replay(lake, paths[:2], cfg)  # "crash" after this commit

    lake2 = Lake(lake.dir)  # restarted driver
    assert lake2.current().hwm == m1.hwm
    m2 = replay(lake2, paths, cfg)
    assert_tables_equal(lake2.read_table(), oracle)
    for rec in m2.ledger[1:]:
        assert tuple(rec["prev_hwm"]) < tuple(rec["hwm"])

    # rollback re-delivery: the forced pointer swap starts a new
    # timeline; the old tip becomes an unreachable orphan
    old_tip = lake2.current()
    lake2.rollback_to_version(m2.version - 1)
    m3 = replay(lake2, paths, cfg)
    assert_tables_equal(lake2.read_table(), oracle)
    assert m3.version == m2.version  # same height, new object
    assert getattr(m3, "_obj_name") != getattr(old_tip, "_obj_name")
    # time-travel resolves along the NEW chain
    assert lake2.manifest_at(m3.version).parent == m3.parent


def test_lookup_and_changes_on_object_store_backend(ray_session, fx, tmp_path):
    """The serving reads (point lookup, incremental changes feed) work
    unchanged over an object-store-backed manifest."""
    spec, info, lake_tbl, oracle = fx
    lake = _mk_lake(tmp_path, lake_tbl, "objectstore")
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2)
    replay(lake, info["segment_paths"], cfg)

    keys = oracle["doc_id"].to_pylist()[:8]
    got = lake.lookup(keys).to_pandas().set_index("doc_id")
    exp = oracle.to_pandas().set_index("doc_id").loc[got.index]
    assert list(got.index) and got["n_tok"].to_dict() == exp["n_tok"].to_dict()

    feed = lake.read_changes_table(0)
    assert feed.num_rows > 0 and "__seq" in feed.column_names


# --- the two-writer race, both backends -----------------------------------


@pytest.mark.parametrize("backend", ["posix", "objectstore"])
def test_two_writer_commit_race(ray_session, fx, tmp_path, backend):
    """Two writers commit concurrently from the SAME base manifest:
    exactly one wins the pointer CAS; the loser gets a loud conflict
    (never silent corruption), retries on the refreshed base, and both
    batches land."""
    spec, info, lake_tbl, _ = fx
    lake = _mk_lake(tmp_path, lake_tbl, backend, n_parts=2)
    base = lake.current()
    handles = [Lake(lake.dir), Lake(lake.dir)]
    results: list = [None, None]
    barrier = threading.Barrier(2)

    def writer(i: int):
        try:
            barrier.wait()
            results[i] = handles[i].commit_batch(
                base, batch_id=0, new_hwm=(0, i + 1), touched={}
            )
        except Exception as e:  # noqa: BLE001 - recorded for assertion
            results[i] = e

    ts = [threading.Thread(target=writer, args=(i,)) for i in (0, 1)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    oks = [r for r in results if not isinstance(r, Exception)]
    errs = [r for r in results if isinstance(r, Exception)]
    assert len(oks) == 1 and len(errs) == 1, results
    assert isinstance(errs[0], CommitConflictError)
    cur = lake.current()
    assert cur.version == base.version + 1
    assert cur.hwm == oks[0].hwm  # winner's snapshot, byte-intact

    # loser retries on the refreshed base (the documented recovery)
    m2 = Lake(lake.dir).commit_batch(cur, batch_id=1, new_hwm=(0, 9), touched={})
    assert m2.version == base.version + 2
    assert [r["batch_id"] for r in lake.full_ledger()] == [0, 1]


@pytest.mark.parametrize("backend", ["posix", "objectstore"])
def test_cas_loser_never_overwrites_winner(ray_session, fx, tmp_path, backend):
    """Storage-level interleave of the worst case: B PUTs its manifest
    AFTER A already swapped. Unique naming means B cannot clobber A's
    snapshot; B's swap fails CAS; B's object is an unreachable orphan."""
    spec, info, lake_tbl, _ = fx
    lake = _mk_lake(tmp_path, lake_tbl, backend, n_parts=2)
    m0 = lake.current()

    a = Lake(lake.dir)
    ma = a.commit_batch(m0, batch_id=0, new_hwm=(0, 5), touched={})

    # B (stale) writes its competing manifest object, then tries to swap
    b = Lake(lake.dir)
    import copy

    mb = copy.deepcopy(m0)
    mb.version = m0.version + 1
    mb.hwm = (0, 7)
    name_b = b._write_manifest(mb, parent=getattr(m0, "_obj_name", ""))
    with pytest.raises(CommitConflictError):
        b._swap_current(name_b, expected=getattr(m0, "_obj_name", None))

    cur = lake.current()
    assert cur.hwm == ma.hwm  # A's commit intact, not B's
    assert getattr(cur, "_obj_name") != name_b
    assert os.path.exists(os.path.join(lake.manifest_dir, name_b))  # orphan


def test_crash_between_manifest_put_and_swap(ray_session, fx, tmp_path):
    """A writer dying between phase-2a (manifest PUT) and phase-2b
    (pointer swap) leaves only an invisible orphan: readers still see
    the old state and the next commit succeeds normally."""
    spec, info, lake_tbl, _ = fx
    lake = _mk_lake(tmp_path, lake_tbl, "objectstore", n_parts=2)
    m0 = lake.current()

    crashing = Lake(lake.dir)
    orig = crashing._swap_current

    def die(*a, **k):
        raise RuntimeError("simulated crash before pointer swap")

    crashing._swap_current = die
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashing.commit_batch(m0, batch_id=0, new_hwm=(0, 3), touched={})
    crashing._swap_current = orig

    assert lake.current().version == m0.version  # nothing published
    m1 = lake.commit_batch(lake.current(), batch_id=0, new_hwm=(0, 4), touched={})
    assert m1.version == m0.version + 1 and lake.current().hwm == (0, 4)
    # the crashed attempt's ledger record was never written (sidecars
    # land after the commit point)
    assert [r["hwm"] for r in lake.full_ledger()] == [[0, 4]]


# --- storage primitives ----------------------------------------------------


def test_pointer_cas_primitive(tmp_path):
    for st in (PosixStorage(), ObjectStoreStorage()):
        p = str(tmp_path / f"ptr_{st.name}")
        assert st.read_pointer(p) is None
        st.swap_pointer(p, "a", expected=None)
        assert st.read_pointer(p) == "a"
        st.swap_pointer(p, "b", expected="a")
        with pytest.raises(StorageCASError):
            st.swap_pointer(p, "c", expected="a")  # stale expectation
        with pytest.raises(StorageCASError):
            st.swap_pointer(p, "c", expected=None)  # create-only on existing
        assert st.read_pointer(p) == "b"
        st.swap_pointer(p, "z", expected="ignored", force=True)  # admin
        assert st.read_pointer(p) == "z"


def test_journal_contract(tmp_path):
    posix, obj = PosixStorage(), ObjectStoreStorage()
    p1 = str(tmp_path / "j1.jsonl")
    posix.append_journal(p1, json.dumps({"i": 1}))
    posix.append_journal(p1, json.dumps({"i": 2}))
    assert [json.loads(x)["i"] for x in posix.journal_lines(p1)] == [1, 2]

    p2 = str(tmp_path / "j2.jsonl")
    obj.append_journal(p2, json.dumps({"i": 1}))
    obj.append_journal(p2, json.dumps({"i": 2}))
    assert not os.path.exists(p2)  # never an appended file
    assert sorted(json.loads(x)["i"] for x in obj.journal_lines(p2)) == [1, 2]
    # a migrated lake: legacy appended file + new per-record objects
    posix.append_journal(p2, json.dumps({"i": 0}))
    assert sorted(json.loads(x)["i"] for x in obj.journal_lines(p2)) == [0, 1, 2]


def test_storage_marker_resolution(tmp_path):
    d = str(tmp_path / "lk")
    assert storage_for(d).name == "posix"  # default / absent marker
    ObjectStoreStorage.format(d)
    assert storage_for(d).name == "objectstore"


def test_gc_sweeps_orphan_manifests_keeps_chain(ray_session, fx, tmp_path):
    """gc() removes manifest objects UNREACHABLE from the pointer (CAS
    losers, crashed writers, rollback-abandoned timelines) but retains
    every chain manifest — even beyond keep_manifests, so a lagging
    mirror can still plan from them."""
    import copy

    spec, info, lake_tbl, oracle = fx
    lake = _mk_lake(tmp_path, lake_tbl, "objectstore", n_parts=2)
    m = lake.current()
    for b in range(4):
        m = lake.commit_batch(m, batch_id=b, new_hwm=(0, b + 1), touched={})
    # orphan 1: a CAS loser's manifest object
    loser = copy.deepcopy(m)
    loser.version = m.version + 1
    name_loser = lake._write_manifest(loser, parent=getattr(m, "_obj_name", ""))
    with pytest.raises(Exception):
        lake._swap_current(name_loser, expected="something-stale")
    # orphan 2: a rollback-abandoned tip
    old_tip = lake.current()
    lake.rollback_to_version(m.version - 1)
    m2 = lake.commit_batch(lake.current(), batch_id=9, new_hwm=(0, 99), touched={})

    before = [
        f for f in os.listdir(lake.manifest_dir) if f.startswith("manifest-")
    ]
    assert name_loser in before and getattr(old_tip, "_obj_name") in before
    # plus put_text temp debris from a writer that died mid-PUT
    with open(os.path.join(lake.manifest_dir, "manifest-00000099-dead.json.tmp.ff00"), "w") as f:
        f.write("{}")
    res = lake.gc(keep_manifests=2, min_age_sec=0.0)
    after = [f for f in os.listdir(lake.manifest_dir) if f.startswith("manifest-")]
    assert res["manifests_removed"] >= 3  # both orphans AND the tmp debris
    assert not any(".tmp." in f for f in after)
    assert name_loser not in after
    assert getattr(old_tip, "_obj_name") not in after
    # the FULL committed chain survives (beyond keep_manifests)
    mm = lake.current()
    chain = []
    while mm is not None:
        chain.append(getattr(mm, "_obj_name"))
        mm = lake._load_parent(mm)
    assert all(c in after for c in chain) and len(chain) >= 4
    assert lake.current().version == m2.version  # state intact
    assert lake.manifest_at(0).version == 0  # deep time-travel intact


@pytest.mark.parametrize("backend", ["posix", "objectstore"])
def test_many_writer_commit_stress(ray_session, fx, tmp_path, backend):
    """4 writers x 20 commits each, all racing the pointer CAS with the
    documented retry-on-conflict loop: every batch lands exactly once,
    versions are gapless, and the final chain is walkable end to end."""
    spec, info, lake_tbl, _ = fx
    lake = _mk_lake(tmp_path, lake_tbl, backend, n_parts=2)
    n_writers, per_writer = 4, 20
    errors: list = []

    def writer(w: int):
        h = Lake(lake.dir)
        for _ in range(per_writer):
            # batch id comes from the REFRESHED base each attempt (the
            # engine's batch-id stream is totally ordered; a racing
            # writer that loses the CAS re-reads and re-numbers)
            for attempt in range(400):
                base = h.current()
                bid = base.last_batch_id + 1
                try:
                    h.commit_batch(
                        base, batch_id=bid, new_hwm=(0, bid + 1), touched={},
                        metrics={"writer": w},
                    )
                    break
                except (CommitConflictError, DuplicateCommitError):
                    continue  # lost the race; refreshed base next loop
                except Exception as e:  # noqa: BLE001
                    errors.append(e)
                    return
            else:
                errors.append(RuntimeError(f"writer {w} starved"))
                return

    ts = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errors, errors[:3]
    total = n_writers * per_writer
    cur = lake.current()
    assert cur.version == total  # gapless: one version per commit
    led = lake.full_ledger()
    assert [r["batch_id"] for r in led] == list(range(total))  # exactly once
    # chain walk reaches v0 (every parent link intact under the race)
    m, steps = cur, 0
    while m.version > 0:
        m = lake._load_parent(m)
        assert m is not None, f"chain broken at step {steps}"
        steps += 1
    assert steps == total


def test_consumer_meta_on_object_store_backend(ray_session, fx, tmp_path):
    """The consumer cursor store (FileMixedMetaManager analog) runs on
    the object-store contract too: a state_dir stamped with
    format_state persists every cursor mutation as an atomic PUT, and
    a restarted consumer resumes exactly where it acked."""
    import pyarrow.parquet as pq

    from clever_canal_ray.client import ChangeConsumer

    spec, info, lake_tbl, oracle = fx
    state = str(tmp_path / "state_os")
    ObjectStoreStorage.format_state(state)
    seg = os.path.dirname(info["segment_paths"][0])

    c = ChangeConsumer(seg, state, client_id="os1")
    assert c.storage.name == "objectstore"
    c.subscribe()
    b0, t0 = c.get_without_ack(200)
    c.ack(b0)
    b1, t1 = c.get_without_ack(200)  # in flight at the "crash"

    c2 = ChangeConsumer(seg, state, client_id="os1")  # restarted
    assert c2._cursor == c._cursor and c2._delivered == c._delivered
    c2.rollback()  # re-deliver the in-flight batch
    got = c2.get_without_ack(200)
    assert got is not None and got[1].num_rows == t1.num_rows
    # drain to completion: row-exact with a fresh posix-state consumer
    rows = t0.num_rows + got[1].num_rows
    c2.ack(got[0])
    while True:
        g = c2.get_without_ack(100_000)
        if g is None:
            break
        rows += g[1].num_rows
        c2.ack(g[0])
    total = sum(pq.read_metadata(p).num_rows for p in info["segment_paths"])
    assert rows == total


def test_multi_table_ddl_on_object_store_backend(ray_session, tmp_path):
    """Multi-table replay with a mid-stream DDL on the object-store
    backend: per-table schema evolution, routed journals, and the
    union read all work over CAS-committed manifests."""
    from clever_canal_ray.fixtures.generator import write_multi_table_fixture

    spec = EventLogSpec(
        seed=23, n_initial_docs=150, n_events=1200, n_segments=4,
        ddls=((0.5, {
            "op": "add_column", "table": "lake.t0", "name": "lang",
            "type": "string", "nullable": True, "default": None,
        }),),
    )
    root = tmp_path / "fx_mt_os"
    info = write_multi_table_fixture(spec, str(root), n_tables=2)
    d = str(tmp_path / "lake_mt_os")
    ObjectStoreStorage.format(d)
    lake = Lake.create_multi(d, info["initials"], partitions_per_table=2)
    assert lake.storage.name == "objectstore"
    m = replay(lake, info["segment_paths"], ReplayConfig(segments_per_batch=2))
    assert "lang" in [f.name for f in m.schema_of_table("lake.t0")]
    assert "lang" not in [f.name for f in m.schema_of_table("lake.t1")]
    t0 = lake.read_table(table="lake.t0")
    t1 = lake.read_table(table="lake.t1")
    union = lake.read_table()
    assert t0.num_rows + t1.num_rows == union.num_rows > 0
    # duplicate replay still a no-op with per-table journals + ledger objects
    m2 = replay(lake, info["segment_paths"], ReplayConfig(segments_per_batch=2))
    assert m2.version == m.version
    assert not os.path.exists(os.path.join(lake.manifest_dir, "ledger.jsonl"))
