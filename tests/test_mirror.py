"""Lake→lake incremental replication (pipelines/mirror): bootstrap +
change-feed sync track a live source exactly — deletes, rekeys, DDLs,
TRUNCATE, re-hash to a different partition count — with exactly-once
cursor semantics and the seq-rewrite refusal guards."""

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
from clever_canal_ray.pipelines.mirror import (
    MirrorWindowError,
    mirror_bootstrap,
    mirror_sync,
)
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.state.manifest import DuplicateCommitError, Lake
from tests.util import assert_tables_equal

ADD_LANG = {
    "op": "add_column",
    "table": "lake.sequences",
    "name": "lang",
    "type": "string",
    "nullable": True,
    "default": None,
}

# mirror-safe source maintenance: delta sink, minor auto-compact
CFG = dict(num_partitions=4, segments_per_batch=2, sink_mode="delta", compact_mode="minor")


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    spec = EventLogSpec(
        seed=91,
        n_initial_docs=300,
        n_events=2000,
        n_segments=8,
        p_insert=0.55,
        p_update=0.30,
        p_delete=0.15,
        rekey_frac=0.10,
        truncates=(0.45,),
        ddls=((0.55, ADD_LANG),),
    )
    root = tmp_path_factory.mktemp("fx_mirror")
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    return spec, info, lake_tbl, oracle


def test_mirror_tracks_live_source(ray_session, fx, tmp_path):
    """Bootstrap mid-stream, then sync after every replay step — the
    mirror equals the source at each step and the oracle at the end,
    across deletes, rekeys, a TRUNCATE, and a mid-stream DDL, into a
    DIFFERENT partition count (re-hash)."""
    spec, info, lake_tbl, oracle = fx
    src = Lake.create(str(tmp_path / "src"), lake_tbl, num_partitions=4)
    paths = info["segment_paths"]
    replay(src, paths[:2], ReplayConfig(**CFG))
    dst = mirror_bootstrap(src, str(tmp_path / "dst"), num_partitions=3)
    assert_tables_equal(dst.read_table(), src.read_table())
    for k in (4, 6, 8):  # windows spanning the truncate and the DDL
        replay(src, paths[:k], ReplayConfig(**CFG))
        out = mirror_sync(src, dst)
        assert not out["noop"]
        assert out["applied_source_version"] == src.current().version
        assert_tables_equal(dst.read_table(), src.read_table())
        # schema evolution followed the source
        assert dst.current().payload_schema.equals(src.current().payload_schema)
    assert_tables_equal(dst.read_table(), oracle)
    # cursor is the applied source version, atomic with the commit
    assert dst.current().last_batch_id == src.current().version


def test_mirror_sync_idempotent_and_crash_retry(ray_session, fx, tmp_path, monkeypatch):
    spec, info, lake_tbl, oracle = fx
    src = Lake.create(str(tmp_path / "src"), lake_tbl, num_partitions=4)
    paths = info["segment_paths"]
    replay(src, paths[:2], ReplayConfig(**CFG))
    dst = mirror_bootstrap(src, str(tmp_path / "dst"))
    replay(src, paths, ReplayConfig(**CFG))

    # crash between the delta-file writes and the commit: first attempt
    # dies after files are on disk; the retry re-applies the window
    real_commit = Lake.commit_batch
    state = {"boom": True}

    def flaky(self, *a, **kw):
        if state["boom"]:
            state["boom"] = False
            raise RuntimeError("injected crash before commit")
        return real_commit(self, *a, **kw)

    monkeypatch.setattr(Lake, "commit_batch", flaky)
    with pytest.raises(RuntimeError, match="injected"):
        mirror_sync(src, dst)
    out = mirror_sync(src, dst)  # retry applies the same window
    assert not out["noop"]
    assert_tables_equal(dst.read_table(), src.read_table())
    # second sync with no source progress is a no-op
    assert mirror_sync(src, dst)["noop"]
    # a duplicate commit (concurrent sync race) reads back as a no-op
    with pytest.raises(DuplicateCommitError):
        dst.commit_batch(
            dst.current(), batch_id=dst.current().last_batch_id, new_hwm=dst.current().hwm, touched={}
        )
    # orphans from the crashed attempt are gc-able, state stays exact
    dst.gc(keep_manifests=1, min_age_sec=0.0)
    assert_tables_equal(dst.read_table(), oracle)


def test_mirror_refuses_seq_rewriting_windows(ray_session, fx, tmp_path):
    """A major compact or a compact-sink batch inside the window folds
    tombstones — the sync must refuse, and a minor compact must not
    trip the guard."""
    spec, info, lake_tbl, oracle = fx
    src = Lake.create(str(tmp_path / "src"), lake_tbl, num_partitions=4)
    paths = info["segment_paths"]
    replay(src, paths[:4], ReplayConfig(**CFG))
    dst = mirror_bootstrap(src, str(tmp_path / "dst"))

    replay(src, paths[:6], ReplayConfig(**CFG))
    src.compact(mode="minor")  # safe: tombstones + per-row seq preserved
    out = mirror_sync(src, dst)
    assert not out["noop"]
    assert_tables_equal(dst.read_table(), src.read_table())

    replay(src, paths, ReplayConfig(**CFG))
    src.compact(mode="major")  # drops tombstones physically
    with pytest.raises(MirrorWindowError, match="seq-rewriting"):
        mirror_sync(src, dst)
    # bounded sync up to the pre-compact version still applies cleanly
    pre = int(src.current().metrics["last_major_compact_version"]) - 1
    out = mirror_sync(src, dst, to_version=pre)
    assert not out["noop"]
    assert_tables_equal(dst.read_table(), oracle)
    # and the now-empty post-compact window is refusal-free only via
    # re-bootstrap; spanning it still raises
    with pytest.raises(MirrorWindowError):
        mirror_sync(src, dst)


def test_mirror_refuses_compact_sink_source(ray_session, tmp_path):
    spec = EventLogSpec(seed=7, n_initial_docs=80, n_events=400, n_segments=4)
    info = write_fixture(spec, str(tmp_path / "fx"))
    src = Lake.create(str(tmp_path / "src"), generate_lake(spec), num_partitions=2)
    replay(src, info["segment_paths"][:2], ReplayConfig(num_partitions=2, segments_per_batch=2))
    dst = mirror_bootstrap(src, str(tmp_path / "dst"))
    replay(src, info["segment_paths"], ReplayConfig(num_partitions=2, segments_per_batch=2))
    with pytest.raises(MirrorWindowError, match="seq-rewriting"):
        mirror_sync(src, dst)


def test_mirror_multi_table(ray_session, tmp_path):
    """Multi-table source: per-table feeds route into the mirror's own
    pid ranges; a mid-stream column DDL on one table follows."""
    spec = EventLogSpec(
        seed=29,
        n_initial_docs=200,
        n_events=1500,
        n_segments=6,
        p_insert=0.58,
        p_update=0.30,
        p_delete=0.12,
        ddls=((0.5, {"op": "add_column", "name": "lang", "type": "string", "table": "lake.t0", "nullable": True, "default": None}),),
    )
    info = write_multi_table_fixture(spec, str(tmp_path / "fx"), n_tables=2)
    src = Lake.create_multi(str(tmp_path / "src"), info["initials"], partitions_per_table=4)
    cfg = ReplayConfig(segments_per_batch=2, sink_mode="delta", compact_mode="minor")
    replay(src, info["segment_paths"][:2], cfg)
    dst = mirror_bootstrap(src, str(tmp_path / "dst"))
    for name in sorted(src.current().tables):
        assert_tables_equal(dst.read_table(table=name), src.read_table(table=name))
    for k in (4, 6):
        replay(src, info["segment_paths"][:k], cfg)
        out = mirror_sync(src, dst)
        assert not out["noop"]
        for name in sorted(src.current().tables):
            assert_tables_equal(dst.read_table(table=name), src.read_table(table=name))
    assert set(dst.current().tables) == set(src.current().tables)


def test_mirror_cli(ray_session, fx, tmp_path):
    """The `mirror` CLI subcommand bootstraps on first run and syncs on
    the next, in its own process (own Ray session)."""
    import json
    import os
    import subprocess
    import sys

    spec, info, lake_tbl, oracle = fx
    src = Lake.create(str(tmp_path / "src"), lake_tbl, num_partitions=4)
    paths = info["segment_paths"]
    replay(src, paths[:4], ReplayConfig(**CFG))
    env = dict(
        os.environ,
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )

    def run_mirror():
        r = subprocess.run(
            [sys.executable, "-m", "clever_canal_ray", "mirror",
             "--src", str(tmp_path / "src"), "--dst", str(tmp_path / "dst")],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return [json.loads(l) for l in r.stdout.strip().splitlines()]

    out = run_mirror()
    assert out[0]["bootstrapped"]
    dst = Lake(str(tmp_path / "dst"))
    assert_tables_equal(dst.read_table(), src.read_table())
    replay(src, paths, ReplayConfig(**CFG))
    out = run_mirror()
    assert not out[-1]["noop"] and out[-1]["rows"] > 0
    assert_tables_equal(dst.read_table(), oracle)


def test_mirror_bootstrap_guards(ray_session, fx, tmp_path):
    spec, info, lake_tbl, _ = fx
    src = Lake.create(str(tmp_path / "src"), lake_tbl, num_partitions=4)
    # a plain lake (no cursor stamp) refuses to sync
    plain = Lake.create(str(tmp_path / "plain"), lake_tbl.slice(0, 10), num_partitions=2)
    with pytest.raises(MirrorWindowError, match="no mirror cursor"):
        mirror_sync(src, plain)
    # a source rolled back below the cursor refuses
    replay(src, info["segment_paths"][:2], ReplayConfig(**CFG))
    dst = mirror_bootstrap(src, str(tmp_path / "dst"))
    src.rollback_to_version(0)
    with pytest.raises(MirrorWindowError, match="BELOW the mirror cursor"):
        mirror_sync(src, dst)
