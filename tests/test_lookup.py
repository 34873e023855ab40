"""Lake point lookup (bloom-pruned serving path) and incremental
change-feed reads (read_changes) — state/filestats + manifest.Lake."""

import os

import numpy as np
import pyarrow as pa
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
from clever_canal_ray.state import filestats
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    # wide key space so a delta file holds a SMALL fraction of all keys
    # (that's what makes bloom pruning visible — and is the 100-TB
    # shape: a micro-batch touches a sliver of the key domain)
    spec = EventLogSpec(seed=77, n_initial_docs=2000, n_events=2400, n_segments=8)
    root = tmp_path_factory.mktemp("fx_lookup")
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    return spec, info, lake_tbl, segs, oracle


# ---------------------------------------------------------------- bloom unit


def test_bloom_no_false_negatives_and_low_fp_rate():
    rng = np.random.default_rng(7)
    members = np.array([f"doc_{i:06d}" for i in rng.choice(200_000, 5_000, replace=False)], dtype=object)
    words, m_bits = filestats.build_bloom(members)
    h1, h2 = filestats.key_hashes(members)
    assert filestats.may_contain(words, m_bits, h1, h2).all()  # no false negatives, ever
    outsiders = np.array([f"zzz_{i:06d}" for i in range(20_000)], dtype=object)
    oh1, oh2 = filestats.key_hashes(outsiders)
    fp = filestats.may_contain(words, m_bits, oh1, oh2).mean()
    assert fp < 0.05  # 10 bits/key, k=7 -> ~1% expected


def test_corrupt_sidecars_degrade_to_read(tmp_path):
    """Advisory contract: ANY malformed sidecar means 'read the file' —
    never an exception out of the lookup fetch task."""
    import json as _json

    h1, h2 = filestats.key_hashes(np.array(["k"], dtype=object))
    cases = {
        "truncated_body": _json.dumps({"v": 1, "k": 7, "m_bits": 8}).encode() + b"\nx",
        "zero_mbits": _json.dumps({"v": 1, "k": 7, "m_bits": 0}).encode() + b"\n",
        "not_multiple_64": _json.dumps({"v": 1, "k": 7, "m_bits": 8}).encode() + b"\n" + b"x" * 1,
        "bad_header": b"not json\n" + b"\x00" * 8,
        "wrong_version": _json.dumps({"v": 9, "k": 7, "m_bits": 64}).encode() + b"\n" + b"\x00" * 8,
        "mbits_not_int": _json.dumps({"v": 1, "k": 7, "m_bits": "64"}).encode() + b"\n" + b"\x00" * 8,
        "empty": b"",
    }
    for name, blob in cases.items():
        data = str(tmp_path / f"{name}.parquet")
        open(data, "w").close()
        with open(data + filestats.BLOOM_SUFFIX, "wb") as f:
            f.write(blob)
        assert filestats.load_sidecar(data) is None, name
        assert filestats.file_may_contain_any(data, h1, h2), name  # degrade, not drop


def test_sidecar_cache_never_caches_failure(tmp_path):
    """A sidecar that appears AFTER a failed load must be seen (absent/
    invalid results are not cached; successful loads are)."""
    ids = np.array([f"k{i}" for i in range(50)], dtype=object)
    data = str(tmp_path / "late.parquet")
    open(data, "w").close()
    assert filestats.load_sidecar(data) is None  # absent
    with open(data + filestats.BLOOM_SUFFIX, "wb") as f:
        f.write(b"garbage\n")  # invalid
    assert filestats.load_sidecar(data) is None
    filestats.write_sidecar(data, ids)  # now valid (overwrites)
    side = filestats.load_sidecar(data)
    assert side is not None
    h1, h2 = filestats.key_hashes(ids)
    assert filestats.may_contain(side[0], side[1], h1, h2).all()


def test_bloom_sidecar_roundtrip(tmp_path):
    ids = np.array([f"k{i}" for i in range(100)], dtype=object)
    data = str(tmp_path / "f.parquet")
    open(data, "w").close()
    filestats.write_sidecar(data, ids)
    h1, h2 = filestats.key_hashes(ids)
    assert filestats.file_may_contain_any(data, h1, h2)
    side = filestats.load_sidecar(data)
    assert side is not None
    # missing sidecar is advisory: always "may contain"
    assert filestats.file_may_contain_any(str(tmp_path / "nope.parquet"), h1, h2)


# ---------------------------------------------------------------- lookup


def _build_delta_lake(fx, tmp_path, name="lake", num_partitions=4):
    spec, info, lake_tbl, segs, oracle = fx
    lake = Lake.create(str(tmp_path / name), lake_tbl, num_partitions=num_partitions)
    cfg = ReplayConfig(num_partitions=num_partitions, segments_per_batch=2, sink_mode="delta")
    replay(lake, info["segment_paths"], cfg)
    return lake, oracle


def test_lookup_matches_full_read(ray_session, fx, tmp_path):
    lake, oracle = _build_delta_lake(fx, tmp_path)
    odf = oracle.to_pandas().set_index("doc_id")
    present = list(odf.index[:3]) + list(odf.index[-2:])
    # a key that existed initially but is deleted by the oracle replay
    initial_ids = set(generate_lake(fx[0])["doc_id"].to_pylist())
    deleted = sorted(initial_ids - set(odf.index))[:2]
    missing = ["doc_does_not_exist", "another_missing_key"]
    keys = present + deleted + missing
    got = lake.lookup(keys)
    expected = oracle.filter(
        pa.compute.is_in(oracle["doc_id"], value_set=pa.array(keys))
    )
    assert_tables_equal(got, expected)
    assert set(got["doc_id"].to_pylist()) == set(present)


def test_lookup_prunes_files(ray_session, fx, tmp_path):
    spec, info, lake_tbl, segs, oracle = fx
    lake, _ = _build_delta_lake(fx, tmp_path, name="lake_prune")
    m = lake.current()
    total_files = sum(len(i["files"]) for i in m.partitions.values())
    assert total_files > m.num_partitions  # deltas accumulated
    # keys present in the initial lake but touched by NO event: every
    # delta file's bloom must exclude them (no false negatives means
    # only ~1% fp reads beyond the base files are possible)
    event_ids = set()
    for s in segs:
        event_ids.update(s["doc_id"].to_pylist())
    quiet = sorted(set(lake_tbl["doc_id"].to_pylist()) - event_ids)[:2]
    assert len(quiet) == 2, "fixture has no quiet keys; widen the key space"
    got, stats = lake.lookup(quiet, return_stats=True)
    assert stats["partitions_touched"] <= 2
    assert stats["files_total"] <= total_files
    # base files (no prune attempted on holders) + at most 1 fp delta
    assert stats["files_read"] <= stats["partitions_touched"] + 1
    assert stats["files_read"] < stats["files_total"]
    assert len(got) == len(quiet)


def test_lookup_empty_and_multi_table_guard(ray_session, fx, tmp_path):
    lake, oracle = _build_delta_lake(fx, tmp_path, name="lake_empty")
    out = lake.lookup([])
    assert out.num_rows == 0
    out = lake.lookup(["nope_1", "nope_2"])
    assert out.num_rows == 0
    with pytest.raises(ValueError, match="takes no table="):
        lake.lookup(["nope_1"], table="anything")


def test_lookup_multi_table(ray_session, tmp_path):
    """Keys route within the target table's pid range; the same key
    can hold different state per table."""
    from clever_canal_ray.fixtures.generator import write_multi_table_fixture

    spec = EventLogSpec(seed=29, n_initial_docs=400, n_events=1500, n_segments=4)
    info = write_multi_table_fixture(spec, str(tmp_path / "fx"), n_tables=2)
    lake = Lake.create_multi(str(tmp_path / "lake"), info["initials"], partitions_per_table=4)
    replay(lake, info["segment_paths"], ReplayConfig(segments_per_batch=2, sink_mode="delta"))
    with pytest.raises(ValueError, match="requires table="):
        lake.lookup(["doc000000000000"])
    with pytest.raises(ValueError, match="unknown table"):
        lake.lookup(["doc000000000000"], table="lake.nope")
    for t in ("lake.t0", "lake.t1"):
        full = lake.read_table(table=t)
        keys = full["doc_id"].to_pylist()[:4] + ["missing_key"]
        got = lake.lookup(keys, table=t)
        exp = full.filter(pa.compute.is_in(full["doc_id"], value_set=pa.array(keys)))
        assert_tables_equal(got, exp)
        # a key of the OTHER table must not leak in
        other = lake.read_table(table="lake.t1" if t == "lake.t0" else "lake.t0")
        other_only = sorted(set(other["doc_id"].to_pylist()) - set(full["doc_id"].to_pylist()))
        if other_only:
            assert lake.lookup(other_only[:2], table=t).num_rows == 0


# ---------------------------------------------------------------- read_changes


def _collect(ds):
    """Dataset -> pandas via Arrow (tombstone rows carry null payload
    lists, which Ray's pandas tensor-extension cast rejects)."""
    import ray

    tbls = ray.get(ds.to_arrow_refs())
    return pa.concat_tables(tbls, promote_options="default").to_pandas()


def _split_replay(fx, tmp_path, name, *, compact_between=None, compact_after=None):
    """Replay segments in two legs; return (lake, v_mid, oracle_leg1)."""
    spec, info, lake_tbl, segs, _ = fx
    lake = Lake.create(str(tmp_path / name), lake_tbl, num_partitions=4)
    cfg = ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta")
    paths = info["segment_paths"]
    replay(lake, paths[:4], cfg)
    if compact_between:
        lake.compact(mode=compact_between)
    v_mid = lake.current().version
    replay(lake, paths[4:], cfg)
    if compact_after:
        lake.compact(mode=compact_after)
    oracle_leg1 = apply_events_serial(lake_tbl, segs[:4])
    return lake, v_mid, oracle_leg1


def _apply_feed(state: pa.Table, feed_df) -> pa.Table:
    """Serial reference: apply a latest_only change feed to a snapshot."""
    import pandas as pd

    sdf = state.to_pandas().set_index("doc_id")
    feed_df = feed_df.sort_values("__seq")
    for _, row in feed_df.iterrows():
        if row["__deleted"]:
            sdf = sdf.drop(row["doc_id"], errors="ignore")
        else:
            vals = row.drop(["__seq", "__deleted", "doc_id"])
            for c in vals.index:
                if c not in sdf.columns:
                    sdf[c] = None
            sdf.loc[row["doc_id"], vals.index] = vals
    out = sdf.reset_index()
    return pa.Table.from_pandas(out[sorted(out.columns)], preserve_index=False)


def test_read_changes_reconstructs_final_state(ray_session, fx, tmp_path):
    lake, v_mid, oracle_leg1 = _split_replay(fx, tmp_path, "lake_rc")
    state_mid = lake.read_table(m=lake.manifest_at(v_mid))
    assert_tables_equal(state_mid, oracle_leg1)
    feed = _collect(lake.read_changes(v_mid, latest_only=True))
    assert len(feed) > 0
    assert feed["__deleted"].any()  # window deletes surface as tombstones
    floor = lake.manifest_at(v_mid).last_batch_id
    assert (feed["__seq"] > floor).all()
    reconstructed = _apply_feed(state_mid, feed)
    final = lake.read_table()
    assert_tables_equal(reconstructed, final)


def test_read_changes_exact_across_minor_compaction(ray_session, fx, tmp_path):
    """Minor compaction folds pre-window deltas into NEW files in the
    window; per-row __seq keeps those rows out of the feed."""
    lake, v_mid, oracle_leg1 = _split_replay(
        fx, tmp_path, "lake_rc_minor", compact_after="minor"
    )
    state_mid = lake.read_table(m=lake.manifest_at(v_mid))
    feed = _collect(lake.read_changes(v_mid, latest_only=True))
    reconstructed = _apply_feed(state_mid, feed)
    assert_tables_equal(reconstructed, lake.read_table())


def test_read_changes_exact_across_major_compaction_upserts(ray_session, fx, tmp_path):
    """Major compaction in the window: keep_seq preserves each row's
    writing batch, so carried-over (pre-window) rows stay OUT of the
    feed and window upserts stay IN. (Tombstones fold into absence —
    the documented major-compact caveat.)"""
    lake, v_mid, _ = _split_replay(fx, tmp_path, "lake_rc_major", compact_after="major")
    floor = lake.manifest_at(v_mid).last_batch_id
    feed = _collect(lake.read_changes(v_mid, latest_only=True))
    assert (feed["__seq"] > floor).all()
    assert not feed["__deleted"].any()  # major compact purged tombstones
    # every fed row matches the final lake state exactly
    final = lake.read_table().to_pandas().set_index("doc_id")
    for _, row in feed.iterrows():
        assert row["doc_id"] in final.index
    # and the same window read at the PRE-compact manifest keeps deletes
    pre = lake.current().version - 1
    feed_pre = _collect(lake.read_changes(v_mid, to_version=pre, latest_only=True))
    assert feed_pre["__deleted"].any()


def test_read_changes_empty_window(ray_session, fx, tmp_path):
    lake, _, _ = _split_replay(fx, tmp_path, "lake_rc_empty")
    v = lake.current().version
    feed = _collect(lake.read_changes(v))
    assert len(feed) == 0


# ---------------------------------------------------------------- gc


def test_gc_removes_orphaned_bloom_sidecars(ray_session, fx, tmp_path):
    lake, _ = _build_delta_lake(fx, tmp_path, name="lake_gc")
    lake.compact()  # deltas become unreferenced
    lake.gc(keep_manifests=1, min_age_sec=0.0)
    live = {f for i in lake.current().partitions.values() for f in i["files"]}
    for d in os.listdir(lake.dir):
        if not d.startswith("part="):
            continue
        for name in os.listdir(os.path.join(lake.dir, d)):
            rel = f"{d}/{name}"
            if name.endswith(filestats.BLOOM_SUFFIX):
                assert rel[: -len(filestats.BLOOM_SUFFIX)] in live, f"orphan sidecar {rel}"
            else:
                assert rel in live, f"orphan data file {rel}"
    # every live data file still has its sidecar
    for rel in live:
        assert os.path.exists(os.path.join(lake.dir, rel + filestats.BLOOM_SUFFIX))
