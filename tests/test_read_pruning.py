"""Column-pruned lake reads: read_dataset(columns=[...]) must equal the
full read projected to those columns — across delta and compacted
layouts, schema evolution (pre-DDL files lack the added column; its
bytes must not leave storage from files that do not have it), and the
multi-table union read. The heavy `tokens` list column never being
read is the 100-TB point of the feature."""

import pandas as pd
import pytest

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import (
    EventLogSpec,
    generate_lake,
    write_fixture,
    write_multi_table_fixture,
)
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.state.manifest import Lake

DDLS = (
    (
        0.4,
        {
            "op": "add_column",
            "table": "lake.sequences",
            "name": "lang",
            "type": "string",
            "nullable": True,
            "default": None,
        },
    ),
)


@pytest.fixture(scope="module")
def lake(tmp_path_factory, ray_session):
    spec = EventLogSpec(
        seed=71, n_initial_docs=150, n_events=1200, n_segments=4, ddls=DDLS
    )
    root = tmp_path_factory.mktemp("fx_prune")
    info = write_fixture(spec, str(root))
    lk = Lake.create(str(root / "lake"), generate_lake(spec), num_partitions=4)
    replay(
        lk,
        info["segment_paths"],
        ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta"),
    )
    return lk


def _cmp(lk, cols, table=None):
    got = lk.read_dataset(columns=cols, table=table).to_pandas()
    want_cols = ["doc_id"] + [c for c in cols if c != "doc_id"]
    assert list(got.columns) == want_cols  # doc_id always rides along
    full = lk.read_dataset(table=table).to_pandas()[want_cols]
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        full.sort_values("doc_id").reset_index(drop=True),
    )
    return got


def test_pruned_read_delta_layout(lake):
    _cmp(lake, ["n_tok", "source"])


def test_pruned_read_evolved_column(lake):
    """`lang` exists only in post-DDL files: the footer grouping reads
    it where present, null-fills where absent — values still exact."""
    got = _cmp(lake, ["lang"])
    assert got["lang"].notna().any() and got["lang"].isna().any()


def test_pruned_read_compacted_fast_path(ray_session, lake, tmp_path):
    import shutil

    dst = str(tmp_path / "lake_c")
    shutil.copytree(lake.dir, dst)
    lk = Lake(dst)
    lk.compact()
    _cmp(lk, ["n_tok"])
    _cmp(lk, ["lang", "source"])


def test_pruned_read_validates_columns(lake):
    with pytest.raises(ValueError, match="not in the"):
        lake.read_dataset(columns=["nope"])


def test_pruned_read_multi_table_union(ray_session, tmp_path):
    spec = EventLogSpec(seed=72, n_initial_docs=80, n_events=400, n_segments=2)
    minfo = write_multi_table_fixture(spec, str(tmp_path / "mfx"), n_tables=2)
    mlake = Lake.create_multi(
        str(tmp_path / "mlake"), minfo["initials"], partitions_per_table=2
    )
    replay(
        mlake,
        minfo["segment_paths"],
        ReplayConfig(segments_per_batch=2, sink_mode="delta"),
    )
    _cmp(mlake, ["n_tok"])  # union read
    _cmp(mlake, ["n_tok", "source"], table="lake.t0")  # single-table read


def test_pruned_change_feed_streaming_and_serial(ray_session, lake):
    """The change feed prunes too — streaming read_changes and the
    serial serving read_changes_table agree with the full feed
    projected, tombstones and __seq intact."""
    import pyarrow as pa
    import ray

    feed_full = pa.concat_tables(
        ray.get(lake.read_changes(0).to_arrow_refs()), promote_options="default"
    )
    feed_cols = pa.concat_tables(
        ray.get(lake.read_changes(0, columns=["n_tok"]).to_arrow_refs()),
        promote_options="default",
    )
    assert sorted(feed_cols.column_names) == ["__deleted", "__seq", "doc_id", "n_tok"]
    keep = sorted(feed_cols.column_names)
    a = feed_cols.select(keep).sort_by([("doc_id", "ascending"), ("__seq", "ascending")])
    b = feed_full.select(keep).sort_by([("doc_id", "ascending"), ("__seq", "ascending")])
    assert a.equals(b)
    serial = lake.read_changes_table(0, columns=["n_tok"])
    assert serial.select(keep).sort_by(
        [("doc_id", "ascending"), ("__seq", "ascending")]
    ).equals(b)
    with pytest.raises(ValueError, match="not in the"):
        lake.read_changes_table(0, columns=["nope"])


def _pc():
    import pyarrow.compute as pc

    return pc


def test_filtered_read_delta_post_merge(lake):
    """The predicate applies to CURRENT state: an old version matching
    it never resurrects a key whose latest version does not (delta
    path filters strictly post-merge)."""
    pc = _pc()
    full = lake.read_dataset().to_pandas()
    got = lake.read_dataset(filter=pc.field("n_tok") > 100).to_pandas()
    exp = full[full["n_tok"] > 100]
    assert sorted(got["doc_id"]) == sorted(exp["doc_id"])
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        exp.sort_values("doc_id").reset_index(drop=True),
    )


def test_filtered_read_fast_path_pushdown(ray_session, lake, tmp_path):
    """Compacted lake: same answer, with the expression pushed into the
    parquet scan (uniform footers after compaction)."""
    import shutil

    pc = _pc()
    dst = str(tmp_path / "lake_cf")
    shutil.copytree(lake.dir, dst)
    lk = Lake(dst)
    lk.compact()
    full = lk.read_dataset().to_pandas()
    got = lk.read_dataset(filter=pc.field("source") == "web").to_pandas()
    exp = full[full["source"] == "web"]
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        exp.sort_values("doc_id").reset_index(drop=True),
    )
    # composes with column pruning (filter over a selected column)
    got2 = lk.read_dataset(
        columns=["source"], filter=pc.field("source") == "web"
    ).to_pandas()
    assert list(got2.columns) == ["doc_id", "source"]
    assert sorted(got2["doc_id"]) == sorted(exp["doc_id"])


def test_filtered_read_evolved_column_null_no_match(lake):
    """Filtering on the mid-stream-added column: pre-DDL rows read null
    there, and null does not match — SQL semantics."""
    pc = _pc()
    full = lake.read_dataset().to_pandas()
    got = lake.read_dataset(filter=pc.field("lang") == "xx").to_pandas()
    exp = full[full["lang"] == "xx"]
    assert len(got) == len(exp)
    if len(exp):
        pd.testing.assert_frame_equal(
            got.sort_values("doc_id").reset_index(drop=True),
            exp.sort_values("doc_id").reset_index(drop=True),
        )


def test_filtered_read_multi_table_union(ray_session, tmp_path):
    pc = _pc()
    spec = EventLogSpec(seed=73, n_initial_docs=60, n_events=300, n_segments=2)
    minfo = write_multi_table_fixture(spec, str(tmp_path / "mfx"), n_tables=2)
    mlake = Lake.create_multi(
        str(tmp_path / "mlake"), minfo["initials"], partitions_per_table=2
    )
    replay(
        mlake,
        minfo["segment_paths"],
        ReplayConfig(segments_per_batch=2, sink_mode="delta"),
    )
    full = mlake.read_dataset().to_pandas()
    got = mlake.read_dataset(filter=pc.field("n_tok") <= 80).to_pandas()
    exp = full[full["n_tok"] <= 80]
    assert sorted(got["doc_id"]) == sorted(exp["doc_id"])


def test_read_table_columns_and_filter(lake):
    """The serial read_table mirrors read_dataset's columns=/filter=
    semantics exactly (evolution null-fill, post-merge predicate)."""
    pc = _pc()
    full = lake.read_table().to_pandas()
    got = lake.read_table(columns=["lang", "n_tok"], filter=pc.field("n_tok") > 100).to_pandas()
    assert list(got.columns) == ["doc_id", "lang", "n_tok"]
    exp = full[full["n_tok"] > 100][["doc_id", "lang", "n_tok"]]
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        exp.sort_values("doc_id").reset_index(drop=True),
    )
    with pytest.raises(ValueError, match="not in the"):
        lake.read_table(columns=["nope"])


def test_read_table_multi_table_pruned(ray_session, tmp_path):
    spec = EventLogSpec(seed=74, n_initial_docs=60, n_events=300, n_segments=2)
    minfo = write_multi_table_fixture(spec, str(tmp_path / "mfx"), n_tables=2)
    mlake = Lake.create_multi(
        str(tmp_path / "mlake"), minfo["initials"], partitions_per_table=2
    )
    replay(
        mlake,
        minfo["segment_paths"],
        ReplayConfig(segments_per_batch=2, sink_mode="delta"),
    )
    got = mlake.read_table(columns=["n_tok"]).to_pandas()
    exp = mlake.read_table().to_pandas()[["doc_id", "n_tok"]]
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        exp.sort_values("doc_id").reset_index(drop=True),
    )


def test_lookup_columns(ray_session, lake):
    """Point lookup prunes too — locally and over the wire."""
    full = lake.read_table()
    keys = full["doc_id"].to_pylist()[:5]
    got, stats = lake.lookup(keys, return_stats=True, columns=["n_tok"])
    assert got.column_names == ["doc_id", "n_tok"]
    exp = lake.lookup(keys).select(["doc_id", "n_tok"])
    assert got.sort_by("doc_id").equals(exp.sort_by("doc_id"))
    assert stats["files_read"] <= stats["files_total"]
    with pytest.raises(ValueError, match="not in the"):
        lake.lookup(keys, columns=["nope"])

    from clever_canal_ray.server import ConsumerServer, WireConsumer

    srv = ConsumerServer(lake.dir, lake.dir + "/_srv_state", lake_dir=lake.dir)
    srv.start()
    try:
        with WireConsumer(srv.host, srv.port) as w:
            wgot, _ = w.lookup(keys, columns=["n_tok"])
            assert wgot.sort_by("doc_id").equals(got.sort_by("doc_id"))
    finally:
        srv.stop()


def test_pruned_reads_resolve_renamed_columns(ray_session, tmp_path):
    """REGRESSION (review finding): pruned reads over a rename_column
    evolution must read the OLD physical name from pre-rename files and
    coalesce — not silently null them. Covers read_dataset, read_table,
    lookup, and the change feed."""
    import pyarrow.compute as pc_

    spec = EventLogSpec(
        seed=75,
        n_initial_docs=120,
        n_events=900,
        n_segments=4,
        ddls=((0.5, {"op": "rename_column", "from": "source", "to": "origin"}),),
    )
    root = tmp_path / "fx"
    info = write_fixture(spec, str(root))
    lk = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=4)
    replay(
        lk,
        info["segment_paths"],
        ReplayConfig(num_partitions=4, segments_per_batch=2, sink_mode="delta"),
    )
    full = lk.read_table()
    exp = full.select(["doc_id", "origin"])
    assert exp["origin"].null_count < exp.num_rows  # pre-rename rows carry values

    got_ds = lk.read_dataset(columns=["origin"]).to_pandas()
    assert got_ds["origin"].notna().sum() == exp.num_rows - exp["origin"].null_count
    got_tb = lk.read_table(columns=["origin"])
    assert got_tb.sort_by("doc_id").equals(exp.sort_by("doc_id"))

    keys = full["doc_id"].to_pylist()[:6]
    got_lk = lk.lookup(keys, columns=["origin"])
    exp_lk = lk.lookup(keys).select(["doc_id", "origin"])
    assert got_lk.sort_by("doc_id").equals(exp_lk.sort_by("doc_id"))

    feed_full = lk.read_changes_table(0)
    feed_pruned = lk.read_changes_table(0, columns=["origin"])
    keep = sorted(feed_pruned.column_names)
    order = [("doc_id", "ascending"), ("__seq", "ascending")]
    assert feed_pruned.select(keep).sort_by(order).equals(
        feed_full.select(keep).sort_by(order)
    )
    # filtered read on the renamed column (post-merge semantics)
    got_f = lk.read_dataset(filter=pc_.field("origin") == "web").to_pandas()
    full_df = full.to_pandas()
    assert sorted(got_f["doc_id"]) == sorted(full_df[full_df["origin"] == "web"]["doc_id"])


def test_fast_path_pushdown_skipped_when_column_missing(ray_session, tmp_path):
    """REGRESSION (review finding): a filter on a DDL-added column over
    a uniformly pre-DDL file set must not be pushed into the scan (the
    upcast null-fills; the scan would error)."""
    import pyarrow.compute as pc_

    spec = EventLogSpec(seed=76, n_initial_docs=100, n_events=200, n_segments=2)
    root = tmp_path / "fx"
    write_fixture(spec, str(root))
    lk = Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=2)
    # no replay: bootstrap files only (1/partition = fast path, uniform);
    # journal an add_column DDL directly so the target schema gains a
    # column no file physically has
    m2 = lk.current()
    m2.ddl_journal = list(m2.ddl_journal) + [
        {"position": [0, 0], "ddl": {"op": "add_column", "name": "lang", "type": "string", "nullable": True, "default": None}}
    ]
    got = lk.read_dataset(m=m2, filter=pc_.field("lang") == "xx").to_pandas()
    assert len(got) == 0  # null never matches; and no scan crash
    got2 = lk.read_dataset(m=m2, columns=["lang"]).to_pandas()
    assert got2["lang"].isna().all()


def test_filtered_read_pushdown_cache_across_versions(ray_session, lake, tmp_path):
    """The per-version footer-signature cache must never serve a stale
    verdict: a new committed batch (new manifest version, new files)
    re-derives the signature set and the filtered read sees new rows."""
    import shutil

    import numpy as np
    import pyarrow as pa

    from clever_canal_ray.state.partitioning import partition_ids

    pc = _pc()
    dst = str(tmp_path / "lake_cache")
    shutil.copytree(lake.dir, dst)
    lk = Lake(dst)
    lk.compact()
    before = lk.read_dataset(filter=pc.field("source") == "web").to_pandas()

    # commit one more web-source row -> new version, delta file appears
    m = lk.current()
    sch = m.payload_schema
    row = {f.name: [None] for f in sch}
    row["doc_id"] = ["zz_cache_probe"] if sch.field("doc_id").type == pa.string() else [10**9]
    if "source" in sch.names:
        row["source"] = ["web"]
    if "tokens" in sch.names:
        row["tokens"] = [np.array([1, 2], dtype=np.int32)]
    if "n_tok" in sch.names:
        row["n_tok"] = [2]
    body = pa.table({**{k: pa.array(v, sch.field(k).type) for k, v in row.items()},
                     "__deleted": pa.array([False])})
    body = body.cast(pa.schema(list(sch) + [pa.field("__deleted", pa.bool_())]))
    pid = int(partition_ids(body["doc_id"].to_numpy(zero_copy_only=False), m.num_partitions)[0])
    rel = lk._write_part_file(body, pid, m.last_batch_id + 1)
    lk.commit_batch(
        m, batch_id=m.last_batch_id + 1, new_hwm=(99, 99),
        touched={pid: {"file": rel, "rows": 1, "mode": "append", "events_in": 1}},
    )
    after = lk.read_dataset(filter=pc.field("source") == "web").to_pandas()
    assert len(after) == len(before) + 1


def test_pushdown_cache_survives_lake_recreate(ray_session, tmp_path):
    """REGRESSION (round-5 advice): deleting and recreating a lake at
    the SAME path restarts manifest versions, so a footer-signature
    cache keyed only by (dir, version) serves round-1 signatures to the
    recreated lake and wrongly pushes a filter on a column the new
    files don't physically have (scan error). The cache key must
    include the resolved file list."""
    import shutil

    import pyarrow as pa

    pc = _pc()
    p = str(tmp_path / "lake_rc")
    t1 = pa.table(
        {"doc_id": [f"d{i}" for i in range(20)], "lang": ["en"] * 10 + ["fr"] * 10}
    )
    lk = Lake.create(
        p,
        t1,
        num_partitions=2,
        ddl_journal=[
            {"op": "base_schema", "fields": [["doc_id", "string"], ["lang", "string"]]}
        ],
    )
    got = lk.read_dataset(filter=pc.field("lang") == "fr").to_pandas()
    assert len(got) == 10  # fast path, pushdown enabled -> cache populated

    shutil.rmtree(p)
    # same path, same version number (0), but files LACK `lang`: the
    # journaled DDL adds it to the target schema only
    t2 = pa.table({"doc_id": [f"d{i}" for i in range(20)]})
    lk2 = Lake.create(
        p,
        t2,
        num_partitions=2,
        ddl_journal=[
            {"op": "base_schema", "fields": [["doc_id", "string"]]},
            {"op": "add_column", "name": "lang", "type": "string", "nullable": True, "default": None},
        ],
    )
    got2 = lk2.read_dataset(filter=pc.field("lang") == "fr").to_pandas()
    assert len(got2) == 0  # null never matches; no stale-pushdown crash
