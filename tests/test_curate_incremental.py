"""Incremental curation: a curated training-set lake maintained in
lockstep with a source documents lake over the change feed —
bootstrap filters the snapshot, each sync judges only the changed keys
(upsert on pass, tombstone on fail/delete), exactly-once via the
mirror cursor discipline."""

import numpy as np
import pandas as pd
import pyarrow as pa

from clever_canal_ray.pipelines.curation import curate_bootstrap, curate_sync
from clever_canal_ray.state.manifest import Lake
from clever_canal_ray.state.partitioning import partition_ids

EVAL_SENT = "benchmark answers must never leak into training data here"

BASE_DDL = {
    "op": "base_schema",
    "fields": [["doc_id", "int64"], ["text", "string"]],
}


def _good(i: int) -> str:
    return f"the item {i} is in that box and we keep words here plain"


def _src_docs() -> pd.DataFrame:
    rows = [(i, _good(i)) for i in range(30)]
    rows += [(100 + i, "der hund ist nicht ein und die katze hier") for i in range(3)]
    rows += [(110, "the and of")]  # too short
    rows += [(120, f"the {EVAL_SENT} is here")]  # contaminated
    return pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})


def _commit_changes(lake: Lake, upserts: pd.DataFrame | None, delete_ids=None):
    """Direct storage-level change commit (the same write path
    mirror/_apply_feed uses) — how the changes entered the source is
    orthogonal to the feed the sync consumes."""
    m = lake.current()
    schema = m.payload_schema
    parts = []
    if upserts is not None and len(upserts):
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(upserts["doc_id"].to_numpy(np.int64)),
                    "text": pa.array(upserts["text"].astype(object), pa.string()),
                    "__deleted": pa.array(np.zeros(len(upserts), bool)),
                },
            )
        )
    for d in delete_ids or []:
        # tombstones carry NULL payloads — exactly what the replay
        # delta sink writes on deletes (the judge must never touch them)
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array([int(d)], pa.int64()),
                    "text": pa.array([None], pa.string()),
                    "__deleted": pa.array([True]),
                }
            )
        )
    body = pa.concat_tables(parts)
    body = body.cast(pa.schema(list(schema) + [pa.field("__deleted", pa.bool_())]))
    batch_id = m.last_batch_id + 1
    pid = partition_ids(body["doc_id"].to_numpy(), m.num_partitions)
    touched = {}
    for p in np.unique(pid):
        sub = body.filter(pa.array(pid == p))
        rel = lake._write_part_file(sub, int(p), batch_id)
        touched[int(p)] = {
            "file": rel,
            "rows": sub.num_rows,
            "mode": "append",
            "events_in": sub.num_rows,
        }
    lake.commit_batch(m, batch_id=batch_id, new_hwm=(0, batch_id), touched=touched)


def _curated_state(dst: Lake) -> pd.DataFrame:
    return (
        dst.read_table()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "text"]]
    )


def _filters():
    return dict(keep_langs=("en",), min_tokens=6, eval_texts=[EVAL_SENT])


def test_curate_incremental_lockstep(ray_session, tmp_path):
    import ray.data as rd

    src = Lake.create_from_dataset(
        str(tmp_path / "src"),
        rd.from_pandas(_src_docs()),
        num_partitions=4,
        ddl_journal=[BASE_DDL],
    )
    dst = curate_bootstrap(src, str(tmp_path / "dst"), num_partitions=3, **_filters())
    state = _curated_state(dst)
    assert state["doc_id"].tolist() == list(range(30))  # filters applied in bootstrap

    # window 1: update 5 (still good), update 6 (now too short), delete 7,
    # insert 200 good / 201 german / 202 exact dup of 200 / 203 contaminated
    _commit_changes(
        src,
        pd.DataFrame(
            {
                "doc_id": [5, 6, 200, 201, 202, 203],
                "text": [
                    _good(5) + " edited",
                    "the and of now",
                    _good(200),
                    "der hund ist nicht ein und die katze neu",
                    _good(200),
                    f"the {EVAL_SENT} again",
                ],
            }
        ),
        delete_ids=[7],
    )
    r1 = curate_sync(src, dst, **_filters())
    assert not r1["noop"]
    state = _curated_state(dst)
    expect = sorted(set(range(30)) - {6, 7}) + [200]
    assert state["doc_id"].tolist() == expect
    assert state[state["doc_id"] == 5]["text"].iloc[0] == _good(5) + " edited"

    # duplicate sync: exactly-once no-op on the same cursor
    r_dup = curate_sync(src, dst, **_filters())
    assert r_dup["noop"]

    # window 2: doc 6 grows long again -> reappears; 202's text changes to
    # a unique good text -> no longer a window dup, appears
    _commit_changes(
        src,
        pd.DataFrame({"doc_id": [6, 202], "text": [_good(6) + " back", _good(202)]}),
    )
    r2 = curate_sync(src, dst, **_filters())
    assert not r2["noop"] and r2["applied_source_version"] == src.current().version
    state = _curated_state(dst)
    assert state["doc_id"].tolist() == sorted(set(range(30)) - {7}) + [200, 202]
    assert state[state["doc_id"] == 6]["text"].iloc[0] == _good(6) + " back"

    # serial oracle: judging the SOURCE's final live rows with the same
    # per-doc filters (+ the curated lake's survivor-of-dups rule) must
    # equal the curated lake — lockstep, not just per-window sanity
    src_rows = src.read_table().to_pandas()
    keep = []
    for _, r in src_rows.iterrows():
        t = r["text"]
        n = t.count(" ") + 1
        en = {"the", "and", "of", "is", "to", "a", "in", "that"} & set(t.lower().split())
        de = {"der", "die", "das", "und", "ist", "nicht", "ein"} & set(t.lower().split())
        if n >= 6 and len(en) > len(de) and EVAL_SENT not in t:
            keep.append(int(r["doc_id"]))
    assert sorted(keep) == state["doc_id"].tolist()


def test_curate_sync_refuses_multi_table(ray_session, tmp_path):
    import pytest
    import ray.data as rd

    src = Lake.create_multi_from_datasets(
        str(tmp_path / "multi"),
        {"a.t": rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]}))},
        partitions_per_table={"a.t": 2},
        ddl_journals={"a.t": [BASE_DDL]},
    )
    with pytest.raises(ValueError, match="single-table"):
        curate_sync(src, src)


def test_curate_sync_cli_subprocess(ray_session, tmp_path):
    """curate-sync CLI: bootstrap + one sync in a real subprocess."""
    import json
    import os
    import subprocess
    import sys

    import ray.data as rd

    src = Lake.create_from_dataset(
        str(tmp_path / "src"),
        rd.from_pandas(_src_docs()),
        num_partitions=4,
        ddl_journal=[BASE_DDL],
    )
    evalf = str(tmp_path / "eval.txt")
    with open(evalf, "w") as fh:
        fh.write(EVAL_SENT + "\n")
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def run():
        r = subprocess.run(
            [
                sys.executable, "-m", "clever_canal_ray", "curate-sync",
                "--src", str(tmp_path / "src"), "--dst", str(tmp_path / "dst"),
                "--bootstrap", "--partitions", "3",
                "--langs", "en", "--min-tokens", "6", "--eval-file", evalf,
            ],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return [json.loads(ln) for ln in r.stdout.strip().splitlines()]

    lines = run()
    assert lines[0]["bootstrap"] is True
    assert lines[1]["noop"] is True  # bootstrap pinned the current version
    dst = Lake(str(tmp_path / "dst"))
    assert _curated_state(dst)["doc_id"].tolist() == list(range(30))


def test_curate_sync_crash_retry_idempotent(ray_session, tmp_path, monkeypatch):
    """A crash between the judged delta writes and the commit leaves
    only orphans; the retried sync re-judges the SAME window
    deterministically and converges to the same curated state."""
    import pytest
    import ray.data as rd

    src = Lake.create_from_dataset(
        str(tmp_path / "src"),
        rd.from_pandas(_src_docs()),
        num_partitions=4,
        ddl_journal=[BASE_DDL],
    )
    dst = curate_bootstrap(src, str(tmp_path / "dst"), num_partitions=3, **_filters())
    _commit_changes(
        src,
        pd.DataFrame(
            {"doc_id": [5, 6, 200], "text": [_good(5) + " v2", "the and of", _good(200)]}
        ),
        delete_ids=[7],
    )

    real_commit = Lake.commit_batch
    state = {"boom": True}

    def flaky(self, *a, **kw):
        if state["boom"]:
            state["boom"] = False
            raise RuntimeError("injected crash before commit")
        return real_commit(self, *a, **kw)

    monkeypatch.setattr(Lake, "commit_batch", flaky)
    with pytest.raises(RuntimeError, match="injected"):
        curate_sync(src, dst, **_filters())
    out = curate_sync(src, dst, **_filters())
    assert not out["noop"]
    state_df = _curated_state(dst)
    assert state_df["doc_id"].tolist() == sorted(set(range(30)) - {6, 7}) + [200]
    # orphans from the crashed attempt are gc-able; state unchanged
    dst.gc(keep_manifests=1, min_age_sec=0.0)
    assert _curated_state(dst)["doc_id"].tolist() == sorted(set(range(30)) - {6, 7}) + [200]
