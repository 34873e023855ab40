"""AggregateMaintainer: incremental GROUP BY maintenance from change
events (retraction deltas). Seeded from the initial lake state, the
maintained aggregate must equal the same GROUP BY recomputed over the
serial oracle's final state — plus crash-resume idempotence and the
TRUNCATE reset."""

import pandas as pd
import pytest

from clever_canal_ray.fixtures.generator import EventLogSpec, generate_events, generate_lake, write_fixture
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.derived import AggregateMaintainer
from clever_canal_ray.schema import pack_position


def _final_state_agg(spec) -> pd.DataFrame:
    final = apply_events_serial(generate_lake(spec), generate_events(spec)[0]).to_pandas()
    return (
        final.groupby("source", dropna=False)
        .agg(n_docs=("doc_id", "size"), sum_n_tok=("n_tok", "sum"))
        .reset_index()
        .astype({"n_docs": "int64", "sum_n_tok": "int64"})
        .sort_values("source")
        .reset_index(drop=True)
    )


def _got(m: AggregateMaintainer) -> pd.DataFrame:
    return m.table().to_pandas().sort_values("source").reset_index(drop=True)


def test_incremental_agg_matches_final_state(tmp_path):
    spec = EventLogSpec(
        seed=91, n_initial_docs=200, n_events=2000, n_segments=5, rekey_frac=0.05
    )
    root = tmp_path / "fx"
    write_fixture(spec, str(root))
    m = AggregateMaintainer(str(root / "segments"), str(tmp_path / "state"))
    m.seed(generate_lake(spec))
    folded = m.run_to_end(batch_size=300)
    assert folded > 3  # genuinely incremental, many batches
    pd.testing.assert_frame_equal(_got(m), _final_state_agg(spec))
    # draining again is a no-op
    assert m.run_to_end(batch_size=300) == 0
    pd.testing.assert_frame_equal(_got(m), _final_state_agg(spec))


def test_crash_between_apply_and_ack_is_exactly_once(tmp_path):
    spec = EventLogSpec(seed=92, n_initial_docs=150, n_events=1200, n_segments=4)
    root = tmp_path / "fx"
    write_fixture(spec, str(root))
    state = str(tmp_path / "state")

    # run one batch manually: fold + persist state, then CRASH before ack
    m = AggregateMaintainer(str(root / "segments"), state)
    m.seed(generate_lake(spec))
    m.consumer.subscribe()
    bid, events = m.consumer.get_without_ack(300)
    ack = m.consumer.delivered_position
    m._fold(events)
    m._applied_pos = int(pack_position(ack[0], ack[1]))
    m._persist()
    del m  # crash: batch folded but never acked

    # resume: the batch is redelivered, recognized as folded, re-acked;
    # the rest of the stream folds exactly once
    m2 = AggregateMaintainer(str(root / "segments"), state)
    m2.run_to_end(batch_size=300)
    pd.testing.assert_frame_equal(_got(m2), _final_state_agg(spec))


def test_resume_with_different_batch_size_is_exactly_once(tmp_path):
    """A redelivered batch re-cut with a LARGER batch_size straddles
    applied_pos; the row-level position filter must fold only the fresh
    suffix (regression: whole-batch skip double-folded the prefix)."""
    spec = EventLogSpec(seed=95, n_initial_docs=150, n_events=1200, n_segments=4)
    root = tmp_path / "fx"
    write_fixture(spec, str(root))
    state = str(tmp_path / "state")

    m = AggregateMaintainer(str(root / "segments"), state)
    m.seed(generate_lake(spec))
    m.consumer.subscribe()
    bid, events = m.consumer.get_without_ack(300)
    ack = m.consumer.delivered_position
    m._fold(events)
    m._applied_pos = int(pack_position(ack[0], ack[1]))
    m._persist()
    del m  # crash before ack

    m2 = AggregateMaintainer(str(root / "segments"), state)
    m2.run_to_end(batch_size=700)  # re-cut: first batch straddles applied_pos
    pd.testing.assert_frame_equal(_got(m2), _final_state_agg(spec))


def test_multi_table_stream_rejected(tmp_path):
    from clever_canal_ray.fixtures.generator import retable_by_key

    spec = EventLogSpec(seed=96, n_initial_docs=80, n_events=400, n_segments=2)
    root = tmp_path / "fx"
    write_fixture(spec, str(root))
    # rewrite the journal as a 2-table stream
    import pyarrow.parquet as pq
    import os

    segdir = root / "segments"
    for f in os.listdir(segdir):
        if f.endswith(".parquet"):
            t = retable_by_key(pq.read_table(segdir / f), 2)
            pq.write_table(t, segdir / f)
    m = AggregateMaintainer(str(segdir), str(tmp_path / "state"))
    with pytest.raises(ValueError, match="multiple tables"):
        m.run_to_end(batch_size=200)


def test_stripped_stream_guard_fires_across_small_batches(tmp_path):
    """include_before=False stream + tiny batch_size: the cumulative
    counter still trips the guard (a per-batch threshold would not)."""
    spec = EventLogSpec(
        seed=97, n_initial_docs=100, n_events=600, n_segments=2, include_before=False
    )
    root = tmp_path / "fx"
    write_fixture(spec, str(root))
    m = AggregateMaintainer(str(root / "segments"), str(tmp_path / "state"))
    with pytest.raises(ValueError, match="no before-images"):
        m.run_to_end(batch_size=10)


def test_truncate_resets_groups(tmp_path):
    spec = EventLogSpec(
        seed=93, n_initial_docs=100, n_events=1000, n_segments=4, truncates=(0.5,)
    )
    root = tmp_path / "fx"
    write_fixture(spec, str(root))
    m = AggregateMaintainer(str(root / "segments"), str(tmp_path / "state"))
    m.seed(generate_lake(spec))
    m.run_to_end(batch_size=250)
    pd.testing.assert_frame_equal(_got(m), _final_state_agg(spec))


def test_state_schema_guard(tmp_path):
    spec = EventLogSpec(seed=94, n_initial_docs=50, n_events=300, n_segments=2)
    root = tmp_path / "fx"
    write_fixture(spec, str(root))
    state = str(tmp_path / "state")
    m = AggregateMaintainer(str(root / "segments"), state, sum_cols=("n_tok",))
    m.run_to_end(batch_size=100)
    with pytest.raises(ValueError, match="maintains"):
        AggregateMaintainer(str(root / "segments"), state, sum_cols=())


def test_maintainer_over_wire_consumer(tmp_path):
    """The downstream applier runs against a SERVED journal through a
    WireConsumer (consumer injection) — the remote-process downstream:
    same exactly-once fold, same final aggregate as the serial oracle."""
    from clever_canal_ray.server import ConsumerServer, WireConsumer

    spec = EventLogSpec(seed=93, n_initial_docs=150, n_events=1500, n_segments=4)
    root = tmp_path / "fx"
    write_fixture(spec, str(root))
    srv = ConsumerServer(str(root / "segments"), str(tmp_path / "srv_state"))
    srv.start()
    try:
        wire = WireConsumer(srv.host, srv.port, client_id="aggw")
        m = AggregateMaintainer(None, str(tmp_path / "state"), consumer=wire)
        m.seed(generate_lake(spec))
        folded = m.run_to_end(batch_size=400)
        assert folded > 1  # several wire get/ack round trips
        pd.testing.assert_frame_equal(_got(m), _final_state_agg(spec))
        assert m.run_to_end(batch_size=400) == 0  # drained; no-op
        pd.testing.assert_frame_equal(_got(m), _final_state_agg(spec))
        # cfg/journal_dirs would be silently dropped under an injected
        # consumer — the constructor refuses the combination
        with pytest.raises(ValueError, match="exclusive"):
            AggregateMaintainer(str(root / "segments"), str(tmp_path / "s2"), consumer=wire)
        wire.close()
    finally:
        srv.stop()


def test_run_follow_tracks_live_journal(tmp_path):
    """run_follow: the maintainer stays up while segments arrive,
    long-polls the consumer, folds each batch as it lands, and exits
    after idle_rounds empty polls — ending at the full-stream oracle."""
    import os
    import shutil
    import threading
    import time

    spec = EventLogSpec(seed=97, n_initial_docs=150, n_events=1200, n_segments=4)
    root = tmp_path / "fx"
    write_fixture(spec, str(root))
    src = str(root / "segments")
    names = sorted(n for n in os.listdir(src) if n.endswith(".parquet"))
    live = str(tmp_path / "live")
    os.makedirs(live)

    def publish(name: str) -> None:
        side = name + ".plan.json"
        if os.path.exists(os.path.join(src, side)):
            shutil.copyfile(os.path.join(src, side), os.path.join(live, side))
        tmp = os.path.join(live, name + ".tmp")
        shutil.copyfile(os.path.join(src, name), tmp)
        os.replace(tmp, os.path.join(live, name))

    publish(names[0])
    m = AggregateMaintainer(live, str(tmp_path / "state"))
    m.seed(generate_lake(spec))

    def feed() -> None:
        for n in names[1:]:
            time.sleep(0.3)
            publish(n)

    th = threading.Thread(target=feed)
    th.start()
    folded = m.run_follow(batch_size=200, poll_ms=400, idle_rounds=4)
    th.join()
    assert folded > 3
    pd.testing.assert_frame_equal(_got(m), _final_state_agg(spec))
    # follow again on the now-static journal: idles out, state unchanged
    assert m.run_follow(batch_size=200, poll_ms=100, idle_rounds=2) == 0
    pd.testing.assert_frame_equal(_got(m), _final_state_agg(spec))


def test_cli_derive_drain_and_resume(tmp_path, capsys):
    """CLI wiring: `derive` seeds from a lake, drains the journal, and
    a resumed invocation is an exactly-once no-op over the same state."""
    import json

    from clever_canal_ray.__main__ import main as cli_main
    from clever_canal_ray.state.manifest import Lake

    spec = EventLogSpec(seed=98, n_initial_docs=120, n_events=800, n_segments=3)
    root = tmp_path / "fx"
    write_fixture(spec, str(root))
    Lake.create(str(tmp_path / "lake"), generate_lake(spec), num_partitions=2)
    args = [
        "derive",
        "--journal", str(root / "segments"),
        "--state", str(tmp_path / "state"),
        "--seed-lake", str(tmp_path / "lake"),
    ]
    assert cli_main(args) == 0
    out1 = json.loads(capsys.readouterr().out)
    assert out1["folded"] > 0
    exp = _final_state_agg(spec)
    got = pd.DataFrame(out1["groups"]).sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)
    # resume: seed skipped, nothing new to fold, state unchanged
    assert cli_main(args) == 0
    out2 = json.loads(capsys.readouterr().out)
    assert out2["folded"] == 0 and out2["groups"] == out1["groups"]
