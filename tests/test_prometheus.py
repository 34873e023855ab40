"""Prometheus collector-family parity (prometheus.py — the
clever-canal-prometheus module analog): every family the reference
registers (CanalInstanceExports, ParserCollector, SinkCollector,
StoreCollector, EntryCollector, PrometheusClientInstanceProfiler) is
present under the same name, with engine-true values, scraped over the
wire from a running ConsumerServer."""

import os
import re

import pytest

from clever_canal_ray.fixtures.generator import EventLogSpec, generate_lake, write_fixture
from clever_canal_ray.server import ConsumerServer, WireConsumer

# every family name registered by the reference's prometheus module
REFERENCE_FAMILIES = [
    # CanalInstanceExports.java:27-33
    "canal_instance",
    "canal_instance_subscriptions",
    "canal_instance_traffic_delay",
    "canal_instance_transactions",
    # ParserCollector.java:32-34
    "canal_instance_publish_blocking_time",
    "canal_instance_received_binlog_bytes",
    "canal_instance_parser_mode",
    # SinkCollector.java:30
    "canal_instance_sink_blocking_time",
    # StoreCollector.java:33-43
    "canal_instance_store",
    "canal_instance_store_produce_seq",
    "canal_instance_store_consume_seq",
    "canal_instance_store_produce_mem",
    "canal_instance_store_consume_mem",
    # EntryCollector.java:38-43
    "canal_instance_put_delay",
    "canal_instance_get_delay",
    "canal_instance_ack_delay",
    "canal_instance_put_rows",
    "canal_instance_get_rows",
    "canal_instance_ack_rows",
    # PrometheusClientInstanceProfiler.java:20-24
    "canal_instance_client_packets",
    "canal_instance_client_bytes",
    "canal_instance_client_empty_batches",
    "canal_instance_client_request_error",
    "canal_instance_client_request_latency",
]


def _value(text: str, name: str, **labels) -> float:
    pat = re.compile(rf"^{re.escape(name)}(\{{[^}}]*\}})? ([-0-9.e+]+)$", re.M)
    for m in pat.finditer(text):
        lab = m.group(1) or ""
        if all(f'{k}="{v}"' in lab for k, v in labels.items()):
            return float(m.group(2))
    raise AssertionError(f"{name}{labels} not found in exposition")


@pytest.fixture(scope="module")
def served(tmp_path_factory, ray_session):
    """A replayed lake + a wire server with one consumer mid-drain."""
    from clever_canal_ray.config import ReplayConfig
    from clever_canal_ray.pipelines.replay import replay
    from clever_canal_ray.state.manifest import Lake

    root = tmp_path_factory.mktemp("fx_prom")
    spec = EventLogSpec(seed=51, n_initial_docs=80, n_events=600, n_segments=3)
    info = write_fixture(spec, str(root))
    seg = os.path.join(str(root), "segments")
    lake = Lake.create(str(root / "lake"), generate_lake(spec), num_partitions=2)
    replay(lake, info["segment_paths"], ReplayConfig(num_partitions=2, segments_per_batch=3))
    srv = ConsumerServer(seg, str(root / "state"), lake_dir=str(root / "lake"))
    srv.start()
    c = WireConsumer(srv.host, srv.port, client_id="prom1")
    c.subscribe()
    b0, t0 = c.get_without_ack(200)
    c.ack(b0)
    b1, t1 = c.get_without_ack(200)  # left in flight (un-acked)
    while c.get_without_ack(10_000) is not None:
        pass  # drain delivery; final empty get bumps empty_batches
    yield srv, c, info["n_events"], t0.num_rows, t1.num_rows
    c.close()
    srv.stop()


def test_every_reference_family_present(served):
    srv, c, total, acked_rows, inflight_rows = served
    text = c.metrics()
    for fam in REFERENCE_FAMILIES:
        assert f"# TYPE {fam} " in text, f"missing family: {fam}"
        assert re.search(rf"^{re.escape(fam)}[{{_ ]", text, re.M), fam


def test_family_values_are_engine_true(served):
    srv, c, total, acked_rows, inflight_rows = served
    text = c.metrics()
    assert _value(text, "canal_instance", destination="canal") == 1
    assert _value(text, "canal_instance_subscriptions") == 1
    assert _value(text, "canal_instance_put_rows") == total
    assert _value(text, "canal_instance_transactions") > 0
    # the consumer delivered everything, acked only the first batch
    assert _value(text, "canal_instance_get_rows", clientId="prom1") == total
    assert _value(text, "canal_instance_ack_rows", clientId="prom1") == acked_rows
    assert _value(text, "canal_instance_get_delay", clientId="prom1") >= 0
    assert _value(text, "canal_instance_ack_delay", clientId="prom1") >= 0
    # store gauges: produce = journal head > consume = acked cursor
    assert _value(text, "canal_instance_store_produce_seq") > _value(
        text, "canal_instance_store_consume_seq"
    )
    assert _value(text, "canal_instance_received_binlog_bytes") > 0
    assert _value(text, "canal_instance_store_produce_mem") > 0  # un-acked backlog
    # client profiler: packets counted by type, latency accumulated
    assert _value(text, "canal_instance_client_packets", packetType="get") >= 3
    assert _value(text, "canal_instance_client_packets", packetType="subscribe") == 1
    assert _value(text, "canal_instance_client_empty_batches") >= 1
    assert _value(text, "canal_instance_client_bytes") > 0
    assert _value(text, "canal_instance_client_request_latency_count") > 0
    assert _value(text, "canal_instance_client_request_error") == 0
    # errors family moves on a bad request
    with pytest.raises(RuntimeError):
        c.lookup(["x"], table="nope_not_a_table")
    assert _value(c.metrics(), "canal_instance_client_request_error") >= 1


def test_families_survive_server_restart(served, tmp_path):
    """get/ack counters ride the durable consumer meta: a FRESH server
    over the same state_dir reports them before any client attaches."""
    srv, c, total, acked_rows, _ = served
    srv2 = ConsumerServer(srv.journal_dirs, srv.state_dir, lake_dir=srv.lake_dir)
    srv2.start()
    try:
        with WireConsumer(srv2.host, srv2.port, client_id="scraper") as w:
            text = w.metrics()
        assert _value(text, "canal_instance_get_rows", clientId="prom1") == total
        assert _value(text, "canal_instance_ack_rows", clientId="prom1") == acked_rows
    finally:
        srv2.stop()


def test_standalone_exposition_no_inputs():
    """Families never disappear: with no lake/journal/consumers every
    family still renders (zero/identity values)."""
    from clever_canal_ray.prometheus import instance_families

    text = instance_families(instance="empty")
    for fam in REFERENCE_FAMILIES:
        assert f"# TYPE {fam} " in text, fam
    assert _value(text, "canal_instance_put_rows") == 0
    assert _value(text, "canal_instance_subscriptions") == 0


def test_label_values_are_escaped():
    """A hostile/accidental client id with quotes or newlines must not
    invalidate the whole scrape (label-value escaping)."""
    from clever_canal_ray.prometheus import instance_families

    text = instance_families(
        instance="canal",
        client_stats={'evil"} 1\nbogus 2': {"subscribed": True, "delivered_rows": 3}},
    )
    # the raw quote/newline never appear unescaped inside a label
    assert 'clientId="evil\\"} 1\\nbogus 2"' in text
    for ln in text.splitlines():
        if ln.startswith("#"):
            continue
        assert ln.count(" ") >= 1 and not ln.startswith("bogus"), ln


def test_http_metrics_endpoint(served):
    """Real HTTP scrape path (PrometheusService exporter analog): GET
    /metrics serves the full family set with the prometheus content
    type; other paths 404."""
    import urllib.request

    srv, c, total, acked_rows, _ = served
    host, port = srv.start_metrics_http(0)
    try:
        with urllib.request.urlopen(f"http://{host}:{port}/metrics", timeout=10) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        for fam in REFERENCE_FAMILIES:
            assert f"# TYPE {fam} " in text, fam
        assert _value(text, "canal_instance_put_rows") == total
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"http://{host}:{port}/nope", timeout=10)
    finally:
        pass  # srv.stop() in the fixture also closes the HTTP exporter
