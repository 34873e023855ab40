"""Prometheus instance export — collector-family parity with the
reference's clever-canal-prometheus module.

Renders EVERY metric family the reference registers, under the SAME
names and label conventions (``destination`` = instance name,
``clientId`` for per-consumer families), with engine-true values:

- CanalInstanceExports (CanalInstanceExports.java:27-33):
  ``canal_instance``, ``canal_instance_subscriptions``,
  ``canal_instance_traffic_delay``, ``canal_instance_transactions``
- ParserCollector (ParserCollector.java:32-34):
  ``canal_instance_received_binlog_bytes``,
  ``canal_instance_parser_mode``,
  ``canal_instance_publish_blocking_time``
- SinkCollector (SinkCollector.java:30):
  ``canal_instance_sink_blocking_time``
- StoreCollector (StoreCollector.java:33-43): ``canal_instance_store``,
  ``..._store_produce_seq`` / ``..._store_consume_seq`` /
  ``..._store_produce_mem`` / ``..._store_consume_mem``
- EntryCollector (EntryCollector.java:38-43): ``..._put_rows`` /
  ``..._get_rows`` / ``..._ack_rows`` and ``..._put_delay`` /
  ``..._get_delay`` / ``..._ack_delay``
- PrometheusClientInstanceProfiler
  (PrometheusClientInstanceProfiler.java:20-24):
  ``canal_instance_client_packets``, ``..._client_bytes``,
  ``..._client_empty_batches``, ``..._client_request_error``,
  ``..._client_request_latency`` (sum/count pair)

Architectural analogs (documented in each HELP string): this engine
has no in-memory ring buffer — Ray Data's streaming executor provides
the backpressure the reference's ring blocking-time families measure,
so the two ``*_blocking_time`` counters report the time follow()/gets
spent idle-waiting on settled segments where available, else 0; the
store produce/consume ``seq`` gauges are packed (segment, offset)
positions (the journal/lake HWM and the slowest consumer's ack), and
the ``mem`` gauges are the settled journal bytes above those cursors —
the store backlog an operator actually pages over.
"""

from __future__ import annotations

import os
import time

from clever_canal_ray.schema import pack_position


def _esc(v) -> str:
    """Prometheus label-value escaping — clientId is an arbitrary
    remote-chosen string; one unescaped quote/newline would invalidate
    the WHOLE scrape."""
    return str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _line(out, name, value, labels=None):
    if labels:
        lab = ",".join(f'{k}="{_esc(v)}"' for k, v in labels.items())
        out.append(f"{name}{{{lab}}} {value}")
    else:
        out.append(f"{name} {value}")


def _family(out, name, typ, help_text):
    out.append(f"# HELP {name} {help_text}")
    out.append(f"# TYPE {name} {typ}")


def _journal_bytes_above(paths: list[str], pos: tuple) -> int:
    """Settled journal bytes in segments past ``pos`` — whole segments
    only (sub-segment byte cursors don't exist for parquet)."""
    total = 0
    for p in paths:
        try:
            seg_id = int(os.path.basename(p).split("-")[1].split(".")[0])
        except (IndexError, ValueError):  # pragma: no cover
            continue
        if seg_id > pos[0]:
            try:
                total += os.path.getsize(p)
            except OSError:  # pragma: no cover - racing a writer
                pass
    return total


def instance_families(
    instance: str = "canal",
    lake=None,
    journal_dirs=None,
    state_dir: str | None = None,
    client_stats: dict | None = None,
    wire_stats: dict | None = None,
    now_ms: int | None = None,
) -> str:
    """Text exposition of the full reference family set for one
    instance. Every input is optional — families whose source is
    absent render with their zero/identity value, never disappear
    (a scrape target's families must be stable)."""
    import json as _json

    now_ms = int(time.time() * 1000) if now_ms is None else int(now_ms)
    dest = {"destination": instance}
    out: list[str] = []

    # --- lake-side (parser/sink/meta) ------------------------------------
    totals: dict = {}
    hwm = (-1, -1)
    txns = 0
    if lake is not None:
        m = lake.current()
        totals = dict(m.metrics)
        hwm = tuple(m.hwm)
        txns = int(m.txn_hwm) + 1 if m.txn_hwm >= 0 else 0
        if not txns and m.gtid_executed:
            from clever_canal_ray.state.gtid import GtidSet

            txns = GtidSet.parse(m.gtid_executed).txn_count()
    last_ts = int(totals.get("last_execute_ts_ms", 0))

    # consumers: durable meta files first, live snapshots override
    consumers: dict[str, dict] = {}
    if state_dir and os.path.isdir(state_dir):
        for name in sorted(os.listdir(state_dir)):
            if name.startswith("meta-") and name.endswith(".json"):
                try:
                    with open(os.path.join(state_dir, name)) as f:
                        consumers[name[5:-5]] = _json.load(f)
                except (OSError, ValueError):  # pragma: no cover
                    continue
    consumers.update(client_stats or {})

    seg_paths: list[str] = []
    if journal_dirs is not None:
        from clever_canal_ray.sources.segments import discover_segments, settled_prefix

        seg_paths = settled_prefix(discover_segments(journal_dirs, missing_ok=True))

    _family(out, "canal_instance", "gauge", "Instance up (CanalInstanceExports).")
    _line(out, "canal_instance", 1, dest)

    _family(
        out,
        "canal_instance_subscriptions",
        "gauge",
        "Subscribed consumers (MetaCollector subscriptions analog).",
    )
    _line(
        out,
        "canal_instance_subscriptions",
        sum(1 for c in consumers.values() if c.get("subscribed")),
        dest,
    )

    _family(
        out,
        "canal_instance_traffic_delay",
        "gauge",
        "ms since the newest applied event's execute time (EntryCollector DELAY).",
    )
    _line(out, "canal_instance_traffic_delay", max(0, now_ms - last_ts) if last_ts else 0, dest)

    _family(
        out,
        "canal_instance_transactions",
        "counter",
        "Transactions applied (EntryCollector TRANSACTION; txn HWM here).",
    )
    _line(out, "canal_instance_transactions", txns, dest)

    # --- parser family ----------------------------------------------------
    _family(
        out,
        "canal_instance_received_binlog_bytes",
        "counter",
        "Settled journal bytes received (ParserCollector RECEIVED_BINLOG).",
    )
    recv = sum(os.path.getsize(p) for p in seg_paths if os.path.exists(p))
    _line(out, "canal_instance_received_binlog_bytes", recv, dest)

    _family(
        out,
        "canal_instance_parser_mode",
        "gauge",
        "Active parser mode (ParserCollector PARSER_MODE).",
    )
    _line(out, "canal_instance_parser_mode", 1, {**dest, "mode": "ray-columnar"})

    _family(
        out,
        "canal_instance_publish_blocking_time",
        "counter",
        "ms the parser blocked publishing (ring analog: Ray streaming "
        "backpressure — no user-visible blocking; 0 by construction).",
    )
    _line(out, "canal_instance_publish_blocking_time", int(totals.get("publish_blocking_ms", 0)), dest)

    _family(
        out,
        "canal_instance_sink_blocking_time",
        "counter",
        "ms the sink blocked (SinkCollector SINK_BLOCKING_TIME; same ring analog).",
    )
    _line(out, "canal_instance_sink_blocking_time", int(totals.get("sink_blocking_ms", 0)), dest)

    # --- store family -----------------------------------------------------
    _family(out, "canal_instance_store", "gauge", "Store up (StoreCollector STORE).")
    _line(out, "canal_instance_store", 1, dest)

    produce_seq = int(pack_position(hwm[0], hwm[1])) if hwm > (-1, -1) else 0
    cursors = [tuple(c.get("cursor", (-1, -1))) for c in consumers.values()] or [hwm]
    min_ack = min(cursors)
    consume_seq = (
        int(pack_position(min_ack[0], min_ack[1])) if min_ack > (-1, -1) else 0
    )
    _family(
        out,
        "canal_instance_store_produce_seq",
        "gauge",
        "Newest produced position, packed (segment<<40|offset) (StoreCollector PRODUCE).",
    )
    _line(out, "canal_instance_store_produce_seq", produce_seq, dest)
    _family(
        out,
        "canal_instance_store_consume_seq",
        "gauge",
        "Slowest consumer's acked position, packed (StoreCollector CONSUME).",
    )
    _line(out, "canal_instance_store_consume_seq", consume_seq, dest)

    deliv = [tuple(c.get("delivered", c.get("cursor", (-1, -1)))) for c in consumers.values()] or [hwm]
    _family(
        out,
        "canal_instance_store_produce_mem",
        "gauge",
        "Journal bytes above the slowest ACK cursor — the un-acked store "
        "backlog (StoreCollector PRODUCE_MEM analog).",
    )
    _line(out, "canal_instance_store_produce_mem", _journal_bytes_above(seg_paths, min_ack), dest)
    _family(
        out,
        "canal_instance_store_consume_mem",
        "gauge",
        "Journal bytes above the slowest DELIVERED cursor — not yet "
        "handed to any consumer (StoreCollector CONSUME_MEM analog).",
    )
    _line(out, "canal_instance_store_consume_mem", _journal_bytes_above(seg_paths, min(deliv)), dest)

    # --- entry (put/get/ack) family --------------------------------------
    _family(
        out,
        "canal_instance_put_rows",
        "counter",
        "Events ingested into the lake (EntryCollector PUT_ROWS).",
    )
    _line(out, "canal_instance_put_rows", int(totals.get("events_applied_total", 0)), dest)
    _family(
        out,
        "canal_instance_put_delay",
        "gauge",
        "ms between now and the newest ingested event (EntryCollector PUT_DELAY).",
    )
    _line(out, "canal_instance_put_delay", max(0, now_ms - last_ts) if last_ts else 0, dest)

    _family(out, "canal_instance_get_rows", "counter", "Rows delivered per consumer (GET_ROWS).")
    for cid, c in sorted(consumers.items()):
        _line(out, "canal_instance_get_rows", int(c.get("delivered_rows", 0)), {**dest, "clientId": cid})
    _family(out, "canal_instance_get_delay", "gauge", "ms since the newest delivered event (GET_DELAY).")
    for cid, c in sorted(consumers.items()):
        ts = int(c.get("last_delivered_ts_ms", 0))
        _line(out, "canal_instance_get_delay", max(0, now_ms - ts) if ts else 0, {**dest, "clientId": cid})
    _family(out, "canal_instance_ack_rows", "counter", "Rows acked per consumer (ACK_ROWS).")
    for cid, c in sorted(consumers.items()):
        _line(out, "canal_instance_ack_rows", int(c.get("acked_rows", 0)), {**dest, "clientId": cid})
    _family(out, "canal_instance_ack_delay", "gauge", "ms since the newest acked event (ACK_DELAY).")
    for cid, c in sorted(consumers.items()):
        ts = int(c.get("last_acked_ts_ms", 0))
        _line(out, "canal_instance_ack_delay", max(0, now_ms - ts) if ts else 0, {**dest, "clientId": cid})

    # --- client profiler family (wire server) -----------------------------
    ws = wire_stats or {}
    _family(
        out,
        "canal_instance_client_packets",
        "counter",
        "Wire requests served, by packet type (PrometheusClientInstanceProfiler PACKET_TYPE).",
    )
    for ptype, n in sorted((ws.get("packets") or {"none": 0}).items()):
        _line(out, "canal_instance_client_packets", int(n), {**dest, "packetType": ptype})
    _family(out, "canal_instance_client_bytes", "counter", "Outbound payload bytes (OUTBOUND_BYTES).")
    _line(out, "canal_instance_client_bytes", int(ws.get("bytes_out", 0)), dest)
    _family(out, "canal_instance_client_empty_batches", "counter", "Empty get responses (EMPTY_BATCHES).")
    _line(out, "canal_instance_client_empty_batches", int(ws.get("empty_batches", 0)), dest)
    _family(out, "canal_instance_client_request_error", "counter", "Failed wire requests (ERRORS).")
    _line(out, "canal_instance_client_request_error", int(ws.get("errors", 0)), dest)
    _family(
        out,
        "canal_instance_client_request_latency",
        "summary",
        "Wire request latency (LATENCY) — sum ms / count.",
    )
    _line(out, "canal_instance_client_request_latency_sum", round(float(ws.get("latency_ms_sum", 0.0)), 3), dest)
    _line(out, "canal_instance_client_request_latency_count", int(ws.get("latency_count", 0)), dest)

    return "\n".join(out) + "\n"
