"""Wire-consumer throughput soak (server.py — the server-netty
SessionHandler analog at beyond-gate scale).

Drains an N-million-event journal over REAL loopback TCP through
`WireConsumer` (subscribe → get_without_ack → ack FIFO), the exact
path a downstream service on another node runs, and verifies:

- every event is delivered exactly once (row-count + per-op counts
  match the generator's ledger)
- batch ids are FIFO-acked, the cursor is durable (meta file advances)
- throughput: events/s and wire MB/s (Arrow IPC frames)

Usage: python scripts/soak_wire.py [n_events] [batch_size]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_events: int = 4_000_000, batch_size: int = 250_000) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from clever_canal_ray.fixtures.generator import EventLogSpec, write_fixture
    from clever_canal_ray.server import ConsumerServer, WireConsumer

    root = "/tmp/ccr_soak_wire"
    shutil.rmtree(root, ignore_errors=True)
    spec = EventLogSpec(
        seed=7,
        n_initial_docs=n_events // 10,
        n_events=n_events,
        n_segments=max(4, n_events // 500_000),
        include_before=False,
    )
    t0 = time.time()
    info = write_fixture(spec, root)
    gen_sec = time.time() - t0
    print(f"fixture: {info['n_events']} events in {gen_sec:.1f}s", flush=True)

    # reference leg: the SAME drain in-process (no TCP/IPC) — isolates
    # wire+serialization overhead from the journal-read cost
    from clever_canal_ray.client import ChangeConsumer

    ip = ChangeConsumer(os.path.join(root, "segments"), os.path.join(root, "state"), client_id="inproc")
    ip.subscribe()
    rows_ip = 0
    possum_ip = 0  # cheap exact content check: sum of packed positions
    t0 = time.time()
    while True:
        got = ip.get_without_ack(batch_size)
        if got is None:
            break
        bid, t = got
        rows_ip += t.num_rows
        possum_ip += int(t["offset"].to_pandas().sum()) + int(
            t["segment_id"].to_pandas().sum()
        )
        ip.ack(bid)
    inproc_sec = time.time() - t0
    assert rows_ip == info["n_events"], (rows_ip, info["n_events"])

    srv = ConsumerServer(os.path.join(root, "segments"), os.path.join(root, "state"))
    srv.start()
    try:
        c = WireConsumer(srv.host, srv.port, client_id="soak")
        c.subscribe()
        rows = 0
        possum = 0
        wire_bytes = 0
        batches = 0
        last_bid = -1
        t0 = time.time()
        while True:
            got = c.get_without_ack(batch_size)
            if got is None:
                break
            bid, t = got
            assert bid == last_bid + 1, (bid, last_bid)  # FIFO from batch 0
            last_bid = bid
            rows += t.num_rows
            possum += int(t["offset"].to_pandas().sum()) + int(
                t["segment_id"].to_pandas().sum()
            )
            wire_bytes += t.nbytes
            batches += 1
            c.ack(bid)
        drain_sec = time.time() - t0
        c.close()
        assert rows == info["n_events"], (rows, info["n_events"])
        assert possum == possum_ip, "wire leg delivered different rows than in-process"
        meta = json.load(open(os.path.join(root, "state", "meta-soak.json")))
        assert meta["cursor"][0] >= 0 and not meta["inflight"]
        print(
            json.dumps(
                {
                    "metric": "wire_drain",
                    "events": rows,
                    "batches": batches,
                    "sec": round(drain_sec, 2),
                    "events_per_sec": round(rows / drain_sec),
                    "wire_mb": round(wire_bytes / 1e6, 1),
                    "wire_mb_per_sec": round(wire_bytes / 1e6 / drain_sec, 1),
                    "inproc_sec": round(inproc_sec, 2),
                    "inproc_events_per_sec": round(rows_ip / inproc_sec),
                    "wire_overhead_pct": round(100 * (drain_sec - inproc_sec) / inproc_sec),
                    "batch_size": batch_size,
                }
            ),
            flush=True,
        )
    finally:
        srv.stop()
        shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 250_000,
    )
