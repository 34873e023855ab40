"""Network consumer surface — the server-netty SessionHandler analog.

The reference exposes its consumer protocol over TCP (server-netty
SessionHandler.java:43-243 dispatching CanalProtocol.proto SUBSCRIPTION
/ GET / CLIENTACK / CLIENTROLLBACK packets over length-prefixed frames;
client SimpleCanalConnector.java speaks the same wire). This module is
the Ray-repo equivalent: a ``ConsumerServer`` that hosts one
:class:`clever_canal_ray.client.ChangeConsumer` per client id over a
length-prefixed wire protocol, plus the thin :class:`WireConsumer`
client — so a second PROCESS (or node) can subscribe/get/ack/rollback a
journal it cannot open locally.

Wire format (the CanalPacket analog, JSON instead of protobuf):

- every frame is ``[4-byte big-endian length][payload]``
- requests and responses are JSON frames
- a ``get`` response with data (``has_data: true``) is followed by ONE
  binary frame containing the batch as an Arrow IPC stream — the
  columnar zero-copy analog of the reference's packed RowData entries

Commands: ``subscribe`` (optional filter cfg — the
subscribe-filter-replace semantics, AbstractCanalInstance
.subscribeChange:69-95), ``get`` (get_without_ack), ``ack`` (FIFO),
``rollback``, ``seek`` (timestamp rewind), ``ping``, and — when the
server is given a ``lake_dir`` — ``lookup`` (bloom-pruned point read
of current row state by key, the request a reference ES/HBase adapter
would serve from its own store; here the lake answers over the same
wire).

Durability: all cursor state lives in the server-side ChangeConsumer
meta files (FileMixedMetaManager analog), so both a restarted client
AND a restarted server resume exactly where the client acked.

Authentication (optional): the reference's MySQL-style challenge-
response handshake (protocol SecurityUtil.java:28-51 scramble,
server-netty ClientAuthenticationHandler.java:40-78): the server
stores only ``SHA1(SHA1(password))``, sends a random seed on connect,
and the client proves knowledge of the password with
``token = SHA1(pw) XOR SHA1(seed || SHA1(SHA1(pw)))`` — the plaintext
never crosses the wire. Pass ``users={username: scramble_gen_pass(pw)}``
to :class:`ConsumerServer` and ``username=/password=`` to
:class:`WireConsumer`. Connections fail closed: an unauthenticated
session may issue NOTHING but ``auth``, and a bad credential closes
the socket (HandlerUtils.writeError + channel close semantics).

Failover: :class:`ClusterWireConsumer` — the ClusterCanalConnector
(client/impl/ClusterCanalConnector.java:97-205) analog: every call
retries across a list of server endpoints; on connection failure it
reconnects to the next node, re-subscribes, and ROLLS BACK un-acked
delivery (SimpleCanalConnector.java:161-170 rollback-on-connect), so a
drain completes exactly-once against a standby server sharing the
journal + state_dir (the HA pair's shared meta, PeriodMixedMetaManager
analog).
"""

from __future__ import annotations

import hashlib
import json
import os
import socket
import socketserver
import struct
import threading
import time
from typing import Optional

import pyarrow as pa

from clever_canal_ray.client import ChangeConsumer, FifoAckError
from clever_canal_ray.config import ReplayConfig


class AuthError(Exception):
    """Wire authentication failed (bad credentials / auth required)."""


def scramble_gen_pass(password: str) -> str:
    """What the SERVER stores: hex ``SHA1(SHA1(password))`` — the
    reference's SecurityUtil.scrambleGenPass. Never the plaintext."""
    return hashlib.sha1(hashlib.sha1(password.encode()).digest()).hexdigest()


def _scramble_token(password: str, seed: bytes) -> bytes:
    """CLIENT side: ``SHA1(pw) XOR SHA1(seed || SHA1(SHA1(pw)))``."""
    stage1 = hashlib.sha1(password.encode()).digest()
    stage2 = hashlib.sha1(stage1).digest()
    mask = hashlib.sha1(seed + stage2).digest()
    return bytes(a ^ b for a, b in zip(stage1, mask))


def _scramble_server_auth(token: bytes, stored_pass: bytes, seed: bytes) -> bool:
    """SERVER check (SecurityUtil.scrambleServerAuth): un-mask the
    token with ``SHA1(seed || stored)`` and require its SHA1 to equal
    the stored double-hash."""
    mask = hashlib.sha1(seed + stored_pass).digest()
    stage1 = bytes(a ^ b for a, b in zip(token, mask))
    import hmac as _hmac

    return _hmac.compare_digest(hashlib.sha1(stage1).digest(), stored_pass)

# ReplayConfig fields a remote client may set at subscribe time (the
# F1-F6 delivery filters). Predicates/callables cannot cross the wire.
_WIRE_CFG_FIELDS = (
    "table_whitelist_regex",
    "table_blacklist_regex",
    "table_list",
    "drop_ops",
    "column_projection",
)


def _send_frame(sock: socket.socket, payload: bytes) -> None:
    sock.sendall(struct.pack(">I", len(payload)) + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf.extend(chunk)
    return bytes(buf)


def _recv_frame(sock: socket.socket) -> bytes | None:
    head = _recv_exact(sock, 4)
    if head is None:
        return None
    (n,) = struct.unpack(">I", head)
    return _recv_exact(sock, n)


def _table_to_ipc(t: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue().to_pybytes()


def _ipc_to_table(buf: bytes) -> pa.Table:
    return pa.ipc.open_stream(pa.BufferReader(buf)).read_all()


class ConsumerServer:
    """Hosts ChangeConsumers for remote clients over TCP.

    One consumer (+ lock — the per-session serialization the reference
    gets from netty's per-channel ordering) per client id; consumers
    are created lazily and persist their cursors under
    ``<state_dir>/meta-<client_id>.json``.
    """

    def __init__(
        self,
        journal_dirs: list[str] | str,
        state_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        base_cfg: Optional[ReplayConfig] = None,
        lake_dir: Optional[str] = None,
        users: Optional[dict] = None,
    ):
        self.journal_dirs = journal_dirs
        self.state_dir = state_dir
        self.base_cfg = base_cfg
        self.lake_dir = lake_dir
        # username -> scramble_gen_pass(password) hex. None/{} = open
        # server (back-compat); non-empty = the reference's mandatory
        # handshake: seed on connect, auth before ANY other command.
        self._users = dict(users) if users else None
        self._lake = None  # lazy; manifest re-read per lookup call
        self._consumers: dict[str, tuple[ChangeConsumer, threading.Lock]] = {}
        self._consumers_lock = threading.Lock()
        outer = self

        self._open_socks: set = set()
        # client-profiler counters (PrometheusClientInstanceProfiler
        # analog): packets by type, outbound bytes, empty gets, errors,
        # latency sum/count — scraped via the `metrics` command
        self._wire_stats = {
            "packets": {},
            "bytes_out": 0,
            "empty_batches": 0,
            "errors": 0,
            "latency_ms_sum": 0.0,
            "latency_count": 0,
        }
        self._wire_stats_lock = threading.Lock()

        class Handler(socketserver.BaseRequestHandler):
            def setup(self) -> None:
                outer._open_socks.add(self.request)

            def finish(self) -> None:
                outer._open_socks.discard(self.request)

            def handle(self) -> None:  # one connection: frame loop until EOF
                authed = outer._users is None
                seed = None
                if not authed:
                    # server-initiated handshake with a per-connection
                    # random seed (HandshakeInitializationHandler analog)
                    seed = os.urandom(8)
                    _send_frame(
                        self.request,
                        json.dumps(
                            {"handshake": True, "auth_required": True, "seed": seed.hex()}
                        ).encode(),
                    )
                while True:
                    raw = _recv_frame(self.request)
                    if raw is None:
                        return
                    t0 = time.monotonic()
                    req: dict = {}
                    try:
                        req = json.loads(raw)
                        if not authed:
                            if req.get("cmd") != "auth":
                                # fail closed AND hang up, like the
                                # reference's writeError + channel close
                                _send_frame(
                                    self.request,
                                    json.dumps(
                                        {"ok": False, "error": "AuthError",
                                         "message": "authentication required"}
                                    ).encode(),
                                )
                                return
                            user = str(req.get("username", ""))
                            stored = (outer._users or {}).get(user)
                            token = bytes.fromhex(str(req.get("token", "")))
                            if stored is None or not _scramble_server_auth(
                                token, bytes.fromhex(stored), seed
                            ):
                                _send_frame(
                                    self.request,
                                    json.dumps(
                                        {"ok": False, "error": "AuthError",
                                         "message": f"auth failed for user: {user}"}
                                    ).encode(),
                                )
                                return  # close the connection on bad creds
                            authed = True
                            _send_frame(self.request, json.dumps({"ok": True}).encode())
                            continue
                        resp, data = outer._dispatch(req)
                    except FifoAckError as e:
                        resp, data = {"ok": False, "error": "fifo", "message": str(e)}, None
                    except Exception as e:  # malformed frame / bad cmd
                        resp, data = {
                            "ok": False,
                            "error": type(e).__name__,
                            "message": str(e),
                        }, None
                    payload = json.dumps(resp).encode()
                    outer._profile(req if isinstance(req, dict) else {}, resp, payload, data, t0)
                    _send_frame(self.request, payload)
                    if data is not None:
                        _send_frame(self.request, data)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread: threading.Thread | None = None

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> tuple[str, int]:
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self.host, self.port

    def start_metrics_http(self, port: int = 0, host: str = "127.0.0.1") -> tuple[str, int]:
        """Serve ``GET /metrics`` over plain HTTP — the reference's
        PrometheusService exporter (PrometheusService.java HTTPServer):
        point a real Prometheus scrape job here. Unauthenticated by
        convention (scrapes run inside the monitoring perimeter), like
        the reference's exporter port."""
        import http.server

        outer = self

        class MetricsHandler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 - stdlib API name
                if self.path.split("?")[0].rstrip("/") not in ("", "/metrics"):
                    self.send_response(404)
                    self.end_headers()
                    return
                body = outer.prometheus_metrics().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        class MetricsServer(http.server.ThreadingHTTPServer):
            daemon_threads = True
            allow_reuse_address = True

        self._metrics_http = MetricsServer((host, port), MetricsHandler)
        t = threading.Thread(target=self._metrics_http.serve_forever, daemon=True)
        t.start()
        self._metrics_http_thread = t
        return self._metrics_http.server_address

    def stop(self) -> None:
        """Stop like a dying node: close the listener AND sever every
        live session (a merely-unlistening server would keep serving
        old connections forever, masking failover bugs)."""
        self._server.shutdown()
        self._server.server_close()
        if getattr(self, "_metrics_http", None) is not None:
            self._metrics_http.shutdown()
            self._metrics_http.server_close()
            self._metrics_http_thread.join(timeout=5)
            self._metrics_http = None
        for s in list(self._open_socks):
            try:
                s.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                s.close()
            except OSError:  # pragma: no cover
                pass
        if self._thread is not None:
            self._thread.join(timeout=5)

    def serve_forever(self) -> None:
        self._server.serve_forever()

    # -- dispatch ----------------------------------------------------------

    def _profile(self, req: dict, resp: dict, payload: bytes, data, t0: float) -> None:
        """Accumulate the client-profiler families for one request."""
        ptype = str(req.get("cmd", "malformed"))
        with self._wire_stats_lock:
            s = self._wire_stats
            s["packets"][ptype] = s["packets"].get(ptype, 0) + 1
            s["bytes_out"] += len(payload) + (len(data) if data is not None else 0)
            if ptype == "get" and resp.get("ok") and not resp.get("has_data"):
                s["empty_batches"] += 1
            if not resp.get("ok"):
                s["errors"] += 1
            s["latency_ms_sum"] += (time.monotonic() - t0) * 1000.0
            s["latency_count"] += 1

    def prometheus_metrics(self, instance: str = "canal") -> str:
        """Full reference-family exposition for THIS instance: lake
        counters (when lake_dir given), journal/store gauges, per-client
        get/ack families from live consumers + durable meta, and the
        wire client-profiler counters."""
        from clever_canal_ray.prometheus import instance_families
        from clever_canal_ray.state.manifest import Lake

        with self._consumers_lock:
            live = {cid: c for cid, (c, _) in self._consumers.items()}
        client_stats = {cid: c.stats() for cid, c in live.items()}
        with self._wire_stats_lock:
            ws = {
                **self._wire_stats,
                "packets": dict(self._wire_stats["packets"]),
            }
        lake = None
        if self.lake_dir is not None and os.path.exists(
            os.path.join(self.lake_dir, "_manifest", "_CURRENT")
        ):
            lake = Lake(self.lake_dir)
        return instance_families(
            instance=instance,
            lake=lake,
            journal_dirs=self.journal_dirs,
            state_dir=self.state_dir,
            client_stats=client_stats or None,
            wire_stats=ws,
        )

    def _get_lake(self, cmd: str):
        """Lazy lake handle for the stateless lake-backed RPCs; the
        manifest pointer is still re-read from disk per call."""
        if self.lake_dir is None:
            raise ValueError(f"server has no lake_dir: {cmd} unavailable")
        if self._lake is None:
            with self._consumers_lock:  # race-free lazy init
                if self._lake is None:
                    from clever_canal_ray.state.manifest import Lake

                    self._lake = Lake(self.lake_dir)
        return self._lake

    def _stats(self, of: Optional[str] = None) -> dict:
        """Admin/monitoring snapshot (the reference's CanalStats /
        admin-port consumer-lag view): per-client cursor positions plus
        the journal head, so an operator can watch consumer lag
        remotely. Attached consumers are read live under their session
        locks; clients known only from durable meta files (e.g. after a
        server restart, before the client reconnects) are reported from
        disk with ``attached: false``. The head comes from the LAST
        plan-bearing segment, scanning backwards — O(1) sidecar reads
        per call regardless of journal length, no data-file reads."""
        from clever_canal_ray.sources.segments import (
            discover_segments,
            load_segment_plan,
        )

        paths = discover_segments(self.journal_dirs, missing_ok=True)
        head = None
        for pth in reversed(paths):
            try:
                plan = load_segment_plan(pth)
            except Exception:  # mid-write tail: step back one
                continue
            if plan is not None:
                head = list(plan["max_pos"])
                break
        clients: dict[str, dict] = {}
        if os.path.isdir(self.state_dir):
            for name in sorted(os.listdir(self.state_dir)):
                if not (name.startswith("meta-") and name.endswith(".json")):
                    continue
                path = os.path.join(self.state_dir, name)
                try:
                    with open(path) as f:
                        d = json.load(f)
                except (OSError, json.JSONDecodeError):
                    continue  # mid-write/corrupt: live snapshot below still covers attached clients
                cid = name[len("meta-") : -len(".json")]
                cursor = list(d.get("cursor", (-1, -1)))
                clients[cid] = {
                    "client_id": cid,
                    "cursor": cursor,
                    "delivered": list(d.get("delivered", cursor)),
                    "inflight": len(d.get("inflight", [])),
                    "subscribed": bool(d.get("subscribed", False)),
                    "next_batch_id": int(d.get("next_batch_id", 0)),
                    "attached": False,
                }
        with self._consumers_lock:
            live = list(self._consumers.items())
        for cid, (consumer, lock) in live:
            # don't block the admin read behind a session mid-long-poll
            # (get holds the lock up to timeout_ms): fall back to the
            # durable meta snapshot for busy sessions
            if lock.acquire(timeout=0.2):
                try:
                    s = consumer.stats()
                finally:
                    lock.release()
                s["client_id"] = cid
                s["attached"] = True
                clients[cid] = s
            elif cid in clients:
                clients[cid]["attached"] = True
                clients[cid]["busy"] = True
            else:
                clients[cid] = {"client_id": cid, "attached": True, "busy": True}
        rows = sorted(clients.values(), key=lambda c: c["client_id"])
        if of is not None:
            rows = [c for c in rows if c["client_id"] == of]
        return {
            "ok": True,
            "journal_head": head,
            "n_segments": len(paths),
            "clients": rows,
        }

    def _consumer(self, client_id: str) -> tuple[ChangeConsumer, threading.Lock]:
        with self._consumers_lock:
            if client_id not in self._consumers:
                self._consumers[client_id] = (
                    ChangeConsumer(
                        self.journal_dirs,
                        self.state_dir,
                        client_id=client_id,
                        cfg=self.base_cfg,
                    ),
                    threading.Lock(),
                )
            return self._consumers[client_id]

    def _dispatch(self, req: dict) -> tuple[dict, bytes | None]:
        cmd = req.get("cmd")
        if cmd == "ping":
            return {"ok": True}, None
        if cmd == "stats":
            # stateless admin read; never creates a consumer for the caller
            return self._stats(req.get("of")), None
        if cmd == "metrics":
            # prometheus scrape: full reference-family text exposition
            return {
                "ok": True,
                "text": self.prometheus_metrics(str(req.get("instance", "canal"))),
            }, None
        if cmd == "lookup":
            # stateless (no consumer/cursor); served from the lake's
            # current manifest, driver-serial in the server process
            lake = self._get_lake("lookup")
            cols = req.get("columns")
            t, stats = lake.lookup(
                list(req["keys"]),
                table=req.get("table"),
                return_stats=True,
                columns=list(cols) if cols is not None else None,
            )
            return (
                {"ok": True, "has_data": True, "n_rows": t.num_rows, "stats": stats},
                _table_to_ipc(t),
            )
        if cmd == "changes":
            # stateless incremental feed between manifest versions —
            # the third serving read (get/ack drains the live journal,
            # lookup reads point state, changes replays lake history)
            lake = self._get_lake("changes")
            to = req.get("to")
            # resolve the ceiling ONCE, before planning: a commit that
            # lands while we read must not advance the to-version the
            # client will poll from next (rows would be skipped forever)
            to_v = int(to) if to is not None else lake.current().version
            cols = req.get("columns")
            t = lake.read_changes_table(
                int(req["since"]),
                to_version=to_v,
                table=req.get("table"),
                latest_only=bool(req.get("latest_only", False)),
                columns=list(cols) if cols is not None else None,
            )
            return (
                {"ok": True, "has_data": True, "n_rows": t.num_rows, "to": to_v},
                _table_to_ipc(t),
            )
        if cmd == "snapshot":
            # catalog-over-the-wire: the remote BOOTSTRAP handshake. A
            # client with shared-storage access pins one consistent
            # version (the pointer may advance between calls), bulk
            # reads the pinned file set itself (Manifest.from_json ->
            # Lake.read_dataset(m) — the full lake never streams over
            # this socket), then tails with changes(since=version).
            lake = self._get_lake("snapshot")
            m = lake.current()
            want = req.get("table")
            lo, hi = 0, m.num_partitions
            if want is not None:
                if m.tables is None or want not in m.tables:
                    raise ValueError(f"unknown table: {want!r}")
                t_info = m.tables[want]
                lo, hi = t_info["base_pid"], t_info["base_pid"] + t_info["num_partitions"]
            files = {
                pid_s: {
                    "files": [os.path.join(lake.dir, f) for f in info["files"]],
                    "rows": info["rows"],
                }
                for pid_s, info in m.partitions.items()
                if lo <= int(pid_s) < hi
            }
            return {
                "ok": True,
                "version": m.version,
                "hwm": list(m.hwm),
                "txn_hwm": m.txn_hwm,
                "num_partitions": m.num_partitions,
                "tables": sorted(m.tables) if m.tables is not None else None,
                "partitions": files,
                "lake_dir": lake.dir,
                "manifest": m.to_json(),
            }, None
        client_id = str(req.get("client_id", "1001"))
        consumer, lock = self._consumer(client_id)
        with lock:
            if cmd == "subscribe":
                cfg = None
                wire_cfg = req.get("cfg") or {}
                unknown = set(wire_cfg) - set(_WIRE_CFG_FIELDS)
                if unknown:
                    raise ValueError(f"non-wire-settable cfg fields: {sorted(unknown)}")
                if wire_cfg:
                    kw = {
                        k: tuple(v) if isinstance(v, list) else v
                        for k, v in wire_cfg.items()
                    }
                    cfg = ReplayConfig(**kw)
                consumer.subscribe(cfg)
                return {"ok": True}, None
            if cmd == "get":
                # optional long-poll (getWithoutAck(timeout) semantics),
                # implemented by the hosted ChangeConsumer. Only THIS
                # client's session waits — other clients dispatch on
                # their own handler threads and locks.
                got = consumer.get_without_ack(
                    int(req.get("batch_size", 4096)),
                    timeout_ms=int(req.get("timeout_ms", 0)) or None,
                )
                if got is None:
                    return {"ok": True, "has_data": False}, None
                batch_id, t = got
                return (
                    {
                        "ok": True,
                        "has_data": True,
                        "batch_id": batch_id,
                        "n_rows": t.num_rows,
                        "delivered": list(consumer.delivered_position),
                    },
                    _table_to_ipc(t),
                )
            if cmd == "ack":
                consumer.ack(int(req["batch_id"]))
                return {"ok": True}, None
            if cmd == "rollback":
                consumer.rollback()
                return {"ok": True}, None
            if cmd == "seek":
                pos = consumer.seek_to_timestamp(int(req["ts_ms"]))
                return {"ok": True, "position": list(pos)}, None
        raise ValueError(f"unknown cmd: {cmd!r}")


class WireConsumer:
    """Thin wire client — the SimpleCanalConnector analog. Mirrors the
    ChangeConsumer method surface over one TCP connection."""

    def __init__(
        self,
        host: str,
        port: int,
        client_id: str = "1001",
        timeout: float = 30.0,
        username: str | None = None,
        password: str | None = None,
        handshake_timeout: float = 5.0,
    ):
        self.client_id = client_id
        # mirrors ChangeConsumer.delivered_position (updated on each
        # get) so wire and in-process consumers are interchangeable for
        # downstream appliers (pipelines/derived.AggregateMaintainer)
        self.delivered_position: tuple[int, int] | None = None
        self._sock = socket.create_connection((host, port), timeout=timeout)
        if username is not None:
            # auth-enabled server: read the seed handshake, answer with
            # the scramble token (plaintext never crosses the wire).
            # Bounded wait: an auth-DISABLED server sends no handshake
            # and sits waiting for our first request — fail fast with a
            # pointed message instead of the full socket timeout.
            # Any handshake failure CLOSES the socket before raising —
            # ClusterWireConsumer rotates endpoints through this path
            # and must not leak one open fd per failed node per sweep.
            try:
                hs_to = handshake_timeout if timeout is None else min(timeout, handshake_timeout)
                old_to = self._sock.gettimeout()
                self._sock.settimeout(hs_to)
                try:
                    raw = _recv_frame(self._sock)
                except (TimeoutError, socket.timeout):
                    raise AuthError(
                        f"no auth handshake from server within {hs_to:g}s — the "
                        "server is likely not auth-enabled (omit username/"
                        "password); if it is just slow, raise handshake_timeout"
                    ) from None
                finally:
                    self._sock.settimeout(old_to)
                if raw is None:
                    raise ConnectionError("server closed during handshake")
                hs = json.loads(raw)
                if not hs.get("handshake"):
                    raise AuthError("server did not offer an auth handshake")
                token = _scramble_token(password or "", bytes.fromhex(hs["seed"]))
                resp, _ = self._call(
                    {"cmd": "auth", "username": username, "token": token.hex()}
                )
                if not resp.get("ok"):  # pragma: no cover - _call raises first
                    raise AuthError(resp.get("message", "auth failed"))
            except BaseException:
                self.close()
                raise

    def _call(self, req: dict) -> tuple[dict, bytes | None]:
        req["client_id"] = self.client_id
        _send_frame(self._sock, json.dumps(req).encode())
        raw = _recv_frame(self._sock)
        if raw is None:
            raise ConnectionError("server closed the connection")
        resp = json.loads(raw)
        if resp.get("handshake"):
            # credential-less client against an auth-required server:
            # the first frame back is the server's seed challenge
            raise AuthError(
                "server requires authentication — pass username=/password="
            )
        data = None
        if resp.get("has_data"):
            data = _recv_frame(self._sock)
            if data is None:
                raise ConnectionError("server closed mid-frame")
        if not resp.get("ok"):
            if resp.get("error") == "fifo":
                raise FifoAckError(resp.get("message", ""))
            if resp.get("error") == "AuthError":
                raise AuthError(resp.get("message", "auth failed"))
            raise RuntimeError(f"{resp.get('error')}: {resp.get('message')}")
        return resp, data

    def subscribe(self, cfg: dict | None = None) -> None:
        self._call({"cmd": "subscribe", "cfg": cfg})

    def get_without_ack(
        self, batch_size: int, timeout_ms: int | None = None
    ) -> tuple[int, pa.Table] | None:
        """``timeout_ms`` long-polls a drained journal server-side (the
        reference getWithoutAck(timeout)): the call blocks until rows
        arrive or the deadline passes, instead of returning None
        immediately. The socket read deadline is widened to cover it."""
        req: dict = {"cmd": "get", "batch_size": batch_size}
        old_to = None
        if timeout_ms:
            req["timeout_ms"] = int(timeout_ms)
            old_to = self._sock.gettimeout()
            if old_to is not None:
                self._sock.settimeout(old_to + timeout_ms / 1000.0)
        try:
            resp, data = self._call(req)
        finally:
            if old_to is not None:
                self._sock.settimeout(old_to)
        if not resp.get("has_data"):
            return None
        self.delivered_position = tuple(resp["delivered"])
        return int(resp["batch_id"]), _ipc_to_table(data)

    def ack(self, batch_id: int) -> None:
        self._call({"cmd": "ack", "batch_id": batch_id})

    def rollback(self) -> None:
        self._call({"cmd": "rollback"})

    def seek_to_timestamp(self, ts_ms: int) -> tuple[int, int]:
        resp, _ = self._call({"cmd": "seek", "ts_ms": ts_ms})
        return tuple(resp["position"])

    def lookup(
        self,
        keys: list,
        table: str | None = None,
        columns: list[str] | None = None,
    ) -> tuple[pa.Table, dict]:
        """Point read of current lake row state by key (requires the
        server to have been started with ``lake_dir``). ``columns``
        prunes the server-side read and the wire payload."""
        req: dict = {"cmd": "lookup", "keys": list(keys)}
        if table is not None:
            req["table"] = table
        if columns is not None:
            req["columns"] = list(columns)
        resp, data = self._call(req)
        return _ipc_to_table(data), resp["stats"]

    def changes(
        self,
        since: int,
        to: int | None = None,
        table: str | None = None,
        latest_only: bool = False,
        columns: list[str] | None = None,
    ) -> tuple[pa.Table, int]:
        """Incremental change feed between manifest versions (requires
        ``lake_dir`` on the server). Returns (rows, served_to_version) —
        poll with ``since = served_to_version`` to tail the lake.
        ``columns`` prunes the server-side read AND the wire payload to
        the named payload columns (+ doc_id and the feed helpers)."""
        req = {"cmd": "changes", "since": int(since), "latest_only": latest_only}
        if to is not None:
            req["to"] = int(to)
        if table is not None:
            req["table"] = table
        if columns is not None:
            req["columns"] = list(columns)
        resp, data = self._call(req)
        return _ipc_to_table(data), int(resp["to"])

    def ping(self) -> bool:
        return bool(self._call({"cmd": "ping"})[0].get("ok"))

    def metrics(self, instance: str = "canal") -> str:
        """Prometheus text exposition of the server's full reference
        metric-family set (scrape this, or serve it over HTTP)."""
        return str(self._call({"cmd": "metrics", "instance": instance})[0]["text"])

    def snapshot(self, table: str | None = None) -> dict:
        """Remote-bootstrap handshake: pin one consistent lake version
        and get its file listing + serialized manifest. A client with
        shared-storage access bulk-reads the pinned files itself
        (``Manifest.from_json(snap["manifest"])`` →
        ``Lake(snap["lake_dir"]).read_dataset(m)``), then tails with
        ``changes(since=snap["version"])`` — the full lake never
        streams over this socket."""
        req: dict = {"cmd": "snapshot"}
        if table is not None:
            req["table"] = table
        resp, _ = self._call(req)
        resp.pop("ok", None)
        return resp

    def stats(self, of: str | None = None) -> dict:
        """Admin snapshot: journal head + per-client cursors/in-flight
        counts (``of=`` filters to one client id). Read-only — never
        creates a server-side consumer for this connection."""
        req: dict = {"cmd": "stats"}
        if of is not None:
            req["of"] = of
        resp, _ = self._call(req)
        resp.pop("ok", None)
        return resp

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:  # pragma: no cover
            pass

    def __enter__(self) -> "WireConsumer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class ClusterWireConsumer:
    """Multi-endpoint consumer with reconnect — the
    ClusterCanalConnector analog (client/impl/ClusterCanalConnector
    .java:97-205 per-call retry loop + restart; node choice is the
    ClusterNodeAccessStrategy round-robin).

    Every ChangeConsumer-surface call retries up to ``retries`` times;
    a connection failure reconnects to the NEXT endpoint, replays the
    remembered ``subscribe`` cfg, and — for delivery calls — issues a
    server-side ``rollback`` first (SimpleCanalConnector.java:161-170
    rollback-on-connect), so an un-acked batch that died with the
    primary is re-delivered by the standby instead of lost. Cursor
    continuity comes from the servers SHARING journal + state_dir
    (the HA pair's common meta store); acks land exactly once because
    the FIFO ledger lives there, not in either server process.
    """

    def __init__(
        self,
        endpoints: list[tuple],
        client_id: str = "1001",
        timeout: float = 30.0,
        username: str | None = None,
        password: str | None = None,
        retries: int = 3,
        retry_backoff: float = 0.2,
    ):
        if not endpoints:
            raise ValueError("ClusterWireConsumer needs at least one endpoint")
        self.endpoints = [tuple(e) for e in endpoints]
        self.client_id = client_id
        self._timeout = timeout
        self._auth = (username, password)
        self._retries = max(1, int(retries))
        self._backoff = float(retry_backoff)
        self._i = -1  # round-robin cursor over endpoints
        self._sub_cfg: dict | None = None
        self._subscribed = False
        self._conn: WireConsumer | None = None
        self.delivered_position: tuple[int, int] | None = None
        self.failovers = 0  # observability: how often we switched nodes
        self._connect()

    # -- connection management --------------------------------------------

    def _connect(self) -> None:
        errs: list[Exception] = []
        for _ in range(len(self.endpoints)):
            self._i = (self._i + 1) % len(self.endpoints)
            host, port = self.endpoints[self._i]
            try:
                self._conn = WireConsumer(
                    host,
                    int(port),
                    client_id=self.client_id,
                    timeout=self._timeout,
                    username=self._auth[0],
                    password=self._auth[1],
                )
                return
            except (OSError, ConnectionError, AuthError) as e:
                # AuthError here = ONE node rejected/misconfigured (e.g.
                # a rolling --auth change): try the next endpoint like
                # any dead node rather than aborting the failover class
                errs.append(e)
        if errs and all(isinstance(e, AuthError) for e in errs):
            # EVERY endpoint refused the credentials (not merely the
            # last one tried — a down node plus a refusing node is an
            # availability problem, still worth retrying): surface the
            # credential problem, loudly
            raise errs[-1]
        raise ConnectionError(f"no server endpoint reachable: {errs}")

    def _restart(self, resubscribe_rollback: bool) -> None:
        """Reconnect to the next node and restore session state — the
        ClusterCanalConnector.restart analog."""
        self.failovers += 1
        if self._conn is not None:
            self._conn.close()
        self._connect()
        if self._subscribed:
            self._conn.subscribe(self._sub_cfg)
        if resubscribe_rollback:
            # re-deliver whatever was in flight when the old node died
            self._conn.rollback()

    def _retrying(self, fn, rollback_on_restart: bool = True):
        last: Exception | None = None
        for attempt in range(self._retries):
            try:
                return fn(self._conn)
            except (OSError, ConnectionError) as e:
                last = e
                if attempt == self._retries - 1:
                    break
                time.sleep(self._backoff * (attempt + 1))
                try:
                    self._restart(rollback_on_restart)
                except OSError as e2:
                    # OSError covers ConnectionError AND socket.timeout:
                    # a hung standby's failed re-subscribe must consume
                    # a retry, not escape the loop this class exists for
                    last = e2
        raise ConnectionError(f"all retries failed: {last}")

    # -- ChangeConsumer surface -------------------------------------------

    def subscribe(self, cfg: dict | None = None) -> None:
        self._sub_cfg = cfg
        self._retrying(lambda c: c.subscribe(cfg), rollback_on_restart=False)
        self._subscribed = True

    def get_without_ack(self, batch_size: int, timeout_ms: int | None = None):
        got = self._retrying(lambda c: c.get_without_ack(batch_size, timeout_ms))
        self.delivered_position = self._conn.delivered_position
        return got

    def ack(self, batch_id: int) -> None:
        # NO rollback on a reconnect inside ack: the get that delivered
        # this batch may have committed server-side; rolling back would
        # discard it and FIFO-reject this very ack. The shared ledger
        # makes a duplicate/lost ack loud instead of silent.
        self._retrying(lambda c: c.ack(batch_id), rollback_on_restart=False)

    def rollback(self) -> None:
        self._retrying(lambda c: c.rollback(), rollback_on_restart=False)

    def seek_to_timestamp(self, ts_ms: int):
        return self._retrying(lambda c: c.seek_to_timestamp(ts_ms))

    def lookup(self, keys: list, table: str | None = None, columns=None):
        return self._retrying(
            lambda c: c.lookup(keys, table=table, columns=columns),
            rollback_on_restart=False,
        )

    def changes(self, since: int, **kw):
        return self._retrying(
            lambda c: c.changes(since, **kw), rollback_on_restart=False
        )

    def snapshot(self, table: str | None = None) -> dict:
        return self._retrying(
            lambda c: c.snapshot(table), rollback_on_restart=False
        )

    def stats(self, of: str | None = None) -> dict:
        return self._retrying(lambda c: c.stats(of), rollback_on_restart=False)

    def ping(self) -> bool:
        return self._retrying(lambda c: c.ping(), rollback_on_restart=False)

    def close(self) -> None:
        if self._conn is not None:
            self._conn.close()

    def __enter__(self) -> "ClusterWireConsumer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
