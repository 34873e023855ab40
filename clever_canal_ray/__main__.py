"""CLI — the CanalLauncher / instance-assembly analog.

    python -m clever_canal_ray create-lake  --lake DIR --from PARQUET [--partitions P]
    python -m clever_canal_ray replay       --lake DIR --segments DIR [DIR ...]
                                            [--mode delta|compact] [--batch-segments N]
    python -m clever_canal_ray compact      --lake DIR
    python -m clever_canal_ray repartition  --lake DIR --partitions P
    python -m clever_canal_ray status       --lake DIR
    python -m clever_canal_ray metrics      --lake DIR
    python -m clever_canal_ray prometheus   --lake DIR
    python -m clever_canal_ray skip-to-ts   --lake DIR --segments DIR --ts-ms T
    python -m clever_canal_ray gen-fixture  --out DIR --events N [--docs N] [--segments N]
    python -m clever_canal_ray lookup       --lake DIR --keys K [K ...] [--table T]
    python -m clever_canal_ray changes      --lake DIR --since V --out DIR [--latest-only]
    python -m clever_canal_ray mirror       --src LAKE --dst LAKE [--follow] [--poll S]
    python -m clever_canal_ray consumer-stats --port P [--host H] [--of CLIENT_ID]
    python -m clever_canal_ray derive       --journal DIR --state DIR [--key C] [--sum C ...]
                                            [--follow] [--seed-lake DIR]
    python -m clever_canal_ray curate       --in PARQUET [...] --out DIR [--langs en ...]
                                            [--min-tokens N] [--near-dedup] [--reference PARQUET]
                                            [--eval-file TXT] [--budget-tokens N] [--report]
    python -m clever_canal_ray curate-sync  --src LAKE --dst LAKE [--bootstrap] [--langs en ...]
                                            [--min-tokens N] [--eval-file TXT] [--follow]
    python -m clever_canal_ray train-tokenizer --in PARQUET [...] --out TOK.json [--merges N]
    python -m clever_canal_ray encode       --in PARQUET [...] --out DIR --tokenizer TOK.json
                                            [--pieces] [--source-col C]

Owns its Ray session (scripts do; library code never does).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="clever_canal_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create-lake")
    c.add_argument("--lake", required=True)
    c.add_argument("--from", dest="src", required=True)
    c.add_argument("--partitions", type=int, default=16)

    r = sub.add_parser("replay")
    r.add_argument("--lake", required=True)
    r.add_argument("--segments", nargs="+", required=True)
    r.add_argument("--mode", choices=["delta", "compact"], default="delta")
    r.add_argument("--batch-segments", type=int, default=8)

    f = sub.add_parser("follow")
    f.add_argument("--lake", required=True)
    f.add_argument("--segments", nargs="+", required=True)
    f.add_argument("--mode", choices=["delta", "compact"], default="delta")
    f.add_argument("--poll", type=float, default=1.0)
    f.add_argument("--idle-stop", type=int, default=None)

    for name in ("compact", "status", "metrics", "gc", "prometheus"):
        s = sub.add_parser(name)
        s.add_argument("--lake", required=True)

    sk = sub.add_parser("skip-to-ts")  # timestamp-positioned start
    sk.add_argument("--lake", required=True)
    sk.add_argument("--segments", nargs="+", required=True)
    sk.add_argument("--ts-ms", type=int, required=True)

    g = sub.add_parser("gen-fixture")
    g.add_argument("--out", required=True)
    g.add_argument("--events", type=int, required=True)
    g.add_argument("--docs", type=int, default=10_000)
    g.add_argument("--segments", type=int, default=8)
    g.add_argument("--seed", type=int, default=42)

    rp = sub.add_parser("repartition")  # grow-the-cluster re-hash
    rp.add_argument("--lake", required=True)
    rp.add_argument("--partitions", type=int, required=True)
    rp.add_argument("--table", default=None, help="multi-table lakes: the table to re-hash")

    lk = sub.add_parser("lookup")  # bloom-pruned point read (serving path)
    lk.add_argument("--lake", required=True)
    lk.add_argument("--keys", nargs="+", required=True)
    lk.add_argument("--table", default=None)
    lk.add_argument("--columns", nargs="+", default=None, help="prune to these payload columns")

    ch = sub.add_parser("changes")  # incremental change feed -> parquet
    ch.add_argument("--lake", required=True)
    ch.add_argument("--since", type=int, required=True, help="manifest version floor")
    ch.add_argument("--to", type=int, default=None, help="manifest version ceiling (default: current)")
    ch.add_argument("--out", required=True, help="output parquet directory")
    ch.add_argument("--table", default=None)
    ch.add_argument("--latest-only", action="store_true")
    ch.add_argument("--columns", nargs="+", default=None, help="prune the read to these payload columns")

    dv = sub.add_parser("derive")  # maintained GROUP BY over the change stream
    dv.add_argument("--journal", nargs="+", required=True)
    dv.add_argument("--state", required=True)
    dv.add_argument("--key", default="source", help="group-by column")
    dv.add_argument("--sum", nargs="+", default=["n_tok"], help="columns to sum")
    dv.add_argument("--client-id", default="agg")
    dv.add_argument("--follow", action="store_true", help="keep folding as segments arrive")
    dv.add_argument("--poll-ms", type=int, default=1000)
    dv.add_argument("--idle-rounds", type=int, default=3)
    dv.add_argument("--seed-lake", default=None, help="seed state from this lake's current rows")

    mi = sub.add_parser("mirror")  # lake->lake cascade replication
    mi.add_argument("--src", required=True, help="source lake directory")
    mi.add_argument("--dst", required=True, help="mirror lake directory")
    mi.add_argument("--partitions", type=int, default=None, help="mirror partition count (bootstrap)")
    mi.add_argument("--follow", action="store_true", help="keep syncing as the source advances")
    mi.add_argument("--poll", type=float, default=1.0)
    mi.add_argument("--idle-stop", type=int, default=None, help="stop after N empty polls")

    cs = sub.add_parser("consumer-stats")  # admin: per-client cursor/lag over the wire
    cs.add_argument("--host", default="127.0.0.1")
    cs.add_argument("--port", type=int, required=True)
    cs.add_argument("--of", default=None, help="filter to one client id")

    sv = sub.add_parser("serve")  # the server-netty consumer endpoint
    sv.add_argument("--journal", nargs="+", required=True)
    sv.add_argument("--state", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=0)
    sv.add_argument("--lake", default=None, help="enable the lookup RPC against this lake")
    sv.add_argument(
        "--auth", nargs="+", default=None, metavar="USER:PASSWORD",
        help="require the scramble auth handshake; repeatable user:password pairs",
    )
    sv.add_argument(
        "--metrics-port", type=int, default=None,
        help="also serve GET /metrics (prometheus text) on this HTTP port",
    )

    mx = sub.add_parser("scrape-metrics")  # prometheus scrape of a running server
    mx.add_argument("--host", default="127.0.0.1")
    mx.add_argument("--port", type=int, required=True)
    mx.add_argument("--instance", default="canal")
    mx.add_argument("--username", default=None)
    mx.add_argument("--password", default=None)

    la = sub.add_parser("live-adapter")  # external cursor -> settled segments
    la.add_argument("--segments", required=True, help="journal dir to publish into")
    la.add_argument("--sqlite", default=None, help="poll this sqlite outbox db")
    la.add_argument("--sqlite-table", default="changes")
    la.add_argument("--jsonl-host", default=None, help="poll a JSONL TCP firehose")
    la.add_argument("--jsonl-port", type=int, default=None)
    la.add_argument("--lake", default=None,
                    help="derive the payload schema from this lake's manifest")
    la.add_argument("--fields", default=None,
                    help="payload schema as name:type,... (alternative to --lake)")
    la.add_argument("--table", default="lake.live")
    la.add_argument("--poll-interval", type=float, default=0.5)
    la.add_argument("--idle-rounds", type=int, default=None,
                    help="stop after this many empty polls (default: run forever)")

    cu = sub.add_parser("curate")  # one-call training-data curation
    cu.add_argument("--in", dest="src", nargs="+", required=True, help="input parquet file(s)/dir(s)")
    cu.add_argument("--out", required=True, help="output parquet directory")
    cu.add_argument("--langs", nargs="+", default=None, help="keep these languages")
    cu.add_argument("--min-tokens", type=int, default=None)
    cu.add_argument("--max-tokens", type=int, default=None)
    cu.add_argument("--gopher", action="store_true", help="apply the Gopher quality rule set")
    cu.add_argument("--c4", action="store_true", help="apply the C4 line-cleaning + page rules")
    cu.add_argument("--no-exact-dedup", action="store_true")
    cu.add_argument("--near-dedup", action="store_true")
    cu.add_argument("--near-threshold", type=float, default=0.7)
    cu.add_argument("--reference", nargs="+", default=None, help="drop docs already in this corpus")
    cu.add_argument("--eval-file", default=None, help="text file of eval lines to decontaminate against")
    cu.add_argument("--budget-tokens", type=int, default=None)
    cu.add_argument("--budget-score-col", default=None)
    cu.add_argument("--report", action="store_true", help="count rows after each stage (extra passes)")

    cu.add_argument("--target", nargs="+", default=None,
                    help="DSIR: select docs resembling this target corpus")
    cu.add_argument("--dsir-select", type=int, default=None, help="DSIR: docs to keep")
    cu.add_argument("--dsir-temperature", type=float, default=0.1)

    ci = sub.add_parser("curate-sync")  # curated lake in lockstep with a source lake
    ci.add_argument("--src", required=True, help="source lake directory")
    ci.add_argument("--dst", required=True, help="curated lake directory")
    ci.add_argument("--bootstrap", action="store_true",
                    help="create the curated lake from the source's current version first")
    ci.add_argument("--partitions", type=int, default=None, help="curated partition count (bootstrap)")
    ci.add_argument("--langs", nargs="+", default=None)
    ci.add_argument("--min-tokens", type=int, default=None)
    ci.add_argument("--max-tokens", type=int, default=None)
    ci.add_argument("--eval-file", default=None)
    ci.add_argument("--follow", action="store_true", help="keep syncing as the source advances")
    ci.add_argument("--poll", type=float, default=1.0)
    ci.add_argument("--idle-stop", type=int, default=None, help="stop after N empty polls")

    tt = sub.add_parser("train-tokenizer")  # corpus -> BPE merges + vocab artifact
    tt.add_argument("--in", dest="src", nargs="+", required=True)
    tt.add_argument("--out", required=True, help="tokenizer JSON path")
    tt.add_argument("--merges", type=int, default=1000)
    tt.add_argument("--min-count", type=int, default=2)
    tt.add_argument("--top-v", type=int, default=None, help="cap the trainer's word histogram")

    en = sub.add_parser("encode")  # corpus -> tokenized-sequence parquet
    en.add_argument("--in", dest="src", nargs="+", required=True)
    en.add_argument("--out", required=True, help="output parquet directory")
    en.add_argument("--tokenizer", required=True, help="tokenizer JSON from train-tokenizer")
    en.add_argument("--pieces", action="store_true",
                    help="emit string pieces instead of the tokens/n_tok id payload")
    en.add_argument("--source-col", default=None, help="carry this column as `source`")

    args = p.parse_args(argv)

    from clever_canal_ray.state.manifest import Lake

    if args.cmd == "create-lake":
        import pyarrow.parquet as pq

        Lake.create(args.lake, pq.read_table(args.src), num_partitions=args.partitions)
        print(json.dumps({"created": args.lake, "partitions": args.partitions}))
    elif args.cmd == "replay":
        _ray_session()
        from clever_canal_ray.config import ReplayConfig
        from clever_canal_ray.pipelines.replay import replay
        from clever_canal_ray.sources.segments import discover_segments

        lake = Lake(args.lake)
        cfg = ReplayConfig(
            num_partitions=lake.current().num_partitions,
            segments_per_batch=args.batch_segments,
            sink_mode=args.mode,
        )
        m = replay(lake, discover_segments(args.segments), cfg)
        print(json.dumps({"hwm": list(m.hwm), "batches": m.last_batch_id + 1, "schema_version": m.schema_version}))
    elif args.cmd == "follow":
        _ray_session()
        from clever_canal_ray.config import ReplayConfig
        from clever_canal_ray.pipelines.replay import follow

        lake = Lake(args.lake)
        cfg = ReplayConfig(
            num_partitions=lake.current().num_partitions, sink_mode=args.mode
        )
        m = follow(lake, args.segments, cfg, poll_interval=args.poll, idle_rounds_to_stop=args.idle_stop)
        print(json.dumps({"hwm": list(m.hwm), "batches": m.last_batch_id + 1}))
    elif args.cmd == "compact":
        _ray_session()
        m = Lake(args.lake).compact()
        print(json.dumps({"version": m.version, "files": sum(len(i["files"]) for i in m.partitions.values())}))
    elif args.cmd == "status":
        m = Lake(args.lake).current()
        print(json.dumps(json.loads(m.to_json())))
    elif args.cmd == "metrics":
        t = Lake(args.lake).metrics_table()
        print(t.to_pandas().to_string(index=False))
    elif args.cmd == "gc":
        print(json.dumps(Lake(args.lake).gc()))
    elif args.cmd == "repartition":
        _ray_session()
        m = Lake(args.lake).repartition(args.partitions, table=args.table)
        out = {"version": m.version, "num_partitions": m.num_partitions}
        if args.table:
            out["table"] = args.table
            out["table_partitions"] = m.tables[args.table]["num_partitions"]
        print(json.dumps(out))
    elif args.cmd == "prometheus":
        print(Lake(args.lake).prometheus_metrics(), end="")
    elif args.cmd == "skip-to-ts":
        from clever_canal_ray.sources.segments import find_start_position

        lake = Lake(args.lake)
        pos = find_start_position(args.segments, args.ts_ms)
        cur_hwm = tuple(lake.current().hwm)
        if tuple(pos) <= cur_hwm:
            # ts at/before the stream start (or already consumed):
            # nothing to skip — replay simply begins at the current HWM
            print(json.dumps({"skipped_to": None, "hwm": list(cur_hwm), "noop": True}))
        else:
            m = lake.skip_to(pos)
            print(json.dumps({"skipped_to": list(pos), "hwm": list(m.hwm)}))
    elif args.cmd == "gen-fixture":
        from clever_canal_ray.fixtures.generator import EventLogSpec, generate_lake, write_fixture
        import pyarrow.parquet as pq
        import os

        spec = EventLogSpec(
            seed=args.seed, n_initial_docs=args.docs, n_events=args.events, n_segments=args.segments
        )
        info = write_fixture(spec, args.out)
        pq.write_table(generate_lake(spec), os.path.join(args.out, "initial_lake.parquet"))
        print(json.dumps({"out": args.out, "n_events": info["n_events"]}))
    elif args.cmd == "lookup":
        # driver-serial path (no Ray session needed for a CLI probe)
        tbl, stats = Lake(args.lake).lookup(
            args.keys, table=args.table, return_stats=True, columns=args.columns
        )
        print(json.dumps({"rows": tbl.to_pylist(), "stats": stats}, default=str))
    elif args.cmd == "changes":
        _ray_session()
        lake = Lake(args.lake)
        ds = lake.read_changes(
            args.since,
            to_version=args.to,
            table=args.table,
            latest_only=args.latest_only,
            columns=args.columns,
        )
        ds.write_parquet(args.out)
        import pyarrow.dataset as pads

        n = sum(f.count_rows() for f in pads.dataset(args.out).get_fragments())
        print(json.dumps({"out": args.out, "rows": n, "since": args.since,
                          "to": args.to if args.to is not None else lake.current().version}))
    elif args.cmd == "derive":
        # driver-serial downstream (no Ray session needed): maintain the
        # GROUP BY incrementally through the get/ack consumer loop
        from clever_canal_ray.pipelines.derived import AggregateMaintainer

        m = AggregateMaintainer(
            args.journal,
            args.state,
            key_col=args.key,
            sum_cols=tuple(args.sum),
            client_id=args.client_id,
        )
        if args.seed_lake is not None:
            try:
                m.seed(Lake(args.seed_lake).read_table())
            except RuntimeError:
                pass  # resumed state: already seeded/folded, keep going
        if args.follow:
            folded = m.run_follow(
                poll_ms=args.poll_ms, idle_rounds=args.idle_rounds
            )
        else:
            folded = m.run_to_end()
        print(
            json.dumps(
                {"folded": folded, "groups": m.table().to_pylist()},
                default=str,
            )
        )
    elif args.cmd == "mirror":
        import os
        import time

        _ray_session()
        from clever_canal_ray.pipelines.mirror import mirror_bootstrap, mirror_sync

        src = Lake(args.src)
        if os.path.exists(os.path.join(args.dst, "_manifest", "_CURRENT")):
            dst = Lake(args.dst)  # resume an existing mirror
        else:
            dst = mirror_bootstrap(src, args.dst, num_partitions=args.partitions)
            print(
                json.dumps(
                    {"bootstrapped": args.dst, "source_version": dst.current().last_batch_id}
                ),
                flush=True,
            )
        idle = 0
        while True:
            out = mirror_sync(src, dst)
            print(json.dumps(out), flush=True)
            if not args.follow:
                break
            idle = idle + 1 if out.get("noop") else 0
            if args.idle_stop is not None and idle >= args.idle_stop:
                break
            time.sleep(args.poll)
    elif args.cmd == "consumer-stats":
        from clever_canal_ray.server import WireConsumer

        with WireConsumer(args.host, args.port, client_id="admin") as wc:
            print(json.dumps(wc.stats(args.of), indent=1))
    elif args.cmd == "serve":
        from clever_canal_ray.server import ConsumerServer, scramble_gen_pass

        users = None
        if args.auth:
            users = {}
            for pair in args.auth:
                user, _, pw = pair.partition(":")
                if not user or not pw:
                    raise SystemExit(f"--auth expects USER:PASSWORD, got {pair!r}")
                users[user] = scramble_gen_pass(pw)
        srv = ConsumerServer(
            args.journal, args.state, host=args.host, port=args.port,
            lake_dir=args.lake, users=users,
        )
        endpoint = {"host": srv.host, "port": srv.port}
        if args.metrics_port is not None:
            mh, mp = srv.start_metrics_http(args.metrics_port, host=args.host)
            endpoint["metrics_port"] = mp
        # announce the bound endpoint FIRST (port=0 binds an ephemeral
        # port) so a supervising process can connect, then block
        print(json.dumps(endpoint), flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:  # pragma: no cover
            srv.stop()
    elif args.cmd == "scrape-metrics":
        from clever_canal_ray.server import WireConsumer

        with WireConsumer(
            args.host, args.port, client_id="scraper",
            username=args.username, password=args.password,
        ) as wc:
            print(wc.metrics(args.instance), end="")
    elif args.cmd == "live-adapter":
        import pyarrow as _pa

        from clever_canal_ray.sources.live import (
            JsonlSocketSource,
            SegmentPublisher,
            SqliteChangeSource,
            pump,
        )

        if (args.sqlite is None) == (args.jsonl_host is None):
            raise SystemExit("pass exactly one of --sqlite / --jsonl-host")
        if args.jsonl_host is not None and args.jsonl_port is None:
            raise SystemExit("--jsonl-host needs --jsonl-port")
        if args.lake:
            from clever_canal_ray.state.manifest import Lake

            payload = Lake(args.lake).current().payload_schema
        elif args.fields:
            from clever_canal_ray.schema import type_from_name

            payload = _pa.schema(
                [
                    _pa.field(n, type_from_name(t), nullable=(n != "doc_id"))
                    for n, t in (f.split(":") for f in args.fields.split(","))
                ]
            )
        else:
            raise SystemExit("pass --lake or --fields for the payload schema")
        pub = SegmentPublisher(args.segments, payload, table=args.table)
        if args.sqlite:
            src = SqliteChangeSource(
                args.sqlite, table=args.sqlite_table, cursor=pub.source_cursor
            )
        else:
            src = JsonlSocketSource(args.jsonl_host, int(args.jsonl_port))
        n = pump(
            src, pub, poll_interval=args.poll_interval,
            idle_rounds_to_stop=args.idle_rounds,
        )
        print(json.dumps({"published": n, "next_segment": pub.next_segment_id}))
    elif args.cmd == "curate":
        _ray_session()
        import ray.data as rd

        from clever_canal_ray.pipelines.curation import curate_corpus

        eval_texts = None
        if args.eval_file:
            with open(args.eval_file) as fh:
                eval_texts = [ln.strip() for ln in fh if ln.strip()]
        curated, report = curate_corpus(
            rd.read_parquet(args.src),
            keep_langs=tuple(args.langs) if args.langs else None,
            min_tokens=args.min_tokens,
            max_tokens=args.max_tokens,
            quality_preset="gopher" if args.gopher else ("c4" if args.c4 else None),
            exact_dedup=not args.no_exact_dedup,
            near_dedup=args.near_dedup,
            near_threshold=args.near_threshold,
            reference_ds=rd.read_parquet(args.reference) if args.reference else None,
            eval_texts=eval_texts,
            target_ds=rd.read_parquet(args.target) if args.target else None,
            dsir_n_select=args.dsir_select,
            dsir_temperature=args.dsir_temperature,
            budget_tokens=args.budget_tokens,
            budget_score_col=args.budget_score_col,
            report=args.report,
        )
        curated.write_parquet(args.out)
        print(json.dumps({"out": args.out, "stages": dict(report)}))
    elif args.cmd == "curate-sync":
        _ray_session()
        import time as _time

        from clever_canal_ray.pipelines.curation import curate_bootstrap, curate_sync

        eval_texts = None
        if args.eval_file:
            with open(args.eval_file) as fh:
                eval_texts = [ln.strip() for ln in fh if ln.strip()]
        filters = dict(
            keep_langs=tuple(args.langs) if args.langs else None,
            min_tokens=args.min_tokens,
            max_tokens=args.max_tokens,
            eval_texts=eval_texts,
        )
        src = Lake(args.src)
        if args.bootstrap:
            dst = curate_bootstrap(src, args.dst, num_partitions=args.partitions, **filters)
            print(json.dumps({"bootstrap": True, "cursor": dst.current().last_batch_id}), flush=True)
        else:
            dst = Lake(args.dst)
        idle = 0
        while True:
            r = curate_sync(src, dst, **filters)
            print(json.dumps(r), flush=True)
            if not args.follow:
                break
            idle = idle + 1 if r.get("noop") else 0
            if args.idle_stop is not None and idle >= args.idle_stop:
                break
            _time.sleep(args.poll)
    elif args.cmd == "train-tokenizer":
        _ray_session()
        import ray.data as rd

        from clever_canal_ray.functions.bpe import (
            bpe_train,
            bpe_vocab,
            save_tokenizer,
            word_histogram,
        )

        hist = word_histogram(rd.read_parquet(args.src), top_v=args.top_v)
        merges = bpe_train(hist, num_merges=args.merges, min_count=args.min_count)
        vocab = bpe_vocab(hist, merges)
        save_tokenizer(args.out, merges, vocab)
        print(json.dumps({"out": args.out, "merges": len(merges), "vocab": len(vocab)}))
    elif args.cmd == "encode":
        _ray_session()
        import ray.data as rd

        from clever_canal_ray.functions.bpe import bpe_encode, bpe_encode_ids, load_tokenizer

        merges, vocab = load_tokenizer(args.tokenizer)
        ds = rd.read_parquet(args.src)
        if args.pieces:
            out_ds = bpe_encode(ds, merges)
        else:
            if vocab is None:
                raise SystemExit("encode: tokenizer file has no vocab; re-train or use --pieces")
            out_ds = bpe_encode_ids(ds, merges, vocab, source_col=args.source_col)
        out_ds.write_parquet(args.out)
        # count from the written footers — out_ds.count() would re-run
        # the whole encode pipeline a second time
        import glob

        import pyarrow.parquet as pq

        rows = sum(
            pq.read_metadata(f).num_rows for f in glob.glob(f"{args.out}/*.parquet")
        )
        print(json.dumps({"out": args.out, "rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
