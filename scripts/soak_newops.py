"""Beyond-gate-scale soak for the round-4 continuation ops:

  bpe     — word_histogram + bpe_train + distributed encode at 2M docs
            (gates run at 500 docs); lossless-encode spot check.
  semdedup — cluster-scoped semantic dedup at 1M x 64-d vectors with
            planted near-dups; recall + false-drop hard asserts.
  curate  — the one-call curate_corpus chain at 4M docs with planted
            categories; per-stage counts asserted exactly.
  inc     — incremental curation: 1M-doc source lake, bootstrap +
            4 change windows; batch re-curation == incremental lake.
  budget  — select_by_token_budget at 20M scored rows; EXACT equality
            vs a driver numpy sort-cumsum reference.

Each prints one JSON line. Usage:
  python scripts/soak_newops.py [bpe|semdedup|curate|inc|dsir|budget|all] [scale]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

OUT = "/tmp/soak_newops"


def _init():
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


class TextGen:
    """Zipf-ish deterministic corpus: doc i draws L word-ids from a
    V-word vocab by splitmix64, squared to skew mass to low ids."""

    L = 80
    V = 60_000

    def __init__(self):
        self.vocab = np.array([f"w{i:05x}" for i in range(self.V)], dtype=object)

    def __call__(self, batch) -> pd.DataFrame:
        from clever_canal_ray.functions.corpus import _splitmix64

        ids = batch["id"].to_numpy()
        slots = ids[:, None] * np.int64(self.L) + np.arange(self.L, dtype=np.int64)[None, :]
        u = _splitmix64(slots.reshape(-1)).astype(np.float64) / 2**64
        w = ((u * u) * self.V).astype(np.int64).reshape(len(ids), self.L)
        words = self.vocab[w]
        return pd.DataFrame(
            {"doc_id": ids.astype(np.int64), "text": [" ".join(r) for r in words]}
        )


def soak_bpe(n_docs: int = 2_000_000):
    import ray.data as rd

    from clever_canal_ray.functions.bpe import (
        END_MARKER,
        bpe_encode,
        bpe_train,
        encode_word,
        word_histogram,
    )

    corpus = os.path.join(OUT, "bpe_corpus")
    shutil.rmtree(corpus, ignore_errors=True)
    res = {"metric": "soak_bpe", "n_docs": n_docs}
    t0 = time.perf_counter()
    (
        rd.range(n_docs, override_num_blocks=max(32, n_docs // 100_000))
        .map_batches(TextGen, batch_format="pandas", concurrency=(2, 16))
        .write_parquet(corpus)
    )
    res["gen_sec"] = round(time.perf_counter() - t0, 2)

    ds = rd.read_parquet(corpus)
    t0 = time.perf_counter()
    hist = word_histogram(ds, num_buckets=64)
    res["hist_sec"] = round(time.perf_counter() - t0, 2)
    res["distinct_words"] = int(len(hist))
    res["total_tokens"] = int(hist["c"].sum())

    t0 = time.perf_counter()
    merges = bpe_train(hist, num_merges=500)
    res["train_sec"] = round(time.perf_counter() - t0, 2)
    res["n_merges"] = len(merges)

    t0 = time.perf_counter()
    enc = bpe_encode(rd.read_parquet(corpus), merges, concurrency=(2, 16))
    total_pieces = int(
        enc.map_batches(
            lambda t: pd.DataFrame({"s": [int(t["n_pieces"].to_pandas().sum())]}),
            batch_format="pyarrow",
        )
        .to_pandas()["s"]
        .sum()
    )
    enc_sec = time.perf_counter() - t0
    res["encode_sec"] = round(enc_sec, 2)
    res["encode_docs_per_sec"] = int(n_docs / enc_sec)
    res["total_pieces"] = total_pieces
    assert total_pieces >= res["total_tokens"], "pieces cannot undercount words"

    # lossless spot check on one batch
    ranks = {m: i for i, m in enumerate(merges)}
    # direct pyarrow read of one file — no Ray LimitOperator (its
    # cancelled execution can segfault the raylet at shutdown; see
    # dedup._arrow_schema_of)
    import glob

    import pyarrow.parquet as _pq

    sample = _pq.read_table(sorted(glob.glob(os.path.join(corpus, "*.parquet"))[:1])[0]).slice(0, 200).to_pandas()
    for t in sample["text"][:50]:
        for w in t.split(" "):
            assert "".join(encode_word(w, ranks)) == w + END_MARKER
    res["lossless_check"] = "ok"
    print(json.dumps(res))


def soak_semdedup(n_vecs: int = 1_000_000, dim: int = 64, n_clusters: int = 256):
    import ray.data as rd

    from clever_canal_ray.functions.dedup import semdedup

    res = {"metric": "soak_semdedup", "n_vecs": n_vecs, "dim": dim, "n_clusters": n_clusters}
    vec_dir = os.path.join(OUT, "vecs")
    shutil.rmtree(vec_dir, ignore_errors=True)

    centers_n = 64

    def gen(batch) -> pd.DataFrame:
        from clever_canal_ray.functions.corpus import _splitmix64

        ids = batch["id"].to_numpy()
        # deterministic per-id gaussian-ish vector around one of centers_n hubs
        base = np.where(ids % 10 == 1, ids - 1, ids)
        hub = (_splitmix64(base) % np.uint64(centers_n)).astype(np.int64)
        hub_mat = (
            _splitmix64(
                (np.arange(centers_n)[:, None] * np.int64(dim) + np.arange(dim)[None, :]).reshape(-1)
            ).astype(np.float64) / 2**63 - 1.0
        ).reshape(centers_n, dim) * 4.0
        slots = base[:, None] * np.int64(dim) + np.arange(dim, dtype=np.int64)[None, :]
        noise = (_splitmix64(slots.reshape(-1) + np.int64(2**42)).astype(np.float64) / 2**63 - 1.0).reshape(
            len(ids), dim
        )
        v = hub_mat[hub] + noise * 0.6
        dup = ids % 10 == 1
        if dup.any():  # near-dup of id-1: tiny deterministic perturbation
            tiny = (_splitmix64(ids[dup] + np.int64(2**43)).astype(np.float64) / 2**63 - 1.0)
            v[dup] += tiny[:, None] * 1e-4
        return pd.DataFrame({"vec_id": ids.astype(np.int64), "embedding": list(v.astype(np.float32))})

    t0 = time.perf_counter()
    (
        rd.range(n_vecs, override_num_blocks=max(32, n_vecs // 50_000))
        .map_batches(gen, batch_format="pandas")
        .write_parquet(vec_dir)
    )
    res["gen_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    dec = semdedup(
        rd.read_parquet(vec_dir),
        threshold=0.999,
        n_clusters=n_clusters,
        iters=2,
        num_buckets=n_clusters,
        max_cluster_rows=400_000,
    ).materialize()
    sd_sec = time.perf_counter() - t0
    res["semdedup_sec"] = round(sd_sec, 2)
    res["vecs_per_sec"] = int(n_vecs / sd_sec)

    # distributed checks: planted dup (i, i-1) pairs land in the same
    # cluster (same hub), so one of each pair must drop
    def check(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n": [len(df)],
                "dropped": [int((df["kept"] == 0).sum())],
                "dropped_planted": [int(((df["kept"] == 0) & ((df["vec_id"] % 10 == 1) | ((df["vec_id"] % 10 == 0)))).sum())],
            }
        )

    agg = dec.map_batches(check, batch_format="pandas").to_pandas().sum()
    res["rows"] = int(agg["n"])
    res["dropped"] = int(agg["dropped"])
    planted = n_vecs // 10
    res["planted_pairs"] = planted
    res["drop_recall"] = round(agg["dropped"] / planted, 4)
    assert agg["n"] == n_vecs
    assert agg["dropped"] >= 0.95 * planted, f"recall {agg['dropped']}/{planted}"
    # false drops: every dropped id must belong to a planted pair
    assert agg["dropped_planted"] == agg["dropped"], "non-planted vector dropped"
    print(json.dumps(res))


def soak_budget(n_rows: int = 20_000_000):
    import ray.data as rd

    from clever_canal_ray.functions.corpus import select_by_token_budget

    res = {"metric": "soak_budget_select", "n_rows": n_rows}

    def gen(batch) -> pd.DataFrame:
        from clever_canal_ray.functions.corpus import _splitmix64

        ids = batch["id"].to_numpy()
        score = _splitmix64(ids).astype(np.float64) / 2**64
        n_tok = (_splitmix64(ids + np.int64(2**41)) % np.uint64(900) + np.uint64(100)).astype(np.int64)
        return pd.DataFrame({"doc_id": ids.astype(np.int64), "score": score, "n_tok": n_tok})

    base = rd.range(n_rows, override_num_blocks=64).map_batches(gen, batch_format="pandas").materialize()
    total = int(base.map_batches(
        lambda df: pd.DataFrame({"s": [df["n_tok"].sum()]}), batch_format="pandas"
    ).to_pandas()["s"].sum())
    budget = total // 4
    res["budget_tokens"] = budget

    t0 = time.perf_counter()
    sel, info = select_by_token_budget(base, budget, num_bins=4096, boundary_cap=200_000)
    got_tokens = int(sel.map_batches(
        lambda df: pd.DataFrame({"s": [df["n_tok"].sum()], "n": [len(df)]}), batch_format="pandas"
    ).to_pandas().agg({"s": "sum"})["s"])
    sel_sec = time.perf_counter() - t0
    res["select_sec"] = round(sel_sec, 2)
    res["rows_per_sec"] = int(n_rows / sel_sec)
    res["tokens_selected"] = info["tokens_selected"]
    assert got_tokens == info["tokens_selected"] <= budget

    # exact reference on the driver (scores fit: 20M float64 = 160 MB)
    p = base.select_columns(["doc_id", "score", "n_tok"]).to_pandas()
    order = np.lexsort((p["doc_id"].to_numpy(), -p["score"].to_numpy()))
    csum = p["n_tok"].to_numpy(np.int64)[order].cumsum()
    take = int(np.searchsorted(csum, budget, side="right"))
    ref_tokens = int(csum[take - 1]) if take else 0
    assert got_tokens == ref_tokens, (got_tokens, ref_tokens)
    res["exact_vs_serial"] = "ok"
    res["cut"] = info["cut"]
    print(json.dumps(res))
class CurationGen:
    """Deterministic 4M-doc mixed corpus with planted categories by id
    residue (mod 20): 0-13 good en (unique), 14-15 exact dups of id-14,
    16-17 german, 18 short, 19 contaminated."""

    EVAL_SENT = "september benchmark answers must never leak into training"
    V = 50_000

    def __init__(self):
        self.vocab = np.array([f"w{i:05x}" for i in range(self.V)], dtype=object)

    def __call__(self, batch) -> pd.DataFrame:
        from clever_canal_ray.functions.corpus import _splitmix64

        ids = batch["id"].to_numpy()
        res = ids % 20
        # body words keyed off a base id so dups are exact copies
        base = np.where((res == 14) | (res == 15), ids - (res - 13), ids)
        L = 30
        slots = base[:, None] * np.int64(L) + np.arange(L, dtype=np.int64)[None, :]
        w = _splitmix64(slots.reshape(-1)).reshape(len(ids), L) % np.uint64(self.V)
        bodies = [" ".join(r) for r in self.vocab[w]]
        texts = []
        for i, r, b in zip(ids, res, bodies):
            if r in (16, 17):
                texts.append(f"der hund ist nicht ein und die katze {b}")
            elif r == 18:
                texts.append("the and of")
            elif r == 19:
                texts.append(f"the {self.EVAL_SENT} is in that {b}")
            else:
                texts.append(f"the item is in that box and {b}")
        return pd.DataFrame({"doc_id": ids.astype(np.int64), "text": texts})


def soak_curate(n_docs: int = 4_000_000):
    import ray.data as rd

    from clever_canal_ray.pipelines.curation import curate_corpus

    corpus = os.path.join(OUT, "curate_corpus")
    shutil.rmtree(corpus, ignore_errors=True)
    res = {"metric": "soak_curate", "n_docs": n_docs}
    t0 = time.perf_counter()
    (
        rd.range(n_docs, override_num_blocks=max(32, n_docs // 100_000))
        .map_batches(CurationGen, batch_format="pandas", concurrency=(2, 16))
        .write_parquet(corpus)
    )
    res["gen_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    curated, report = curate_corpus(
        rd.read_parquet(corpus),
        keep_langs=("en",),
        min_tokens=6,
        exact_dedup=True,
        eval_texts=[CurationGen.EVAL_SENT],
        report=True,
    )
    n_final = curated.count()
    wall = time.perf_counter() - t0
    res["curate_sec"] = round(wall, 2)
    res["docs_per_sec"] = int(n_docs / wall)
    res["stages"] = {s: int(c) for s, c in report}
    res["final_rows"] = int(n_final)
    g = n_docs // 20  # docs per residue class
    assert res["stages"]["lang_filter"] == n_docs - 2 * g, res["stages"]
    assert res["stages"]["length_filter"] == n_docs - 3 * g, res["stages"]
    # exact dedup: residues 14 and 15 both rebuild residue 13's body
    # (base = id-1 / id-2) under the same header, so each 20-block has
    # three identical texts {13, 14, 15}; min-id (13) survives -> two
    # drops per block.
    assert res["stages"]["exact_dedup"] == n_docs - 3 * g - 2 * g, res["stages"]
    assert res["stages"]["decontaminate"] == res["stages"]["exact_dedup"] - g
    assert n_final == res["stages"]["decontaminate"]
    print(json.dumps(res))


def soak_curate_incremental(n_docs: int = 1_000_000, n_windows: int = 4, window_rows: int | None = None):
    """Incremental curation at soak scale: bootstrap a curated lake
    from a 1M-doc source lake, then apply n_windows change windows
    (updates that flip verdicts both ways, inserts of every planted
    category, deletes) and hard-assert final lockstep vs judging the
    source's final state serially-per-rule (distributed count compare)."""
    import ray.data as rd

    from clever_canal_ray.pipelines.curation import curate_bootstrap, curate_sync
    from clever_canal_ray.state.manifest import Lake
    from clever_canal_ray.state.partitioning import partition_ids
    import pyarrow as pa

    EVAL = "benchmark answers must never leak into training data here"
    # windows must TILE the corpus: an updated doc whose text collides
    # with a never-updated doc is a cross-window dup the incremental
    # judge cannot see (the documented batch-dedup boundary)
    if window_rows is None:
        window_rows = n_docs // n_windows
    res = {"metric": "soak_curate_incremental", "n_docs": n_docs, "n_windows": n_windows}
    root = os.path.join(OUT, "inc")
    shutil.rmtree(root, ignore_errors=True)

    gen = CurationGen()

    def docs_of(batch):
        df = gen(batch)
        return df

    t0 = time.perf_counter()
    src = Lake.create_from_dataset(
        os.path.join(root, "src"),
        rd.range(n_docs, override_num_blocks=max(32, n_docs // 100_000)).map_batches(
            docs_of, batch_format="pandas"
        ),
        num_partitions=32,
        ddl_journal=[{"op": "base_schema", "fields": [["doc_id", "int64"], ["text", "string"]]}],
    )
    res["src_create_sec"] = round(time.perf_counter() - t0, 2)

    filters = dict(keep_langs=("en",), min_tokens=6, eval_texts=[CurationGen.EVAL_SENT])
    t0 = time.perf_counter()
    dst = curate_bootstrap(src, os.path.join(root, "dst"), num_partitions=32, **filters)
    res["bootstrap_sec"] = round(time.perf_counter() - t0, 2)
    res["bootstrap_rows"] = int(dst.read_dataset().count())

    # change windows: each updates window_rows docs to the NEXT residue
    # class behavior (rotate planted category by re-generating with a
    # shifted id base) and deletes a slice
    sync_secs = []
    for w in range(n_windows):
        lo = (w * window_rows) % n_docs
        ids = np.arange(lo, lo + window_rows, dtype=np.int64) % n_docs
        shifted = gen(pd.DataFrame({"id": (ids + 7) % n_docs}))
        upserts = pd.DataFrame({"doc_id": ids, "text": shifted["text"].to_numpy()})
        del_ids = ids[:1000] + n_docs  # absent keys: tombstones for nothing
        m = src.current()
        body = pa.table(
            {
                "doc_id": pa.array(np.concatenate([upserts["doc_id"].to_numpy(), del_ids])),
                "text": pa.array(
                    list(upserts["text"]) + ["x"] * len(del_ids), pa.string()
                ),
                "__deleted": pa.array(
                    np.concatenate(
                        [np.zeros(len(upserts), bool), np.ones(len(del_ids), bool)]
                    )
                ),
            }
        )
        body = body.cast(pa.schema(list(m.payload_schema) + [pa.field("__deleted", pa.bool_())]))
        batch_id = m.last_batch_id + 1
        pid = partition_ids(body["doc_id"].to_numpy(), m.num_partitions)
        touched = {}
        for p in np.unique(pid):
            sub = body.filter(pa.array(pid == p))
            rel = src._write_part_file(sub, int(p), batch_id)
            touched[int(p)] = {"file": rel, "rows": sub.num_rows, "mode": "append", "events_in": sub.num_rows}
        src.commit_batch(m, batch_id=batch_id, new_hwm=(0, batch_id), touched=touched)
        t0 = time.perf_counter()
        r = curate_sync(src, dst, **filters)
        sync_secs.append(round(time.perf_counter() - t0, 2))
        assert not r["noop"]
    res["sync_secs"] = sync_secs
    res["rows_per_sync"] = window_rows
    res["sync_rows_per_sec"] = int(window_rows / (sum(sync_secs) / len(sync_secs)))

    # lockstep invariant: BATCH re-curation of the source's final state
    # == the INCREMENTALLY maintained lake (count + id-sum fingerprint).
    # Valid here because the planted exact-dup groups are id-consecutive
    # triples that never straddle a window boundary — in general,
    # cross-window dup collisions are the documented reason global
    # dedup remains a batch job.
    from clever_canal_ray.pipelines.curation import curate_corpus

    batch_cur, _ = curate_corpus(
        src.read_dataset().materialize(), exact_dedup=True, **filters
    )

    def ids_partial(df):
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({"n": [len(ids)], "s": [int(ids.sum())]})

    exp = batch_cur.map_batches(ids_partial, batch_format="pandas").to_pandas().sum()

    got = dst.read_dataset().map_batches(ids_partial, batch_format="pandas").to_pandas().sum()
    assert int(exp["n"]) == int(got["n"]) and int(exp["s"]) == int(got["s"]), (dict(exp), dict(got))
    res["final_rows"] = int(got["n"])
    res["lockstep"] = "exact"
    print(json.dumps(res))


def soak_dsir(n_docs: int = 4_000_000):
    """DSIR at corpus scale: hashed-n-gram totals over a 4M-doc mixed
    corpus (en-marker vs de-marker planted domains via CurationGen),
    log-ratio weights, Gumbel-top-k selection. Hard asserts: selection
    is ~all target-domain docs; constant-size partials only."""
    import ray.data as rd

    from clever_canal_ray.functions.dsir import (
        dsir_log_ratio,
        dsir_log_weights,
        dsir_sample,
        hashed_ngram_totals,
    )

    corpus = os.path.join(OUT, "dsir_corpus")
    shutil.rmtree(corpus, ignore_errors=True)
    res = {"metric": "soak_dsir", "n_docs": n_docs}
    t0 = time.perf_counter()
    (
        rd.range(n_docs, override_num_blocks=max(32, n_docs // 100_000))
        .map_batches(CurationGen, batch_format="pandas", concurrency=(2, 16))
        .write_parquet(corpus)
    )
    res["gen_sec"] = round(time.perf_counter() - t0, 2)

    B = 65_536
    # target = the german residue classes (16, 17) — the MINORITY domain
    t0 = time.perf_counter()
    def target_only(df):
        r = df["doc_id"].to_numpy() % 20
        return df[(r == 16) | (r == 17)]

    p = hashed_ngram_totals(
        rd.read_parquet(corpus).map_batches(target_only, batch_format="pandas"),
        n_buckets=B,
    )
    q = hashed_ngram_totals(rd.read_parquet(corpus), n_buckets=B)
    res["totals_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    w = dsir_log_weights(rd.read_parquet(corpus), dsir_log_ratio(p, q))
    n_sel = n_docs // 20  # half the target-domain mass (target = 2/20 of docs)
    sel = dsir_sample(w, n_select=n_sel, seed=3, temperature=0.05).materialize()
    res["select_sec"] = round(time.perf_counter() - t0, 2)
    res["docs_per_sec"] = int(n_docs / (res["totals_sec"] + res["select_sec"]))

    def check(df):
        r = df["doc_id"].to_numpy() % 20
        return pd.DataFrame({"n": [len(df)], "target": [int(((r == 16) | (r == 17)).sum())]})

    agg = sel.map_batches(check, batch_format="pandas").to_pandas().sum()
    res["selected"] = int(agg["n"])
    res["target_share"] = round(agg["target"] / agg["n"], 4)
    assert agg["n"] == n_sel
    assert res["target_share"] >= 0.95, res
    print(json.dumps(res))



if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    os.makedirs(OUT, exist_ok=True)
    _init()
    if which in ("bpe", "all"):
        soak_bpe(scale or 2_000_000)
    if which in ("semdedup", "all"):
        soak_semdedup(scale or 1_000_000)
    if which in ("curate", "all"):
        soak_curate(scale or 4_000_000)
    if which in ("inc", "all"):
        soak_curate_incremental(scale or 1_000_000)
    if which in ("dsir", "all"):
        soak_dsir(scale or 4_000_000)
    if which in ("budget", "all"):
        soak_budget(scale or 20_000_000)
    import ray

    ray.shutdown()
