"""ANN soak: recall + throughput of the approximate paths at 1M
vectors (beyond-gate-scale evidence for functions/ann.py).

Deterministic clustered corpus (1M × 64-d around 256 seeded centers +
noise — the shape IVF exists for), 64 query vectors drawn from the
corpus. Exact brute-force cosine top-10 (broadcast matmul per batch)
is the ground truth; `ivf_topk` (distributed Lloyd centroids +
n_probe cell semi-join, the documented 100-TB scale path) and
`lsh_topk` (multiprobe hyperplane buckets) report recall@10 and wall
time against it.

Usage: python scripts/soak_ann.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

import numpy as np  # noqa: E402

from soak_dedup import _MemPoller  # noqa: E402

D = 64
N_CENTERS = 256
N_QUERIES = 64
K = 10


class VecGen:
    """Actor-pool generator: centers built once per actor; per-batch
    vectors are center[id % C] + seeded noise — fully vectorized."""

    def __init__(self):
        rng = np.random.default_rng(12345)
        # noise DOMINATES the center signal (6x): clusters overlap
        # heavily, so true neighbors cross IVF cells and probe depth
        # matters — a well-separated corpus scores recall 1.0 at
        # n_probe=1 and differentiates nothing
        self.centers = rng.standard_normal((N_CENTERS, D)).astype(np.float32)

    def __call__(self, batch):
        import pandas as pd

        ids = batch["id"].to_numpy()
        # deterministic per-id noise: splitmix the id into a seed block
        from clever_canal_ray.functions.corpus import _splitmix64

        base = self.centers[ids % N_CENTERS]
        noise = np.empty((len(ids), D), dtype=np.float32)
        for j in range(0, D, 8):  # 8 u64 -> 8 noise cols per pass
            h = _splitmix64(ids.astype(np.int64) * np.int64(D) + j)
            for b in range(8):
                noise[:, j + b] = (((h >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.float32) - 127.5) / 255.0
        vecs = base + noise * 6.0
        # plain Arrow fixed_size_list<float32> (NOT the tensor
        # extension type — its pandas metadata does not survive the
        # parquet round trip at multi-file scale)
        import pyarrow as pa

        flat = pa.array(vecs.reshape(-1))
        return pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(flat, D),
            }
        )


def main(n_vectors: int = 1_000_000) -> None:
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
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from clever_canal_ray.config import actor_pool
    from clever_canal_ray.functions.ann import brute_force_topk, ivf_build_centroids, ivf_topk, lsh_topk

    out_dir = "/tmp/soak_ann"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    poller = _MemPoller()
    poller.start()
    res: dict = {"metric": "soak_ann", "n_vectors": n_vectors, "dim": D, "k": K, "unit": "sec"}

    t0 = time.perf_counter()
    (
        rd.range(n_vectors, override_num_blocks=max(32, n_vectors // 100_000))
        .map_batches(VecGen, batch_format="pandas", concurrency=actor_pool())
        .write_parquet(out_dir)
    )
    res["gen_sec"] = round(time.perf_counter() - t0, 2)

    vecs = rd.read_parquet(out_dir)
    # queries = corpus vectors at fixed strides (known true neighbor: itself)
    q_ids = np.arange(N_QUERIES) * (n_vectors // N_QUERIES)
    gen = VecGen()
    import pandas as pd

    qt = gen(pd.DataFrame({"id": q_ids}))
    Q = (
        qt["embedding"]
        .combine_chunks()
        .flatten()
        .to_numpy(zero_copy_only=False)
        .reshape(len(q_ids), D)
    )

    t0 = time.perf_counter()
    exact = brute_force_topk(vecs, Q, k=K)
    res["brute_sec"] = round(time.perf_counter() - t0, 2)
    truth = {qi: set(g["vec_id"]) for qi, g in exact.groupby("query_i")}

    def recall(df) -> float:
        hits = sum(len(set(g["vec_id"]) & truth[qi]) for qi, g in df.groupby("query_i"))
        return round(hits / (K * len(truth)), 4)

    t0 = time.perf_counter()
    cents = ivf_build_centroids(vecs, n_centroids=N_CENTERS, iters=2)
    res["ivf_build_sec"] = round(time.perf_counter() - t0, 2)
    for n_probe in (1, 4, 16):
        t0 = time.perf_counter()
        approx = ivf_topk(vecs, Q, cents, k=K, n_probe=n_probe)
        res[f"ivf_probe{n_probe}_sec"] = round(time.perf_counter() - t0, 2)
        res[f"ivf_probe{n_probe}_recall"] = recall(approx)

    t0 = time.perf_counter()
    lsh = lsh_topk(vecs, Q, k=K, n_bits=10, n_probe_bits=2)
    res["lsh_sec"] = round(time.perf_counter() - t0, 2)
    res["lsh_recall"] = recall(lsh)

    res["peak_mem_gb"] = round(poller.peak_used_gb(), 1)
    poller.stop_flag.set()
    # the scale path must be materially cheaper than brute at equal-ish recall
    assert res["ivf_probe16_recall"] >= 0.9, res
    print(json.dumps(res), flush=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
