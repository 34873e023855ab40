"""Unigram-LM quality-scoring soak (beyond-gate-scale evidence for
functions/text.unigram_lm_scores).

2M-doc deterministic corpus (100 words/doc, 100k vocab — the
soak_dedup generator): ONE bucketed (word,count) exchange builds the
broadcast LM, then the score pass streams. Verifies:

- the capped (top_v >= vocab) and uncapped paths return IDENTICAL
  scores (both code paths, determinism);
- the mean NLL sits at ln(V) (uniform corpus: every count ~ total/V),
  a real end-to-end value check at scale;
- throughput + peak memory recorded for BASELINE.md.

Usage: python scripts/soak_lm.py [n_docs]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

from soak_dedup import V, CorpusGen, _MemPoller  # noqa: E402


def main(n_docs: int = 2_000_000) -> None:
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
    from clever_canal_ray.functions.text import lm_nll_batch, unigram_counts_broadcast

    out_dir = "/tmp/soak_lm"
    corpus_dir = os.path.join(out_dir, "corpus")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(corpus_dir)
    poller = _MemPoller()
    poller.start()
    res: dict = {"metric": "soak_unigram_lm", "n_docs": n_docs, "unit": "sec"}

    t0 = time.perf_counter()
    (
        rd.range(n_docs, override_num_blocks=max(32, n_docs // 250_000))
        .map_batches(CorpusGen, batch_format="pandas", concurrency=actor_pool())
        .write_parquet(corpus_dir)
    )
    res["gen_sec"] = round(time.perf_counter() - t0, 2)

    docs = rd.read_parquet(corpus_dir, columns=["doc_id", "text"])

    t0 = time.perf_counter()
    ref = unigram_counts_broadcast(docs)  # uncapped: vocab 100k << max_vocab
    res["count_pass_sec"] = round(time.perf_counter() - t0, 2)
    words, cvals, total = ray.get(ref)
    res["vocab"] = int(len(words))
    assert total == n_docs * 100, (total, n_docs * 100)

    t0 = time.perf_counter()

    def score(t):
        import pyarrow as pa

        return pa.table({"doc_id": t["doc_id"], "nll": pa.array(lm_nll_batch(t["text"], ref))})

    import pyarrow.compute as pc

    agg = {"mn": None, "mx": None, "s": 0, "n": 0}
    for b in docs.map_batches(score, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        col = b["nll"]
        agg["mn"] = min(x for x in [agg["mn"], pc.min(col).as_py()] if x is not None)
        agg["mx"] = max(x for x in [agg["mx"], pc.max(col).as_py()] if x is not None)
        agg["s"] += pc.sum(col).as_py()
        agg["n"] += len(col)
    res["score_sec"] = round(time.perf_counter() - t0, 2)
    assert agg["n"] == n_docs
    mean_nll = agg["s"] / agg["n"] / 1e4
    res["mean_nll"] = round(mean_nll, 4)
    res["nll_range_e4"] = [int(agg["mn"]), int(agg["mx"])]
    # uniform corpus: every word count ~ total/V -> nll ~ ln(V)
    assert abs(mean_nll - math.log(V)) < 0.1, (mean_nll, math.log(V))

    # capped path (top_v >= vocab) must be IDENTICAL on a sample
    ref_cap = unigram_counts_broadcast(docs, top_v=V + 1000)
    w2, c2, t2 = ray.get(ref_cap)
    import numpy as np

    assert t2 == total and np.array_equal(words, w2) and np.array_equal(cvals, c2)

    res["docs_per_sec"] = round(n_docs / (res["count_pass_sec"] + res["score_sec"]))
    res["peak_mem_gb"] = round(poller.peak_used_gb(), 1)
    poller.stop_flag.set()
    print(json.dumps(res), flush=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000)
