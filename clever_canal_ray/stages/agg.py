"""Bucketed high-cardinality aggregation.

Ray Data's ``groupby(key).aggregate(...)`` pays per-GROUP Python
overhead in its sort-based reduce — catastrophic at 10^5+ groups
(measured: 73 s for 580 k groups where pandas does the same in <1 s).

The scalable pattern (SURVEY.md §4 "pre-aggregate partial"):

1. ``map_batches(partial)``: vectorized pandas per-key partials within
   each batch — output rows ≤ distinct keys per batch;
2. bucket the partials by ``stable_hash(key) % num_buckets`` — the
   shuffle key has ≤ num_buckets groups, so Ray's per-group overhead
   is bounded and constant;
3. ``groupby("__bucket").map_groups(final)``: the many-key merge runs
   VECTORIZED inside each bucket (pandas groupby), not per key.

``num_buckets`` sizes reduce parallelism: ~2-4× total cores; each
bucket must fit a worker's heap (keys/num_buckets × row width).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd

from clever_canal_ray.state.partitioning import stable_hash


def bucketed_groupby(
    ds,
    key_cols: list[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    final_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 64,
    partial_format: str = "pandas",
):
    """partial per batch -> bucket shuffle -> vectorized final per bucket.

    ``partial_fn``: batch -> per-key partial rows (must include key_cols).
    ``final_fn``: all partial rows of one bucket -> final rows.
    ``partial_format``: batch format handed to ``partial_fn`` — pass
    "pyarrow" when the partial reads wide columns (embeddings) so the
    scan stays zero-copy; the partial still RETURNS pandas rows.
    """

    def partial_and_bucket(batch) -> pd.DataFrame:
        p = partial_fn(batch)
        if len(p) == 0:
            p = p.copy()
            p["__bucket"] = pd.Series([], dtype="int64")
            return p
        if len(key_cols) == 1:
            key = p[key_cols[0]].astype(str).to_numpy()
        else:
            key = p[key_cols[0]].astype(str).str.cat([p[c].astype(str) for c in key_cols[1:]], sep="\x00").to_numpy()
        p = p.copy()
        p["__bucket"] = (stable_hash(key) % np.uint64(num_buckets)).astype(np.int64)
        return p

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return final_fn(group.drop(columns="__bucket"))

    return (
        ds.map_batches(partial_and_bucket, batch_format=partial_format)
        .groupby("__bucket")
        .map_groups(final, batch_format="pandas")
    )
