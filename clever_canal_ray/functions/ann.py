"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: baseline — broadcast the (small) query matrix
  with ``ray.put`` once, one numpy matmul per batch, per-batch local
  top-k, tiny global reduce. Scales linearly in corpus size with zero
  shuffles of the corpus.
- ``lsh_topk``: scale path — random-hyperplane signatures bucket the
  corpus (one groupby on the bucket key); queries probe matching
  buckets and rerank exactly. Recall < 1 by design; multi-table
  probing trades compute for recall.
- ``pq_train`` / ``pq_encode`` / ``pq_topk``: product quantization —
  the compression tier (float32 embeddings → n_sub uint8 codes per
  row); search runs in the compressed domain via per-query ADC lookup
  tables, over-fetch + exact rerank recovers recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(ds, query_vecs: np.ndarray, k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Exact cosine top-k per query vector.

    Returns a pandas DataFrame (query_i, vec_id, cos_sim) with k rows
    per query, cos_sim rounded to 4 decimals for cross-engine
    comparability.
    """
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    ref = ray.put(q)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(ref)
        ids = batch[id_col].to_numpy()
        m = _normalize(np.stack(batch[emb_col].to_numpy()).astype(np.float64))
        sims = qm @ m.T  # (n_query, n_batch)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = {
            "query_i": np.repeat(np.arange(qm.shape[0]), kk),
            id_col: ids[idx.reshape(-1)],
            "cos_sim": np.take_along_axis(sims, idx, axis=1).reshape(-1),
        }
        return pd.DataFrame(rows)

    partials = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    out = (
        partials.sort_values(["query_i", "cos_sim", id_col], ascending=[True, False, True])
        .groupby("query_i", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["cos_sim"] = out["cos_sim"].round(4)
    return out


class HyperplaneHasher:
    """Actor-pool signature stage: hyperplanes drawn once per actor from
    a fixed seed (identical across actors — deterministic)."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 99):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_bits, dim))
        self.weights = (1 << np.arange(n_bits)).astype(np.int64)

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        return (((m @ self.planes.T) > 0).astype(np.int64) * self.weights).sum(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        out = batch.copy()
        out["bucket"] = self.bucket_of(m)
        return out


def lsh_dup_pairs(ds, threshold: float = 0.9, n_bits: int = 10, seed: int = 7, id_col: str = "vec_id", emb_col: str = "embedding", num_buckets: int = 64):
    """Embedding near-dup at scale: random-hyperplane signatures bucket
    the corpus (ONE groupby on the bucket hash — the same shuffle
    pattern as MinHash banding), exact cosine only within buckets.
    Near-identical vectors share all sign bits with high probability,
    so recall at threshold→1 is high without any broadcast matrix.
    """
    import pandas as pd

    hasher: dict = {}

    def sign_stage(batch: pd.DataFrame) -> pd.DataFrame:
        if "h" not in hasher:
            dim = len(batch[emb_col].iloc[0])
            hasher["h"] = HyperplaneHasher(dim, n_bits=n_bits, seed=seed)
        m = np.stack(batch[emb_col].to_numpy()).astype(np.float64)
        out = batch[[id_col, emb_col]].copy()
        out["bucket"] = hasher["h"].bucket_of(m)
        return out

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cos_sim": []})
        ids = g[id_col].to_numpy()
        m = _normalize(np.stack(g[emb_col].to_numpy()).astype(np.float64))
        sims = m @ m.T
        ai, bi = np.where(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {
                "a": np.minimum(ids[ai], ids[bi]),
                "b": np.maximum(ids[ai], ids[bi]),
                "cos_sim": np.round(sims[ai, bi], 4),
            }
        )

    return (
        ds.map_batches(sign_stage, batch_format="pandas")
        .groupby("bucket")
        .map_groups(lambda g: bucket_pairs(g.drop(columns="bucket")), batch_format="pandas")
    )


def lsh_topk(ds, query_vecs: np.ndarray, k: int = 10, n_bits: int = 8, seed: int = 99, id_col: str = "vec_id", emb_col: str = "embedding", n_probe_bits: int = 0):
    """LSH-bucketed ANN: exact rerank within the query's bucket(s).

    The corpus is bucketed with one map_batches (signatures) and
    filtered to the query buckets (broadcast set) — a semi-join, not a
    shuffle; rerank is brute force over the tiny candidate set.
    ``n_probe_bits`` > 0 enables multiprobe: also search every bucket
    within that Hamming distance of each query signature (recall rises
    steeply; candidate volume grows ~ C(n_bits, n_probe_bits)).
    """
    q = np.atleast_2d(np.asarray(query_vecs, dtype=np.float64))
    hasher = HyperplaneHasher(q.shape[1], n_bits=n_bits, seed=seed)
    base = hasher.bucket_of(q).tolist()
    q_buckets = set(base)
    if n_probe_bits > 0:
        from itertools import combinations

        flips = [
            sum(1 << b for b in combo)
            for r in range(1, n_probe_bits + 1)
            for combo in combinations(range(n_bits), r)
        ]
        q_buckets |= {sig ^ f for sig in base for f in flips}

    def in_query_buckets(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch[emb_col].to_numpy()).astype(np.float64)
        return batch[pd.Series(hasher.bucket_of(m), index=batch.index).isin(q_buckets)]

    candidates = ds.map_batches(in_query_buckets, batch_format="pandas")
    return brute_force_topk(candidates, q, k=k, id_col=id_col, emb_col=emb_col)


def ivf_build_centroids(ds, n_centroids: int = 16, iters: int = 2, emb_col: str = "embedding", id_col: str = "vec_id", num_buckets: int = 8):
    """IVF coarse quantizer: k-means centroids trained distributed —
    seeds = the first ``n_centroids`` vectors by id (deterministic),
    then ``iters`` Lloyd rounds where assignment runs per batch against
    broadcast centroids and the (cid, sum, count) partials merge
    through ONE small bucketed groupby per round. Centroid matrix is
    k × d — driver-resident by design (the IVF index's only global
    state)."""
    import ray

    seed_df = (
        ds.map_batches(
            lambda df: df.nsmallest(n_centroids, id_col), batch_format="pandas"
        )
        .to_pandas()
        .nsmallest(n_centroids, id_col)
        .sort_values(id_col)
    )
    cents = _normalize(np.stack(seed_df[emb_col].to_numpy()).astype(np.float64))

    from clever_canal_ray.stages.agg import bucketed_groupby

    for _ in range(iters):
        ref = ray.put(cents)

        def assign_partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            m = _normalize(np.stack(df[emb_col].to_numpy()).astype(np.float64))
            cid = np.argmax(m @ c.T, axis=1)
            sums = np.zeros((c.shape[0], m.shape[1]))
            np.add.at(sums, cid, m)
            counts = np.bincount(cid, minlength=c.shape[0])
            keep = counts > 0
            return pd.DataFrame(
                {
                    "cid": np.arange(c.shape[0])[keep],
                    "vec_sum": list(sums[keep]),
                    "n": counts[keep].astype("int64"),
                }
            )

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            agg = (
                g.groupby("cid", sort=False)
                .agg(vec_sum=("vec_sum", lambda s: np.sum(np.stack(s.to_numpy()), axis=0)), n=("n", "sum"))
                .reset_index()
            )
            return agg

        stats = bucketed_groupby(
            ds, ["cid"], assign_partial, merge, num_buckets=num_buckets
        ).to_pandas()
        new = cents.copy()
        for _, r in stats.iterrows():
            if r["n"] > 0:
                new[int(r["cid"])] = np.asarray(r["vec_sum"]) / r["n"]
        cents = _normalize(new)
    return cents


def ivf_topk(ds, query_vecs: np.ndarray, centroids: np.ndarray, k: int = 10, n_probe: int = 4, id_col: str = "vec_id", emb_col: str = "embedding"):
    """IVF search: per batch, assign vectors to their nearest centroid
    (broadcast k × d matrix) and keep only vectors whose cell is among
    each query's ``n_probe`` nearest cells — a semi-join filter, no
    corpus shuffle — then exact rerank of the surviving candidates."""
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    cents = _normalize(np.asarray(centroids, dtype=np.float64))
    probe_cells = set(
        np.argsort(-(q @ cents.T), axis=1)[:, :n_probe].reshape(-1).tolist()
    )
    ref = ray.put(cents)

    def in_probe_cells(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        m = _normalize(np.stack(df[emb_col].to_numpy()).astype(np.float64))
        cid = np.argmax(m @ c.T, axis=1)
        return df[pd.Series(cid, index=df.index).isin(probe_cells)]

    candidates = ds.map_batches(in_probe_cells, batch_format="pandas")
    return brute_force_topk(candidates, q, k=k, id_col=id_col, emb_col=emb_col)


def _assign_cosine(df, cents: np.ndarray, emb_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-centroid by cosine for one batch against pre-normalized
    centroids: (cid, winning similarity), float64 — the shared kernel
    under cluster_assign and dedup.semdedup (one implementation, one
    set of normalization semantics)."""
    m = _normalize(np.stack(df[emb_col].to_numpy()).astype(np.float64))
    sims = m @ cents.T
    cid = np.argmax(sims, axis=1)
    return cid, sims[np.arange(len(cid)), cid]


def cluster_assign(ds, centroids: np.ndarray, emb_col: str = "embedding",
                   id_prefix: str = "cluster"):
    """Corpus clustering (domain discovery): assign every row to its
    nearest centroid by cosine and append ``<prefix>_id`` (int32) and
    ``<prefix>_sim`` (float32, the winning cosine).

    Pairs with :func:`ivf_build_centroids` (the distributed Lloyd
    trainer) to make k-means clustering a first-class corpus op — e.g.
    partition a web corpus into topical domains before per-domain
    sampling (``corpus.stratified_sample`` on the cluster id).

    Scale shape: centroids (k × d, the only global state) broadcast
    ONCE via ``ray.put``; per batch one matmul + argmax; zero shuffle,
    streams at any corpus size.
    """
    import ray

    cents = _normalize(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cents)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        cid, win = _assign_cosine(df, ray.get(ref), emb_col)
        out = df.copy()
        out[f"{id_prefix}_id"] = cid.astype(np.int32)
        out[f"{id_prefix}_sim"] = win.astype(np.float32)
        return out

    return ds.map_batches(fn, batch_format="pandas")


def random_projection(
    ds, dim_out: int, seed: int = 0, emb_col: str = "embedding", d_in: int | None = None
):
    """Johnson–Lindenstrauss dimensionality reduction: project the
    embedding column through a seeded Gaussian matrix, scaled by
    1/sqrt(dim_out) so expected pairwise inner products are preserved.

    The projection matrix is broadcast ONCE via ``ray.put`` and read in
    each task (never re-shipped per batch); the per-batch work is one
    numpy matmul — zero shuffle, streams at any corpus size. The output
    column keeps the input's dtype family (float32 lists).
    """
    import ray

    if d_in is None:
        head = ds.take(1)
        if not head:
            # empty input: nothing to project (and no dim to infer)
            return ds
        d_in = len(head[0][emb_col])
    rng = np.random.default_rng(seed)
    proj = (rng.standard_normal((d_in, dim_out)) / np.sqrt(dim_out)).astype(np.float32)
    proj_ref = ray.put(proj)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(proj_ref)
        m = np.stack(df[emb_col].to_numpy()).astype(np.float32)
        out = df.copy()
        out[emb_col] = list(m @ p)
        return out

    return ds.map_batches(fn, batch_format="pandas")


# --- product quantization (compressed-domain ANN) -------------------------


def _pq_split(m: np.ndarray, n_sub: int) -> np.ndarray:
    """(n, d) -> (n, n_sub, d/n_sub); d must divide evenly."""
    n, d = m.shape
    if d % n_sub:
        raise ValueError(f"embedding dim {d} not divisible by m={n_sub} subspaces")
    return m.reshape(n, n_sub, d // n_sub)


def pq_train(
    ds,
    n_sub: int = 8,
    n_codes: int = 256,
    sample_n: int = 20_000,
    iters: int = 6,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train product-quantization codebooks: per-subspace k-means over
    a bounded deterministic sample (the FAISS practice — codebooks are
    statistics of the distribution, not of every row; the sample is
    the first ``sample_n`` rows by id so training is reproducible at
    any parallelism). Vectors are L2-normalized first, so PQ inner
    product approximates cosine like the rest of the ANN family.

    Returns codebooks of shape (n_sub, n_codes, d/n_sub) — the index's
    only global state, 256·d floats regardless of corpus size
    (broadcast once by the encode/search stages).
    """
    if n_codes > 256:
        raise ValueError(f"n_codes={n_codes} > 256: codes are uint8 (one byte per subspace)")

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col).head(sample_n)[[id_col, emb_col]]

    # fold one block's prefix at a time — the driver holds at most
    # 2·sample_n rows, never blocks × sample_n
    sample = None
    for b in ds.map_batches(prefilter, batch_format="pandas").iter_batches(
        batch_size=None, batch_format="pandas"
    ):
        sample = b if sample is None else pd.concat([sample, b], ignore_index=True)
        sample = sample.sort_values(id_col).head(sample_n)
    if sample is None or sample.empty:
        raise ValueError("pq_train: empty dataset")
    x = _normalize(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
    sub = _pq_split(x, n_sub)
    books = []
    for s in range(n_sub):
        xs = sub[:, s, :]
        k = min(n_codes, len(xs))
        # deterministic seeds: first k distinct subvectors
        _, first = np.unique(xs.round(12), axis=0, return_index=True)
        cents = xs[np.sort(first)[:k]].copy()
        if len(cents) < n_codes:  # degenerate sample: pad by repetition
            cents = cents[np.arange(n_codes) % len(cents)]
        for _ in range(iters):
            # L2 assignment: argmin ||x-c||^2 = argmax x·c - ||c||²/2
            aff = xs @ cents.T - 0.5 * (cents * cents).sum(1)[None, :]
            a = np.argmax(aff, axis=1)
            sums = np.zeros_like(cents)
            np.add.at(sums, a, xs)
            counts = np.bincount(a, minlength=len(cents))
            nz = counts > 0
            cents[nz] = sums[nz] / counts[nz, None]  # empty cells keep position
        books.append(cents)
    return np.stack(books)  # (n_sub, n_codes, d/n_sub)


def pq_encode(ds, codebooks: np.ndarray, emb_col: str = "embedding", id_col: str = "vec_id"):
    """Compress the embedding column to ``n_sub`` uint8 codes per row
    (e.g. 768-dim float32 = 3 KB -> 8-64 B): per batch, one
    affinity matmul per subspace against the broadcast codebooks, no
    shuffle. Returns a Dataset of (id_col, ``pq_code`` list<uint8>) —
    the compressed index a 100-TB corpus can actually hold in hot
    storage (the raw embeddings stay cold; search runs in the
    compressed domain via :func:`pq_topk`)."""
    import ray

    cb = np.asarray(codebooks, dtype=np.float64)
    if cb.shape[1] > 256:
        raise ValueError(f"codebooks carry {cb.shape[1]} codes/subspace > 256 (uint8 codes)")
    ref = ray.put(cb)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        books = ray.get(ref)
        m = _normalize(np.stack(df[emb_col].to_numpy()).astype(np.float64))
        sub = _pq_split(m, books.shape[0])
        codes = np.empty((len(m), books.shape[0]), dtype=np.uint8)
        for s in range(books.shape[0]):
            cents = books[s]
            aff = sub[:, s, :] @ cents.T - 0.5 * (cents * cents).sum(1)[None, :]
            codes[:, s] = np.argmax(aff, axis=1).astype(np.uint8)
        return pd.DataFrame({id_col: df[id_col].to_numpy(), "pq_code": list(codes)})

    return ds.map_batches(encode, batch_format="pandas")


def pq_topk(
    codes_ds,
    query_vecs: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Asymmetric-distance (ADC) top-k in the COMPRESSED domain: per
    query a (n_sub × n_codes) lookup table of subspace inner products
    is built once on the driver and broadcast; each batch scores its
    rows with pure table gathers (sum over subspaces of
    LUT[s, code[s]]) — no decompression, no matmul over d, no shuffle
    — and keeps local top-k; driver final over blocks × Q × k rows.
    Returns (query_i, vec_id, adc_sim) with adc_sim ≈ cosine (exact
    cosine of the reconstructed vectors). Pair with
    :func:`brute_force_topk` over an id semi-join for exact reranking
    of an over-fetched candidate set."""
    import ray

    cb = np.asarray(codebooks, dtype=np.float64)
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    n_sub = cb.shape[0]
    qsub = _pq_split(q, n_sub)  # (Q, n_sub, d/n_sub)
    # LUT[qi, s, c] = q_sub(qi,s) · codebook(s,c)
    lut = np.einsum("qsd,scd->qsc", qsub, cb)
    ref = ray.put(lut)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        tables = ray.get(ref)
        codes = np.stack(df["pq_code"].to_numpy()).astype(np.int64)  # (n, n_sub)
        ids = df[id_col].to_numpy()
        # local ties must break by id like the driver final does, or a
        # tie straddling the local-k boundary varies with block layout
        # (ADC sims are quantized — identical codes tie exactly)
        id_rank = np.empty(len(ids), dtype=np.int64)
        id_rank[np.argsort(ids, kind="stable")] = np.arange(len(ids))
        rows = np.arange(codes.shape[1])[None, :]
        out = []
        for qi in range(tables.shape[0]):
            sims = tables[qi][rows, codes].sum(axis=1)  # (n,)
            top = np.lexsort((id_rank, -sims))[:k]
            out.append(
                pd.DataFrame({"query_i": qi, id_col: ids[top], "adc_sim": sims[top]})
            )
        return pd.concat(out, ignore_index=True)

    cand = codes_ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["query_i", "adc_sim", id_col], ascending=[True, False, True])
    out = cand.groupby("query_i", sort=True).head(k).reset_index(drop=True)
    out["adc_sim"] = out["adc_sim"].round(4)
    return out
