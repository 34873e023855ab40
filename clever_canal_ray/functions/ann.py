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
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_np(batch, emb_col: str, dtype=np.float64) -> np.ndarray:
    """(n, d) embedding matrix from a batch — ZERO-COPY on Arrow
    list/fixed_size_list columns: one flat-buffer view + reshape + a
    single vectorized cast, instead of ``np.stack`` over n per-row
    Python objects (the MinHasher Arrow-kernel pattern; float32→float64
    is exact, so results are bit-identical to the object path). Pandas
    batches (tests, small driver frames) fall back to np.stack; so do
    ragged or null-bearing columns, where np.stack surfaces the shape
    error the caller should see."""
    if not isinstance(batch, pa.Table):
        return np.stack(batch[emb_col].to_numpy()).astype(dtype)
    col = batch[emb_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ExtensionArray):
        # Ray tensor-extension column (from_pandas ndarray cells):
        # its storage IS a fixed_size_list — same zero-copy path
        col = col.storage
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype)
    t = col.type
    if col.null_count == 0:
        d = None
        if pa.types.is_fixed_size_list(t):
            d = t.list_size
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            w = np.diff(col.offsets.to_numpy(zero_copy_only=False))
            if (w == w[0]).all():
                d = int(w[0])
        if d is not None:
            flat = col.flatten()  # slice-aware, zero-copy child view
            return (
                flat.to_numpy(zero_copy_only=False)
                .reshape(n, d)
                .astype(dtype, copy=False)
            )
    return np.stack([np.asarray(v) for v in col.to_pylist()]).astype(dtype)


def _emb_list_array(m: np.ndarray, like_type: pa.DataType | None = None) -> pa.Array:
    """(n, d) matrix -> an Arrow list column in one shot (no per-row
    objects). ``like_type`` list<T> keeps the variable-length layout a
    caller's schema may expect; default is fixed_size_list."""
    n, d = m.shape
    if like_type is not None and isinstance(like_type, pa.ExtensionType):
        # keep Ray tensor-extension columns in their native layout
        from ray.air.util.tensor_extensions.arrow import ArrowTensorArray

        return ArrowTensorArray.from_numpy(np.ascontiguousarray(m))
    flat = pa.array(np.ascontiguousarray(m).reshape(-1))
    if like_type is not None and (
        pa.types.is_list(like_type) or pa.types.is_large_list(like_type)
    ):
        off = np.arange(0, (n + 1) * d, d, dtype=np.int64)
        if pa.types.is_large_list(like_type):
            return pa.LargeListArray.from_arrays(pa.array(off), flat)
        return pa.ListArray.from_arrays(pa.array(off, pa.int32()), flat)
    return pa.FixedSizeListArray.from_arrays(flat, d)


def _ids_np(t: pa.Table, id_col: str) -> np.ndarray:
    return t[id_col].to_numpy(zero_copy_only=False)


def brute_force_topk(ds, query_vecs: np.ndarray, k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Exact cosine top-k per query vector.

    Returns a pandas DataFrame (query_i, vec_id, cos_sim) with k rows
    per query, cos_sim rounded to 4 decimals for cross-engine
    comparability.
    """
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    ref = ray.put(q)

    def local_topk(t: pa.Table) -> pa.Table:
        qm = ray.get(ref)
        ids = _ids_np(t, id_col)
        m = _normalize(_emb_np(t, emb_col))  # zero-copy Arrow view
        sims = qm @ m.T  # (n_query, n_batch)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        return pa.table(
            {
                "query_i": np.repeat(np.arange(qm.shape[0]), kk),
                id_col: ids[idx.reshape(-1)],
                "cos_sim": np.take_along_axis(sims, idx, axis=1).reshape(-1),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
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

    def __call__(self, batch):
        m = _emb_np(batch, "embedding")
        if isinstance(batch, pa.Table):
            return batch.append_column("bucket", pa.array(self.bucket_of(m)))
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

    def sign_stage(t: pa.Table) -> pa.Table:
        m = _emb_np(t, emb_col)  # zero-copy Arrow view
        if "h" not in hasher:
            hasher["h"] = HyperplaneHasher(m.shape[1], n_bits=n_bits, seed=seed)
        # id/embedding columns pass through untouched (no re-encode)
        return pa.table(
            {
                id_col: t[id_col],
                emb_col: t[emb_col],
                "bucket": pa.array(hasher["h"].bucket_of(m)),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
        if len(g) < 2:
            return empty
        ids = _ids_np(g, id_col)
        m = _normalize(_emb_np(g, emb_col))
        sims = m @ m.T
        ai, bi = np.where(np.triu(sims >= threshold, k=1))
        if not len(ai):
            return empty
        return pa.table(
            {
                "a": np.minimum(ids[ai], ids[bi]).astype(np.int64),
                "b": np.maximum(ids[ai], ids[bi]).astype(np.int64),
                "cos_sim": np.round(sims[ai, bi], 4),
            }
        )

    return (
        ds.map_batches(sign_stage, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: bucket_pairs(g.drop_columns(["bucket"])), batch_format="pyarrow"
        )
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

    probe = np.fromiter(q_buckets, dtype=np.int64)

    def in_query_buckets(t: pa.Table) -> pa.Table:
        m = _emb_np(t, emb_col)  # zero-copy Arrow view
        return t.filter(pa.array(np.isin(hasher.bucket_of(m), probe)))

    candidates = ds.map_batches(in_query_buckets, batch_format="pyarrow")
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

    def seed_partial(t: pa.Table) -> pa.Table:
        ids = _ids_np(t, id_col)
        kk = min(n_centroids, len(ids))
        idx = np.sort(np.argpartition(ids, kk - 1)[:kk]) if len(ids) > kk else np.arange(len(ids))
        return t.select([id_col, emb_col]).take(pa.array(idx))

    seed_df = (
        ds.map_batches(seed_partial, batch_format="pyarrow")
        .to_pandas()
        .nsmallest(n_centroids, id_col)
        .sort_values(id_col)
    )
    cents = _normalize(np.stack(seed_df[emb_col].to_numpy()).astype(np.float64))

    from clever_canal_ray.stages.agg import bucketed_groupby

    for _ in range(iters):
        ref = ray.put(cents)

        def assign_partial(t: pa.Table) -> pd.DataFrame:
            c = ray.get(ref)
            m = _normalize(_emb_np(t, emb_col))  # zero-copy Arrow view
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
            ds, ["cid"], assign_partial, merge, num_buckets=num_buckets,
            partial_format="pyarrow",
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

    probe = np.fromiter(probe_cells, dtype=np.int64)

    def in_probe_cells(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_emb_np(t, emb_col))  # zero-copy Arrow view
        cid = np.argmax(m @ c.T, axis=1)
        return t.filter(pa.array(np.isin(cid, probe)))

    candidates = ds.map_batches(in_probe_cells, batch_format="pyarrow")
    return brute_force_topk(candidates, q, k=k, id_col=id_col, emb_col=emb_col)


def _assign_cosine(batch, cents: np.ndarray, emb_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-centroid by cosine for one batch (Arrow table or pandas
    frame) against pre-normalized centroids: (cid, winning similarity),
    float64 — the shared kernel under cluster_assign and dedup.semdedup
    (one implementation, one set of normalization semantics)."""
    m = _normalize(_emb_np(batch, emb_col))
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

    def fn(t: pa.Table) -> pa.Table:
        cid, win = _assign_cosine(t, ray.get(ref), emb_col)
        # payload columns pass through zero-copy; only the two small
        # result columns are new allocations
        return t.append_column(
            f"{id_prefix}_id", pa.array(cid.astype(np.int32))
        ).append_column(f"{id_prefix}_sim", pa.array(win.astype(np.float32)))

    return ds.map_batches(fn, batch_format="pyarrow")


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

    def fn(t: pa.Table) -> pa.Table:
        p = ray.get(proj_ref)
        m = _emb_np(t, emb_col, np.float32)  # zero-copy Arrow view
        i = t.schema.get_field_index(emb_col)
        return t.set_column(
            i, emb_col, _emb_list_array(m @ p, like_type=t[emb_col].type)
        )

    return ds.map_batches(fn, batch_format="pyarrow")


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

    def encode(t: pa.Table) -> pa.Table:
        books = ray.get(ref)
        m = _normalize(_emb_np(t, emb_col))  # zero-copy Arrow view
        sub = _pq_split(m, books.shape[0])
        codes = np.empty((len(m), books.shape[0]), dtype=np.uint8)
        for s in range(books.shape[0]):
            cents = books[s]
            aff = sub[:, s, :] @ cents.T - 0.5 * (cents * cents).sum(1)[None, :]
            codes[:, s] = np.argmax(aff, axis=1).astype(np.uint8)
        return pa.table({id_col: t[id_col], "pq_code": _emb_list_array(codes)})

    return ds.map_batches(encode, batch_format="pyarrow")


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

    def local_topk(t: pa.Table) -> pd.DataFrame:
        tables = ray.get(ref)
        codes = _emb_np(t, "pq_code", np.int64)  # (n, n_sub), zero-copy view
        ids = _ids_np(t, id_col)
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

    cand = codes_ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["query_i", "adc_sim", id_col], ascending=[True, False, True])
    out = cand.groupby("query_i", sort=True).head(k).reset_index(drop=True)
    out["adc_sim"] = out["adc_sim"].round(4)
    return out
