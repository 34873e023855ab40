"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale design notes (100 TB):
- exact dedup = content-hash ``map_batches`` + ONE ``groupby(hash)``
  shuffle of (hash, doc_id) pairs only — payloads never move; the
  survivor set is then a broadcast semi-join filter.
- MinHash: signatures computed per batch (vectorized universal
  hashing), exploded to (band, band_hash, doc_id) rows — b×n tiny rows
  — one groupby on the band key; candidate verify uses the carried
  signatures (no second pass over text).
- embedding near-dup: per-batch numpy matmul against a broadcast
  (ray.put) candidate matrix; at full scale the matrix is replaced by
  LSH bucket keys (same groupby pattern as MinHash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_MERSENNE = np.uint64(2**61 - 1)


def _stable_u64(strings) -> np.ndarray:
    return pd.util.hash_array(np.asarray(strings, dtype=object), categorize=False)


def _arrow_schema_of(ds) -> pa.Schema:
    """The dataset's Arrow payload schema WITHOUT a Limit execution.

    ``ds.schema().base_schema`` is already Arrow for parquet-read /
    arrow-block datasets; pandas-block datasets (from_pandas in tests)
    expose a PandasBlockSchema instead. The obvious fallbacks —
    ``take_batch(1)`` / an early-broken ``iter_batches`` — run a
    cancelled LimitOperator execution, and repeated cancellations
    segfault Ray 2.49's raylet AT SHUTDOWN (reproduced 6/6 in
    /tmp-scale scripts; the crash killed whole pytest sessions after
    every test had passed). Routing the schema probe through an
    identity ``map_batches(batch_format="pyarrow")`` makes schema
    resolution itself produce the Arrow schema with no cancellation —
    measured clean across repeated sessions."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return base
    mapped = ds.map_batches(lambda t: t, batch_format="pyarrow").schema()
    base = getattr(mapped, "base_schema", mapped)
    if not isinstance(base, pa.Schema):  # pragma: no cover - ray internals moved
        raise TypeError(f"cannot resolve an Arrow schema from {type(base)}")
    return base



# --- exact dedup ----------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", num_buckets: int = 64):
    """Keep the minimum-id document per exact text hash.

    Returns a Dataset of (h, keep_id, n_dups). The shuffle carries only
    (hash, id) pairs bucketed to ``num_buckets`` groups (per-group Ray
    overhead bounded; the per-hash merge is vectorized pandas — see
    stages/agg.py).
    """
    from clever_canal_ray.stages.agg import bucketed_groupby

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _stable_u64(df[text_col].to_numpy()).astype(np.int64)
        p = pd.DataFrame({"h": h, id_col: df[id_col].to_numpy()})
        return (
            p.groupby("h", sort=False)
            .agg(keep_id=(id_col, "min"), n_dups=(id_col, "size"))
            .reset_index()
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("h", sort=False)
            .agg(keep_id=("keep_id", "min"), n_dups=("n_dups", "sum"))
            .reset_index()
        )

    return bucketed_groupby(ds, ["h"], partial, final, num_buckets=num_buckets)


def exact_dedup_survivors(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    broadcast: bool = False,
):
    """The corpus AFTER exact dedup: keep each text's minimum-id doc,
    drop the other copies — the filtered dataset a training pipeline
    actually consumes (exact_dedup reports the groups; this applies
    them).

    DEFAULT (scale path): fully distributed — the keeper-id set (one
    row per DISTINCT text, i.e. ~the corpus for a mostly-unique crawl)
    NEVER lands on the driver. Keeper ids and doc rows hash-shuffle
    into the same id buckets (ONE extra bucketed exchange) and each
    bucket filters with a zero-copy Arrow semi-join (``pc.is_in``
    against the bucket's keeper ids). Payloads move once — the same
    transport cost any shuffle-based dedup pays.

    ``broadcast=True`` (small-corpus fast path): collect the keeper-id
    set to the driver, ``ray.put`` it once, and filter per batch with
    no payload shuffle — O(distinct texts) driver memory, only safe
    when the distinct count is known to be small.
    """
    import pyarrow.compute as pc

    keep = exact_dedup(ds, text_col=text_col, id_col=id_col, num_buckets=num_buckets)

    if broadcast:
        import ray

        keep_ids = keep.select_columns(["keep_id"]).to_pandas()["keep_id"].to_numpy()
        ref = ray.put(pa.array(np.sort(keep_ids)))  # broadcast once, read per task

        def survivors(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t[id_col], value_set=ray.get(ref)))

        return ds.map_batches(survivors, batch_format="pyarrow")

    doc_schema = _arrow_schema_of(ds)
    id_type = doc_schema.field(id_col).type
    transport = pa.schema(list(doc_schema) + [pa.field("__keep", pa.bool_())])

    def docs_side(t: pa.Table) -> pa.Table:
        arrays = [t.column(f.name) for f in doc_schema]
        return pa.Table.from_arrays(
            arrays + [pa.array(np.zeros(t.num_rows, bool))], schema=transport
        )

    def keep_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = [
            t["keep_id"].cast(id_type) if f.name == id_col else pa.nulls(n, f.type)
            for f in doc_schema
        ]
        return pa.Table.from_arrays(cols + [pa.array(np.ones(n, bool))], schema=transport)

    def bucket(t: pa.Table) -> pa.Table:
        from clever_canal_ray.functions.corpus import _fast_u64

        ids = t[id_col].to_numpy(zero_copy_only=False)
        b = (_fast_u64(ids) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def semi_join(t: pa.Table) -> pa.Table:
        is_keep = t["__keep"].to_numpy(zero_copy_only=False)
        ids = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        keep_ids = ids.filter(pa.array(is_keep))
        mask = pc.and_(pa.array(~is_keep), pc.is_in(ids, value_set=keep_ids))
        out = t.filter(mask)
        return out.drop_columns(["__keep", "__bucket"])

    u = ds.map_batches(docs_side, batch_format="pyarrow").union(
        keep.map_batches(keep_side, batch_format="pyarrow")
    )
    return (
        u.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(semi_join, batch_format="pyarrow")
    )


# --- MinHash + LSH --------------------------------------------------------


def _run_pair_indices(b: np.ndarray, h: np.ndarray, order_within: np.ndarray):
    """All unordered index pairs within equal-``(b, h)`` runs, ordered
    by ``order_within`` inside a run — the shared LSH-bucket pair
    expansion (MinHash bands, SimHash bands). Returns ``(perm, ia,
    ib)``: apply ``perm`` to any payload column, then index with
    ia/ib. Fully vectorized: lexsort → run-length detect → per-RUN-SIZE
    batched triu expansion (a per-group pandas loop measured 27 s per
    100k docs)."""
    order = np.lexsort((order_within, h, b))
    bs, hs = b[order], h[order]
    new_run = np.ones(len(bs), dtype=bool)
    new_run[1:] = (bs[1:] != bs[:-1]) | (hs[1:] != hs[:-1])
    run_id = np.cumsum(new_run) - 1
    counts = np.bincount(run_id)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    ias, ibs = [], []
    for m in np.unique(counts):
        if m < 2:
            continue
        idx = starts[counts == m]
        mat = idx[:, None] + np.arange(m)[None, :]
        iu, ju = np.triu_indices(int(m), k=1)
        ias.append(mat[:, iu].reshape(-1))
        ibs.append(mat[:, ju].reshape(-1))
    if not ias:
        e = np.array([], dtype=np.int64)
        return order, e, e
    ia, ib = np.concatenate(ias), np.concatenate(ibs)
    # strict a < b by order_within: a doc_id appearing on TWO rows of a
    # bucket (self-unioned corpus, re-emitted rows) must not produce a
    # self-pair — within a run order_within is sorted, so equality is
    # the only violation possible
    ow = order_within[order]
    keep = ow[ia] != ow[ib]
    return order, ia[keep], ib[keep]


def _pair_bucket(df: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    """Bucket (a, b) pair rows for the dedup exchange — the same pair
    surfacing from several bands must land in ONE bucket."""
    from clever_canal_ray.functions.corpus import _fast_u64

    df = df.copy()
    df["__bucket"] = (
        (_fast_u64(df["a"].to_numpy()) ^ (_fast_u64(df["b"].to_numpy()) >> np.uint64(1)))
        % np.uint64(num_buckets)
    ).astype(np.int64)
    return df


class MinHasher:
    """Actor-pool stage: seeded universal-hash parameters built once per
    actor; per-batch signature computation is a vectorized loop over
    shingles (numpy, no per-row Python hashing).

    ``num_hashes`` minhashes over word ``k``-gram shingles, banded into
    ``bands`` bands of ``num_hashes // bands`` rows each.
    """

    def __init__(self, num_hashes: int = 64, bands: int = 16, k: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 2**61 - 1, size=num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, 2**61 - 1, size=num_hashes, dtype=np.uint64)
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows = num_hashes // bands
        self.k = k

    @staticmethod
    def _shingle_hashes(word_hashes: np.ndarray, k: int) -> np.ndarray:
        """k-gram shingle hash = rolling polynomial combine of the
        per-word hashes (uint64 wraparound). Hashing each word once and
        combining numerically replaces re-hashing every joined k-gram
        string — the dominant cost of the naive kernel (measured ~45%
        of signature time)."""
        acc = word_hashes[: len(word_hashes) - k + 1].copy()
        for j in range(1, k):
            acc = acc * np.uint64(1_099_511_628_211) + word_hashes[j : len(word_hashes) - k + 1 + j]
        return acc

    def signature(self, text: str) -> np.ndarray:
        """Per-doc reference implementation (tests assert the batch
        kernel reproduces it bit-for-bit)."""
        words = text.split()
        if len(words) < self.k:
            sh = np.array([hash_text(text)], dtype=np.uint64)
        else:
            sh = self._shingle_hashes(_stable_u64(words), self.k)
        # (a * x + b) mod p, min over shingles — vectorized outer product
        vals = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def signatures_batch(self, texts) -> np.ndarray:
        """Fully-columnar signature kernel, Arrow-native: ONE C++
        whitespace split over the batch (``pc.utf8_split_whitespace``
        — measured 1.75× the pandas object-path split at 10k×100-word
        docs, bit-identical hashes), stable per-word hashes over the
        flat token array, rolling-combined shingle hashes, then
        per-hash segment-min (np.minimum.reduceat) over the per-doc
        shingle runs. No per-document Python loop. Accepts a pyarrow
        string Array/ChunkedArray zero-copy; lists/ndarrays are
        coerced once."""
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if not isinstance(texts, pa.Array):
            texts = pa.array(np.asarray(texts, dtype=object), type=pa.string())
        n = len(texts)
        sig = np.empty((n, self.num_hashes), dtype=np.uint64)
        if n == 0:
            return sig
        lens, flat = _ws_tokens(texts)  # str.split() parity incl. empty tokens
        short = lens < self.k
        if short.any():
            th = _stable_u64(
                texts.filter(pa.array(short)).to_numpy(zero_copy_only=False)
            )
            # elementwise (a*x+b) % p — same values the reference path yields
            sig[short] = (th[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        ok = ~short
        if ok.any():
            doc_lens = lens[ok]
            flat_arr = flat if ok.all() else flat.filter(pa.array(np.repeat(ok, lens)))
            wh = _stable_u64(flat_arr.to_numpy(zero_copy_only=False))
            sh_all = self._shingle_hashes(wh, self.k)
            # keep only shingles fully inside one document
            ends = np.cumsum(doc_lens)
            starts = ends - doc_lens
            m = len(sh_all)
            pos_in_doc = np.arange(m) - np.repeat(starts, doc_lens)[:m]
            valid = pos_in_doc <= (np.repeat(doc_lens, doc_lens)[:m] - self.k)
            sh = sh_all[valid]
            seg_counts = doc_lens - self.k + 1
            offs = np.zeros(len(doc_lens), np.int64)
            np.cumsum(seg_counts[:-1], out=offs[1:])
            out = np.empty((len(doc_lens), self.num_hashes), dtype=np.uint64)
            for j in range(self.num_hashes):  # 64 vectorized passes, not n_docs
                vals = (self.a[j] * sh + self.b[j]) % _MERSENNE
                out[:, j] = np.minimum.reduceat(vals, offs)
            sig[ok] = out
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        """ONE row per doc: (doc_id, sig fixed_size_list<int64>).
        Arrow in/out — the text column reads zero-copy from the object
        store and the signatures leave as ONE contiguous buffer (no
        per-row Python list objects). Band hashes are derived
        downstream from the signature (cheap vectorized fold) so the
        LSH exchange never replicates the signature per band."""
        sigs = self.signatures_batch(batch["text"])
        flat = pa.array(sigs.reshape(-1).view(np.int64))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.FixedSizeListArray.from_arrays(flat, self.num_hashes),
            }
        )

    def band_hashes(self, sigs: np.ndarray) -> np.ndarray:
        """(n, num_hashes) signatures -> (n, bands) band hashes."""
        banded = sigs.reshape(len(sigs), self.bands, self.rows)
        bh = np.zeros((len(sigs), self.bands), dtype=np.uint64)
        for r in range(self.rows):
            bh = bh * np.uint64(1_000_003) + banded[:, :, r]
        return bh


def hash_text(text: str) -> int:
    return int(_stable_u64([text])[0])


def _broadcast_candidate_ids(cand, cap: int = 10_000_000):
    """Distinct doc ids touched by candidate pairs — sorted int64, as a
    ``ray.put`` broadcast. The SEMI-JOIN PUSHDOWN for the signature /
    text joins: only O(candidates) docs need their payload shipped into
    the join, so the corpus side filters against this set instead of
    shuffling whole-corpus signatures/texts (measured at 16M docs: the
    unfiltered 10-11 GB sides pinned the executor's memory reservations
    and starved the join to 1-2 tasks). Returns None when the
    per-block-distinct upper bound exceeds ``cap`` (bounds the driver
    pull to ~80 MB of int64) — callers fall back to shipping the full
    side through the bucketed join."""
    import pyarrow.compute as pc

    def ids_block(t: pa.Table) -> pa.Table:
        u = pc.unique(
            pa.concat_arrays(
                [
                    t["a"].combine_chunks().cast(pa.int64()),
                    t["b"].combine_chunks().cast(pa.int64()),
                ]
            )
        )
        return pa.Table.from_arrays([u], names=["id"])

    try:
        per_block = cand.map_batches(ids_block, batch_format="pyarrow").materialize()
    except Exception:
        return None  # non-int64-castable ids -> full-side fallback
    if per_block.count() > cap:
        return None
    ids = np.unique(per_block.to_pandas()["id"].to_numpy())
    return ray.put(ids)


def _member_mask(values: np.ndarray, sorted_ids: np.ndarray) -> np.ndarray:
    """Membership of values in a sorted id array — searchsorted, no
    per-batch hash-set build."""
    v = values.astype(np.int64, copy=False)
    pos = np.searchsorted(sorted_ids, v)
    pos_c = np.minimum(pos, len(sorted_ids) - 1) if len(sorted_ids) else pos
    return (pos < len(sorted_ids)) & (sorted_ids[pos_c] == v) if len(sorted_ids) else np.zeros(len(v), bool)


def _sig_transport(num_hashes: int) -> pa.Schema:
    # signatures travel as ONE fixed-size binary blob per row (8 bytes
    # per minhash) — compact, null-safe through pandas group blocks
    # (a list<int64> column with nulls breaks TensorArray concat)
    return pa.schema(
        [
            ("key", pa.int64()),
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("sig", pa.binary(8 * num_hashes)),
            ("role", pa.int8()),  # 0 = pair side a, 1 = pair side b, 2 = doc signature
        ]
    )


def _minhash_pairs_small(ds, threshold, num_hashes, bands, k, seed, num_buckets):
    """Gate-scale fast path: ONE streaming execution (two exchanges, no
    materialize barriers, no actor pool — MinHasher setup is a handful
    of seed constants, so per-batch construction beats actor spin-up).
    Band rows DO carry the signature here; at ≤ a few hundred thousand
    docs the sig-bearing exchange is a few hundred MB and the fixed
    cost of the large path's four executions dominates instead
    (measured: 10 s → ~3 s at 5k docs). Pair set and est values are
    identical to the large path by construction."""
    hasher_cfg = (num_hashes, bands, k, seed)

    def explode_with_sigs(t: pa.Table) -> pd.DataFrame:
        mh = MinHasher(*hasher_cfg)
        sigs = mh.signatures_batch(t["text"])
        bh = mh.band_hashes(sigs)
        n = t.num_rows
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(bands, dtype=np.int32), n),
                "band_hash": bh.reshape(-1).astype(np.int64),
                "doc_id": np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), bands),
                "sig": list(np.repeat(sigs.astype(np.int64), bands, axis=0)),
                "__bucket": (bh.reshape(-1) % np.uint64(num_buckets)).astype(np.int64),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """Vectorized est-filtered pairs: lexsort → run-length detect
        equal (band, band_hash) runs → per-run-size triu expansion →
        one (sig_a == sig_b).mean over all pairs of that size."""
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "est_jaccard": pd.Series(dtype=np.float64),
            }
        )
        if len(group) < 2:
            return empty
        b = group["band"].to_numpy()
        h = group["band_hash"].to_numpy()
        d = group["doc_id"].to_numpy().astype(np.int64)
        order, ia, ib = _run_pair_indices(b, h, d)
        if not len(ia):
            return empty
        d = d[order]
        sig = np.stack(group["sig"].to_numpy())[order]
        est = np.round((sig[ia] == sig[ib]).mean(axis=1), 6)
        keep = est >= threshold
        if not keep.any():
            return empty
        return pd.DataFrame({"a": d[ia][keep], "b": d[ib][keep], "est_jaccard": est[keep]})

    return (
        ds.map_batches(explode_with_sigs, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda g: bucket_pairs(g.drop(columns="__bucket")), batch_format="pandas")
        .map_batches(lambda df: _pair_bucket(df, num_buckets), batch_format="pandas")
        .groupby("__bucket")
        .map_groups(
            lambda g: g.drop(columns="__bucket").drop_duplicates(["a", "b"]),
            batch_format="pandas",
        )
    )


def minhash_lsh_pairs(
    ds,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 1234,
    num_buckets: int = 64,
    small_input: bool | None = None,
    small_threshold: int = 200_000,
):
    """Near-duplicate pairs via MinHash banding.

    Pipeline (the 100-TB shape — nothing in the LSH exchange carries a
    signature): signatures once per doc (actor pool, materialized and
    reused) → band rows of just (band, band_hash, doc_id) — 24 bytes
    per doc per band, NOT sig-bearing — → groupby(bucket of band_hash)
    → per-LSH-bucket candidate id pairs → bucketed pair dedup → the
    signatures hash-join back onto the CANDIDATE pairs only (two
    id-bucketed exchanges over O(candidates) rows, mirror of
    minhash_lsh_pairs_verified's text join) where the estimated
    Jaccard (mean equal minhash) ≥ threshold filter runs. Returns
    (a, b, est_jaccard) with int64 ids, a < b.

    The earlier shape shipped the full 64×u64 signature on every band
    row — ``bands`` copies of every signature through the widest
    shuffle (8 KB/doc at the defaults; 131 GB of exchange per 16M
    docs). Candidate pairs sharing ≥1 band but estimating below
    threshold are now filtered one stage later; the pair set and
    est values are unchanged.

    Inputs at or below ``small_threshold`` docs dispatch to the
    single-execution gate-scale path (``_minhash_pairs_small`` —
    sig-bearing band rows are harmless there and the large path's
    four-execution fixed cost dominates). ``small_input`` forces the
    choice; None auto-detects via ``ds.count()`` (metadata-only for
    parquet reads).
    """
    if small_input is None:
        try:
            small_input = ds.count() <= small_threshold
        except Exception:
            small_input = False
    if small_input:
        return _minhash_pairs_small(ds, threshold, num_hashes, bands, k, seed, num_buckets)
    import pyarrow.compute as pc

    from clever_canal_ray.config import actor_pool
    from clever_canal_ray.functions.corpus import _fast_u64

    rows = num_hashes // bands

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_args=(num_hashes, bands, k, seed),
        batch_format="pyarrow",
        concurrency=actor_pool(),
    ).materialize()  # reused twice: band explode + candidate-pair est join

    hasher_cfg = (num_hashes, bands, k, seed)

    def explode_bands(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sig_col = t["sig"].combine_chunks()
        sig = (
            sig_col.flatten()
            .to_numpy(zero_copy_only=False)
            .view(np.uint64)
            .reshape(n, num_hashes)
        )
        mh = MinHasher(*hasher_cfg)
        bh = mh.band_hashes(sig)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
                "doc_id": t["doc_id"].take(
                    pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
                ),
                "__bucket": pa.array(
                    (bh.reshape(-1) % np.uint64(num_buckets)).astype(np.int64)
                ),
            }
        )

    def bucket_cand(group: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket = many (band, band_hash) LSH buckets; pair
        expansion via the shared ``_run_pair_indices`` (runs are
        overwhelmingly size 2)."""
        empty = pd.DataFrame(
            {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}
        )
        if len(group) < 2:
            return empty
        b = group["band"].to_numpy()
        h = group["band_hash"].to_numpy()
        d = group["doc_id"].to_numpy().astype(np.int64)
        order, ia, ib = _run_pair_indices(b, h, d)
        if not len(ia):
            return empty
        d = d[order]
        return pd.DataFrame({"a": d[ia], "b": d[ib]})

    cand = (
        sigs.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda g: bucket_cand(g.drop(columns="__bucket")), batch_format="pandas")
        # same pair may surface from several bands — vectorized dedup
        .map_batches(lambda df: _pair_bucket(df, num_buckets), batch_format="pandas")
        .groupby("__bucket")
        .map_groups(
            lambda g: g.drop(columns="__bucket").drop_duplicates(["a", "b"]),
            batch_format="pandas",
        )
        # PHASE SPLIT (measured at 16M docs): the candidate id table is
        # tiny (16 B/pair) next to the corpus — materializing it here
        # means the est-jaccard join below starts from a ready dataset
        # instead of chaining a union + 2 more sorts onto the 2-sort
        # banding pipeline in ONE streaming DAG. With everything in one
        # DAG the executor's per-operator memory reservations starved
        # the union (short side queued, long side's producer
        # output-backpressured) down to 1-2 running tasks cluster-wide.
        .repartition(32, shuffle=False)
        .materialize()
    )

    # --- est-jaccard join: signatures meet CANDIDATE pairs only ---
    transport = _sig_transport(num_hashes)
    blob_t = pa.binary(8 * num_hashes)
    # semi-join pushdown: only docs appearing in a candidate pair ship
    # their signature into the join (None above the broadcast cap ->
    # full-side fallback)
    cand_ids_ref = _broadcast_candidate_ids(cand)

    def pair_sides(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) else t["a"]
        b = t["b"].combine_chunks() if isinstance(t["b"], pa.ChunkedArray) else t["b"]
        a = a.cast(pa.int64())
        b = b.cast(pa.int64())
        n = t.num_rows
        side = lambda key, role: pa.Table.from_arrays(  # noqa: E731
            [
                key,
                a,
                b,
                pa.nulls(n, blob_t),
                pa.array(np.full(n, role, np.int8()), pa.int8()),
            ],
            schema=transport,
        )
        return pa.concat_tables([side(a, 0), side(b, 1)])

    def sig_rows(t: pa.Table) -> pa.Table:
        if cand_ids_ref is not None:
            ids = ray.get(cand_ids_ref)
            keep = _member_mask(
                t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False),
                ids,
            )
            t = t.filter(pa.array(keep))
        n = t.num_rows
        sig_col = t["sig"].combine_chunks() if isinstance(t["sig"], pa.ChunkedArray) else t["sig"]
        flat = sig_col.cast(pa.list_(pa.int64())).flatten().to_numpy(zero_copy_only=False)
        blobs = pa.Array.from_buffers(
            blob_t, n, [None, pa.py_buffer(np.ascontiguousarray(flat, dtype="<i8").tobytes())]
        )
        return pa.Table.from_arrays(
            [
                pc.cast(t["doc_id"], pa.int64()).combine_chunks(),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                blobs,
                pa.array(np.full(n, 2, np.int8()), pa.int8()),
            ],
            schema=transport,
        )

    def key_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (_fast_u64(df["key"].to_numpy()) % np.uint64(num_buckets)).astype(
            np.int64
        )
        return df

    def join_sigs(g: pd.DataFrame) -> pd.DataFrame:
        sig_side = g[g["role"] == 2][["key", "sig"]].rename(columns={"sig": "side_sig"})
        pairs = g[g["role"] < 2].drop(columns=["sig", "__bucket"])
        return pairs.merge(sig_side, on="key", how="inner").drop(columns=["key"])

    joined = (
        cand.map_batches(pair_sides, batch_format="pyarrow")
        .union(sigs.map_batches(sig_rows, batch_format="pyarrow"))
        .map_batches(key_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(join_sigs, batch_format="pandas")
    )

    def est_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "est_jaccard": pd.Series(dtype=np.float64),
            }
        )
        a_rows = g[g["role"] == 0][["a", "b", "side_sig"]].rename(columns={"side_sig": "sig_a"})
        b_rows = g[g["role"] == 1][["a", "b", "side_sig"]].rename(columns={"side_sig": "sig_b"})
        m = a_rows.merge(b_rows, on=["a", "b"], how="inner")
        if not len(m):
            return empty
        sa = np.frombuffer(b"".join(m["sig_a"]), dtype="<i8").reshape(len(m), -1)
        sb = np.frombuffer(b"".join(m["sig_b"]), dtype="<i8").reshape(len(m), -1)
        est = np.round((sa == sb).mean(axis=1), 6)
        keep = est >= threshold
        return pd.DataFrame(
            {
                "a": m["a"].to_numpy(np.int64)[keep],
                "b": m["b"].to_numpy(np.int64)[keep],
                "est_jaccard": est[keep],
            }
        )

    return (
        joined.map_batches(lambda df: _pair_bucket(df, num_buckets), batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda g: est_pairs(g.drop(columns="__bucket")), batch_format="pandas")
        # map_groups hands downstream one tiny block per bucket; coalesce
        # so consumers (verify join, clustering) don't pay per-block costs
        .repartition(32, shuffle=False)
    )


def shingle_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word k-gram Jaccard (the MinHash estimator's target)."""

    def sh(t):
        w = t.split()
        if len(w) < k:
            return {t}
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb) if (sa or sb) else 1.0


_VERIFY_TRANSPORT = pa.schema(
    [
        ("key", pa.string()),
        ("a", pa.string()),
        ("b", pa.string()),
        ("est_jaccard", pa.float64()),
        ("text", pa.string()),
        ("role", pa.int8()),  # 0 = pair side a, 1 = pair side b, 2 = doc text
    ]
)


def minhash_lsh_pairs_verified(
    ds,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 1234,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
):
    """Candidate pairs (MinHash banding) + EXACT distributed verification.

    Fully distributed — the candidate set NEVER lands on the driver
    (under heavy duplication it is unbounded): each candidate pair
    explodes into two keyed side rows which hash-shuffle-join against
    the corpus texts (one ``groupby(bucket-of-id)``), then regroup by
    pair to compute the true word-shingle Jaccard. Returns a Dataset of
    (a, b, est_jaccard, jaccard) with jaccard >= threshold; a/b are
    transported as strings (cast back as needed).
    """
    cand = minhash_lsh_pairs(
        ds,
        threshold=threshold * 0.8,
        num_hashes=num_hashes,
        bands=bands,
        k=k,
        seed=seed,
        num_buckets=num_buckets,
        # est-filtered pairs are a small table; same phase split as in
        # minhash_lsh_pairs — the text join below gets a ready input 1
        # so its union streams instead of starving (see cand comment
        # there)
    ).materialize()

    # semi-join pushdown: only docs in a candidate pair ship their text
    # (falls back to the full corpus side above the broadcast cap, or
    # when ids aren't int64-castable)
    cand_ids_ref = _broadcast_candidate_ids(cand)

    def pair_sides(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a = pc.cast(t["a"], pa.string()).combine_chunks()
        b = pc.cast(t["b"], pa.string()).combine_chunks()
        est = pc.cast(t["est_jaccard"], pa.float64()).combine_chunks()
        n = t.num_rows
        side = lambda key, role: pa.Table.from_arrays(  # noqa: E731
            [key, a, b, est, pa.nulls(n, pa.string()), pa.array([role] * n, pa.int8())],
            schema=_VERIFY_TRANSPORT,
        )
        return pa.concat_tables([side(a, 0), side(b, 1)])

    def doc_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if cand_ids_ref is not None:
            ids = ray.get(cand_ids_ref)
            keep = _member_mask(
                t[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False),
                ids,
            )
            t = t.filter(pa.array(keep))
        n = t.num_rows
        key = pc.cast(t[id_col], pa.string()).combine_chunks()
        txt = pc.cast(t[text_col], pa.string()).combine_chunks()
        return pa.Table.from_arrays(
            [
                key,
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.float64()),
                txt,
                pa.array([2] * n, pa.int8()),
            ],
            schema=_VERIFY_TRANSPORT,
        )

    sides = cand.map_batches(pair_sides, batch_format="pyarrow")
    docs = ds.map_batches(doc_rows, batch_format="pyarrow")

    def key_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (
            _stable_u64(df["key"].to_numpy()) % np.uint64(num_buckets)
        ).astype(np.int64)
        return df

    def join_texts(g: pd.DataFrame) -> pd.DataFrame:
        texts = g[g["role"] == 2][["key", "text"]].rename(columns={"text": "side_text"})
        pairs = g[g["role"] < 2].drop(columns=["text", "__bucket"])
        out = pairs.merge(texts, on="key", how="inner").drop(columns=["key"])
        return out

    joined = (
        sides.union(docs)
        .map_batches(key_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(join_texts, batch_format="pandas")
    )

    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (
            _stable_u64(df["a"].str.cat(df["b"], sep="\x00").to_numpy()) % np.uint64(num_buckets)
        ).astype(np.int64)
        return df

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        a_rows = g[g["role"] == 0][["a", "b", "est_jaccard", "side_text"]].rename(
            columns={"side_text": "text_a"}
        )
        b_rows = g[g["role"] == 1][["a", "b", "side_text"]].rename(columns={"side_text": "text_b"})
        m = a_rows.merge(b_rows, on=["a", "b"], how="inner")
        if len(m) == 0:
            return pd.DataFrame(
                {"a": pd.Series(dtype=object), "b": pd.Series(dtype=object),
                 "est_jaccard": pd.Series(dtype=float), "jaccard": pd.Series(dtype=float)}
            )
        # exact shingle-Jaccard per candidate pair (bounded post-LSH work);
        # raw double — callers round/format (half-up floor trick for the
        # DuckDB gate, where round() semantics differ)
        m["jaccard"] = [
            shingle_jaccard(ta, tb, k) for ta, tb in zip(m["text_a"], m["text_b"])
        ]
        m = m[m["jaccard"] >= threshold]
        return m[["a", "b", "est_jaccard", "jaccard"]]

    return (
        joined.map_batches(pair_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda g: verify(g), batch_format="pandas")
        .repartition(32, shuffle=False)  # coalesce per-bucket blocks for consumers
    )


def connected_components(
    pairs_ds, a_col: str = "a", b_col: str = "b", num_buckets: int = 16, max_iters: int = 50
):
    """Connected components of an undirected pair graph by distributed
    min-label propagation (the cluster step after near-dup pair
    generation: every doc in a component shares the min doc id as its
    cluster id).

    Scale shape: per iteration, TWO bucketed hash shuffles of
    edge/label rows (labels join edge sources, messages re-key to edge
    targets, per-node min) — no driver-side graph, no adjacency
    materialization. Converges in O(component diameter) iterations
    (near-dup components are shallow); stops early when no label
    changes. Node ids must be integers.
    """
    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        u = df[a_col].to_numpy(dtype=np.int64)
        v = df[b_col].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "key": np.concatenate([u, v]),
                "val": np.concatenate([v, u]),
                "own": np.zeros(2 * len(df), dtype=bool),
            }
        )

    # coalesce to <= num_buckets blocks (shuffle=False repartition is a
    # cheap split/merge): upstream bucketed stages can hand us hundreds
    # of tiny per-group blocks, and every iteration below pays a
    # per-block scheduling + sort cost on edges AND labels — measured
    # 25x on a 10k-edge graph fed from an 800-block pair dataset
    edges = (
        pairs_ds.map_batches(to_edges, batch_format="pandas")
        .repartition(num_buckets, shuffle=False)
        .materialize()
    )

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (df["key"].to_numpy(dtype=np.uint64) % np.uint64(num_buckets)).astype(
            np.int64
        )
        return df

    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        nodes = g["key"].unique()
        return pd.DataFrame({"key": nodes, "val": nodes, "own": np.ones(len(nodes), dtype=bool)})

    labels = (
        edges.map_batches(bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda g: init_labels(g.drop(columns="__bucket")), batch_format="pandas")
        .materialize()
    )

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        lbl = g[g["own"]]
        e = g[~g["own"]]
        if len(e) == 0:
            return lbl
        # vectorized label lookup (sorted-key searchsorted join) — the
        # old per-edge dict build + Series.map paid a Python hash op
        # per edge per iteration; this is two argsorts over the bucket
        lk = lbl["key"].to_numpy(np.int64)
        order = np.argsort(lk, kind="stable")
        lk_s = lk[order]
        lv_s = lbl["val"].to_numpy(np.int64)[order]
        ek = e["key"].to_numpy(np.int64)
        pos = np.searchsorted(lk_s, ek)
        pos = np.clip(pos, 0, max(len(lk_s) - 1, 0))
        if len(lk_s) == 0 or not (lk_s[pos] == ek).all():
            # co-partitioning invariant broken: fail loud, never NaN
            raise AssertionError("label-propagation: edge key without a label in its bucket")
        msgs = pd.DataFrame(
            {
                "key": e["val"].to_numpy(),
                "val": lv_s[pos],
                "own": np.zeros(len(e), dtype=bool),
            }
        )
        return pd.concat([msgs, lbl], ignore_index=True)

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("key", sort=False)["val"].min().reset_index()
        old = g[g["own"]][["key", "val"]].rename(columns={"val": "old"})
        out = new.merge(old, on="key", how="left")
        out["changed"] = (out["val"] < out["old"].fillna(np.iinfo(np.int64).max)).astype("int64")
        out["own"] = True
        return out[["key", "val", "own", "changed"]]

    for _ in range(max_iters):
        stream = edges.union(labels)
        new_labels = (
            stream.map_batches(bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(lambda g: propagate(g.drop(columns="__bucket")), batch_format="pandas")
            .map_batches(bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(lambda g: reduce_min(g.drop(columns="__bucket")), batch_format="pandas")
            .repartition(num_buckets, shuffle=False)
            .materialize()
        )
        n_changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"]).materialize()
        if not n_changed:
            break

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["key"].astype("int64"), "cluster": df["val"].astype("int64")}
        )

    return labels.map_batches(finish, batch_format="pandas")


def _survivors_anti_join(ds, drop_src_ds, extract_drop_ids, id_col: str, num_buckets: int):
    """Shared apply step for the dedup family: drop every ``ds`` row
    whose id appears in ``extract_drop_ids(drop_src_batch)``.

    Fully distributed: the drop-id set (one row per REMOVED doc — at
    heavy duplication the majority of the corpus) never lands on the
    driver. Drop ids and doc rows hash-shuffle into the same id
    buckets (one bucketed exchange) and each bucket filters with a
    zero-copy Arrow anti-join (inverted ``pc.is_in``)."""
    import pyarrow.compute as pc

    doc_schema = _arrow_schema_of(ds)
    id_type = doc_schema.field(id_col).type
    transport = pa.schema(list(doc_schema) + [pa.field("__drop", pa.bool_())])

    def docs_side(t: pa.Table) -> pa.Table:
        arrays = [t.column(f.name) for f in doc_schema]
        return pa.Table.from_arrays(
            arrays + [pa.array(np.zeros(t.num_rows, bool))], schema=transport
        )

    def drop_side(t: pa.Table) -> pa.Table:
        ids = extract_drop_ids(t).cast(id_type)
        n = len(ids)
        cols = [ids if f.name == id_col else pa.nulls(n, f.type) for f in doc_schema]
        return pa.Table.from_arrays(cols + [pa.array(np.ones(n, bool))], schema=transport)

    def bucket(t: pa.Table) -> pa.Table:
        from clever_canal_ray.functions.corpus import _fast_u64

        ids = t[id_col].to_numpy(zero_copy_only=False)
        b = (_fast_u64(ids) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def anti_join(t: pa.Table) -> pa.Table:
        is_drop = t["__drop"].to_numpy(zero_copy_only=False)
        ids = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        drop_ids = ids.filter(pa.array(is_drop))
        mask = pc.and_(pa.array(~is_drop), pc.invert(pc.is_in(ids, value_set=drop_ids)))
        return t.filter(mask).drop_columns(["__drop", "__bucket"])

    u = ds.map_batches(docs_side, batch_format="pyarrow").union(
        drop_src_ds.map_batches(drop_side, batch_format="pyarrow")
    )
    return (
        u.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(anti_join, batch_format="pyarrow")
    )


def neardup_survivors(ds, components_ds, id_col: str = "doc_id", num_buckets: int = 64):
    """The corpus AFTER near-dup clustering: drop every doc whose
    cluster label is not its own id (each component keeps its min-id
    member — the keeper `connected_components` elected). The apply
    step after pairs → verify → cluster, mirroring
    ``exact_dedup_survivors`` for the near-duplicate path; topology in
    :func:`_survivors_anti_join`."""

    def drop_ids(t: pa.Table) -> pa.Array:
        node = t["node"].to_numpy(zero_copy_only=False)
        cluster = t["cluster"].to_numpy(zero_copy_only=False)
        return pa.array(node[cluster != node])

    return _survivors_anti_join(
        ds, components_ds, drop_ids, id_col=id_col, num_buckets=num_buckets
    )


# --- SimHash --------------------------------------------------------------


def _ws_tokens(texts) -> tuple[np.ndarray, pa.Array]:
    """Whitespace-split a text column Arrow-native with python
    ``str.split()`` parity (empty boundary tokens dropped): returns
    (per-doc token counts int64, flat token StringArray). One C++
    split pass, zero per-row Python."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        texts = pa.array(np.asarray(texts, dtype=object), type=pa.string())
    split = pc.utf8_split_whitespace(texts)
    flat = split.flatten()
    ne = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
    lens = (
        pc.list_value_length(split)
        .fill_null(0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    if len(ne) and not ne.all():
        c = np.zeros(len(ne) + 1, np.int64)
        np.cumsum(~ne, out=c[1:])
        ends = np.cumsum(lens)
        lens = lens - (c[ends] - c[ends - lens])
        flat = flat.filter(pa.array(ne))
    return lens, flat


def simhash_u64(texts, word_hash=None) -> np.ndarray:
    """64-bit SimHash over word unigrams, fully columnar: one Arrow
    C++ split, one hash pass over the flattened words, per-doc bit
    votes via np.add.reduceat. ``word_hash``: callable over an object
    array of words -> uint64 array (default: pandas hash_array; pass an
    md5-based hash for a DuckDB-mirrorable variant)."""
    word_hash = word_hash or _stable_u64
    lens, flat_arr = _ws_tokens(texts)
    out_vals = np.zeros(len(lens), dtype=np.uint64)
    ok = lens > 0
    if ok.any():
        doc_lens = lens[ok]
        if not ok.all():
            flat_arr = flat_arr.filter(pa.array(np.repeat(ok, lens)))
        flat = flat_arr.to_numpy(zero_copy_only=False)
        hs = np.asarray(word_hash(flat), dtype=np.uint64)
        offs = np.zeros(len(doc_lens), np.int64)
        np.cumsum(doc_lens[:-1], out=offs[1:])
        acc = np.zeros(len(doc_lens), dtype=np.uint64)
        # 64 one-dimensional passes (cache-friendly) instead of a
        # (words × 64) vote matrix — segment-sum per bit via reduceat
        for b in range(64):
            ones = np.add.reduceat(((hs >> np.uint64(b)) & np.uint64(1)).astype(np.int64), offs)
            maj = ones * 2 >= doc_lens
            acc |= np.where(maj, np.uint64(1) << np.uint64(b), np.uint64(0))
        out_vals[ok] = acc
    return out_vals


def md5_u64(words) -> np.ndarray:
    """First 8 md5 bytes as LITTLE-endian uint64 — matches DuckDB's
    ``md5_number_upper`` exactly (verified: md5_number_upper('hello')
    == int.from_bytes(md5(b'hello').digest()[:8], 'little')).

    The digest runs once per DISTINCT word (factorize = one C hash
    pass over the occurrences, then scatter) — on natural corpora the
    vocabulary is orders of magnitude smaller than the token stream."""
    import hashlib

    codes, uniq = pd.factorize(np.asarray(words, dtype=object))
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
            for w in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return hs[codes]


def simhash64(batch: pd.DataFrame, word_hash=None) -> pd.DataFrame:
    """64-bit SimHash over word unigrams (vectorized bit-vote)."""
    out = batch[["doc_id"]].copy()
    out["simhash"] = simhash_u64(batch["text"].to_numpy(), word_hash).astype(np.int64)
    return out


def near_dedup_corpus(
    ds,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 1234,
    num_buckets: int = 64,
):
    """ONE-CALL near-duplicate dedup — the full chain a training
    pipeline runs, composed from the soak-proven pieces
    (scripts/soak_dedup.py at 16M docs, recall 1.0, zero false pairs):
    MinHash banding → exact word-shingle-Jaccard verify →
    distributed connected components → survivors anti-join. Keeps
    each duplicate component's minimum-id member and every unpaired
    doc; returns the filtered corpus with the input schema. Ids must
    be int64-castable (they ride the verify join as strings)."""
    pairs = minhash_lsh_pairs_verified(
        ds,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        k=k,
        seed=seed,
        id_col=id_col,
        text_col=text_col,
        num_buckets=num_buckets,
    )

    def to_int(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        return pd.DataFrame({"a": df["a"].astype("int64"), "b": df["b"].astype("int64")})

    comps = connected_components(
        pairs.map_batches(to_int, batch_format="pandas"), num_buckets=min(num_buckets, 16)
    ).materialize()  # tiny next to the corpus: one row per clustered doc
    return neardup_survivors(ds, comps, id_col=id_col, num_buckets=num_buckets)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array via the byte LUT."""
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def simhash_dup_pairs(
    ds,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int | None = None,
    word_hash=None,
    num_buckets: int = 64,
):
    """Near-duplicate pairs by SimHash Hamming distance — the banded
    LSH completion of :func:`simhash_u64` (reference parity: the
    simhash dedup family; same shape as Manku et al.'s
    near-duplicate-detection tables).

    RECALL 1 by pigeonhole: the 64-bit fingerprint splits into
    ``bands`` contiguous bit-bands (default ``max_hamming + 1``); any
    pair within ``max_hamming`` differing bits must agree exactly on
    at least one band, so banding misses nothing. Candidates verify
    with an exact popcount of XOR. Distribution mirrors the MinHash
    path: band rows of (band, band_val, doc_id, sim) — sim is 8
    bytes, so carrying it on the band row is cheap even at 100-TB
    scale (unlike the 8 KB MinHash signatures) — one
    ``groupby(bucket)`` exchange, per-bucket vectorized run-length
    pair generation, bucketed pair dedup. Returns (a, b, hamming)
    with a < b, int64 ids.
    """
    if bands is None:
        bands = max_hamming + 1
    if not (1 <= bands <= 64):
        raise ValueError(f"bands must be in [1, 64], got {bands}")
    edges = np.linspace(0, 64, bands + 1).astype(np.int64)  # contiguous bit ranges

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        sim = simhash_u64(df[text_col].to_numpy(), word_hash)
        n = len(df)
        vals = []
        for b in range(bands):
            lo, hi = int(edges[b]), int(edges[b + 1])
            mask = np.uint64((1 << (hi - lo)) - 1) if hi - lo < 64 else np.uint64(2**64 - 1)
            vals.append((sim >> np.uint64(lo)) & mask)
        band_val = np.stack(vals, axis=1).reshape(-1)  # row-major: doc x band
        band_idx = np.tile(np.arange(bands, dtype=np.int32), n)
        bucket = (
            (band_val * np.uint64(1_099_511_628_211) + band_idx.astype(np.uint64))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "band": band_idx,
                "band_val": band_val.view(np.int64),
                "doc_id": np.repeat(df[id_col].to_numpy(), bands),
                "sim": np.repeat(sim.view(np.int64), bands),
                "__bucket": bucket,
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "hamming": pd.Series(dtype=np.int64),
            }
        )
        if len(group) < 2:
            return empty
        b = group["band"].to_numpy()
        h = group["band_val"].to_numpy()
        d = group["doc_id"].to_numpy().astype(np.int64)
        s = group["sim"].to_numpy().view(np.uint64)
        order, ia, ib = _run_pair_indices(b, h, d)
        if not len(ia):
            return empty
        d, s = d[order], s[order]
        ham = _popcount64(s[ia] ^ s[ib])
        keep = ham <= max_hamming
        if not keep.any():
            return empty
        return pd.DataFrame({"a": d[ia][keep], "b": d[ib][keep], "hamming": ham[keep]})

    return (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda g: bucket_pairs(g.drop(columns="__bucket")), batch_format="pandas")
        .map_batches(lambda df: _pair_bucket(df, num_buckets), batch_format="pandas")
        .groupby("__bucket")
        .map_groups(
            lambda g: g.drop(columns="__bucket").drop_duplicates(["a", "b"]),
            batch_format="pandas",
        )
    )


def char_jaccard(a: str, b: str) -> float:
    """Character-set Jaccard — mirrors DuckDB's ``jaccard(s1, s2)``."""
    sa, sb = set(a), set(b)
    return len(sa & sb) / len(sa | sb) if (sa or sb) else 1.0


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
_CHARSET_BITS = 1024  # codepoint bound of the bitmask (128 bytes/doc)


def _charset_masks(texts: np.ndarray) -> np.ndarray:
    """(n, 128) uint8 bitmask of each text's character SET, codepoints
    < 1024 (ASCII + Latin-1 + Latin Extended + combining marks). Raises
    on higher codepoints — callers needing full Unicode should shingle
    through MinHash instead; a hashed fold here would silently collide.

    One flat pass across the batch: the joined codepoint stream is
    deduped as (doc, codepoint) pairs, then a single unbuffered
    scatter-or sets the bits (no per-document loop)."""
    n = len(texts)
    masks = np.zeros((n, _CHARSET_BITS // 8), dtype=np.uint8)
    if not n:
        return masks
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    cps = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
    if len(cps):
        top = int(cps.max())
        if top >= _CHARSET_BITS:
            raise ValueError(
                f"charset_jaccard_pairs: codepoint {top} >= {_CHARSET_BITS} "
                "(bitmask alphabet bound); use minhash_lsh_pairs for full-Unicode text"
            )
        doc = np.repeat(np.arange(n, dtype=np.int64), lens)
        pairs = np.unique(doc * np.int64(_CHARSET_BITS) + cps.astype(np.int64))
        d, cp = pairs // _CHARSET_BITS, pairs % _CHARSET_BITS
        flat = masks.reshape(-1)
        np.bitwise_or.at(
            flat,
            d * (_CHARSET_BITS // 8) + (cp >> 3),
            (np.uint8(1) << (cp & 7).astype(np.uint8)),
        )
    return masks


def charset_jaccard_pairs(
    ds,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_id: int | None = None,
    n_groups: int = 8,
    round_digits: int | None = None,
):
    """EXACT character-set Jaccard pairs ≥ threshold (the DuckDB
    ``jaccard(s1, s2)`` semantics), fully distributed via the same
    triangle block-join as :func:`embedding_dup_pairs` (reference
    parity: this is the n-gram/character Jaccard near-dup family).

    Each doc is reduced ONCE to a 1024-bit charset bitmask (128 bytes —
    the only thing that travels; text never enters the exchange), each
    mask is exploded to its ``n_groups`` unordered group-pair buckets
    so every doc pair co-locates in exactly one bucket, and per bucket
    the pairwise |A∩B| / |A∪B| is a vectorized byte-AND + popcount-LUT
    over the two sides' mask matrices. Compute is the inherent n²/2 of
    exact all-pairs spread over G(G+1)/2 buckets; transport is n·G·128
    bytes. Returns (a, b, jac) with a < b.

    ``round_digits`` (e.g. 4) rounds half-away-from-zero BEFORE the
    threshold compare — SQL ``ROUND(jaccard(s1,s2), 4) >= t`` parity
    for oracle gates; default None thresholds the raw ratio.
    """
    src = ds if max_id is None else ds.filter(expr=f"{id_col} < {max_id}")

    def to_masks(df: pd.DataFrame) -> pd.DataFrame:
        from clever_canal_ray.functions.corpus import _fast_u64

        masks = _charset_masks(df[text_col].to_numpy())
        n = len(df)
        blob = masks.tobytes()
        mask_bytes = np.empty(n, dtype=object)
        mask_bytes[:] = [blob[i * 128 : (i + 1) * 128] for i in range(n)]
        ids = df[id_col].to_numpy()
        g = (_fast_u64(ids) % np.uint64(n_groups)).astype(np.int64)
        rep_g = np.repeat(g, n_groups)
        rep_x = np.tile(np.arange(n_groups, dtype=np.int64), n)
        lo = np.minimum(rep_g, rep_x)
        hi = np.maximum(rep_g, rep_x)
        return pd.DataFrame(
            {
                "__gp": lo * n_groups + hi,
                "__side": (rep_g <= rep_x).astype(np.int8),
                id_col: np.repeat(ids, n_groups),
                "mask": np.repeat(mask_bytes, n_groups),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "jac": pd.Series(dtype="float64"),
            }
        )
        gp = int(g["__gp"].iloc[0])
        same = (gp // n_groups) == (gp % n_groups)
        if same:
            sub = g.drop_duplicates(id_col)
            a_ids = b_ids = sub[id_col].to_numpy()
            a_m = b_m = np.frombuffer(b"".join(sub["mask"]), np.uint8).reshape(len(sub), -1)
        else:
            a = g[g["__side"] == 1]
            b = g[g["__side"] == 0]
            if len(a) == 0 or len(b) == 0:
                return empty
            a_ids, b_ids = a[id_col].to_numpy(), b[id_col].to_numpy()
            a_m = np.frombuffer(b"".join(a["mask"]), np.uint8).reshape(len(a), -1)
            b_m = np.frombuffer(b"".join(b["mask"]), np.uint8).reshape(len(b), -1)
        pop_a = _POP8[a_m].sum(axis=1, dtype=np.int32)
        pop_b = _POP8[b_m].sum(axis=1, dtype=np.int32) if not same else pop_a
        inter = _POP8[a_m[:, None, :] & b_m[None, :, :]].sum(axis=2, dtype=np.int32)
        union = pop_a[:, None] + pop_b[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        if round_digits is not None:
            scale = 10.0**round_digits
            jac = np.floor(jac * scale + 0.5) / scale
        ai, bi = np.where(jac >= threshold)
        if same:
            keep = a_ids[ai] < b_ids[bi]
            ai, bi = ai[keep], bi[keep]
        if len(ai) == 0:
            return empty
        ia, ib = a_ids[ai], b_ids[bi]
        return pd.DataFrame(
            {
                "a": np.minimum(ia, ib).astype(np.int64),
                "b": np.maximum(ia, ib).astype(np.int64),
                "jac": jac[ai, bi],
            }
        )

    return (
        src.map_batches(to_masks, batch_format="pandas")
        .groupby("__gp")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


# --- embedding cosine near-dup -------------------------------------------


def embedding_dup_pairs(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_id: int | None = None,
    n_groups: int = 8,
):
    """EXACT embedding near-dup pairs by cosine ≥ threshold, fully
    distributed — the triangle block-join.

    At a LOW threshold (the fixture's 0.35: pairs at ~68° — verified
    mostly CROSS-cluster tail pairs), NO LSH/IVF bucketing can reach
    recall 1, so the exact operator must compare all pairs. The scale
    shape that does this without any driver-side candidate matrix:

    1. assign each vector to one of ``n_groups`` hash groups g(id);
    2. explode each vector to ``n_groups`` keyed copies — one per
       unordered group pair ``(min(g,x), max(g,x))``, so every
       unordered VECTOR pair co-locates in exactly ONE group-pair
       bucket (no post-dedup needed);
    3. one ``groupby`` over the G(G+1)/2 bucket keys; per bucket a
       single numpy matmul between the two sides emits pairs ≥
       threshold with ``a < b`` by id.

    Transport is n·G vector copies (G ≈ sqrt(desired tasks)); compute
    is the inherent n²/2 flops of exact all-pairs, spread over buckets.
    For HIGH thresholds (~1) where bucketing recall is achievable, use
    ``ann.lsh_dup_pairs`` — the approximate fast path.
    """
    src = ds if max_id is None else ds.filter(expr=f"{id_col} < {max_id}")

    def explode_groups(df: pd.DataFrame) -> pd.DataFrame:
        from clever_canal_ray.functions.corpus import _fast_u64

        n = len(df)
        ids = df[id_col].to_numpy()
        g = (_fast_u64(ids) % np.uint64(n_groups)).astype(np.int64)
        rep_g = np.repeat(g, n_groups)
        rep_x = np.tile(np.arange(n_groups, dtype=np.int64), n)
        lo = np.minimum(rep_g, rep_x)
        hi = np.maximum(rep_g, rep_x)
        return pd.DataFrame(
            {
                "__gp": lo * n_groups + hi,
                "__side": (rep_g <= rep_x).astype(np.int8),  # g==lo side
                id_col: np.repeat(ids, n_groups),
                emb_col: df[emb_col].to_numpy().repeat(n_groups),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "cos_sim": pd.Series(dtype="float64")}
        )
        gp = int(g["__gp"].iloc[0])
        same = (gp // n_groups) == (gp % n_groups)
        # each copy was tagged with whether its home group is the LOW
        # group of the pair; the diagonal bucket keeps one copy per id
        if same:
            sub = g.drop_duplicates(id_col)
            a_ids = b_ids = sub[id_col].to_numpy()
            a_m = b_m = np.stack(sub[emb_col].to_numpy()).astype(np.float64)
        else:
            a = g[g["__side"] == 1]
            b = g[g["__side"] == 0]
            if len(a) == 0 or len(b) == 0:
                return empty
            a_ids, b_ids = a[id_col].to_numpy(), b[id_col].to_numpy()
            a_m = np.stack(a[emb_col].to_numpy()).astype(np.float64)
            b_m = np.stack(b[emb_col].to_numpy()).astype(np.float64)
        a_m = a_m / np.linalg.norm(a_m, axis=1, keepdims=True)
        b_m = b_m / np.linalg.norm(b_m, axis=1, keepdims=True) if not same else a_m
        sims = a_m @ b_m.T
        ai, bi = np.where(sims >= threshold)
        if same:
            # symmetric matrix: keep each unordered pair once, no self
            keep = a_ids[ai] < b_ids[bi]
            ai, bi = ai[keep], bi[keep]
        if len(ai) == 0:
            return empty
        ia, ib = a_ids[ai], b_ids[bi]
        return pd.DataFrame(
            {
                "a": np.minimum(ia, ib),
                "b": np.maximum(ia, ib),
                "cos_sim": np.round(sims[ai, bi], 4),
            }
        )

    return (
        src.map_batches(explode_groups, batch_format="pandas")
        .groupby("__gp")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


@ray.remote(num_cpus=0.25)
class _DedupShard:
    """One shard of the streaming-dedup index: owns hashes where
    ``hash % num_shards == shard_id``. ``check_and_add`` is atomic per
    call (actor mailbox serializes), so exactly ONE caller wins each
    first-seen hash even under concurrent batches.

    ``fp_bits`` > 0 switches the exact set to a Bloom filter of that
    many bits (two-hash Kirsch-Mitzenmacher scheme): memory becomes
    O(bits) instead of O(distinct), at a false-positive rate that
    *drops* rows (never duplicates) — the 100 TB memory-bound mode.
    """

    def __init__(self, fp_bits: int = 0, k: int = 4):
        self.exact = None
        self.exact_sorted: np.ndarray | None = None
        self.n_exact = 0
        self.k = k
        if fp_bits:
            self.bits = np.zeros((fp_bits + 63) // 64, dtype=np.uint64)
            self.m = np.uint64(fp_bits)
        else:
            self.bits = None
            # exact mode: persistent khash table (pandas' own uint64
            # hash table — the engine behind Index/duplicated). O(1)
            # amortized per element with vectorized lookup/insert; no
            # per-call rebuild or re-sort. Import-gated: falls back to
            # a sorted uint64 array + searchsorted merge (same
            # semantics, O(distinct) merge per call) if the pandas
            # internal module moves.
            try:
                from pandas._libs import hashtable as _pd_ht

                self.exact = _pd_ht.UInt64HashTable()
                self._ht_dup = _pd_ht.duplicated
            except Exception:  # pragma: no cover - pandas internals moved
                self.exact_sorted = np.empty(0, dtype=np.uint64)

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean mask: True where the hash is NEW (first time seen,
        counting earlier positions in this same call)."""
        h = np.ascontiguousarray(hashes, dtype=np.uint64)
        if self.exact is not None:
            # vectorized first-seen, one khash pass: (1) lookup rows
            # already in the table, (2) within-call first occurrence
            # among the misses, (3) bulk-insert the fresh hashes
            locs = self.exact.lookup(h)
            new_rows = np.flatnonzero(locs == -1)
            out = np.zeros(len(h), dtype=bool)
            if len(new_rows):
                sub = h[new_rows]
                fm = ~self._ht_dup(sub, keep="first")
                out[new_rows[fm]] = True
                fresh = np.ascontiguousarray(sub[fm])
                self.exact.map_locations(fresh)
                self.n_exact += len(fresh)
            return out
        if self.exact_sorted is not None:  # pragma: no cover - fallback path
            # two-pass vectorized first-seen: (1) within-call first
            # occurrence via np.unique, (2) membership in the sorted
            # seen-array via searchsorted — no per-element Python
            uniq, first_idx = np.unique(h, return_index=True)
            seen = self.exact_sorted
            pos = np.searchsorted(seen, uniq)
            known = np.zeros(len(uniq), dtype=bool)
            inb = pos < len(seen)
            known[inb] = seen[pos[inb]] == uniq[inb]
            out = np.zeros(len(h), dtype=bool)
            out[first_idx[~known]] = True
            fresh = uniq[~known]
            if len(fresh):
                # radix-sort merge keeps the array sorted
                self.exact_sorted = np.concatenate([seen, fresh])
                self.exact_sorted.sort(kind="stable")
                self.n_exact = len(self.exact_sorted)
            return out
        # bloom: k derived probe positions per hash
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        new = np.zeros(len(h), dtype=bool)
        for j in range(self.k):
            pos = (h + np.uint64(j) * h2) % self.m
            word, bit = pos >> np.uint64(6), pos & np.uint64(63)
            probe = (self.bits[word] >> bit) & np.uint64(1)
            new |= probe == 0
        # set all probe bits for every row (idempotent for dups)
        for j in range(self.k):
            pos = (h + np.uint64(j) * h2) % self.m
            word, bit = (pos >> np.uint64(6)).astype(np.int64), pos & np.uint64(63)
            np.bitwise_or.at(self.bits, word, np.uint64(1) << bit)
        # within-call first-occurrence: later duplicates in the same
        # call must not both pass
        first = pd.Series(h).duplicated(keep="first").to_numpy()
        return new & ~first

    def count(self) -> int:
        return int(self.n_exact) if self.bits is None else -1


class StreamingDeduper:
    """Cross-micro-batch streaming dedup — the shared-mutable-index
    case where the Dataset API genuinely can't express the semantics
    (a groupby dedups within ONE dataset; a CDC-style stream needs
    first-seen state that persists ACROSS replay calls).

    Sharded index actors (hash-routed, so shards never coordinate);
    ``filter_new(ds)`` keeps rows whose content hash was never seen in
    any earlier (or this) pass. Exactly one copy of each distinct text
    survives across all passes; which copy wins under concurrent blocks
    is racy by design (same as any parallel first-seen rule).

    Memory: exact mode is O(distinct) across shards; ``fp_bits`` flips
    each shard to a Bloom filter for bounded memory with a documented
    false-DROP (never false-keep) rate.
    """

    def __init__(self, num_shards: int = 8, text_col: str = "text", fp_bits: int = 0):
        self.num_shards = num_shards
        self.text_col = text_col
        self.shards = [_DedupShard.remote(fp_bits=fp_bits) for _ in range(num_shards)]

    def filter_new(self, ds):
        shards = self.shards
        n = np.uint64(self.num_shards)
        text_col = self.text_col

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            h = _stable_u64(df[text_col].to_numpy())
            sid = (h % n).astype(np.int64)
            keep = np.zeros(len(df), dtype=bool)
            calls, idxs = [], []
            for s in range(len(shards)):
                idx = np.where(sid == s)[0]
                if len(idx):
                    calls.append(shards[s].check_and_add.remote(h[idx]))
                    idxs.append(idx)
            for idx, mask in zip(idxs, ray.get(calls)):
                keep[idx] = mask
            return df[keep]

        return ds.map_batches(fn, batch_format="pandas")

    def distinct_seen(self) -> int:
        counts = ray.get([s.count.remote() for s in self.shards])
        return -1 if any(c < 0 for c in counts) else sum(counts)


# --- SemDeDup (cluster-scoped semantic dedup) -------------------------------


def semdedup(
    ds,
    threshold: float = 0.9,
    n_clusters: int = 16,
    iters: int = 2,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_buckets: int = 32,
    max_cluster_rows: int = 200_000,
    row_block: int = 1024,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    scoped to k-means clusters — the embedding-dedup shape that DOES
    reach 100 TB, unlike the exact all-pairs triangle join
    (:func:`embedding_dup_pairs`): pair comparison is confined to each
    cluster, so total flops are sum |C_i|^2 instead of n^2, and
    ``n_clusters`` is the knob that bounds them (the paper runs 50k
    clusters over LAION).

    Semantics (the paper's published rule): within a cluster, order
    items by cosine similarity TO THE CENTROID ascending (ties by id);
    an item is a semantic duplicate — dropped — iff some EARLIER item
    in that order has cosine >= ``threshold`` with it. The survivor of
    any duplicate group is therefore the member least similar to the
    centroid ("keep the most atypical example").

    Topology: centroids come from :func:`ann.ivf_build_centroids`
    (distributed Lloyd; broadcast k x d matrix) unless passed in;
    assignment is one broadcast matmul per batch (zero shuffle); then
    ONE bucketed groupby co-locates each cluster and the per-cluster
    kernel streams the similarity matrix in ``row_block``-row slabs
    (memory O(row_block x |C|), flops the inherent |C|^2/2). Clusters
    above ``max_cluster_rows`` raise — the fix is more clusters, not
    more memory.

    Returns one decision row per vector:
    ``(id_col:int64, cluster:int32, centroid_sim:float64, kept:int32)``.
    """
    import pyarrow.compute as pc

    from clever_canal_ray.functions.ann import _normalize, ivf_build_centroids

    if centroids is None:
        centroids = ivf_build_centroids(
            ds, n_centroids=n_clusters, iters=iters, emb_col=emb_col, id_col=id_col
        )
    cents = _normalize(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        from clever_canal_ray.functions.ann import _assign_cosine

        cid, win = _assign_cosine(t, ray.get(ref), emb_col)  # zero-copy view
        return pa.table(
            {
                id_col: pc.cast(t[id_col], pa.int64()),
                emb_col: t[emb_col],  # passes through, never re-encoded
                "cluster": pa.array(cid.astype(np.int32)),
                "centroid_sim": pa.array(win),
                "__bucket": pa.array((cid % num_buckets).astype(np.int64)),
            }
        )

    def dedup_bucket(g: pa.Table) -> pa.Table:
        from clever_canal_ray.functions.ann import _emb_np

        if g.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int32()),
                    "centroid_sim": pa.array([], pa.float64()),
                    "kept": pa.array([], pa.int32()),
                }
            )
        # one global (cluster, centroid_sim, id) sort, then each cluster
        # is a contiguous zero-copy slice (the paper's scan order)
        g = g.sort_by(
            [("cluster", "ascending"), ("centroid_sim", "ascending"), (id_col, "ascending")]
        )
        cl = g["cluster"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        ends = np.r_[starts[1:], len(cl)]
        kept_all = np.empty(len(cl), dtype=np.int32)
        for lo, hi in zip(starts, ends):
            n = int(hi - lo)
            if n > max_cluster_rows:
                raise ValueError(
                    f"semdedup cluster has {n} rows > max_cluster_rows="
                    f"{max_cluster_rows}; raise n_clusters (pair flops are "
                    "per-cluster quadratic by design)"
                )
            m = _normalize(_emb_np(g.slice(lo, n), emb_col))
            dropped = np.zeros(n, dtype=bool)
            # row slabs: rows [s:e) vs all EARLIER rows [0:e) — strict
            # lower triangle within the slab masks self/later columns
            for s in range(1, n, row_block):
                e = min(s + row_block, n)
                sims = m[s:e] @ m[:e].T
                col = np.arange(e)
                row = np.arange(s, e)
                sims[col[None, :] >= row[:, None]] = -np.inf
                dropped[s:e] = sims.max(axis=1) >= threshold
            kept_all[lo:hi] = (~dropped).astype(np.int32)
        return pa.table(
            {
                id_col: g[id_col],
                "cluster": g["cluster"],
                "centroid_sim": g["centroid_sim"],
                "kept": pa.array(kept_all),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: dedup_bucket(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
    )


def semdedup_survivors(ds, decisions_ds, id_col: str = "doc_id", num_buckets: int = 64):
    """The corpus AFTER SemDeDup: drop every row whose decision row has
    ``kept == 0``. Same fully-distributed bucketed anti-join as
    :func:`neardup_survivors` — the drop-id set never lands on the
    driver."""
    import pyarrow.compute as pc

    def drop_ids(t: pa.Table) -> pa.Array:
        dropped = t.filter(pc.equal(t["kept"], pa.scalar(0, pa.int32())))
        # decisions carry the vector id as their first column; honor a
        # same-named column when the doc and decision id names match
        name = id_col if id_col in dropped.schema.names else dropped.schema.names[0]
        col = dropped[name]
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    return _survivors_anti_join(
        ds, decisions_ds, drop_ids, id_col=id_col, num_buckets=num_buckets
    )


# --- cross-corpus dedup (new crawl vs existing training set) ---------------


def _bloom_positions(h: np.ndarray, m: np.uint64, k: int):
    """Kirsch-Mitzenmacher double hashing: bit i = (h1 + i*h2) mod m."""
    from clever_canal_ray.functions.corpus import _splitmix64

    h1 = np.ascontiguousarray(h, dtype=np.uint64)
    h2 = _splitmix64(h1) | np.uint64(1)
    return [((h1 + np.uint64(i) * h2) % m) for i in range(k)]


def cross_corpus_dedup(
    new_ds,
    ref_ds,
    text_col: str = "text",
    ref_text_col: str | None = None,
    num_buckets: int = 64,
    mode: str = "exact",
    fp_bits: int = 1 << 24,
    k: int = 4,
):
    """Dedup a NEW corpus against an existing REFERENCE corpus: drop
    every new doc whose exact text already appears in the reference
    (the standard ingest step — new crawl vs the training set already
    in the lake). Returns the surviving NEW rows (reference unchanged).

    ``mode="exact"`` (the default): both sides hash their text per
    batch; the reference ships ONLY (hash) rows — its payload never
    moves — and one bucketed exchange anti-joins new rows against
    reference hashes per bucket. Exact; transport = new payload once +
    8 B/doc for the reference.

    ``mode="bloom"`` (zero-shuffle scale path): the reference side
    emits one ``fp_bits``-bit Bloom bitmap partial per block
    (Kirsch-Mitzenmacher double hashing, ``k`` probes), the driver
    OR-folds them ONE AT A TIME via ``iter_batches`` (never all blocks
    at once) and broadcasts the filter via ``ray.put``; the new corpus
    streams through a membership test with NO exchange on either side.
    False positives DROP new rows (never admit duplicates) at rate
    ~(1 - e^{-kn/m})^k — size ``fp_bits`` ≈ 10+ bits per reference doc.
    """
    import pyarrow.compute as pc

    rcol = ref_text_col or text_col

    if mode == "bloom":
        words = (int(fp_bits) + 63) // 64
        m = np.uint64(fp_bits)

        def ref_partial(df: pd.DataFrame) -> pd.DataFrame:
            bits = np.zeros(words, dtype=np.uint64)
            h = _stable_u64(df[rcol].to_numpy())
            for pos in _bloom_positions(h, m, k):
                np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                                 np.uint64(1) << (pos & np.uint64(63)))
            return pd.DataFrame({"bits": [bits.tobytes()]})

        folded = np.zeros(words, dtype=np.uint64)
        for b in ref_ds.map_batches(ref_partial, batch_format="pandas").iter_batches(
            batch_size=1, batch_format="pandas"
        ):
            for blob in b["bits"]:
                folded |= np.frombuffer(blob, dtype=np.uint64)
        bits_ref = ray.put(folded)

        def keep_new(df: pd.DataFrame) -> pd.DataFrame:
            bits = ray.get(bits_ref)
            h = _stable_u64(df[text_col].to_numpy())
            hit = np.ones(len(df), dtype=bool)
            for pos in _bloom_positions(h, m, k):
                word = bits[(pos >> np.uint64(6)).astype(np.int64)]
                hit &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
            return df[~hit]

        return new_ds.map_batches(keep_new, batch_format="pandas")

    if mode != "exact":
        raise ValueError(f"cross_corpus_dedup: unknown mode {mode!r}")

    doc_schema = _arrow_schema_of(new_ds)
    transport = pa.schema(
        list(doc_schema) + [pa.field("__h", pa.uint64()), pa.field("__ref", pa.bool_())]
    )

    def new_side(t: pa.Table) -> pa.Table:
        h = _stable_u64(t[text_col].to_numpy(zero_copy_only=False))
        arrays = [t.column(f.name) for f in doc_schema]
        return pa.Table.from_arrays(
            arrays + [pa.array(h, pa.uint64()), pa.array(np.zeros(t.num_rows, bool))],
            schema=transport,
        )

    def ref_side(t: pa.Table) -> pa.Table:
        h = np.unique(_stable_u64(t[rcol].to_numpy(zero_copy_only=False)))
        n = len(h)
        cols = [pa.nulls(n, f.type) for f in doc_schema]
        return pa.Table.from_arrays(
            cols + [pa.array(h, pa.uint64()), pa.array(np.ones(n, bool))],
            schema=transport,
        )

    def bucket(t: pa.Table) -> pa.Table:
        h = t["__h"].to_numpy(zero_copy_only=False)
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def anti_join(t: pa.Table) -> pa.Table:
        is_ref = t["__ref"].to_numpy(zero_copy_only=False)
        hcol = t["__h"].combine_chunks() if isinstance(t["__h"], pa.ChunkedArray) else t["__h"]
        ref_h = hcol.filter(pa.array(is_ref))
        mask = pc.and_(pa.array(~is_ref), pc.invert(pc.is_in(hcol, value_set=ref_h)))
        return t.filter(mask).drop_columns(["__h", "__ref", "__bucket"])

    u = new_ds.map_batches(new_side, batch_format="pyarrow").union(
        ref_ds.map_batches(ref_side, batch_format="pyarrow")
    )
    return (
        u.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(anti_join, batch_format="pyarrow")
    )
