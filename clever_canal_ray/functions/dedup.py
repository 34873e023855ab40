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

_MERSENNE = np.uint64(2**61 - 1)


def _stable_u64(strings) -> np.ndarray:
    return pd.util.hash_array(np.asarray(strings, dtype=object), categorize=False)


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


# --- MinHash + LSH --------------------------------------------------------


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

    def signature(self, text: str) -> np.ndarray:
        words = text.split()
        if len(words) < self.k:
            sh = np.array([hash_text(text)], dtype=np.uint64)
        else:
            joined = [" ".join(words[i : i + self.k]) for i in range(len(words) - self.k + 1)]
            sh = np.unique(_stable_u64(joined))
        # (a * x + b) mod p, min over shingles — vectorized outer product
        vals = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Explode each doc to ``bands`` rows: (band, band_hash, doc_id, sig)."""
        sigs = np.stack([self.signature(t) for t in batch["text"]])
        n = len(batch)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n)
        doc_ids = np.repeat(batch["doc_id"].to_numpy(), self.bands)
        banded = sigs.reshape(n, self.bands, self.rows)
        band_hash = np.zeros((n, self.bands), dtype=np.uint64)
        for r in range(self.rows):
            band_hash = band_hash * np.uint64(1_000_003) + banded[:, :, r]
        return pd.DataFrame(
            {
                "band": band_ids,
                "band_hash": band_hash.reshape(-1).astype(np.int64),
                "doc_id": doc_ids,
                "sig": list(np.repeat(sigs.astype(np.int64), self.bands, axis=0)),
            }
        )


def hash_text(text: str) -> int:
    return int(_stable_u64([text])[0])


def minhash_lsh_pairs(ds, threshold: float = 0.7, num_hashes: int = 64, bands: int = 16, k: int = 3, seed: int = 1234):
    """Near-duplicate pairs via MinHash banding.

    Pipeline: signatures+banding (actor pool) → groupby(band,band_hash)
    → per-bucket candidate pairs verified with the signature-estimated
    Jaccard (mean equal minhash) ≥ threshold. Returns (a, b, est_jaccard).
    """

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        ids = g["doc_id"].to_numpy()
        sigs = np.stack(g["sig"].to_numpy())
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            hit = np.where(eq >= threshold)[0]
            for h in hit:
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + h])
                out_j.append(round(float(eq[h]), 6))
        return pd.DataFrame({"a": out_a, "b": out_b, "est_jaccard": out_j})

    def bucket_pairs_vec(group: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket = many (band, band_hash) LSH buckets; pair
        generation loops only over multi-doc buckets (rare)."""
        outs = []
        for _, g in group.groupby(["band", "band_hash"], sort=False):
            if len(g) >= 2:
                outs.append(bucket_pairs(g))
        if not outs:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        return pd.concat(outs, ignore_index=True)

    banded = ds.map_batches(MinHasher(num_hashes, bands, k, seed), batch_format="pandas", concurrency=2)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (df["band_hash"].to_numpy().astype(np.uint64) % np.uint64(64)).astype(np.int64)
        return df

    pairs = (
        banded.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda g: bucket_pairs_vec(g.drop(columns="__bucket")), batch_format="pandas")
    )

    # same pair may surface from several bands — final vectorized dedup
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])

    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (
            _stable_u64(df["a"].astype(str).str.cat(df["b"].astype(str), sep="\x00").to_numpy())
            % np.uint64(64)
        ).astype(np.int64)
        return df

    return (
        pairs.map_batches(pair_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda g: dedup_pairs(g.drop(columns="__bucket")), batch_format="pandas")
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


def minhash_lsh_pairs_verified(ds, threshold: float = 0.7, num_hashes: int = 64, bands: int = 16, k: int = 3, seed: int = 1234, id_col: str = "doc_id", text_col: str = "text"):
    """Candidate pairs (MinHash banding) + EXACT verification.

    The candidate id set is small after LSH, so their texts are fetched
    with one filtered scan, broadcast via ray.put, and each pair gets
    its true word-shingle Jaccard computed per batch — the standard
    candidate-then-verify near-dup pipeline. Returns
    (a, b, est_jaccard, jaccard) with jaccard >= threshold.
    """
    import ray

    cand = minhash_lsh_pairs(ds, threshold=threshold * 0.8, num_hashes=num_hashes, bands=bands, k=k, seed=seed)
    cand_df = cand.to_pandas()
    if len(cand_df) == 0:
        cand_df["jaccard"] = []
        return cand_df
    ids = sorted(set(cand_df["a"]) | set(cand_df["b"]))
    id_arr = pa.array(ids)

    def grab(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t[id_col], value_set=id_arr)).select([id_col, text_col])

    texts_tbl = ds.map_batches(grab, batch_format="pyarrow").to_pandas()
    lookup = dict(zip(texts_tbl[id_col], texts_tbl[text_col]))
    ref = ray.put(lookup)

    import ray.data as rd

    cand_ds = rd.from_pandas(cand_df)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        texts = ray.get(ref)
        df = df.copy()
        df["jaccard"] = [
            round(shingle_jaccard(texts[a], texts[b], k), 6) for a, b in zip(df["a"], df["b"])
        ]
        return df[df["jaccard"] >= threshold]

    return cand_ds.map_batches(verify, batch_format="pandas").to_pandas()


# --- SimHash --------------------------------------------------------------


def simhash64(batch: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash over word unigrams (vectorized bit-vote)."""
    out_vals = np.zeros(len(batch), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(batch["text"]):
        words = t.split()
        if not words:
            continue
        hs = _stable_u64(words)
        votes = ((hs[:, None] >> bits) & np.uint64(1)).astype(np.int64)  # (n_words, 64)
        maj = votes.sum(axis=0) * 2 >= len(words)
        out_vals[i] = np.bitwise_or.reduce(np.where(maj, np.uint64(1) << bits, np.uint64(0)))
    out = batch[["doc_id"]].copy()
    out["simhash"] = out_vals.astype(np.int64)
    return out


def char_jaccard(a: str, b: str) -> float:
    """Character-set Jaccard — mirrors DuckDB's ``jaccard(s1, s2)``."""
    sa, sb = set(a), set(b)
    return len(sa & sb) / len(sa | sb) if (sa or sb) else 1.0


# --- embedding cosine near-dup -------------------------------------------


def embedding_dup_pairs(ds, threshold: float = 0.95, id_col: str = "vec_id", emb_col: str = "embedding", max_id: int | None = None):
    """Embedding near-dup pairs by cosine ≥ threshold.

    The candidate matrix (optionally id-bounded) is materialized once,
    L2-normalized, broadcast via ray.put, and each batch does one numpy
    matmul against it — no shuffle. At 100 TB the broadcast matrix is
    replaced by LSH bucketing (random hyperplanes → groupby bucket).
    """
    import ray

    cand = ds
    if max_id is not None:
        cand = cand.filter(expr=f"{id_col} < {max_id}")
    cand_tbl = cand.select_columns([id_col, emb_col]).to_pandas()
    ids = cand_tbl[id_col].to_numpy()
    mat = np.stack(cand_tbl[emb_col].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids, mat))

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        c_ids, c_mat = ray.get(ref)
        q_ids = batch[id_col].to_numpy()
        q = np.stack(batch[emb_col].to_numpy()).astype(np.float64)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        sims = q @ c_mat.T
        qi, ci = np.where(sims >= threshold)
        keep = q_ids[qi] < c_ids[ci]  # each unordered pair once, no self
        return pd.DataFrame(
            {
                "a": q_ids[qi][keep],
                "b": c_ids[ci][keep],
                "cos_sim": np.round(sims[qi, ci][keep], 4),
            }
        )

    src = ds if max_id is None else ds.filter(expr=f"{id_col} < {max_id}")
    return src.map_batches(pairs, batch_format="pandas")
