"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus docs whose hashed-n-gram
distribution looks like a TARGET corpus.

Pipeline (all passes the 100-TB shape):

1. :func:`hashed_ngram_totals` on the target and on the raw corpus —
   per-batch CONSTANT-SIZE partials (one ``n_buckets``-long bincount
   per batch, the docs never shuffle), driver-summed into the two
   bucket-count vectors. ``n_buckets`` (default 10k) bounds every
   global object regardless of corpus size.
2. :func:`dsir_log_weights` — broadcast the smoothed
   ``log p - log q`` ratio once via ``ray.put``; per batch one
   vectorized hashed-ngram scatter-add gives each doc
   ``log w = Σ_b c_doc[b] · logratio[b]`` (a streaming map, zero
   shuffle).
3. :func:`dsir_sample` — Gumbel-top-k resampling WITHOUT replacement:
   per-doc deterministic Gumbel noise (seeded splitmix64 of the id),
   then the exact distributed top-``n_select`` by perturbed weight —
   delegated to the iterative-histogram-refinement selector
   (:func:`~clever_canal_ray.functions.corpus.select_by_token_budget`
   with a unit token column), so no global sort and no driver pull
   beyond the boundary bin.

Feature hashing: unigrams + bigrams of the whitespace token stream,
bucketed by splitmix64 (vectorized; bigram key mixes adjacent word
hashes). Smoothing: add-epsilon on both distributions before the log.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from clever_canal_ray.functions.corpus import _splitmix64
from clever_canal_ray.functions.dedup import _stable_u64

_BIGRAM_SALT = np.uint64(0x9E3779B97F4A7C15)


def _hashed_ngram_buckets(texts, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket ids, doc index) of every unigram+bigram occurrence in a
    batch of texts — fully vectorized off one explode."""
    s = pd.Series(texts)
    lists = s.str.split(" ")
    flat = lists.explode()
    mask = flat.notna() & (flat != "")
    words = flat[mask]
    doc_of = s.index.get_indexer(words.index)
    h = _stable_u64(words.to_numpy())
    uni = (_splitmix64(h) % np.uint64(n_buckets)).astype(np.int64)
    # bigrams: adjacent word pairs WITHIN a doc (doc boundary breaks runs)
    same_doc = doc_of[1:] == doc_of[:-1]
    big_h = _splitmix64(h[:-1] * _BIGRAM_SALT + h[1:])
    bi = (big_h % np.uint64(n_buckets)).astype(np.int64)[same_doc]
    bi_doc = doc_of[1:][same_doc]
    return np.concatenate([uni, bi]), np.concatenate([doc_of, bi_doc])


def hashed_ngram_totals(ds, text_col: str = "text", n_buckets: int = 10_000) -> np.ndarray:
    """Global hashed unigram+bigram bucket counts of a corpus: one
    streaming pass of constant-size (``n_buckets``) partials, summed on
    the driver — no shuffle, no per-doc state."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b, _ = _hashed_ngram_buckets(df[text_col].to_numpy(), n_buckets)
        counts = np.bincount(b, minlength=n_buckets).astype(np.int64)
        return pd.DataFrame({"counts": [counts.tobytes()]})

    total = np.zeros(n_buckets, np.int64)
    for batch in (
        ds.map_batches(partial, batch_format="pandas").iter_batches(
            batch_size=1, batch_format="pandas"
        )
    ):
        for blob in batch["counts"]:
            total += np.frombuffer(blob, np.int64)
    return total


def dsir_log_ratio(
    target_counts: np.ndarray, raw_counts: np.ndarray, eps: float = 1e-8
) -> np.ndarray:
    """Smoothed ``log p_target - log p_raw`` per hash bucket."""
    p = target_counts.astype(np.float64) + eps
    q = raw_counts.astype(np.float64) + eps
    return np.log(p / p.sum()) - np.log(q / q.sum())


def dsir_log_weights(
    ds,
    log_ratio: np.ndarray,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
):
    """Append ``log_w`` to every doc: the dot product of its hashed
    n-gram counts with the broadcast log ratio (one scatter-add per
    batch, zero shuffle). ``normalize=True`` divides by the doc's
    feature count (length-debiased, the common DSIR variant)."""
    n_buckets = len(log_ratio)
    ref = ray.put(np.ascontiguousarray(log_ratio, np.float64))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        lr = ray.get(ref)
        out = df.copy()
        if not len(df):
            out["log_w"] = pd.Series(dtype=np.float64)
            return out
        b, doc = _hashed_ngram_buckets(df[text_col].to_numpy(), n_buckets)
        w = np.bincount(doc, weights=lr[b], minlength=len(df))
        if normalize:
            n_feat = np.bincount(doc, minlength=len(df))
            w = np.divide(w, n_feat, out=np.zeros_like(w), where=n_feat > 0)
        out["log_w"] = w
        return out

    return ds.map_batches(fn, batch_format="pandas")


def dsir_sample(
    ds,
    n_select: int,
    weight_col: str = "log_w",
    id_col: str = "doc_id",
    seed: int = 1234,
    temperature: float = 1.0,
    num_bins: int = 4096,
    boundary_cap: int = 200_000,
):
    """Gumbel-top-k importance resampling WITHOUT replacement: perturb
    each doc's ``log_w / temperature`` with deterministic per-id Gumbel
    noise and keep the global top ``n_select`` — exactly equivalent to
    sampling n docs without replacement with probability ∝
    ``exp(log_w/T)`` (the Gumbel-max trick). The top-k itself runs as
    iterative histogram refinement (unit token column), so selection is
    exact at any scale with no global sort. Returns the selected rows
    (original columns + log_w + the perturbed ``__gumbel_w``)."""
    from clever_canal_ray.functions.corpus import select_by_token_budget

    def perturb(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        u = (
            _splitmix64(df[id_col].to_numpy(np.int64) + np.int64(seed)).astype(np.float64)
            + 1.0
        ) / np.float64(2.0**64)  # uniform in (0, 1]
        out["__gumbel_w"] = df[weight_col].to_numpy(np.float64) / temperature - np.log(
            -np.log(u)
        )
        out["__one"] = np.ones(len(df), np.int64)
        return out

    perturbed = ds.map_batches(perturb, batch_format="pandas")
    sel, _info = select_by_token_budget(
        perturbed,
        n_select,
        score_col="__gumbel_w",
        tok_col="__one",
        id_col=id_col,
        num_bins=num_bins,
        boundary_cap=boundary_cap,
    )
    return sel.map_batches(
        lambda df: df.drop(columns="__one"), batch_format="pandas"
    )
