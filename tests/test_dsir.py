"""DSIR importance resampling: feature totals and per-doc log weights
vs a serial reference (same hash functions applied one doc at a time),
plus end-to-end selection behavior on planted domains."""

import numpy as np
import pandas as pd

from clever_canal_ray.functions.corpus import _splitmix64
from clever_canal_ray.functions.dedup import _stable_u64
from clever_canal_ray.functions.dsir import (
    _BIGRAM_SALT,
    dsir_log_ratio,
    dsir_log_weights,
    dsir_sample,
    hashed_ngram_totals,
)


def _serial_buckets(text: str, n_buckets: int) -> list[int]:
    words = [w for w in text.split(" ") if w]
    if not words:
        return []
    h = _stable_u64(np.array(words, dtype=object))
    uni = (_splitmix64(h) % np.uint64(n_buckets)).astype(np.int64).tolist()
    bi = []
    for i in range(len(words) - 1):
        bh = _splitmix64(np.array([h[i] * _BIGRAM_SALT + h[i + 1]], dtype=np.uint64))[0]
        bi.append(int(bh % np.uint64(n_buckets)))
    return uni + bi


def _mk_corpus(rng, vocab, n, start_id=0):
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 20))) for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(start_id, start_id + n, dtype=np.int64), "text": texts})


def test_hashed_ngram_totals_matches_serial(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    docs = _mk_corpus(rng, vocab, 80)
    docs.loc[5, "text"] = ""  # empty doc
    docs.loc[7, "text"] = "solo"  # single word: no bigram
    B = 256
    got = hashed_ngram_totals(rd.from_pandas(docs).repartition(5), n_buckets=B)
    ref = np.zeros(B, np.int64)
    for t in docs["text"]:
        for b in _serial_buckets(t, B):
            ref[b] += 1
    assert (got == ref).all()


def test_dsir_log_weights_match_serial(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(30)]
    docs = _mk_corpus(rng, vocab, 60)
    B = 128
    lr = rng.standard_normal(B)
    got = (
        dsir_log_weights(rd.from_pandas(docs).repartition(4), lr, normalize=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        bs = _serial_buckets(r["text"], B)
        ref = float(np.mean([lr[b] for b in bs])) if bs else 0.0
        assert abs(r["log_w"] - ref) < 1e-9, r["doc_id"]

    raw = (
        dsir_log_weights(rd.from_pandas(docs).repartition(4), lr, normalize=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, r in raw.iterrows():
        bs = _serial_buckets(r["text"], B)
        assert abs(r["log_w"] - float(np.sum([lr[b] for b in bs]))) < 1e-9


def test_dsir_selects_target_like_docs(ray_session):
    """Target-domain docs get higher weights; Gumbel top-k prefers them
    heavily; selection is deterministic and layout-invariant."""
    import ray.data as rd

    rng = np.random.default_rng(21)
    vocab_a = [f"alpha{i}" for i in range(50)]
    vocab_b = [f"beta{i}" for i in range(50)]
    target = _mk_corpus(rng, vocab_a, 100)
    raw_a = _mk_corpus(rng, vocab_a, 150, start_id=1000)
    raw_b = _mk_corpus(rng, vocab_b, 150, start_id=2000)
    raw = pd.concat([raw_a, raw_b], ignore_index=True)
    B = 2048

    p = hashed_ngram_totals(rd.from_pandas(target), n_buckets=B)
    q = hashed_ngram_totals(rd.from_pandas(raw), n_buckets=B)
    lr = dsir_log_ratio(p, q)
    weighted = dsir_log_weights(rd.from_pandas(raw).repartition(4), lr)
    wp = weighted.to_pandas()
    mean_a = wp[wp["doc_id"] < 2000]["log_w"].mean()
    mean_b = wp[wp["doc_id"] >= 2000]["log_w"].mean()
    assert mean_a > mean_b + 1.0, (mean_a, mean_b)

    sel = dsir_sample(weighted, n_select=100, seed=5, num_bins=64, boundary_cap=500).to_pandas()
    assert len(sel) == 100
    frac_a = (sel["doc_id"] < 2000).mean()
    assert frac_a >= 0.9, frac_a

    sel2 = dsir_sample(
        dsir_log_weights(rd.from_pandas(raw).repartition(7), lr),
        n_select=100,
        seed=5,
        num_bins=64,
        boundary_cap=500,
    ).to_pandas()
    assert sorted(sel2["doc_id"]) == sorted(sel["doc_id"])
    # a different seed changes the draw (temperature finite => noise matters)
    sel3 = dsir_sample(weighted, n_select=100, seed=99, num_bins=64, boundary_cap=500).to_pandas()
    assert sorted(sel3["doc_id"]) != sorted(sel["doc_id"])
