"""Linear probe over the embedding column: train a ridge-regression /
one-vs-rest classifier head distributed, score the corpus streaming.

The quality-classifier step of training-data curation (the
fastText-classifier / DSIR pattern: label a small seed set — "looks
like wiki", "looks like spam" — fit a cheap linear head over
embeddings, score EVERYTHING, keep by threshold), expressed in the
only shape that works at 100 TB:

- **Training is sufficient statistics, not SGD**: ridge regression has
  the closed form ``w = (XᵀX + λI)⁻¹ Xᵀy``, and ``XᵀX`` / ``Xᵀy`` are
  SUMS over rows — each batch emits one constant-size partial
  ((d+1)² + (d+1) floats, intercept folded in as a constant column),
  the driver folds partials ONE AT A TIME via ``iter_batches`` (never
  all blocks at once) and solves a (d+1)×(d+1) system. Zero shuffle,
  one pass, exact — identical to the single-machine closed form up to
  float summation order.
- **Scoring is a broadcast matmul**: weights ship once via
  ``ray.put``; one matmul per batch appends the score column.

Labels are ±1 (or arbitrary reals — it is a regression head); for
multi-class, call per class one-vs-rest and argmax the score columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _design(df: pd.DataFrame, emb_col: str) -> np.ndarray:
    x = np.stack(df[emb_col].to_numpy()).astype(np.float64)
    return np.concatenate([x, np.ones((len(x), 1))], axis=1)  # intercept column


def linear_probe_train(
    ds,
    label_col: str,
    emb_col: str = "embedding",
    l2: float = 1e-3,
) -> np.ndarray:
    """Fit ``w`` (length d+1, last entry = intercept) by ridge
    regression over the whole Dataset in one distributed pass.

    ``l2`` regularizes the d feature weights (not the intercept).
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        xd = _design(df, emb_col)
        y = df[label_col].to_numpy().astype(np.float64)
        xtx = xd.T @ xd
        xty = xd.T @ y
        return pd.DataFrame({"xtx": [xtx.reshape(-1)], "xty": [xty], "n": [len(y)]})

    parts = ds.map_batches(partial, batch_format="pandas")
    xtx = xty = None
    n = 0
    # fold one constant-size partial at a time — the driver never holds
    # more than one (d+1)² block regardless of corpus size
    for b in parts.iter_batches(batch_size=None, batch_format="pandas"):
        for _, r in b.iterrows():
            g = np.asarray(r["xtx"], dtype=np.float64)
            v = np.asarray(r["xty"], dtype=np.float64)
            xtx = g if xtx is None else xtx + g
            xty = v if xty is None else xty + v
            n += int(r["n"])
    if n == 0:
        raise ValueError("linear_probe_train: empty dataset")
    d1 = len(xty)
    a = xtx.reshape(d1, d1)
    reg = np.eye(d1) * l2
    reg[-1, -1] = 0.0  # don't shrink the intercept
    return np.linalg.solve(a + reg, xty)


def linear_probe_score(
    ds,
    weights: np.ndarray,
    emb_col: str = "embedding",
    out_col: str = "probe_score",
):
    """Append ``out_col`` = w·x + b per row (broadcast weights, one
    matmul per batch, zero shuffle). Threshold downstream with a plain
    ``ds.filter`` / ``map_batches`` mask, or pick the cut from a target
    keep-rate via ``corpus.approx_quantiles`` on the score column."""
    import ray

    w = np.asarray(weights, dtype=np.float64)
    ref = ray.put(w)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ww = ray.get(ref)
        s = _design(df, emb_col) @ ww
        out = df.copy()
        out[out_col] = s
        return out

    return ds.map_batches(score, batch_format="pandas")
