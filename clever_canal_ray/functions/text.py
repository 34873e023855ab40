"""Text-analysis stages for large-scale training-data pipelines.

All are vectorized ``map_batches`` bodies over the ``documents`` table
(doc_id, text, lang, source, n_chars). Where a function has a DuckDB
oracle in ``__ray_entry__.oracle_sql``, its formula is mirrored there
EXACTLY — keep the two in sync.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

# BPE-ish word/punct tokenizer (compiled once at import; actor stages
# would compile in __init__ — this module-level constant serves both).
TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def token_counts(batch: pd.DataFrame) -> pd.DataFrame:
    """Whitespace token count: split on single spaces, count pieces.

    SQL mirror: ``len(string_split(text, ' '))``.
    """
    out = batch[["doc_id"]].copy()
    out["n_tokens"] = batch["text"].str.split(" ").str.len().astype("int64")
    return out


def token_counts_regex(batch: pd.DataFrame) -> pd.DataFrame:
    """BPE-ish token count with a word/punctuation regex.

    SQL mirror: ``len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))``.
    """
    out = batch[["doc_id"]].copy()
    out["n_tokens"] = batch["text"].str.findall(TOKEN_RE).str.len().astype("int64")
    return out


def quality_scores(batch: pd.DataFrame) -> pd.DataFrame:
    """Quality heuristics: length bounds, punctuation ratio, stopword
    ratio. Mirrored in SQL with string_split + list_filter lambdas.
    """
    out = batch[["doc_id"]].copy()
    toks = batch["text"].str.split(" ")
    n_tok = toks.str.len()
    stop = toks.map(lambda ws: sum(1 for w in ws if w in STOPWORDS))
    out["n_tokens"] = n_tok.astype("int64")
    out["stop_ratio"] = (stop / n_tok).round(6)
    out["n_chars"] = batch["text"].str.len().astype("int64")
    out["is_quality"] = ((out["n_chars"] >= 100) & (out["n_chars"] <= 2000) & (out["stop_ratio"] > 0.02)).astype(
        "int32"
    )
    return out


def fingerprints(batch: pd.DataFrame) -> pd.DataFrame:
    """Document fingerprint = md5 of the lower-cased text.

    SQL mirror: ``md5(lower(text))``.
    """
    out = batch[["doc_id"]].copy()
    out["fp"] = [hashlib.md5(t.lower().encode()).hexdigest() for t in batch["text"]]
    return out


def rolling_fingerprints(batch: pd.DataFrame, k: int = 8, window: int = 16) -> pd.DataFrame:
    """Winnowing-style rolling-hash fingerprint (non-SQL-expressible):
    min-of-window over k-gram Rabin hashes, xor-folded to one int64.
    Deterministic; used for cheap near-dup pre-clustering."""
    B, M = np.uint64(1_000_003), np.uint64(2**61 - 1)
    fps = np.zeros(len(batch), dtype=np.int64)
    for i, t in enumerate(batch["text"]):
        b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
        if len(b) < k:
            fps[i] = int(b.sum())
            continue
        # k-gram polynomial rolling hashes, vectorized
        h = np.zeros(len(b) - k + 1, dtype=np.uint64)
        for j in range(k):
            h = (h * B + b[j : len(b) - k + 1 + j]) % M
        n_win = max(1, len(h) - window + 1)
        mins = np.minimum.reduce([h[j : j + n_win] for j in range(min(window, len(h)))])
        acc = np.uint64(0)
        for v in np.unique(mins):
            acc ^= v * B % M
        fps[i] = np.int64(acc & np.uint64(0x7FFF_FFFF_FFFF_FFFF))
    out = batch[["doc_id"]].copy()
    out["rolling_fp"] = fps
    return out


# --- language ID (n-gram/function-word heuristic, rows-only check) -------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "to", "a", "in", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein"},
    "fr": {"le", "la", "les", "et", "est", "une", "pas"},
    "es": {"el", "la", "los", "y", "es", "una", "no"},
    "zh": set(),  # detected by CJK codepoint ratio instead
}


class LangId:
    """Actor-pool language-ID stage: marker tables built once per actor
    (the model-load-in-__init__ pattern); per-batch work is vectorized.
    """

    def __init__(self):
        self.markers = {k: v for k, v in _LANG_MARKERS.items()}
        self.word_re = re.compile(r"[a-zA-Z]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        preds = []
        for t in batch["text"]:
            cjk = sum(1 for ch in t[:200] if "一" <= ch <= "鿿")
            if cjk > 5:
                preds.append("zh")
                continue
            words = set(self.word_re.findall(t.lower()[:500]))
            scores = {lang: len(words & m) for lang, m in self.markers.items() if m}
            best = max(scores, key=lambda k: (scores[k], k))
            preds.append(best if scores[best] > 0 else "en")
        out["pred_lang"] = preds
        return out
