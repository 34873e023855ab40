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


def _text_table(batch) -> pa.Table:
    """Coerce a map_batches batch to Arrow (pandas accepted for direct
    callers/tests; the pipelines pass ``batch_format="pyarrow"``)."""
    if isinstance(batch, pa.Table):
        return batch
    return pa.Table.from_pandas(batch, preserve_index=False)


def token_counts(batch) -> pa.Table:
    """Whitespace token count — pure-Arrow kernel: one C++
    ``count_substring`` pass, zero Python objects (the split-and-count
    pandas path built a list per row; measured 2.6× at 5k docs).

    SQL mirror: ``len(string_split(text, ' '))`` — i.e. single-space
    separator count + 1, empties kept.
    """
    t = _text_table(batch)
    import pyarrow.compute as pc

    n = pc.add(pc.count_substring(t["text"], pattern=" "), 1)
    return pa.table({"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())})


def token_counts_regex(batch) -> pa.Table:
    """BPE-ish token count with a word/punctuation regex — Arrow
    ``count_substring_regex`` (RE2). RE2 is the SAME engine DuckDB's
    ``regexp_extract_all`` oracle runs, so the mirror is exact by
    construction; note RE2's ``\\w`` is ASCII where Python ``re``'s is
    Unicode (identical on ASCII corpora).

    SQL mirror: ``len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))``.

    BEHAVIOR NOTE: RE2's ``\\w`` is ASCII — accented/non-Latin letters
    count as punctuation-class tokens ('café' → 'caf', 'é'), unlike
    Python ``re``'s Unicode ``\\w``. Identical on ASCII corpora; for
    Unicode word semantics plug a real tokenizer into ``Tokenize``.
    """
    t = _text_table(batch)
    import pyarrow.compute as pc

    n = pc.count_substring_regex(t["text"], pattern=TOKEN_RE.pattern)
    return pa.table({"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())})


def quality_scores(batch) -> pa.Table:
    """Quality heuristics: length bounds, stopword ratio. Mirrored in
    SQL with string_split + list_filter lambdas. Pure-Arrow: ONE C++
    split, ``is_in`` against the stopword set over the flat token
    array, per-doc hit counts by cumsum-diff (no pandas explode, no
    Python objects).
    """
    t = _text_table(batch)
    import pyarrow.compute as pc

    texts = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
    # null-as-empty: a null text misaligns the cumsum-diff folds for the
    # whole batch (null list length -> NaN -> garbage int offsets)
    texts = pc.fill_null(texts, "")
    split = pc.split_pattern(texts, pattern=" ")
    n_tok = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    hits = pc.is_in(split.flatten(), value_set=pa.array(STOPWORDS)).to_numpy(
        zero_copy_only=False
    )
    ends = np.cumsum(n_tok)
    c = np.zeros(len(hits) + 1, np.int64)
    np.cumsum(hits, out=c[1:])
    stop = c[ends] - c[ends - n_tok]
    stop_ratio = np.round(stop / n_tok, 6)
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    is_quality = ((n_chars >= 100) & (n_chars <= 2000) & (stop_ratio > 0.02)).astype(
        np.int32
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok),
            "stop_ratio": pa.array(stop_ratio),
            "n_chars": pa.array(n_chars),
            "is_quality": pa.array(is_quality),
        }
    )


def fingerprints(batch) -> pa.Table:
    """Document fingerprint = md5 of the lower-cased text (the digest
    itself is an inherent per-row C call — hashlib releases no
    vectorized batch API).

    SQL mirror: ``md5(lower(text))``.
    """
    t = _text_table(batch)
    import pyarrow.compute as pc

    lowered = pc.utf8_lower(t["text"])
    fps = [hashlib.md5(x.encode()).hexdigest() for x in lowered.to_pylist()]
    return pa.table({"doc_id": t["doc_id"], "fp": pa.array(fps, pa.string())})


def _rolling_fp_row(t: str, k: int = 8, window: int = 16) -> np.int64:
    """Per-doc reference implementation (tests assert the batch kernel
    reproduces it bit-for-bit)."""
    B, M = np.uint64(1_000_003), np.uint64(2**61 - 1)
    b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        return np.int64(b.sum())
    h = np.zeros(len(b) - k + 1, dtype=np.uint64)
    for j in range(k):
        h = (h * B + b[j : len(b) - k + 1 + j]) % M
    n_win = max(1, len(h) - window + 1)
    mins = np.minimum.reduce([h[j : j + n_win] for j in range(min(window, len(h)))])
    acc = np.uint64(0)
    with np.errstate(over="ignore"):  # uint64 wraparound is the contract
        for v in np.unique(mins):
            acc ^= v * B % M
    return np.int64(acc & np.uint64(0x7FFF_FFFF_FFFF_FFFF))


def rolling_fingerprints(batch, k: int = 8, window: int = 16) -> pa.Table:
    """Winnowing-style rolling-hash fingerprint (non-SQL-expressible):
    min-of-window over k-gram Rabin hashes of the utf-8 byte stream,
    xor-folded over the DISTINCT window minima into one int64.
    Deterministic; used for cheap near-dup pre-clustering.

    Fully columnar across the batch (formerly the library's last
    per-row text loop): the utf-8 bytes are read straight out of the
    Arrow string data buffer (no per-row encode), the k-gram hashes
    run as k vectorized passes over the flat byte stream with
    doc-crossing grams masked, per-doc window minima come from
    ``window`` shifted-view ``minimum.reduce`` passes (+ ``reduceat``
    for docs shorter than one window), and the unique-xor fold is one
    lexsort + ``bitwise_xor.reduceat``."""
    B, M = np.uint64(1_000_003), np.uint64(2**61 - 1)
    FP_MASK = np.uint64(0x7FFF_FFFF_FFFF_FFFF)
    t = _text_table(batch)
    arr = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
    n = len(arr)
    if n == 0 or pa.types.is_null(arr.type):
        # empty batch / all-None column (Arrow infers null type, which
        # has no offsets buffer): every fp is 0, same as zero-byte text
        return pa.table(
            {"doc_id": t["doc_id"], "rolling_fp": pa.array(np.zeros(n, np.int64))}
        )
    if arr.null_count:  # null slots may carry bogus offsets; treat as ""
        import pyarrow.compute as pc

        arr = pc.fill_null(arr, "")
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + n + 1].astype(
        np.int64
    )
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    lens = np.diff(offsets)
    fps = np.zeros(n, dtype=np.int64)

    short = lens < k
    if short.any():
        csum = np.zeros(len(data) + 1, dtype=np.int64)
        np.cumsum(data, out=csum[1:])
        fps[short] = csum[offsets[1:][short]] - csum[offsets[:-1][short]]
    if short.all():
        return pa.table({"doc_id": t["doc_id"], "rolling_fp": pa.array(fps)})

    # flat k-gram rolling hashes; grams crossing a doc boundary (and
    # all positions of <k-byte docs) masked by position arithmetic.
    # In-place ops: the k passes stream the array without temporaries
    # (measured ~2x on the 48 MB/6M-gram case)
    flat = data.astype(np.uint64)
    m = len(flat) - k + 1
    h_all = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h_all *= B
        h_all += flat[j : m + j]
        h_all %= M
    pos_in_doc = np.arange(m) - np.repeat(offsets[:-1], lens)[:m]
    valid = pos_in_doc <= (np.repeat(lens, lens)[:m] - k)
    h = h_all[valid]
    hlen = np.maximum(lens - k + 1, 0)  # grams per doc (0 for short)
    hoff = np.zeros(n, dtype=np.int64)
    np.cumsum(hlen[:-1], out=hoff[1:])

    # docs whose whole gram array fits in one window: min over all grams
    # (reduceat over the starts of ALL gram-bearing docs — consecutive
    # indices are then exact doc boundaries — and select the subset)
    one_win = (hlen > 0) & (hlen <= window)
    if one_win.any():
        has_grams = hlen > 0
        mins_all = np.minimum.reduceat(h, hoff[has_grams])
        minv = mins_all[one_win[has_grams]]
        fps[one_win] = ((minv * B) % M & FP_MASK).astype(np.int64)

    # docs with a real sliding window: per-start minima over `window`
    # shifted views, starts valid only when fully inside the doc
    slide = hlen > window
    if slide.any():
        L = len(h) - window + 1
        # van Herk / Gil-Werman sliding minimum: block prefix + suffix
        # minima, 3 contiguous passes total instead of `window` shifted
        # reduce passes (measured 42x at 6M grams); windows straddling
        # doc boundaries are dropped by the start mask below
        nb = -(-len(h) // window)
        hp = np.full(nb * window, np.uint64(1) << np.uint64(62), dtype=np.uint64)
        hp[: len(h)] = h
        hp = hp.reshape(nb, window)
        pre = np.minimum.accumulate(hp, axis=1).reshape(-1)
        suf = np.minimum.accumulate(hp[:, ::-1], axis=1)[:, ::-1].reshape(-1)
        mins_flat = np.minimum(suf[:L], pre[window - 1 : window - 1 + L])
        s_pos = np.arange(L) - np.repeat(hoff, hlen)[:L]
        s_doc = np.repeat(np.arange(n), hlen)[:L]
        s_ok = (s_pos <= np.repeat(hlen, hlen)[:L] - window) & slide[s_doc]
        vals, docs = mins_flat[s_ok], s_doc[s_ok]
        # run-length prefilter before the sort: consecutive windows
        # overwhelmingly share their minimum (the winnowing property),
        # so dropping same-(doc,val) runs first shrinks the lexsort
        # input from O(windows) to ~O(distinct mins)
        if len(vals):
            keep = np.ones(len(vals), dtype=bool)
            keep[1:] = (docs[1:] != docs[:-1]) | (vals[1:] != vals[:-1])
            vals, docs = vals[keep], docs[keep]
        order = np.lexsort((vals, docs))
        vals, docs = vals[order], docs[order]
        first = np.ones(len(vals), dtype=bool)
        first[1:] = (docs[1:] != docs[:-1]) | (vals[1:] != vals[:-1])
        vals_u, docs_u = vals[first], docs[first]
        seg = np.ones(len(docs_u), dtype=bool)
        seg[1:] = docs_u[1:] != docs_u[:-1]
        folded = (vals_u * B) % M
        acc = np.bitwise_xor.reduceat(folded, np.flatnonzero(seg))
        fps[docs_u[seg]] = (acc & FP_MASK).astype(np.int64)

    return pa.table({"doc_id": t["doc_id"], "rolling_fp": pa.array(fps)})


def _flat_tokens(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-explode a batch: (doc_row_index, flat token array).
    One explode, no per-token Python in the caller."""
    toks = texts.str.split(" ")
    flat = toks.explode()
    return flat.index.to_numpy(), np.asarray(flat.to_numpy(), dtype=object)


def _ngrams(doc_codes: np.ndarray, flat: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Space-joined n-grams over the flat token stream; grams crossing a
    document boundary are masked out. Elementwise object-array concat
    (C loop over the batch, no Python-level row loop)."""
    if len(flat) < n:
        return np.array([], dtype=np.int64), np.array([], dtype=object)
    m = len(flat) - n + 1
    g = flat[:m].copy()
    for j in range(1, n):
        g = g + " "
        g = g + flat[j : m + j]
    same_doc = doc_codes[:m] == doc_codes[n - 1 :]
    return doc_codes[:m][same_doc], g[same_doc]


def repetition_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style intra-document repetition filters: the fraction of
    bigrams taken by the single most frequent bigram, and the fraction
    of duplicate trigrams. Both scaled to integers (×1e6, half-up) so
    the SQL mirror is exact (no float-rounding ties).

    Docs with <2 (resp. <3) tokens score 0 — nothing can repeat.
    """
    batch = batch.reset_index(drop=True)  # doc codes are row positions
    codes, flat = _flat_tokens(batch["text"])
    out = batch[["doc_id"]].copy()
    n_rows = len(batch)

    bi_doc, bi = _ngrams(codes, flat, 2)
    top = np.zeros(n_rows, dtype=np.int64)
    if len(bi):
        bc = pd.DataFrame({"d": bi_doc, "g": bi}).groupby(["d", "g"], sort=False).size()
        per_doc = bc.groupby(level=0)
        mx = per_doc.max()
        tot = per_doc.sum()
        frac = mx.to_numpy() / tot.to_numpy()
        top[mx.index.to_numpy()] = np.floor(frac * 1_000_000 + 0.5).astype(np.int64)
    out["top_bigram_e6"] = top

    tri_doc, tri = _ngrams(codes, flat, 3)
    dup = np.zeros(n_rows, dtype=np.int64)
    if len(tri):
        tc = pd.DataFrame({"d": tri_doc, "g": tri})
        tot3 = tc.groupby("d", sort=False).size()
        uniq3 = tc.drop_duplicates().groupby("d", sort=False).size()
        frac = 1.0 - uniq3.to_numpy() / tot3.to_numpy()
        dup[tot3.index.to_numpy()] = np.floor(frac * 1_000_000 + 0.5).astype(np.int64)
    out["dup_trigram_e6"] = dup
    return out


class Tokenize:
    """Actor-pool tokenization stage with a REAL-tokenizer pass-through.

    ``tokenizer_factory``: optional callable returning a tokenizer —
    itself a callable ``list[str] -> list[list[int]]`` (e.g. a
    HuggingFace ``AutoTokenizer`` wrapper: ``lambda texts:
    tok(texts)["input_ids"]``) — loaded ONCE per actor in ``__init__``
    (the model-load pattern; never per batch, never shipped per task).
    Without it, the dependency-free default applies the BPE-ish
    ``TOKEN_RE`` regex and hashes each piece into ``vocab`` — a
    deterministic stand-in with the same output layout
    (doc_id, tokens:list<int32>, n_tokens).

    Use with ``ds.map_batches(Tokenize, fn_constructor_kwargs={...},
    concurrency=N, batch_size=B)``.
    """

    def __init__(self, tokenizer_factory=None, vocab: int = 50257):
        self.tokenizer = tokenizer_factory() if tokenizer_factory is not None else None
        self.vocab = vocab

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        out = batch[["doc_id"]].copy()
        if self.tokenizer is not None:
            ids = self.tokenizer(list(batch["text"]))
            out["tokens"] = [np.asarray(t, dtype=np.int32) for t in ids]
            out["n_tokens"] = np.array([len(t) for t in ids], dtype=np.int64)
            return out
        # Arrow-native TOKEN_RE findall: space out punctuation runs
        # (RE2 group replace) and whitespace-split — identical piece
        # stream to str.findall(r"\w+|[^\w\s]") (RE2's \w is ASCII
        # where Python's is Unicode; identical on ASCII corpora),
        # measured 2.1x with no per-row regex loop
        import pyarrow.compute as pc

        from clever_canal_ray.functions.dedup import _ws_tokens

        texts = pa.array(batch["text"].to_numpy(), type=pa.string())
        spaced = pc.replace_substring_regex(
            texts, pattern=r"([^\w\s])", replacement=r" \1 "
        )
        counts, flat_arr = _ws_tokens(spaced)
        fl = flat_arr.to_numpy(zero_copy_only=False)
        if len(fl):
            h = (
                pd.util.hash_array(fl, categorize=False) % np.uint64(self.vocab)
            ).astype(np.int32)
        else:
            h = np.array([], dtype=np.int32)
        out["tokens"] = np.split(h, np.cumsum(counts)[:-1]) if len(counts) else []
        out["n_tokens"] = counts
        return out


# --- unigram-LM quality scoring (CCNet-style LM filter analog) -----------


def unigram_counts_broadcast(
    ds,
    text_col: str = "text",
    num_buckets: int = 64,
    top_v: int | None = None,
    max_vocab: int = 5_000_000,
):
    """PASS 1 of the unigram-LM scorer: global token counts as a
    broadcast lookup — (sorted word array, aligned counts, total) via
    ``ray.put``, built from ONE bucketed (word, count) exchange
    (per-batch partial counts first, so only distinct words leave each
    batch; the string payload crosses the shuffle once).

    ``top_v``: at 100-TB scale the full vocabulary cannot land on the
    driver — keep the ``top_v`` most frequent words (ties by word) and
    let scoring floor out-of-vocab tokens at count 1 (Laplace-ish).
    None (gate scale / bounded vocabs) keeps every word — the exactly
    SQL-mirrorable setting.
    """
    import ray

    from clever_canal_ray.stages.agg import bucketed_groupby

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lists = df[text_col].str.split(" ")  # string_split(text,' ') parity
        flat = lists.explode().to_numpy()
        codes, uniq = pd.factorize(flat)
        return pd.DataFrame({"w": uniq, "c": np.bincount(codes).astype(np.int64)})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("w", sort=False).agg(c=("c", "sum")).reset_index()

    counts_ds = bucketed_groupby(ds, ["w"], partial, final, num_buckets=num_buckets)
    if top_v is None:
        # the pull below lands one row per DISTINCT word on the driver
        # — guard it like exact_quantiles: count distributed FIRST and
        # refuse unbounded vocabularies instead of silently OOMing
        counts_ds = counts_ds.materialize()
        n_vocab = counts_ds.count()
        if n_vocab > max_vocab:
            raise ValueError(
                f"unigram_counts_broadcast: {n_vocab} distinct words > max_vocab="
                f"{max_vocab}; pass top_v=N to cap the broadcast vocabulary "
                "(OOV tokens floor at count 1)"
            )
        counts = counts_ds.to_pandas()
        total = int(counts["c"].sum())
    else:
        # the cap must apply DISTRIBUTED: each block keeps its local
        # top_v (global top-v is a subset of the per-block top-v union
        # — counts are already final per word), so the driver pull is
        # bounded by blocks x top_v, never the full vocabulary. The
        # total token count still sums over EVERY word (one scalar per
        # block), not just the kept ones.
        counts_ds = counts_ds.materialize()
        tot_parts = counts_ds.map_batches(
            lambda df: pd.DataFrame({"t": [df["c"].sum()]}), batch_format="pandas"
        ).to_pandas()
        total = int(tot_parts["t"].sum())

        def block_top(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) <= top_v:
                return df
            return df.sort_values(["c", "w"], ascending=[False, True]).head(top_v)

        counts = counts_ds.map_batches(block_top, batch_format="pandas").to_pandas()
        if len(counts) > top_v:
            counts = counts.sort_values(["c", "w"], ascending=[False, True]).head(top_v)
    if len(counts):
        counts = counts.sort_values("w").reset_index(drop=True)
        words = counts["w"].to_numpy()
        cvals = counts["c"].to_numpy(dtype=np.int64)
    else:  # top_v=0 / empty corpus: Ray drops the schema of empty pulls
        words = np.array([], dtype=object)
        cvals = np.array([], dtype=np.int64)
    return ray.put((words, cvals, total))


def lm_nll_batch(texts, vocab_ref, scale: int = 10_000) -> np.ndarray:
    """PASS 2 kernel: per-doc mean token negative log-likelihood under
    the unigram LM, scaled to int64 (×``scale``, half-up) so the SQL
    mirror is stable. nll = ln(total) − mean(ln c_w); out-of-vocab
    words (only possible under a ``top_v`` cap) floor at count 1."""
    import ray

    words, cvals, total = ray.get(vocab_ref) if not isinstance(vocab_ref, tuple) else vocab_ref
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        texts = pa.array(np.asarray(texts, dtype=object), type=pa.string())
    import pyarrow.compute as pc

    split = pc.split_pattern(texts, pattern=" ")
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = split.flatten().to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(flat)
    if len(words):
        pos = np.searchsorted(words, uniq)
        pos_c = np.minimum(pos, len(words) - 1)
        hit = (pos < len(words)) & (words[pos_c] == uniq)
        # ln over hit counts only: np.where evaluates both branches, so
        # an eager cvals[pos_c] would IndexError on an empty vocab
        ln_u = np.zeros(len(uniq), np.float64)
        ln_u[hit] = np.log(cvals[pos_c[hit]].astype(np.float64))
    else:
        ln_u = np.zeros(len(uniq), np.float64)  # everything OOV: ln(1)=0
    ln_flat = ln_u[codes]
    csum = np.zeros(len(ln_flat) + 1, np.float64)
    np.cumsum(ln_flat, out=csum[1:])
    ends = np.cumsum(lens)
    mean_ln = (csum[ends] - csum[ends - lens]) / lens  # every doc has >=1 token ('' counts)
    nll = np.log(float(total)) - mean_ln
    return np.floor(nll * scale + 0.5).astype(np.int64)


def unigram_lm_scores(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    top_v: int | None = None,
):
    """CCNet-style unigram language-model quality score per document
    (mean token NLL under the corpus' own unigram distribution; low =
    typical text, high = rare-token soup). Two passes, both the 100-TB
    shape: ONE bucketed (word, count) exchange whose result broadcasts
    once via ``ray.put`` (``top_v``-capped at scale), then a streaming
    score pass — no per-doc state, no second shuffle.

    SQL mirror (exact when ``top_v=None``): counts CTE + join + avg(ln)
    — see ``__ray_entry__.oracle_sql['text_quality']``.
    """
    ref = unigram_counts_broadcast(ds, text_col=text_col, num_buckets=num_buckets, top_v=top_v)

    def score(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t[id_col],
                "lm_nll_e4": pa.array(lm_nll_batch(t[text_col], ref)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# --- language ID (n-gram/function-word heuristic, rows-only check) -------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "to", "a", "in", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein"},
    "fr": {"le", "la", "les", "et", "est", "une", "pas"},
    "es": {"el", "la", "los", "y", "es", "una", "no"},
    "zh": set(),  # detected by CJK codepoint ratio instead
}


class LangId:
    """Actor-pool language-ID stage: marker tables (or a real model)
    built once per actor (the model-load-in-__init__ pattern); per-batch
    work is fully columnar — one lower+findall pass, one explode, one
    ``isin`` per language, ``bincount`` per doc; CJK detection is a
    vectorized codepoint-range count on a 200-char head slice.

    ``model_factory``: optional callable returning a *model* — itself a
    callable ``texts -> labels`` (e.g. a fastText/langdetect wrapper) —
    loaded ONCE per actor in ``__init__`` (never per batch / never
    shipped per task). When present it replaces the marker heuristic
    entirely; the heuristic stays the dependency-free default (no lang
    models are vendored in this environment).
    """

    def __init__(self, model_factory=None):
        self.markers = {k: v for k, v in _LANG_MARKERS.items()}
        self.word_re = re.compile(r"[a-zA-Z]+")
        self.cjk_re = re.compile(r"[一-鿿]")
        # ascending lang order; ties resolve to the lexicographically
        # LARGEST language (max((score, name))) — mirrored in SQL
        self.langs = sorted(k for k, v in self.markers.items() if v)
        # ONE alternation over all marker words, letter-lookaround
        # anchored — matches exactly "a maximal [a-zA-Z]+ run equal to a
        # marker" (what predict_row's set-intersection sees), so only
        # marker HITS materialize from each batch, never the full token
        # stream (the explode-everything variant was slower than the row
        # loop on short docs — BASELINE.md microbench)
        all_markers = sorted({w for v in self.markers.values() for w in v}, key=len, reverse=True)
        self.marker_re = re.compile(
            r"(?<![a-zA-Z])(?:" + "|".join(map(re.escape, all_markers)) + r")(?![a-zA-Z])"
        )
        self.model = model_factory() if model_factory is not None else None

    def predict_row(self, t: str) -> str:
        """Per-row reference implementation (tests assert the batch
        kernel reproduces it exactly)."""
        cjk = sum(1 for ch in t[:200] if "一" <= ch <= "鿿")
        if cjk > 5:
            return "zh"
        words = set(self.word_re.findall(t.lower()[:500]))
        scores = {lang: len(words & m) for lang, m in self.markers.items() if m}
        best = max(scores, key=lambda k: (scores[k], k))
        return best if scores[best] > 0 else "en"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        if self.model is not None:
            out["pred_lang"] = np.asarray(self.model(batch["text"].to_numpy()), dtype=object)
            return out
        s = batch["text"].reset_index(drop=True)
        n = len(s)
        cjk = s.str.slice(0, 200).str.count(self.cjk_re).to_numpy()
        # only marker OCCURRENCES leave the regex (tiny vs the token
        # stream); dedupe (doc, marker) as int64 pairs, then one
        # bincount per language
        hits = s.str.slice(0, 500).str.lower().str.findall(self.marker_re)
        fl = hits.explode().dropna()
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        if len(fl):
            w_codes, w_uniq = pd.factorize(fl.to_numpy())
            d_codes = fl.index.to_numpy(dtype=np.int64)
            uniq_s = pd.Series(w_uniq)
            lang_hit = np.stack(
                [uniq_s.isin(self.markers[lang]).to_numpy() for lang in self.langs]
            )  # (n_langs, n_uniq_markers)
            pairs = np.unique(d_codes * np.int64(len(w_uniq)) + w_codes)
            d_u = pairs // len(w_uniq)
            w_u = pairs % len(w_uniq)
            for j in range(len(self.langs)):
                m = lang_hit[j][w_u]
                if m.any():
                    scores[:, j] = np.bincount(d_u[m], minlength=n)
        # argmax over REVERSED columns = last max in ascending order =
        # the lexicographically largest language on score ties
        rev = scores[:, ::-1]
        best = np.array(self.langs, dtype=object)[::-1][rev.argmax(axis=1)]
        preds = np.where(rev.max(axis=1) > 0, best, "en").astype(object)
        preds[cjk > 5] = "zh"
        out["pred_lang"] = preds
        return out


# --- PII-style redaction (pluggable compiled-pattern scrub) --------------

# default pattern set: the common PII shapes a training-data pipeline
# scrubs before the corpus ships. Compiled once at import; each entry is
# (name, compiled pattern, replacement token).
PII_PATTERNS = [
    ("email", re.compile(r"[\w.+-]+@[\w-]+\.[\w.-]+"), "<EMAIL>"),
    ("ipv4", re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b"), "<IP>"),
    ("phone", re.compile(r"\+?\d[\d\s().-]{7,}\d"), "<PHONE>"),
    ("digits", re.compile(r"\d+"), "#"),
]


def redact(ds, col: str, patterns=None, out_col: str | None = None, count_col: str | None = None):
    """Scrub a text column with an ordered compiled-pattern list —
    the redaction/masking step of a privacy pass. Pure per-batch
    vectorized ``str.replace`` chain (pandas' C regex loop), no
    shuffle; patterns are compiled once at module import (or supplied
    pre-compiled), never per batch.

    ``count_col``: if set, also emit the number of matches of the
    FIRST pattern before scrubbing (the auditable redaction count).
    Earlier patterns win on overlapping text (email before digits),
    mirroring sequential ``regexp_replace`` application in SQL.
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    out_col = out_col or col

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        s = df[col]
        if count_col:
            # null text -> 0 matches (str.count yields NaN on nulls)
            df[count_col] = s.str.count(pats[0][1]).fillna(0).astype("int64")
        for _, pat, repl in pats:
            s = s.str.replace(pat, repl, regex=True)
        df[out_col] = s
        return df

    return ds.map_batches(scrub, batch_format="pandas")


# --- Gopher quality rules (Rae et al. 2021, Appendix A.1) -----------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(batch) -> pa.Table:
    """The published Gopher document-quality rule set (Rae et al. 2021,
    arXiv:2112.11446 A.1.1), vectorized — one row per doc with each
    rule's boolean plus the conjunction ``gopher_pass``:

    - 50 <= word count <= 100,000
    - 3 <= mean word length <= 10 (non-space chars / words — exact
      under single-space separation, the corpus contract everywhere
      else in this engine)
    - symbol-to-word ratio (``#`` or ``...``/``…``) <= 0.1
    - < 90% of lines start with a bullet; < 30% end with an ellipsis
    - >= 80% of words contain at least one alphabetic character
    - >= 2 distinct Gopher stop words present

    Zero per-row Python: Arrow split + ``is_in``/regex counts +
    cumsum-diff per-doc folds (the quality_scores kernel pattern).
    """
    t = _text_table(batch)
    import pyarrow.compute as pc

    texts = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
    # null text would make list_value_length yield null -> NaN -> garbage
    # int offsets, misaligning EVERY doc's fold in the batch; treat null
    # as empty (fails the word-count rule, like the CurateJudge guard)
    texts = pc.fill_null(texts, "")
    split = pc.split_pattern(texts, pattern=" ")
    n_tok = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = split.flatten()
    ends = np.cumsum(n_tok)
    starts = ends - n_tok

    def per_doc(flat_bool) -> np.ndarray:
        c = np.zeros(len(flat_bool) + 1, np.int64)
        np.cumsum(flat_bool, out=c[1:])
        return c[ends] - c[starts]

    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    n_space = pc.count_substring(texts, pattern=" ").to_numpy(zero_copy_only=False)
    mean_wl = np.divide(
        n_chars - n_space, n_tok, out=np.zeros(len(n_tok), np.float64), where=n_tok > 0
    )

    n_hash = pc.count_substring(texts, pattern="#").to_numpy(zero_copy_only=False)
    n_ell = (
        pc.count_substring(texts, pattern="...").to_numpy(zero_copy_only=False)
        + pc.count_substring(texts, pattern="…").to_numpy(zero_copy_only=False)
    )
    sym_ratio = np.divide(
        n_hash + n_ell, n_tok, out=np.zeros(len(n_tok), np.float64), where=n_tok > 0
    )

    lines = pc.split_pattern(texts, pattern="\n")
    n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_lines = lines.flatten()
    l_ends = np.cumsum(n_lines)
    l_starts = l_ends - n_lines
    bullet = pc.match_substring_regex(
        flat_lines, pattern=r"^\s*(•|\*|-|‣|◦)"
    ).to_numpy(zero_copy_only=False)
    ell_end = pc.match_substring_regex(
        flat_lines, pattern=r"(\.\.\.|…)\s*$"
    ).to_numpy(zero_copy_only=False)

    def per_doc_lines(flat_bool) -> np.ndarray:
        c = np.zeros(len(flat_bool) + 1, np.int64)
        np.cumsum(flat_bool, out=c[1:])
        return c[l_ends] - c[l_starts]

    bullet_frac = np.divide(
        per_doc_lines(bullet), n_lines, out=np.zeros(len(n_lines), np.float64), where=n_lines > 0
    )
    ell_frac = np.divide(
        per_doc_lines(ell_end), n_lines, out=np.zeros(len(n_lines), np.float64), where=n_lines > 0
    )

    has_alpha = pc.match_substring_regex(flat, pattern="[A-Za-z]").to_numpy(
        zero_copy_only=False
    )
    alpha_frac = np.divide(
        per_doc(has_alpha), n_tok, out=np.zeros(len(n_tok), np.float64), where=n_tok > 0
    )

    lowered = pc.utf8_lower(flat)
    stop_distinct = np.zeros(len(n_tok), np.int64)
    for w in GOPHER_STOPWORDS:
        hit = per_doc(pc.equal(lowered, pa.scalar(w)).to_numpy(zero_copy_only=False))
        stop_distinct += (hit > 0).astype(np.int64)

    r_words = (n_tok >= 50) & (n_tok <= 100_000)
    r_wl = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    r_sym = sym_ratio <= 0.1
    r_bullet = bullet_frac < 0.9
    r_ell = ell_frac < 0.3
    r_alpha = alpha_frac >= 0.8
    r_stop = stop_distinct >= 2
    passed = r_words & r_wl & r_sym & r_bullet & r_ell & r_alpha & r_stop
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_words": pa.array(n_tok),
            "mean_word_len": pa.array(np.round(mean_wl, 6)),
            "symbol_ratio": pa.array(np.round(sym_ratio, 6)),
            "bullet_frac": pa.array(np.round(bullet_frac, 6)),
            "ellipsis_frac": pa.array(np.round(ell_frac, 6)),
            "alpha_frac": pa.array(np.round(alpha_frac, 6)),
            "stop_distinct": pa.array(stop_distinct),
            "gopher_pass": pa.array(passed.astype(np.int32)),
        }
    )


# --- C4 cleaning rules (Raffel et al. 2020, §2.2) -------------------------


def c4_clean(batch) -> pa.Table:
    """The published C4 line+page cleaning rules (arXiv:1910.10683
    §2.2), vectorized — returns the CLEANED text plus the page verdict:

    line level (dropped from the text):
    - keep only lines ending in terminal punctuation (. ! ? ")
    - keep only lines with >= 5 words
    - drop lines containing the word "javascript" (any case)

    page level (``c4_keep = 0``):
    - fewer than 3 kept lines/sentences
    - contains "lorem ipsum" (any case) or a curly brace ``{``

    Zero per-row Python: one Arrow line split, RE2 predicates over the
    flat line array, ragged re-assembly via ``pc.binary_join`` with the
    kept-line ListArray rebuilt from cumsum offsets.
    """
    t = _text_table(batch)
    import pyarrow.compute as pc

    texts = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
    # null-as-empty: see gopher_quality — a single null would misalign
    # the flattened line folds for the whole batch
    texts = pc.fill_null(texts, "")
    lines = pc.split_pattern(texts, pattern="\n")
    n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lines.flatten()

    terminal = pc.match_substring_regex(flat, pattern=r'[.!?"]\s*$').to_numpy(
        zero_copy_only=False
    )
    # >= 5 words == >= 4 separating spaces between non-space runs
    five_words = pc.match_substring_regex(
        flat, pattern=r"^\s*(?:\S+\s+){4,}\S+"
    ).to_numpy(zero_copy_only=False)
    no_js = np.invert(
        pc.match_substring_regex(flat, pattern=r"(?i)javascript").to_numpy(
            zero_copy_only=False
        )
    )
    keep_line = terminal & five_words & no_js

    ends = np.cumsum(n_lines)
    starts = ends - n_lines
    c = np.zeros(len(keep_line) + 1, np.int64)
    np.cumsum(keep_line, out=c[1:])
    kept_per_doc = c[ends] - c[starts]

    kept_flat = flat.filter(pa.array(keep_line))
    off = np.zeros(len(n_lines) + 1, np.int64)
    np.cumsum(kept_per_doc, out=off[1:])
    kept_lists = pa.ListArray.from_arrays(pa.array(off, pa.int32()), kept_flat)
    cleaned = pc.binary_join(kept_lists, pa.scalar("\n"))

    bad_page = pc.match_substring_regex(texts, pattern=r"(?i)lorem ipsum|\{").to_numpy(
        zero_copy_only=False
    )
    keep_page = (kept_per_doc >= 3) & np.invert(bad_page)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "text": cleaned,
            "n_lines_kept": pa.array(kept_per_doc),
            "c4_keep": pa.array(keep_page.astype(np.int32)),
        }
    )


def line_repetition_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """The duplicate-LINE/PARAGRAPH half of Gopher's repetition filters
    (A.1.2; the n-gram half lives in :func:`repetition_stats`): per doc,
    the fraction of lines (and of line CHARACTERS) occupied by
    duplicated lines, and the same pair for blank-line-separated
    paragraphs. All ×1e6 half-up ints (exact SQL mirroring convention).

    Vectorized: one split + explode per granularity; duplicate masks by
    (doc, unit) `duplicated(keep=False)` minus one surviving copy per
    distinct repeated unit; per-doc folds via bincount.
    """
    batch = batch.reset_index(drop=True)
    out = batch[["doc_id"]].copy()
    n_rows = len(batch)

    def frac_pair(sep: str) -> tuple[np.ndarray, np.ndarray]:
        units = batch["text"].str.split(sep)
        flat = units.explode()
        mask = flat.notna() & (flat != "")
        kept = flat[mask]
        doc = batch.index.get_indexer(kept.index)
        if not len(kept):
            return np.zeros(n_rows, np.int64), np.zeros(n_rows, np.int64)
        df = pd.DataFrame({"d": doc, "u": kept.to_numpy(), "n": kept.str.len().to_numpy()})
        # a unit is "duplicated mass" if it is a 2nd+ occurrence of its
        # (doc, text) pair — Gopher counts the surplus copies
        surplus = df.duplicated(["d", "u"]).to_numpy()
        tot_units = np.bincount(df["d"], minlength=n_rows)
        dup_units = np.bincount(df["d"][surplus], minlength=n_rows)
        tot_chars = np.bincount(df["d"], weights=df["n"], minlength=n_rows)
        dup_chars = np.bincount(df["d"][surplus], weights=df["n"][surplus], minlength=n_rows)
        f_units = np.divide(dup_units, tot_units, out=np.zeros(n_rows), where=tot_units > 0)
        f_chars = np.divide(dup_chars, tot_chars, out=np.zeros(n_rows), where=tot_chars > 0)
        e6 = lambda a: np.floor(a * 1_000_000 + 0.5).astype(np.int64)  # noqa: E731
        return e6(f_units), e6(f_chars)

    out["dup_line_e6"], out["dup_line_char_e6"] = frac_pair("\n")
    out["dup_para_e6"], out["dup_para_char_e6"] = frac_pair("\n\n")
    return out
