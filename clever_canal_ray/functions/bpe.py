"""BPE tokenizer TRAINING + application over a Ray Data corpus.

The missing piece between the corpus ops (dedup, quality, mixing) and
the tokenized-sequence lake this engine maintains: learn a subword
vocabulary from the corpus itself, then encode documents with it.

Scale design (100 TB): BPE training never touches the corpus twice —
its entire state is the DISTINCT-WORD histogram (the classic
Sennrich/HuggingFace trainer trick: merge counts are word-count
weighted sums, so the corpus reduces to one bounded (word, count)
table). Pass 1 is ONE bucketed (word, count) exchange — only distinct
words leave each batch, the corpus text crosses no shuffle; the
histogram lands on the driver under an explicit ``max_vocab`` guard
(cap with ``top_v`` at open-web scale — merges learned from the top-V
word histogram are the standard approximation). The merge loop itself
is corpus-size-independent: O(vocab x merges) with an incremental
pair->words index. Encoding streams: an actor-pool stage holds the
merge ranks + a persistent word->pieces cache (built once per actor,
reused across batches), and each batch encodes only its NEW distinct
words (factorize -> encode uniques -> scatter).

Reference semantics: Sennrich et al. 2016 (arXiv:1508.07909) with a
separate end-of-word marker symbol; deterministic tie-break (highest
count, then lexicographically smallest pair) so training is
reproducible at any parallelism.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa

END_MARKER = "</w>"


def word_histogram(
    ds,
    text_col: str = "text",
    num_buckets: int = 64,
    top_v: int | None = None,
    max_vocab: int = 2_000_000,
) -> pd.DataFrame:
    """Distinct-word histogram of a corpus as a driver DataFrame
    ``(w, c)`` — the BPE trainer's input. One bucketed (word, count)
    exchange; the driver pull is guarded by ``max_vocab`` (count runs
    distributed FIRST), or capped to the ``top_v`` most frequent words
    (ties by word) with the cap applied per block so the pull is
    bounded by blocks x top_v."""
    from clever_canal_ray.stages.agg import bucketed_groupby

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lists = df[text_col].str.split(" ")
        flat = lists.explode().dropna().to_numpy()
        flat = flat[flat != ""]
        if not len(flat):
            return pd.DataFrame({"w": pd.Series(dtype=object), "c": pd.Series(dtype=np.int64)})
        codes, uniq = pd.factorize(flat)
        return pd.DataFrame({"w": uniq, "c": np.bincount(codes).astype(np.int64)})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("w", sort=False).agg(c=("c", "sum")).reset_index()

    counts_ds = bucketed_groupby(ds, ["w"], partial, final, num_buckets=num_buckets).materialize()
    if top_v is not None:

        def block_top(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(["c", "w"], ascending=[False, True], kind="mergesort").head(top_v)

        pulled = counts_ds.map_batches(block_top, batch_format="pandas").to_pandas()
        return (
            pulled.sort_values(["c", "w"], ascending=[False, True], kind="mergesort")
            .head(top_v)
            .reset_index(drop=True)
        )
    n_vocab = counts_ds.count()
    if n_vocab > max_vocab:
        raise ValueError(
            f"word_histogram: {n_vocab} distinct words > max_vocab={max_vocab}; "
            "pass top_v=N to cap the trainer's histogram (the standard "
            "open-web approximation)"
        )
    return (
        counts_ds.to_pandas()
        .sort_values(["c", "w"], ascending=[False, True], kind="mergesort")
        .reset_index(drop=True)
    )


def _merge_word(syms: tuple, pair: tuple, new_sym: str) -> tuple:
    out = []
    i, n = 0, len(syms)
    a, b = pair
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(new_sym)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    word_counts: pd.DataFrame,
    num_merges: int = 1000,
    min_count: int = 2,
    end_marker: str = END_MARKER,
) -> list[tuple[str, str]]:
    """Learn BPE merges from a ``(w, c)`` word histogram (driver-side —
    corpus-size-independent by construction, see module docstring).

    Deterministic: each round merges the (count desc, pair lexicographic
    asc) best adjacent symbol pair; stops at ``num_merges`` or when the
    best pair's count drops below ``min_count``. Incremental update:
    only words containing the merged pair recount (pair -> word-ids
    index), the Sennrich reference algorithm."""
    words = [tuple(w) + (end_marker,) for w in word_counts["w"]]
    counts = word_counts["c"].to_numpy(np.int64)

    pair_count: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)
    for i, syms in enumerate(words):
        c = int(counts[i])
        for p in zip(syms, syms[1:]):
            pair_count[p] += c
            pair_words[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_count:
            break
        best = min(pair_count.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        pair = best[0]
        merges.append(pair)
        new_sym = pair[0] + pair[1]
        for i in sorted(pair_words[pair]):
            syms, c = words[i], int(counts[i])
            for p in zip(syms, syms[1:]):
                pair_count[p] -= c
                if pair_count[p] <= 0:
                    del pair_count[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        del pair_words[p]
            merged = _merge_word(syms, pair, new_sym)
            words[i] = merged
            for p in zip(merged, merged[1:]):
                pair_count[p] += c
                pair_words[p].add(i)
    return merges


def bpe_train_corpus(
    ds,
    num_merges: int = 1000,
    min_count: int = 2,
    text_col: str = "text",
    num_buckets: int = 64,
    top_v: int | None = None,
    max_vocab: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Corpus-in convenience: distributed histogram -> merge learning."""
    hist = word_histogram(
        ds, text_col=text_col, num_buckets=num_buckets, top_v=top_v, max_vocab=max_vocab
    )
    return bpe_train(hist, num_merges=num_merges, min_count=min_count)


def encode_word(word: str, ranks: dict, end_marker: str = END_MARKER) -> tuple:
    """Greedy rank-order BPE encode of one word (the GPT-2 apply rule:
    repeatedly merge the lowest-rank adjacent pair, all occurrences,
    until none ranks). Applying the learned ranks reproduces the
    trainer's final segmentation on training words."""
    syms = list(word) + [end_marker]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = list(_merge_word(tuple(syms), best_pair, best_pair[0] + best_pair[1]))
    return tuple(syms)


def _pack_tokenizer(merges, vocab=None) -> bytes:
    """Compress (merges, vocab) into ONE small inline-able bytes blob.

    Why: Ray stores large actor-constructor arguments in the OBJECT
    STORE; with max_restarts > 0 an actor restart can then fail if the
    argument object is lost (ray issue 53727 — surfaced as a warning on
    every bpe bench run). A zlib blob of the ~8k-merge tokenizer is a
    few tens of KB — under Ray's inline threshold, so it rides in the
    task spec itself and restarts never need the object store.

    NOTE: Ray 2.49 still PRINTS the 53727 warning for every Data actor
    pool regardless — the MapWorker's own ctor argument (the serialized
    map transformer) is object-store-resident even for a trivial UDF
    class with no args (reproduced). What this packing fixes is the
    USER-payload half of the hazard; tests
    (test_bpe_encode_survives_actor_death) kill an encode actor
    mid-stream with os._exit and the job completes with correct
    output."""
    import json
    import zlib

    return zlib.compress(
        json.dumps({"m": [list(p) for p in merges], "v": vocab}).encode(), 6
    )


def _unpack_tokenizer(blob: bytes):
    import json
    import zlib

    d = json.loads(zlib.decompress(blob).decode())
    return [tuple(p) for p in d["m"]], d["v"]


class BpeEncoder:
    """Actor-pool encode stage: merge ranks built once per actor in
    ``__init__`` (never shipped per batch) plus a persistent
    word -> pieces cache that accumulates across batches — each batch
    pays only for its new distinct words (factorize -> encode uniques
    -> scatter). Output: ``(id_col, pieces: list<string>,
    n_pieces: int32)`` per document.

    ``merges`` may be the packed bytes blob from :func:`_pack_tokenizer`
    (what the pipeline wrappers pass, restart-safe) or a plain merge
    list (direct/test use)."""

    def __init__(self, merges, id_col: str = "doc_id",
                 text_col: str = "text", end_marker: str = END_MARKER,
                 vocab: dict | None = None, source_col: str | None = None):
        if isinstance(merges, (bytes, bytearray)):
            merges, packed_vocab = _unpack_tokenizer(merges)
            vocab = vocab if vocab is not None else packed_vocab
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.id_col, self.text_col, self.end_marker = id_col, text_col, end_marker
        self.cache: dict = {}
        # id mode (bpe_encode_ids): emit the lake's tokenized-sequence
        # schema instead of string pieces
        self.vocab = vocab
        self.unk_id = vocab.get(UNK, 0) if vocab is not None else 0
        self.source_col = source_col

    def _pieces_of(self, word: str) -> tuple:
        got = self.cache.get(word)
        if got is None:
            got = encode_word(word, self.ranks, self.end_marker)
            self.cache[word] = got
        return got

    def __call__(self, df: pd.DataFrame) -> pa.Table:
        n_docs = len(df)
        lists = df[self.text_col].str.split(" ")
        flat = lists.explode()
        mask = flat.notna() & (flat != "")
        kept = flat[mask]
        flat_w = kept.to_numpy()
        # positional doc row per token (explode is doc-major, so tokens
        # of a doc are contiguous and in order)
        doc_pos = df.index.get_indexer(kept.index)
        if len(flat_w):
            codes, uniq = pd.factorize(flat_w)
        else:
            codes, uniq = np.array([], np.int64), []
        # O(new distinct words) Python — everything below is vectorized
        enc = [self._pieces_of(w) for w in uniq]
        u_lens = np.array([len(e) for e in enc], np.int64)
        flat_u = (
            np.concatenate([np.asarray(e, object) for e in enc])
            if enc
            else np.array([], object)
        )
        u_off = np.zeros(len(enc) + 1, np.int64)
        np.cumsum(u_lens, out=u_off[1:])
        # ragged gather: token t copies flat_u[u_off[c_t] : +l_t] to its slot
        tok_lens = u_lens[codes]
        out_start = np.zeros(len(codes) + 1, np.int64)
        np.cumsum(tok_lens, out=out_start[1:])
        total = int(out_start[-1])
        idx = np.repeat(u_off[codes] - out_start[:-1], tok_lens) + np.arange(total)
        pieces_flat = flat_u[idx] if total else np.array([], object)
        per_doc = np.bincount(doc_pos, weights=tok_lens, minlength=n_docs).astype(np.int64)
        doc_off = np.zeros(n_docs + 1, np.int64)
        np.cumsum(per_doc, out=doc_off[1:])
        if self.vocab is not None:
            ids = (
                pd.Series(pieces_flat).map(self.vocab).fillna(self.unk_id).to_numpy(np.int32)
                if total
                else np.array([], np.int32)
            )
            tokens = pa.ListArray.from_arrays(
                pa.array(doc_off, pa.int32()), pa.array(ids, pa.int32())
            )
            cols = {
                self.id_col: pa.array(df[self.id_col].to_numpy()),
                "tokens": tokens,
                "n_tok": pa.array(per_doc.astype(np.int32)),
            }
            if self.source_col is not None:
                cols["source"] = pa.array(df[self.source_col].astype(object), pa.string())
            return pa.table(cols)
        pieces_arr = pa.ListArray.from_arrays(
            pa.array(doc_off, pa.int32()), pa.array(pieces_flat, pa.string())
        )
        return pa.table(
            {
                self.id_col: pa.array(df[self.id_col].to_numpy()),
                "pieces": pieces_arr,
                "n_pieces": pa.array(per_doc.astype(np.int32)),
            }
        )


def bpe_encode(ds, merges, id_col: str = "doc_id", text_col: str = "text",
               concurrency=None):
    """Distributed BPE encode: documents stream through a
    :class:`BpeEncoder` actor pool (ranks + cache once per actor).
    Default pool bounds leave one CPU free for the upstream read
    (config.actor_pool_free)."""
    if concurrency is None:
        from clever_canal_ray.config import actor_pool_free

        concurrency = actor_pool_free(lo=2)
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={
            "merges": _pack_tokenizer(merges),
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )


UNK = "<unk>"


def bpe_vocab(word_counts: pd.DataFrame, merges: list[tuple[str, str]],
              end_marker: str = END_MARKER) -> dict[str, int]:
    """Deterministic piece -> id vocabulary: ``<unk>`` = 0, the end
    marker = 1, then every character seen in the training histogram
    (sorted), then merged symbols in merge order. Encoding a corpus
    disjoint from the histogram can hit unseen characters — those
    pieces map to ``<unk>`` (byte-fallback is a tokenizer-design
    choice out of scope here)."""
    chars = sorted({c for w in word_counts["w"] for c in str(w)})
    vocab: dict[str, int] = {UNK: 0, end_marker: 1}
    for c in chars:
        if c not in vocab:
            vocab[c] = len(vocab)
    for a, b in merges:
        s = a + b
        if s not in vocab:
            vocab[s] = len(vocab)
    return vocab


def bpe_encode_ids(
    ds,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str | None = None,
    concurrency=None,
):
    """Encode a text corpus into THE tokenized-sequence table this
    engine's lake maintains (BASELINE.json input_hint:
    ``doc_id, tokens: array<int32>, n_tok: int32, source``) — the
    text-side on-ramp: raw documents -> trained BPE -> the exact
    payload schema `Lake.create_from_dataset` ingests and CDC replay
    then keeps fresh. Same cached actor pool as :func:`bpe_encode`;
    pieces map to vocab ids vectorized (unknowns -> ``<unk>``)."""
    if concurrency is None:
        from clever_canal_ray.config import actor_pool_free

        concurrency = actor_pool_free(lo=2)
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={
            "merges": _pack_tokenizer(merges, vocab),
            "id_col": id_col,
            "text_col": text_col,
            "source_col": source_col,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )


def save_tokenizer(path: str, merges: list[tuple[str, str]], vocab: dict[str, int] | None = None) -> None:
    """Persist a trained tokenizer as one JSON artifact (merges in rank
    order + optional piece->id vocab) — atomic replace so a concurrent
    reader never sees a torn file."""
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"format": "clever_canal_ray.bpe.v1",
             "end_marker": END_MARKER,
             "merges": [list(m) for m in merges],
             "vocab": vocab},
            fh,
        )
    os.replace(tmp, path)


def load_tokenizer(path: str) -> tuple[list[tuple[str, str]], dict[str, int] | None]:
    import json

    with open(path) as fh:
        d = json.load(fh)
    if d.get("format") != "clever_canal_ray.bpe.v1":
        raise ValueError(f"{path}: not a clever_canal_ray BPE tokenizer file")
    return [tuple(m) for m in d["merges"]], d.get("vocab")
