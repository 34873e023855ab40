"""Distributed keyword retrieval (BM25) over a corpus Dataset.

The keyword-search counterpart of the embedding ANN family
(functions/ann.py): score every document against a SMALL set of
queries and return the global top-k per query. Training-data uses:
relevance-targeted subset mining, decontamination probes ("which
corpus docs match this eval question"), and quality auditing.

100-TB shape — no shuffle at all:
  PASS 1 (corpus stats): per-batch constant-size partials — document
    count, total token count, and document frequency for the QUERY
    TERMS ONLY (never the full vocabulary; df of other words is not
    needed) — summed on the driver (blocks × (T+2) scalars).
  PASS 2 (score): the (terms, idf, avgdl) table broadcasts once via
    ``ray.put``; each batch computes its docs' tf over the query-term
    slots (one factorize + bincount — vectorized, no per-row Python),
    BM25-scores all queries at once with a (docs × T) @ (T × Q)
    matmul, and emits only its LOCAL top-k rows per query. The driver
    finalizes over blocks × Q × k candidate rows.

Tokenization is the engine's word convention (single-space split —
``pc.split_pattern(text, ' ')``), matching the unigram-LM scorer and
its SQL mirror. Scores use the Lucene BM25 idf
``ln(1 + (N - df + .5)/(df + .5))`` and ship as ``score_e6``
(×1e6, half-up int64) so ordering is tie-stable and SQL-mirrorable;
rank ties break by doc_id. Only documents containing at least one
query term are returned (classic top-k retrieval semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _query_terms(queries: list[tuple[str, str]]) -> tuple[np.ndarray, np.ndarray]:
    """Sorted distinct term array + (Q × T) query-membership matrix."""
    per_q = [sorted(set(q.split(" "))) for _, q in queries]
    terms = np.array(sorted({t for ts in per_q for t in ts}), dtype=object)
    m = np.zeros((len(queries), len(terms)), dtype=np.float64)
    for qi, ts in enumerate(per_q):
        m[qi, np.searchsorted(terms, np.array(ts, dtype=object))] = 1.0
    return terms, m


def _term_slots(texts: pa.ChunkedArray | pa.Array, terms: np.ndarray):
    """Per-batch flat token → query-term slot mapping.

    Returns (doc lengths, flat doc index of matching tokens, flat term
    slot of matching tokens) — everything later stages need, one
    factorize per batch. (Same clamped-searchsorted membership kernel
    as text.lm_nll_batch — kept separate because that one is a
    hash-gated path; a change there must not ripple here and vice
    versa.)"""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_null(texts.type):  # all-null block infers type null
        texts = texts.cast(pa.string())
    texts = pc.fill_null(texts, "")  # null text scores like empty text
    split = pc.split_pattern(texts, pattern=" ")
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = split.flatten().to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(flat)
    pos = np.searchsorted(terms, uniq)
    pos_c = np.minimum(pos, len(terms) - 1)
    hit = (pos < len(terms)) & (terms[pos_c] == uniq)
    slot_u = np.where(hit, pos_c, -1)
    slot_flat = slot_u[codes]
    doc_flat = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    mask = slot_flat >= 0
    return lens, doc_flat[mask], slot_flat[mask]


def bm25_topk(
    ds,
    queries: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """Global BM25 top-k per query over a corpus Dataset.

    ``queries``: small driver-side list of (query_id, query_text).
    Returns an arrow table (query_id, rank, doc_id, score_e6), rank
    1-based by (score_e6 desc, doc_id asc).
    """
    import ray

    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except Exception:
        id_type = pa.string()

    def _empty() -> pa.Table:
        return pa.table(
            {"query_id": pa.array([], pa.string()), "rank": pa.array([], pa.int64()),
             "doc_id": pa.array([], id_type), "score_e6": pa.array([], pa.int64())}
        )

    if not queries:
        return _empty()
    terms, qmat = _query_terms(queries)
    T = len(terms)

    # ---- PASS 1: N, total length, df per query term (no shuffle) ----
    def stats_partial(t: pa.Table) -> pa.Table:
        lens, doc_f, slot_f = _term_slots(t[text_col], terms)
        upairs = np.unique(doc_f * T + slot_f)  # distinct (doc, term)
        df_part = np.bincount(upairs % T, minlength=T).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(lens)], pa.int64()),
                "tot": pa.array([int(lens.sum())], pa.int64()),
                "df": pa.array([df_part.tolist()], pa.list_(pa.int64())),
            }
        )

    parts = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n"].sum())
    if n_docs == 0:
        return _empty()
    avgdl = float(parts["tot"].sum()) / n_docs
    df = np.sum(np.stack(parts["df"].to_numpy()), axis=0).astype(np.float64)
    idf = np.log1p((n_docs - df + 0.5) / (df + 0.5))  # Lucene BM25 idf
    ref = ray.put((terms, idf, qmat, avgdl))

    # ---- PASS 2: per-batch score + local top-k (broadcast read) ----
    def score_block(t: pa.Table, k1=k1, b=b, k=k) -> pa.Table:
        terms_b, idf_b, qmat_b, avgdl_b = ray.get(ref)
        lens, doc_f, slot_f = _term_slots(t[text_col], terms_b)
        n = len(lens)
        tf = np.bincount(doc_f * len(terms_b) + slot_f, minlength=n * len(terms_b))
        tf = tf.reshape(n, len(terms_b)).astype(np.float64)
        norm = k1 * (1.0 - b + b * (lens / avgdl_b))[:, None]
        contrib = idf_b[None, :] * (tf * (k1 + 1.0)) / (tf + norm)
        scores = contrib @ qmat_b.T  # (docs × Q)
        ids = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        # local selection must use the SAME key as the driver final —
        # (score_e6 desc, doc_id asc) — or a tie straddling the local-k
        # boundary would make the result depend on block layout
        id_rank = np.empty(len(t), dtype=np.int64)
        id_rank[np.argsort(ids.to_numpy(zero_copy_only=False), kind="stable")] = np.arange(len(t))
        e6 = np.floor(scores * 1e6 + 0.5).astype(np.int64)
        out_q, out_i, out_s = [], [], []
        for qi, (query_id, _) in enumerate(queries):
            col = e6[:, qi]
            nz = np.nonzero(col > 0)[0]
            if len(nz) > k:
                order = np.lexsort((id_rank[nz], -col[nz]))[:k]
                nz = nz[order]
            out_q.extend([query_id] * len(nz))
            out_i.extend(nz.tolist())
            out_s.extend(col[nz].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.string()),
                # take preserves the input id type (string, int, ...)
                "doc_id": ids.take(pa.array(out_i, pa.int64())),
                "score_e6": pa.array(np.asarray(out_s, np.int64)),
            }
        )

    cand = ds.map_batches(score_block, batch_format="pyarrow").take_all()
    if not cand:
        return _empty()
    # driver final over ≤ blocks × Q × k candidate rows
    cdf = pd.DataFrame(cand, columns=["query_id", "doc_id", "score_e6"])
    cdf = cdf.sort_values(
        ["query_id", "score_e6", "doc_id"], ascending=[True, False, True]
    )
    cdf = cdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    cdf["rank"] = cdf.groupby("query_id", sort=False).cumcount() + 1
    return pa.Table.from_pydict(
        {
            "query_id": pa.array(cdf["query_id"].to_numpy(dtype=object), pa.string()),
            "rank": pa.array(cdf["rank"].to_numpy(np.int64)),
            # infer from the candidate values (the schema()-derived
            # id_type is only trusted for the typed-empty paths)
            "doc_id": pa.array(cdf["doc_id"].tolist()),
            "score_e6": pa.array(cdf["score_e6"].to_numpy(np.int64)),
        }
    )


def bm25_topk_serial(
    texts: list[str],
    ids: list[str],
    queries: list[tuple[str, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> pd.DataFrame:
    """Per-row reference implementation (tests fuzz the batch kernel
    against it — same formula, per-document Python loop)."""
    import math
    from collections import Counter

    toks = [t.split(" ") for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    rows = []
    for query_id, q in queries:
        terms = sorted(set(q.split(" ")))
        df = {t: sum(1 for d in toks if t in d) for t in terms}
        scored = []
        for d_id, d in zip(ids, toks):
            c = Counter(d)
            s = 0.0
            for t in terms:
                tf = c.get(t, 0)
                if tf == 0:
                    continue
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(d) / avgdl))
            s_e6 = math.floor(s * 1e6 + 0.5)
            if s_e6 > 0:  # same cut as the distributed kernel
                scored.append((s_e6, d_id))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for r, (s_e6, d_id) in enumerate(scored[:k], 1):
            rows.append({"query_id": query_id, "rank": r, "doc_id": d_id, "score_e6": s_e6})
    return pd.DataFrame(rows)
