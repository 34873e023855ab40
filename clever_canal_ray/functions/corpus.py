"""Corpus-level statistics and training-set assembly operators.

These are the "whole-corpus" training-data ops a 100 TB pipeline needs
beyond per-document transforms (functions/text.py): vocabulary
statistics, deterministic sampling, group-wise selection, exact
distribution quantiles, and sequence packing (the concat-and-chunk step
that turns a tokenized corpus into fixed-length LM training windows).

Design rules (SURVEY.md §4):
- every per-batch body is vectorized pandas/numpy;
- every wide step pre-aggregates inside ``map_batches`` before its one
  bucketed shuffle (stages/agg.bucketed_groupby), so shuffle volume is
  O(distinct keys per batch), never O(rows);
- driver-side state is bounded (top-k candidates, bucket partial sums,
  distinct histogram values) — never the corpus.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from clever_canal_ray.stages.agg import bucketed_groupby


def token_histogram(ds, text_col: str = "text", top_n: int = 100, num_buckets: int = 32):
    """Corpus vocabulary: top-``top_n`` whitespace tokens by frequency.

    Partial-aggregation topology: per-batch ``value_counts`` (rows out
    ≤ distinct words per batch) → one bucketed shuffle on the word →
    per-bucket vectorized sum + LOCAL top-n → driver-side final top-n
    over ≤ num_buckets × top_n candidate rows. A word's global rank can
    only be ≥ its in-bucket rank, so per-bucket top-n never drops a
    global top-n word.

    Tie-break: count desc, word asc (mirrors the SQL oracle's
    ``ORDER BY n DESC, word LIMIT top_n``).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = df[text_col].str.split(" ").explode().value_counts()
        return pd.DataFrame({"word": counts.index.to_numpy(dtype=object), "n": counts.to_numpy()})

    def merge_partials(df: pd.DataFrame) -> pd.DataFrame:
        sums = df.groupby("word", sort=False)["n"].sum().reset_index()
        return sums.sort_values(["n", "word"], ascending=[False, True], kind="mergesort").head(top_n)

    cand = bucketed_groupby(ds, ["word"], partial, merge_partials, num_buckets=num_buckets)
    out = (
        cand.to_pandas()
        .sort_values(["n", "word"], ascending=[False, True], kind="mergesort")
        .head(top_n)
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


def _md5_u64(values) -> np.ndarray:
    """Little-endian low 8 bytes of md5(str(v)) — exactly DuckDB's
    ``md5_number_lower(CAST(v AS VARCHAR))`` — as a uint64 vector.
    Per-row Python hashing (~1 µs/row): the cross-engine MIRROR kernel,
    used only when ``mirror=True`` (oracle-checked gates); full-corpus
    passes default to ``_fast_u64``."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:16], "little")
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — pure numpy uint64 ops (wraparound
    multiply), full-avalanche 64-bit mix; the integer-id fast hash."""
    x = np.asarray(x).astype(np.uint64)
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _fast_u64(values) -> np.ndarray:
    """C-speed deterministic 64-bit hash: numpy splitmix64 for integer
    ids, pandas ``util.hash_array`` (fixed default hash key) for
    strings — both stable across processes, runs, and cluster sizes.
    NOT DuckDB-mirrorable; the default kernel for full-corpus
    deterministic sampling/routing (BASELINE.md microbench: ~170×
    ``_md5_u64`` on 1M int ids, ~13× on 1M short strings)."""
    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        return pd.util.hash_array(np.asarray(arr, dtype=object), categorize=False)
    with np.errstate(over="ignore"):
        return _splitmix64(arr)


def _hash_u64(values, mirror: bool) -> np.ndarray:
    return _md5_u64(values) if mirror else _fast_u64(values)


def hash_sample(ds, id_col: str, denom: int, select_rem: int = 0, mirror: bool = False):
    """Deterministic hash sampling: keep rows where
    ``hash(id) % denom == select_rem``.

    No RNG state, no seed shipping; the id IS the seed — reproducible
    across runs and cluster sizes at any parallelism. ``mirror=True``
    switches the hash to DuckDB's ``md5_number_lower`` (see
    ``_md5_u64``) so an external SQL engine can reproduce the exact
    sample — the oracle-gate mode; the default is the C-speed
    ``_fast_u64``. Embarrassingly parallel: pure per-batch filter, no
    shuffle.
    """
    denom_u = np.uint64(denom)
    rem_u = np.uint64(select_rem)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[(_hash_u64(df[id_col], mirror) % denom_u) == rem_u]

    return ds.map_batches(keep, batch_format="pandas")


def shard_positions(ds, id_col: str, num_shards: int = 16, num_buckets: int = 64, mirror: bool = False):
    """Deterministic training-shard assignment with exact within-shard
    positions — a distributed ``row_number() OVER (PARTITION BY shard
    ORDER BY h, id)`` (the op behind writing globally-shuffled training
    shards where every row needs its slot).

    ``shard = hash(id) % num_shards`` (``mirror=True`` = the DuckDB
    md5 hash for oracle gates, default = C-speed ``_fast_u64``); within
    a shard rows are totally ordered by ``(h, id)``. Two passes, both
    scale-safe:

    1. count pass — per-batch ``(shard, coarse_bucket)`` counts, where
       ``coarse_bucket`` is the top ``log2(num_buckets)`` bits of ``h``
       (so buckets partition the ``(h, id)`` order). Only the
       ``num_shards × num_buckets`` count matrix reaches the driver,
       never rows; prefix sums per shard give each bucket's base rank.
    2. rank pass — shuffle by coarse bucket (bounded group count),
       local sort + per-shard cumcount + the tiny broadcast offset
       table merged in vectorized.

    The input is re-read for pass 2 (Dataset lineage re-executes); the
    hash is recomputed rather than materializing pass-1 output.
    """
    shift_bits = 64 - int(np.log2(num_buckets))
    if 1 << (64 - shift_bits) != num_buckets:
        raise ValueError("num_buckets must be a power of two")
    shift = np.uint64(shift_bits)

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = _hash_u64(df[id_col], mirror)
        df["__h"] = h
        df["__shard"] = (h % np.uint64(num_shards)).astype(np.int64)
        df["__bucket"] = (h >> shift).astype(np.int64)
        return df

    annotated = ds.map_batches(annotate, batch_format="pandas")

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["__shard", "__bucket"], sort=False).size().reset_index(name="n")
        )

    cnt = annotated.map_batches(partial_counts, batch_format="pandas").to_pandas()
    if len(cnt):
        cnt = cnt.groupby(["__shard", "__bucket"], sort=True)["n"].sum().reset_index()
        cnt["__base"] = cnt.groupby("__shard")["n"].cumsum() - cnt["n"]
    else:
        cnt["__base"] = pd.Series([], dtype="int64")
    offsets = cnt[["__shard", "__bucket", "__base"]]  # ≤ shards×buckets rows

    def rank_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["__shard", "__h", id_col]).reset_index(drop=True)
        g["pos"] = g.groupby("__shard", sort=False).cumcount()
        g = g.merge(offsets, on=["__shard", "__bucket"], how="left")
        g["pos"] = (g["pos"] + g["__base"]).astype("int64")
        g["shard"] = g["__shard"].astype("int64")
        return g.drop(columns=["__h", "__bucket", "__shard", "__base"])

    return annotated.groupby("__bucket").map_groups(rank_bucket, batch_format="pandas")


class Decontaminator:
    """Train/eval decontamination: flag training documents sharing any
    word ``n``-gram with a (small) benchmark/eval set.

    The eval side is broadcast: the driver collects the eval docs'
    distinct n-grams ONCE (eval sets are small by definition — a
    benchmark is KBs–MBs, not the corpus), ``ray.put``s the frozenset,
    and every actor pulls it once in ``__init__`` (never re-shipped per
    batch). The training side is a pure per-batch map — no shuffle, no
    all-pairs; the corpus streams.

    A doc with fewer than ``n`` tokens contributes its whole text as
    one gram (mirrors the MinHash shingle rule).
    """

    def __init__(self, eval_grams_ref, n: int = 5):
        import ray

        self.eval_grams = ray.get(eval_grams_ref)
        self.n = n

    @staticmethod
    def build_eval_grams(texts, n: int = 5) -> frozenset:
        """Distinct n-grams of the eval texts (driver-side, small)."""
        from clever_canal_ray.functions.text import _flat_tokens, _ngrams

        s = pd.Series(list(texts), dtype=object)
        codes, flat = _flat_tokens(s)
        _, grams = _ngrams(codes, flat, n)
        short = {t for t in s if len(t.split(" ")) < n}
        return frozenset(grams.tolist()) | short

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from clever_canal_ray.functions.text import _flat_tokens, _ngrams

        batch = batch.reset_index(drop=True)
        codes, flat = _flat_tokens(batch["text"])
        gdoc, grams = _ngrams(codes, flat, self.n)
        hits = np.zeros(len(batch), dtype=np.int64)
        if len(grams):
            df = pd.DataFrame({"d": gdoc, "g": grams}).drop_duplicates()
            hit = df["g"].isin(self.eval_grams)
            agg = df.loc[hit].groupby("d", sort=False).size()
            hits[agg.index.to_numpy()] = agg.to_numpy()
        # short docs: whole text is the single gram
        n_tok = batch["text"].str.split(" ").str.len().to_numpy()
        short = n_tok < self.n
        if short.any():
            hits[short] = batch["text"][short].isin(self.eval_grams).to_numpy().astype(np.int64)
        out = batch[["doc_id"]].copy()
        out["n_hits"] = hits
        out["contaminated"] = (hits > 0).astype("int32")
        return out


def decontaminate(ds, eval_texts, n: int = 5, concurrency: int = 4):
    """Decontamination pipeline: broadcast the eval-set n-grams, then an
    actor-pool ``map_batches`` marks each training doc with its distinct
    eval-gram hit count. Returns (doc_id, n_hits, contaminated).

    The pool is clamped to cluster_CPUs - 1: Ray 2.49's streaming
    executor deadlocks when a fixed actor pool claims every CPU (the
    non-actor stages can never schedule).
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 2)) if ray.is_initialized() else 2
    concurrency = max(1, min(concurrency, cpus - 1))
    ref = ray.put(Decontaminator.build_eval_grams(eval_texts, n))
    return ds.map_batches(
        Decontaminator,
        fn_constructor_args=(ref, n),
        batch_format="pandas",
        concurrency=concurrency,
    )


def stratified_sample(ds, rates_permille: dict, source_col: str, id_col: str, mirror: bool = False):
    """Domain-mixing sampler: keep each row with a per-source rate
    (permille), decided by a deterministic salted hash of the row id —
    ``hash(f"{id}:{source}") % 1000 < rate``. ``mirror=True`` = DuckDB
    mirror hash: ``md5_number_lower(CAST(id AS VARCHAR) || ':' ||
    source) % 1000`` (the oracle-gate mode; default = C-speed hash).

    The rate table is a tiny dict in the task closure (broadcast once
    per task by Ray); the op is a pure per-batch filter — no shuffle,
    no RNG state, reproducible at any parallelism. Sources absent from
    the table default to rate 0 (dropped), the conservative choice for
    an unknown domain. The salt key is built with vectorized pandas
    string concat; only the mirror path pays per-row md5.
    """

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        keys = (
            df[id_col].astype(str).str.cat(df[source_col].astype(str), sep=":").to_numpy(dtype=object)
        )
        h = _hash_u64(keys, mirror)
        rates = df[source_col].map(rates_permille).fillna(0).to_numpy(dtype=np.int64)
        return df[(h % np.uint64(1000)).astype(np.int64) < rates]

    return ds.map_batches(keep, batch_format="pandas")


def mix_rates(
    ds,
    weights: dict[str, float],
    source_col: str = "source",
    tokens_col: str = "n_tok",
    total_tokens: float | None = None,
    max_sources: int = 100_000,
) -> dict:
    """Per-source keep-rates (permille) for a target token MIX — the
    domain-reweighting step of training-data assembly (compute rates
    here, apply them with :func:`stratified_sample` / :func:`mix_sample`).

    One streaming pass computes each source's available tokens A_s
    (per-batch partial sums: rows out ≤ sources per batch, no shuffle;
    the final merge handles ≤ ``max_sources`` rows on the driver — the
    dimension-column assumption, guarded). Weights are normalized; the
    target for source s is w_s × B. With ``total_tokens=None``, B is
    the largest budget achievable WITHOUT upsampling, min_s A_s / w_s:
    the binding source keeps everything (rate 1000) and the rest
    downsample to match the mix. An explicit ``total_tokens`` beyond a
    source's supply caps that source at 1000 and reports the shortfall
    in ``deficit`` — this sampler never duplicates rows. Rates floor to
    permille, so realized shares can undershoot a target by <0.1%.

    Returns ``{"rates_permille", "budget_tokens", "available",
    "target", "deficit"}``.
    """
    return _mix_rates(ds, weights, source_col, tokens_col, total_tokens, max_sources, False, 0)


def _mix_rates(
    ds,
    weights,
    source_col,
    tokens_col,
    total_tokens,
    max_sources,
    allow_upsampling: bool,
    max_rate_permille: int,
) -> dict:
    w = {str(k): float(v) for k, v in weights.items() if float(v) > 0}
    if not w:
        raise ValueError("mix_rates: at least one positive weight required")
    tot_w = sum(w.values())
    w = {k: v / tot_w for k, v in w.items()}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(source_col, dropna=False)[tokens_col].sum().reset_index()
        g.columns = ["source", "tok"]
        return g

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts["source"].nunique() > max_sources:
        raise ValueError(
            f"mix_rates: {parts['source'].nunique()} distinct sources "
            f"(> max_sources={max_sources}) — {source_col!r} is not a "
            "dimension column; aggregate upstream or raise the cap"
        )
    avail = parts.groupby("source")["tok"].sum().astype(float).to_dict()
    dry = [s for s in w if avail.get(s, 0.0) <= 0]
    if dry:
        raise ValueError(f"mix_rates: weighted sources with no tokens: {sorted(dry)}")
    b_max = min(avail[s] / w[s] for s in w)
    budget = float(total_tokens) if total_tokens is not None else b_max
    rates: dict[str, int] = {}
    target: dict[str, float] = {}
    deficit: dict[str, float] = {}
    for s, ws in w.items():
        t = ws * budget
        target[s] = t
        # +1e-9 absorbs IEEE dust so the binding source (t == avail_s up
        # to rounding) lands exactly on 1000 instead of flooring to 999
        r = int(1000.0 * t / avail[s] + 1e-9)
        if allow_upsampling:
            if r > max_rate_permille:
                raise ValueError(
                    f"mix_rates: source {s!r} would repeat {r / 1000:.1f} "
                    f"epochs (> max_rate_permille={max_rate_permille}‰) — "
                    "lower its weight/budget or raise the cap"
                )
            rates[s] = r
        else:
            rates[s] = min(1000, r)
            if t > avail[s]:
                deficit[s] = t - avail[s]
    return {
        "rates_permille": rates,
        "budget_tokens": budget,
        "available": {s: avail[s] for s in w},
        "target": target,
        "deficit": deficit,
    }


def stratified_sample_epochs(ds, rates_permille: dict, source_col: str, id_col: str, mirror: bool = False):
    """:func:`stratified_sample` generalized to rates ABOVE 1000‰ —
    the upsampling half of data mixing (a scarce domain repeated for
    several epochs). A row with rate r is kept ``r // 1000`` times in
    full plus once more with probability ``(r % 1000)/1000``; output
    rows carry an ``epoch`` int column (0-based copy index) so a later
    global shuffle can interleave the copies. Epoch 0 uses exactly the
    :func:`stratified_sample` key (bit-identical keeps at r ≤ 1000);
    epoch e ≥ 1 salts the hash with ``#e{e}`` so fractional epochs
    draw independent row subsets. Deterministic at any parallelism."""

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        rates = df[source_col].map(rates_permille).fillna(0).to_numpy(dtype=np.int64)
        base = df[id_col].astype(str).str.cat(df[source_col].astype(str), sep=":")
        out = []
        for e in range(int(rates.max() // 1000 + 1) if len(df) else 0):
            thr = rates - 1000 * e  # this epoch's permille for each row
            full = thr >= 1000
            frac = (thr > 0) & ~full
            sel = full
            if frac.any():
                keys = (base + f"#e{e}" if e else base).to_numpy(dtype=object)
                h = (_hash_u64(keys, mirror) % np.uint64(1000)).astype(np.int64)
                sel = full | (frac & (h < thr))
            if sel.any():
                part = df[sel].copy()
                part["epoch"] = np.int64(e)
                out.append(part)
        if not out:
            part = df.head(0).copy()
            part["epoch"] = pd.Series([], dtype="int64")
            return part
        return pd.concat(out, ignore_index=True)

    return ds.map_batches(keep, batch_format="pandas")


def mix_sample(
    ds,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tok",
    total_tokens: float | None = None,
    mirror: bool = False,
    allow_upsampling: bool = False,
    max_rate_permille: int = 10_000,
):
    """One-call domain mixing: :func:`mix_rates` → :func:`stratified_
    sample`. Two streaming passes over ``ds`` (a tiny per-source token
    aggregate, then the hash-deterministic filter — no shuffle in
    either). Returns ``(sampled_ds, rates_info)``; sources outside
    ``weights`` are dropped (rate 0).

    ``allow_upsampling=True`` lets a scarce domain repeat (rates above
    1000‰, applied with :func:`stratified_sample_epochs`; output rows
    gain an ``epoch`` column and ``deficit`` stays empty). The epoch
    count per source is capped at ``max_rate_permille/1000`` — beyond
    ~10 epochs the duplication itself is usually the bug."""
    info = _mix_rates(
        ds, weights, source_col, tokens_col, total_tokens,
        100_000, allow_upsampling, max_rate_permille,
    )
    sampler = stratified_sample_epochs if allow_upsampling else stratified_sample
    out = sampler(
        ds, info["rates_permille"], source_col=source_col, id_col=id_col, mirror=mirror
    )
    return out, info


def span_dedup(ds, id_col: str = "doc_id", text_col: str = "text", span_tokens: int = 10, num_buckets: int = 64):
    """C4/RefinedWeb-style span-level dedup decision: cut each document
    into non-overlapping ``span_tokens``-token windows (the last window
    may be short); across the WHOLE corpus the first occurrence of each
    span text — min ``(doc_id, span_idx)`` — is kept, every later
    occurrence is flagged duplicate. Returns one row per span:
    ``(doc_id, span_idx, kept)``.

    Topology: spans (≈ tokens/span_tokens rows, ~10× smaller than the
    token stream) shuffle ONCE, bucketed by span text; the
    first-occurrence decision is a vectorized stable sort +
    ``duplicated`` per bucket. No all-pairs, no driver materialization
    — the per-doc rebuild (drop duplicate spans, re-join) is a second
    shuffle by doc_id if a caller wants the filtered text.
    """
    from clever_canal_ray.functions.text import _flat_tokens

    def explode_spans(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        codes, flat = _flat_tokens(df[text_col])
        if len(flat) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "span_idx": pd.Series([], dtype="int64"),
                 "span": pd.Series([], dtype=object)}
            )
        n = len(flat)
        idx = np.arange(n)
        new_doc = np.r_[True, codes[1:] != codes[:-1]]
        run_starts = idx[new_doc]
        start = np.repeat(run_starts, np.diff(np.r_[run_starts, n]))
        span_idx = (idx - start) // span_tokens
        sp = pd.DataFrame({"__row": codes, "span_idx": span_idx, "tok": flat})
        spans = (
            sp.groupby(["__row", "span_idx"], sort=False)["tok"]
            .agg(" ".join)
            .reset_index(name="span")
        )
        spans["doc_id"] = df[id_col].to_numpy()[spans["__row"].to_numpy()]
        return spans[["doc_id", "span_idx", "span"]].astype(
            {"doc_id": "int64", "span_idx": "int64"}
        )

    def first_occurrence(df: pd.DataFrame) -> pd.DataFrame:
        order = df.sort_values(["span", "doc_id", "span_idx"], kind="mergesort")
        order["kept"] = (~order.duplicated("span")).astype("int32")
        return order[["doc_id", "span_idx", "kept"]]

    spans_ds = ds.map_batches(explode_spans, batch_format="pandas")
    return bucketed_groupby(
        spans_ds, ["span"], lambda df: df, first_occurrence, num_buckets=num_buckets
    )


def topk_per_group(
    ds,
    group_col: str,
    score_col: str,
    k: int,
    tie_col: str,
    num_buckets: int = 32,
):
    """Group-wise top-k selection (e.g. k best-quality docs per source).

    Per-batch local top-k per group (rows out ≤ groups-in-batch × k) →
    one bucketed shuffle on the group → per-bucket final top-k. Order:
    ``score_col`` desc, ``tie_col`` asc — deterministic under ties.
    """

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values([score_col, tie_col], ascending=[False, True], kind="mergesort")
        return s.groupby(group_col, sort=False).head(k)

    return bucketed_groupby(ds, [group_col], local_topk, local_topk, num_buckets=num_buckets)


def exact_quantiles(
    ds, col: str, qs: list[float], num_buckets: int = 16, max_distinct: int = 2_000_000
) -> pd.DataFrame:
    """EXACT distribution quantiles via a distributed value histogram.

    Scale assumption (ENFORCED, not advisory): the column's
    DISTINCT-value count is bounded (ints, scores, lengths — token
    counts at 100 TB still have ~10^5 distinct values), so the merged
    (value, count) histogram fits the driver even when the row count
    does not. The histogram size is counted distributed BEFORE the
    driver pull and a ``ValueError`` points to :func:`approx_quantiles`
    (constant-size partials) when it exceeds ``max_distinct``.
    Topology: per-batch ``value_counts`` partial → one bucketed shuffle
    on value → per-bucket sum → driver merge + scan.

    Quantile rule = SQL ``percentile_disc``: the smallest value whose
    cumulative fraction ≥ q.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = df[col].value_counts()
        return pd.DataFrame({"value": counts.index.to_numpy(), "n": counts.to_numpy()})

    def merge_partials(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("value", sort=False)["n"].sum().reset_index()

    hist_ds = bucketed_groupby(
        ds, ["value"], partial, merge_partials, num_buckets=num_buckets
    ).materialize()
    n_distinct = hist_ds.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"exact_quantiles: column {col!r} has {n_distinct} distinct values "
            f"(> max_distinct={max_distinct}); the merged histogram would not fit "
            "the driver — use approx_quantiles for unbounded-cardinality columns"
        )
    hist = hist_ds.to_pandas().sort_values("value").reset_index(drop=True)
    total = int(hist["n"].sum()) if len(hist) else 0
    if total == 0:
        # empty input: no value can satisfy any quantile
        return pd.DataFrame({"q": pd.Series([], dtype="float64"), "value": pd.Series([], dtype="float64")})
    cum = hist["n"].cumsum().to_numpy()
    rows = []
    for q in qs:
        # smallest value with cum_count/total >= q  (ceil with float guard)
        threshold = math.ceil(q * total - 1e-9)
        idx = int(np.searchsorted(cum, threshold, side="left"))
        rows.append((float(q), hist["value"].iloc[idx]))
    return pd.DataFrame(rows, columns=["q", "value"])


def pack_sequences(
    ds,
    order_col: str,
    n_tok_col: str,
    ctx: int,
    bucket_size: int = 65_536,
):
    """Sequence packing (concat-and-chunk): lay the corpus's token
    streams end-to-end in ``order_col`` order and cut fixed ``ctx``-size
    training windows; emit each row's global token offset and the
    window range it lands in.

    This is the LM-training assembly step: window w holds tokens
    [w*ctx, (w+1)*ctx); a document spans windows first_window..
    last_window (documents are split across window boundaries, as
    training pipelines do after packing).

    Distributed prefix sum, no global sort:
      1. range-bucket rows by ``order_col // bucket_size`` and sum
         ``n_tok_col`` per bucket (one bucketed shuffle, ≤ N/bucket_size
         partial rows);
      2. exclusive-scan the per-bucket totals on the driver (tiny) and
         broadcast the base offsets;
      3. per-bucket: sort locally by ``order_col``, local cumsum + base.

    Partitioning assumption: ``order_col`` is an integer key whose
    range buckets are reasonably balanced (dense ids are ideal); each
    bucket (≤ bucket_size distinct ids) must fit one worker. Offsets
    are exact regardless of balance.
    """
    import ray

    def bucket_of(vals: np.ndarray) -> np.ndarray:
        return (vals // bucket_size).astype("int64")

    def partial_sums(df: pd.DataFrame) -> pd.DataFrame:
        b = bucket_of(df[order_col].to_numpy())
        return (
            pd.DataFrame({"bucket": b, "n": df[n_tok_col].to_numpy()})
            .groupby("bucket", sort=False)["n"]
            .sum()
            .reset_index()
        )

    def merge_sums(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bucket", sort=False)["n"].sum().reset_index()

    totals = (
        bucketed_groupby(ds, ["bucket"], partial_sums, merge_sums, num_buckets=8)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    base = {}
    acc = 0
    for b, n in zip(totals["bucket"], totals["n"]):
        base[int(b)] = acc
        acc += int(n)
    base_ref = ray.put(base)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = bucket_of(df[order_col].to_numpy())
        return df

    def offsets(group: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        g = group.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        n = g[n_tok_col].to_numpy().astype("int64")
        start = np.int64(bases[int(g["__bucket"].iloc[0])])
        excl = start + np.concatenate(([0], np.cumsum(n)[:-1]))
        out = g.drop(columns="__bucket")
        out["tok_offset"] = excl
        out["first_window"] = excl // ctx
        out["last_window"] = (excl + np.maximum(n, 1) - 1) // ctx
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(offsets, batch_format="pandas")
    )


def approx_distinct(ds, col: str, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT col) via HyperLogLog — the
    unbounded-cardinality counterpart to the exact paths (which shuffle
    every distinct value once). Standard error ≈ 1.04/sqrt(2^p); p=12
    → ~1.6% with 4 KiB registers.

    Topology: per-batch vectorized register fold (hash → bucket =
    high ``p`` bits, rank = leading zeros of the rest + 1, per-bucket
    max via ``np.maximum.at``) → ONE register row per batch to the
    driver (2^p bytes each, independent of row count) → elementwise max
    merge + bias-corrected estimate. No shuffle at all: registers are
    a commutative monoid, so any batch/block split gives the identical
    merged state.
    """
    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _fast_u64(df[col].to_numpy())
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel low bits
        # rank = leading zeros of `rest` + 1, capped at 64 - p + 1
        x = rest.copy()
        nz = x != 0
        # leading zeros via float64 exponent is unsafe past 2^53; do a
        # branchless binary reduction instead: if the top `shift` bits
        # (x >> (64 - shift)) are zero, count them and shift them out
        shift = 32
        cnt = np.zeros(len(h), dtype=np.int64)
        while shift > 0:
            take = (x >> np.uint64(64 - shift)) == 0
            cnt = np.where(take, cnt + shift, cnt)
            x = np.where(take, x << np.uint64(shift), x)
            shift //= 2
        lead = np.where(nz, cnt, 64)
        rank = (lead + 1).astype(np.uint8)
        regs = np.zeros(m, dtype=np.uint8)
        np.maximum.at(regs, bucket, rank)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    regs = np.zeros(m, dtype=np.uint8)
    for b in parts["regs"]:
        regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
    # HLL estimate with small-range (linear counting) correction
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def approx_quantiles(
    ds, col: str, qs: list[float], num_bins: int = 4096, bounds: tuple | None = None
) -> pd.DataFrame:
    """Approximate quantiles for UNBOUNDED-distinct numeric columns —
    the scale path where ``exact_quantiles``' bounded-distinct histogram
    assumption breaks (floats, free-range ints). Fixed-bin equi-width
    histogram: error ≤ (hi - lo) / num_bins in value space.

    Topology: (optional) min/max pass via Dataset aggregates, then ONE
    map_batches pass emitting a num_bins-long count row per batch (size
    independent of rows), summed on the driver; quantiles read off the
    cumulative histogram at the bin's upper edge. Returns (q, value).
    """
    import ray.data

    if bounds is None:
        # bounds over the NaN-free view (float NaN is not an Arrow null,
        # so a raw Min/Max could propagate it into the bin width)
        clean = ds.map_batches(
            lambda df: df[[col]].dropna(subset=[col]), batch_format="pandas"
        )
        mm = clean.aggregate(
            ray.data.aggregate.Min(col), ray.data.aggregate.Max(col)
        )
        lo = float(mm[f"min({col})"]) if mm[f"min({col})"] is not None else np.nan
        hi = float(mm[f"max({col})"]) if mm[f"max({col})"] is not None else np.nan
    else:
        lo, hi = float(bounds[0]), float(bounds[1])
    if np.isnan(lo) or np.isnan(hi):
        # all-NaN/empty column (or NaN bounds): quantiles are undefined
        return pd.DataFrame({"q": qs, "value": [np.nan] * len(qs)})
    if hi <= lo:
        return pd.DataFrame({"q": qs, "value": [lo] * len(qs)})
    width = (hi - lo) / num_bins

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy().astype(np.float64)
        v = v[~np.isnan(v)]  # NaNs are excluded from the distribution
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, num_bins - 1)
        counts = np.bincount(idx, minlength=num_bins).astype(np.int64)
        return pd.DataFrame({"counts": [counts.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    counts = np.zeros(num_bins, dtype=np.int64)
    for b in parts["counts"]:
        counts += np.frombuffer(b, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return pd.DataFrame({"q": qs, "value": [np.nan] * len(qs)})
    cum = np.cumsum(counts)
    out = []
    for qq in qs:
        target = max(1, int(np.ceil(qq * total)))
        i = int(np.searchsorted(cum, target))
        out.append(lo + (i + 1) * width)
    return pd.DataFrame({"q": qs, "value": out})


def chunk_tokens(
    ds,
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    ctx: int = 2048,
    stride: int | None = None,
):
    """Context-window chunking: split each document's token run into
    windows of ``ctx`` tokens advancing by ``stride`` (overlap =
    ctx - stride; default stride=ctx → disjoint). Emits one row per
    chunk: (id, chunk_idx, tok_start, tok_len) — the training-sequence
    splitting complement to ``pack_sequences`` (which concatenates short
    docs; this cuts long ones).

    Fully vectorized per batch (np.repeat explode), embarrassingly
    parallel — no shuffle, no state; chunk counts are pure row-local
    arithmetic, so the output is identical at any block layout. The
    final short window is kept (tok_len < ctx) so every token lands in
    ≥1 chunk; empty docs emit one zero-length chunk row.
    """
    stride = ctx if stride is None else stride
    if stride <= 0 or ctx <= 0:
        raise ValueError("ctx and stride must be positive")
    if stride > ctx:
        # windows would leave gaps, breaking the every-token-covered
        # invariant (and emitting spurious zero-length chunks)
        raise ValueError(f"stride ({stride}) must be <= ctx ({ctx})")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n = df[n_tok_col].to_numpy().astype(np.int64)
        # chunks per doc: 1 + ceil(max(n - ctx, 0) / stride)
        extra = np.maximum(n - ctx, 0)
        k = 1 + (extra + stride - 1) // stride
        idx = np.repeat(np.arange(len(df)), k)
        # chunk_idx within doc: position within each run
        starts_of_run = np.concatenate(([0], np.cumsum(k)[:-1]))
        chunk_idx = np.arange(int(k.sum()), dtype=np.int64) - np.repeat(starts_of_run, k)
        tok_start = chunk_idx * stride
        tok_len = np.minimum(n[idx] - tok_start, ctx)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy()[idx],
                "chunk_idx": chunk_idx,
                "tok_start": tok_start,
                "tok_len": np.maximum(tok_len, 0),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


# --- quality-aware selection under a token budget ---------------------------


def select_by_token_budget(
    ds,
    budget_tokens: int,
    score_col: str = "score",
    tok_col: str = "n_tok",
    id_col: str = "doc_id",
    num_bins: int = 4096,
    max_refine: int = 4,
    boundary_cap: int = 200_000,
    bounds: tuple | None = None,
):
    """Budget-constrained curation: keep the highest-``score_col`` docs
    whose cumulative ``tok_col`` stays within ``budget_tokens`` — "the
    best 1T tokens of this corpus". EXACT prefix semantics: docs are
    ranked by (score desc, id asc) and the maximal prefix with token
    sum <= budget is kept (a doc that would overflow the budget stops
    the prefix — sort-cumsum, not knapsack).

    Scale shape — iterative histogram refinement (the distributed
    order-statistic trick), never a global sort:

    1. one min/max pass (skipped when ``bounds`` given);
    2. one full pass emitting per-batch CONSTANT-SIZE partials
       (token-weighted + row-count histograms, ``num_bins`` bins);
       the driver folds them and finds the boundary bin — every bin
       above it is kept whole;
    3. only the boundary bin's rows (≈ n/num_bins) materialize; further
       rounds re-histogram just that subset until it fits
       ``boundary_cap``, then the driver resolves the exact prefix
       among <= boundary_cap (id, score, tok) rows;
    4. one filter pass: ``score >= cut`` OR id in the broadcast
       boundary keep-set.

    Ties: equal scores share a bin forever, so a tie-mass above
    ``boundary_cap`` raises (the documented assumption) instead of
    silently spilling the driver.

    Returns ``(selected_ds, info)`` with info =
    {cut, tokens_selected, docs_boundary_kept, budget_tokens}.
    NaN scores are never selected.
    """
    import ray
    import ray.data

    if bounds is None:
        clean = ds.map_batches(
            lambda df: df[[score_col]].dropna(subset=[score_col]), batch_format="pandas"
        )
        mm = clean.aggregate(ray.data.aggregate.Min(score_col), ray.data.aggregate.Max(score_col))
        lo = mm[f"min({score_col})"]
        hi = mm[f"max({score_col})"]
        if lo is None or hi is None:
            return ds.filter(lambda r: False), {
                "cut": None, "tokens_selected": 0, "docs_boundary_kept": 0,
                "budget_tokens": int(budget_tokens),
            }
        lo, hi = float(lo), float(hi)
    else:
        lo, hi = float(bounds[0]), float(bounds[1])

    # EVERY membership decision (histogram counts, boundary/refinement
    # subsets, and the final keep filter) uses the ONE clipped-trunc bin
    # computation below — a recomputed float cut (`s >= w_lo + k*width`)
    # can disagree with `trunc((s-w_lo)/width)` by 1 ulp at a bin edge,
    # silently excluding a doc that was counted into the kept region.
    # The refinement trail (one (w_lo, width, b_star) entry per round)
    # is replayed verbatim in the final filter instead.
    def _bin_idx(s, valid, w_lo, width):
        q = np.where(valid, (s - w_lo) / width, -1.0)
        return np.clip(q.astype(np.int64), 0, num_bins - 1)

    def _round0_mask(s):
        # the round-0 window clamp ([lo,hi] = exact data min/max, or the
        # caller's `bounds`); replayed identically in the keep filter
        return ~np.isnan(s) & (s >= lo) & (s <= hi)

    def hist_partials(sub_ds, w_lo, width, round0: bool):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            s = df[score_col].to_numpy().astype(np.float64)
            t = df[tok_col].to_numpy().astype(np.int64)
            # refined rounds: scan IS the previous boundary bin by
            # construction — clip absorbs <=1-ulp edge drift instead of
            # a window mask silently dropping (and losing) edge rows
            m = _round0_mask(s) if round0 else ~np.isnan(s)
            idx = _bin_idx(s, m, w_lo, width)[m]
            t = t[m]
            toks = np.bincount(idx, weights=t, minlength=num_bins).astype(np.int64)
            rows = np.bincount(idx, minlength=num_bins).astype(np.int64)
            return pd.DataFrame({"toks": [toks.tobytes()], "rows": [rows.tobytes()]})

        parts = sub_ds.map_batches(partial, batch_format="pandas").to_pandas()
        toks = np.zeros(num_bins, np.int64)
        rows = np.zeros(num_bins, np.int64)
        for tb, rb in zip(parts["toks"], parts["rows"]):
            toks += np.frombuffer(tb, np.int64)
            rows += np.frombuffer(rb, np.int64)
        return toks, rows

    def bin_subset(sub_ds, w_lo, width, b_sel, round0: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            s = df[score_col].to_numpy().astype(np.float64)
            m = _round0_mask(s) if round0 else ~np.isnan(s)
            m &= _bin_idx(s, m, w_lo, width) == b_sel
            return df.loc[m, [id_col, score_col, tok_col]]

        return sub_ds.map_batches(fn, batch_format="pandas")

    def tie_subset(sub_ds, round0: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            s = df[score_col].to_numpy().astype(np.float64)
            m = _round0_mask(s) if round0 else ~np.isnan(s)
            return df.loc[m, [id_col, score_col, tok_col]]

        return sub_ds.map_batches(fn, batch_format="pandas")

    cut = None  # informational float edge (info dict only, never a predicate)
    trail = []  # (w_lo, width, b_star, whole) per refinement round
    budget_rem = int(budget_tokens)
    scan = ds
    w_lo, w_hi = lo, hi
    boundary_df = None
    for round_i in range(max_refine):
        round0 = round_i == 0
        if w_hi <= w_lo:  # degenerate window (all ties): pull it —
            # but COUNT first: a constant score column would otherwise
            # materialize the whole remaining window on the driver
            # before the boundary_cap guard ever ran (OOM, not the
            # documented error)
            sub = tie_subset(scan, round0)
            if sub.count() > max(boundary_cap, num_bins):
                raise ValueError(
                    f"select_by_token_budget: degenerate (all-tied) score "
                    f"window holds more than boundary_cap={boundary_cap} "
                    "rows; ties share one bin and cannot refine — raise "
                    "boundary_cap"
                )
            boundary_df = sub.to_pandas()
            break
        width = (w_hi - w_lo) / num_bins
        toks, rows = hist_partials(scan, w_lo, width, round0)
        rev_cum = np.cumsum(toks[::-1])[::-1]  # rev_cum[b] = tokens at bins >= b
        fits = rev_cum <= budget_rem
        if fits[0]:  # whole window fits: everything in it is kept
            cut = w_lo
            budget_rem -= int(rev_cum[0])
            trail.append((w_lo, width, None, True))
            boundary_df = pd.DataFrame(columns=[id_col, score_col, tok_col])
            break
        b_star = int(np.argmax(fits)) - 1 if fits.any() else num_bins - 1
        top_bin = b_star == num_bins - 1
        if not top_bin:
            # bins above b_star are kept whole. When the boundary IS the
            # top bin there is no fully-kept region this round.
            budget_rem -= int(rev_cum[b_star + 1])
            cut = w_lo + (b_star + 1) * width
        trail.append((w_lo, width, b_star, False))
        n_boundary = int(rows[b_star])
        if n_boundary <= boundary_cap:
            boundary_df = bin_subset(scan, w_lo, width, b_star, round0).to_pandas()
            break
        # refine inside the boundary bin only — materialize the ~n/num_bins subset
        scan = bin_subset(scan, w_lo, width, b_star, round0).materialize()
        w_lo, w_hi = w_lo + b_star * width, w_lo + (b_star + 1) * width
    else:
        raise ValueError(
            f"select_by_token_budget: boundary mass still > boundary_cap="
            f"{boundary_cap} after {max_refine} refinements (tie-heavy score "
            "column?); raise boundary_cap or num_bins"
        )
    if boundary_df is None:
        boundary_df = pd.DataFrame(columns=[id_col, score_col, tok_col])
    if len(boundary_df) > max(boundary_cap, num_bins):
        raise ValueError(
            f"select_by_token_budget: {len(boundary_df)} tied boundary rows "
            f"exceed boundary_cap={boundary_cap}; ties share one bin and "
            "cannot refine — raise boundary_cap"
        )

    # exact prefix among the boundary rows: (score desc, id asc)
    kept_ids = np.array([], dtype=np.int64)
    boundary_tokens = 0
    if len(boundary_df):
        b = boundary_df.sort_values(
            [score_col, id_col], ascending=[False, True], kind="mergesort"
        )
        csum = b[tok_col].to_numpy(np.int64).cumsum()
        take = int(np.searchsorted(csum, budget_rem, side="right"))
        kept_ids = b[id_col].to_numpy(np.int64)[:take]
        boundary_tokens = int(csum[take - 1]) if take else 0
    tokens_selected = int(budget_tokens) - budget_rem + boundary_tokens

    ids_ref = ray.put(np.sort(kept_ids))
    trail_t = tuple(trail)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        s = df[score_col].to_numpy().astype(np.float64)
        # replay the refinement trail with the IDENTICAL bin computation
        # the histograms used — never a recomputed float cut
        m_win = _round0_mask(s)
        m = np.zeros(len(s), bool)
        for t_lo, t_w, t_b, t_whole in trail_t:
            if t_whole:  # fits[0] fired: the whole round window is kept
                m |= m_win
                break
            idx = _bin_idx(s, m_win, t_lo, t_w)
            m |= m_win & (idx > t_b)  # bins above the boundary: kept whole
            m_win &= idx == t_b  # descend into the boundary bin
        ids = ray.get(ids_ref)
        if len(ids):
            pos = np.searchsorted(ids, df[id_col].to_numpy(np.int64))
            pos = np.clip(pos, 0, len(ids) - 1)
            m |= ids[pos] == df[id_col].to_numpy(np.int64)
        return df[m]

    info = {
        "cut": None if cut is None else float(cut),
        "tokens_selected": tokens_selected,
        "docs_boundary_kept": int(len(kept_ids)),
        "budget_tokens": int(budget_tokens),
    }
    return ds.map_batches(keep, batch_format="pandas"), info


def corpus_report(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str | None = None,
    top_words: int = 20,
    quantile_qs: tuple = (0.5, 0.9, 0.99),
) -> dict:
    """One-call corpus statistics card — the "what is in this corpus"
    snapshot a curation run starts and ends with:

    - ``n_docs``, ``total_tokens``, token-length quantiles
      (fixed-bin :func:`approx_quantiles`, constant-size partials);
    - ``distinct_texts`` (HyperLogLog on the text hash) and the implied
      ``approx_dup_ratio``;
    - ``top_words`` most frequent tokens (bucketed
      :func:`token_histogram` exchange);
    - per-``source_col`` doc counts when given (constant partials).

    Every sub-statistic is one streaming pass with constant-size or
    bounded partials — the report costs a handful of corpus scans and
    no driver materialization beyond the summaries. Diagnostic tool:
    fuse the passes yourself if you need it on the hot path.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    base = ds.materialize()

    def count_partial(t: pa.Table) -> pd.DataFrame:
        n_tok = pc.add(pc.count_substring(t[text_col], pattern=" "), 1)
        return pd.DataFrame(
            {"docs": [t.num_rows], "toks": [int(pc.sum(n_tok).as_py() or 0)]}
        )

    counts = base.map_batches(count_partial, batch_format="pyarrow").to_pandas().sum()

    def with_ntok(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.add(pc.count_substring(t[text_col], pattern=" "), 1), pa.int64())
        return pa.table({"n_tok": n})

    q = approx_quantiles(base.map_batches(with_ntok, batch_format="pyarrow"), "n_tok", list(quantile_qs))

    def hash_col(df: pd.DataFrame) -> pd.DataFrame:
        from clever_canal_ray.functions.dedup import _stable_u64

        return pd.DataFrame({"h": _stable_u64(df[text_col].to_numpy())})

    distinct = approx_distinct(base.map_batches(hash_col, batch_format="pandas"), "h")

    report = {
        "n_docs": int(counts["docs"]),
        "total_tokens": int(counts["toks"]),
        "token_quantiles": {float(r["q"]): float(r["value"]) for _, r in q.iterrows()},
        "distinct_texts": int(distinct),
        "approx_dup_ratio": round(
            max(0.0, 1.0 - distinct / counts["docs"]) if counts["docs"] else 0.0, 4
        ),
        "top_words": token_histogram(base, text_col=text_col, top_n=top_words).to_dict(
            "records"
        ),
    }
    if source_col is not None:
        def src_partial(df: pd.DataFrame) -> pd.DataFrame:
            c = df[source_col].value_counts()
            return pd.DataFrame({"source": c.index, "n": c.to_numpy()})

        agg = (
            base.map_batches(src_partial, batch_format="pandas")
            .to_pandas()
            .groupby("source")["n"]
            .sum()
            .sort_values(ascending=False)
        )
        report["by_source"] = {str(k): int(v) for k, v in agg.items()}
    return report


def pack_bins(
    ds,
    ctx: int,
    id_col: str = "doc_id",
    tok_col: str = "n_tok",
    num_buckets: int = 64,
    mirror: bool = False,
):
    """Doc-boundary sequence packing: assign whole documents to
    fixed-capacity ``ctx``-token bins minimizing padding — the
    padding-free-batching step (contrast :func:`pack_sequences` /
    ``chunk_tokens``, the concat-and-chunk path that SPLITS docs
    across window boundaries).

    Topology: docs hash into ``num_buckets`` groups (ONE bucketed
    exchange of (id, n_tok) pairs — payloads never move), each bucket
    runs best-fit-decreasing over its own docs (sort by n_tok desc,
    id asc; the classic 11/9·OPT+1 waste bound holds per bucket), and
    bin ids are globally unique as ``bucket * 2^32 + local``.
    Deterministic at any parallelism/layout: bucket membership and
    in-bucket order depend only on ids. The per-bucket loop is
    per-DOC with an O(log bins) bisect per step (docs/bucket
    iterations, not tokens).

    Docs longer than ``ctx`` get a bin of their own, flagged
    ``oversize=1`` (callers chunk those first via ``chunk_tokens``).
    Returns one row per doc: ``(id_col, n_tok, bin_id:int64,
    bin_off:int64, oversize:int32)`` with sum(n_tok) <= ctx per
    regular bin.
    """

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, tok_col]].copy()
        out["__b"] = (_hash_u64(df[id_col], mirror) % np.uint64(num_buckets)).astype(np.int64)
        return out

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        import bisect

        b = int(g["__b"].iloc[0])
        base = np.int64(b) << np.int64(32)
        g = g.sort_values([tok_col, id_col], ascending=[False, True], kind="mergesort")
        n = g[tok_col].to_numpy(np.int64)
        rooms: list[int] = []  # open-bin remaining capacity, sorted asc
        rids: list[int] = []  # parallel local bin index
        n_bins = 0
        bin_id = np.empty(len(g), np.int64)
        bin_off = np.empty(len(g), np.int64)
        oversize = np.zeros(len(g), np.int32)
        for i, tok in enumerate(n):
            tok = int(tok)
            if tok > ctx:
                bin_id[i] = base + n_bins  # closed solo bin
                bin_off[i] = 0
                oversize[i] = 1
                n_bins += 1
                continue
            # best fit: tightest open bin that still has room
            j = bisect.bisect_left(rooms, tok)
            if j == len(rooms):
                bin_id[i] = base + n_bins
                bin_off[i] = 0
                r = ctx - tok
                k = bisect.bisect_left(rooms, r)
                rooms.insert(k, r)
                rids.insert(k, n_bins)
                n_bins += 1
            else:
                r, k_bin = rooms.pop(j), rids.pop(j)
                bin_id[i] = base + k_bin
                bin_off[i] = ctx - r
                r -= tok
                k = bisect.bisect_left(rooms, r)
                rooms.insert(k, r)
                rids.insert(k, k_bin)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                tok_col: n,
                "bin_id": bin_id,
                "bin_off": bin_off,
                "oversize": oversize,
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(lambda g: pack(g), batch_format="pandas")
    )
