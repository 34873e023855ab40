"""One-call corpus curation: the end-to-end training-data pipeline the
operator library exists for, composed corpus-in → corpus-out —

    language filter → quality filter → exact dedup → near dedup →
    cross-corpus dedup → decontamination → selection (DSIR target
    match OR quality-score token budget)

Every stage is one of the soak-proven distributed ops; this module
only sequences them (each stage is optional, enabled by its argument).
The streaming default materializes nothing between stages — Ray fuses
the filter passes; the dedup/decontaminate stages carry their own
bounded exchanges. ``report=True`` materializes after each enabled
stage to count rows (a per-stage extra pass — the debugging mode, not
the 100-TB default).

Reference framing: this is the Canal-client "downstream consumer"
composed at corpus scale — what a user pipes the CDC-maintained
documents lake into when assembling a training set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from clever_canal_ray.config import actor_pool_free


def _lang_filter_stage(keep_langs):
    from clever_canal_ray.functions.text import LangId

    keep = set(keep_langs)

    class _LangFilter(LangId):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.reset_index(drop=True)
            pred = LangId.__call__(self, batch)["pred_lang"]
            return batch[np.isin(pred.to_numpy(), list(keep))]

    return _LangFilter


def curate_corpus(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_langs: tuple | None = None,
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    quality_preset: str | None = None,
    exact_dedup: bool = True,
    near_dedup: bool = False,
    near_threshold: float = 0.7,
    reference_ds=None,
    eval_texts=None,
    decontam_max_hits: int = 0,
    target_ds=None,
    dsir_n_select: int | None = None,
    dsir_temperature: float = 0.1,
    dsir_n_buckets: int = 65_536,
    budget_tokens: int | None = None,
    budget_score_col: str | None = None,
    seed: int = 1234,
    report: bool = False,
):
    """Run the standard curation chain over a (id, text, ...) corpus.

    Stages (each skipped unless its argument is set):
      1. ``keep_langs``: LangId actor pool, keep listed languages.
      2. ``min_tokens``/``max_tokens``: whitespace-token length bounds
         (pure-Arrow count, zero shuffle).
      2b. ``quality_preset``: "gopher" (Rae 2021 rule set, doc filter)
         or "c4" (Raffel 2020 line cleaning — kept lines REPLACE the
         text — plus the page filter).
      3. ``exact_dedup``: keep each exact text's min-id doc
         (bucketed hash exchange + distributed survivor semi-join).
      4. ``near_dedup``: MinHash → exact-Jaccard verify → components →
         survivors (the soak-proven chain).
      5. ``reference_ds``: drop docs already present in an existing
         corpus (cross-corpus anti-join; reference ships 8 B/doc).
      6. ``eval_texts``: drop docs with more than ``decontam_max_hits``
         distinct eval n-gram hits (broadcast eval grams).
      7. selection: ``target_ds`` + ``dsir_n_select`` → DSIR
         importance resampling toward the target distribution; else
         ``budget_tokens`` → exact best-``budget_score_col`` prefix
         under the token budget.

    Returns ``(curated_ds, report_list)`` — report rows are
    ``(stage, rows)`` when ``report=True`` (one count pass per stage),
    else just ``[("input", -1), ...]`` stage names with -1 counts.
    """
    from clever_canal_ray.functions.dedup import (
        cross_corpus_dedup,
        exact_dedup_survivors,
        near_dedup_corpus,
    )

    stages: list[tuple[str, int]] = []

    def note(name, cur):
        if report:
            cur = cur.materialize()
            stages.append((name, cur.count()))
        else:
            stages.append((name, -1))
        return cur

    cur = note("input", ds)

    if keep_langs is not None:
        cur = note(
            "lang_filter",
            cur.map_batches(
                _lang_filter_stage(keep_langs),
                batch_format="pandas",
                concurrency=actor_pool_free(),
            ),
        )

    if min_tokens is not None or max_tokens is not None:
        lo = 0 if min_tokens is None else int(min_tokens)
        hi = np.iinfo(np.int64).max if max_tokens is None else int(max_tokens)

        def len_filter(t):
            import pyarrow as pa
            import pyarrow.compute as pc

            n = pc.add(pc.count_substring(t[text_col], pattern=" "), 1)
            n = pc.cast(n, pa.int64())
            mask = pc.and_(pc.greater_equal(n, pa.scalar(lo)), pc.less_equal(n, pa.scalar(hi)))
            return t.filter(mask)

        cur = note("length_filter", cur.map_batches(len_filter, batch_format="pyarrow"))

    if quality_preset is not None:
        if quality_preset not in ("gopher", "c4"):
            raise ValueError(
                f"unknown quality_preset {quality_preset!r} (have: 'gopher', 'c4')"
            )
        if quality_preset == "gopher":
            from clever_canal_ray.functions.text import gopher_quality

            def gopher_filter(t):
                import pyarrow.compute as pc

                mask = pc.equal(gopher_quality(t)["gopher_pass"], 1)
                return t.filter(mask)

            cur = note("gopher_quality", cur.map_batches(gopher_filter, batch_format="pyarrow"))
        else:
            # C4 is a text TRANSFORM + page filter: kept lines replace
            # the text column, failing pages drop
            from clever_canal_ray.functions.text import c4_clean

            def c4_stage(t):
                import pyarrow as pa
                import pyarrow.compute as pc

                cleaned = c4_clean(t)
                keep = pc.equal(cleaned["c4_keep"], 1)
                out = t.set_column(
                    t.schema.get_field_index(text_col), text_col, cleaned["text"]
                )
                return out.filter(keep)

            cur = note("c4_clean", cur.map_batches(c4_stage, batch_format="pyarrow"))

    if exact_dedup:
        cur = note(
            "exact_dedup", exact_dedup_survivors(cur, text_col=text_col, id_col=id_col)
        )

    if near_dedup:
        cur = note(
            "near_dedup",
            near_dedup_corpus(
                cur, threshold=near_threshold, id_col=id_col, text_col=text_col, seed=seed
            ),
        )

    if reference_ds is not None:
        cur = note(
            "cross_corpus_dedup",
            cross_corpus_dedup(cur, reference_ds, text_col=text_col),
        )

    if eval_texts is not None:
        from clever_canal_ray.functions.corpus import Decontaminator

        import ray

        ref = ray.put(Decontaminator.build_eval_grams(eval_texts))
        max_hits = int(decontam_max_hits)

        class _DecontamFilter(Decontaminator):
            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                batch = batch.reset_index(drop=True)
                hits = Decontaminator.__call__(self, batch)["n_hits"].to_numpy()
                return batch[hits <= max_hits]

        cur = note(
            "decontaminate",
            cur.map_batches(
                _DecontamFilter,
                fn_constructor_args=(ref,),
                batch_format="pandas",
                concurrency=actor_pool_free(),
            ),
        )

    if (target_ds is not None and dsir_n_select is not None) or budget_tokens is not None:
        # the selection legs each run SEVERAL full passes over `cur`
        # (ngram totals / log weights / min-max / histogram rounds /
        # boundary window / final filter); on the lazy chain every pass
        # would re-execute all earlier curation stages (LangId actor
        # pools, dedup exchanges) — 5-6 re-runs. Pin the curated set
        # once; the selection passes then scan materialized blocks.
        cur = cur.materialize()

    if target_ds is not None and dsir_n_select is not None:
        from clever_canal_ray.functions.dsir import (
            dsir_log_ratio,
            dsir_log_weights,
            dsir_sample,
            hashed_ngram_totals,
        )

        p = hashed_ngram_totals(target_ds, text_col=text_col, n_buckets=dsir_n_buckets)
        q = hashed_ngram_totals(cur, text_col=text_col, n_buckets=dsir_n_buckets)
        weighted = dsir_log_weights(
            cur, dsir_log_ratio(p, q), text_col=text_col, id_col=id_col
        )
        cur = note(
            "dsir_select",
            dsir_sample(
                weighted,
                n_select=int(dsir_n_select),
                id_col=id_col,
                seed=seed,
                temperature=dsir_temperature,
            ),
        )
    elif budget_tokens is not None:
        from clever_canal_ray.functions.corpus import select_by_token_budget

        score_col = budget_score_col or "__neg_len"

        def add_cols(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            n = df[text_col].str.count(" ").to_numpy() + 1
            out["__n_tok"] = n.astype(np.int64)
            if budget_score_col is None:
                # default score: prefer LONGER docs (more tokens per
                # selection decision) — callers pass a real quality col
                out["__neg_len"] = n.astype(np.float64)
            return out

        sel, _info = select_by_token_budget(
            cur.map_batches(add_cols, batch_format="pandas"),
            int(budget_tokens),
            score_col=score_col,
            tok_col="__n_tok",
            id_col=id_col,
        )
        cur = note(
            "budget_select",
            sel.map_batches(
                lambda df: df.drop(columns=[c for c in ("__n_tok", "__neg_len") if c in df]),
                batch_format="pandas",
            ),
        )

    return cur, stages


# --- incremental curation (curated lake in lockstep with a source lake) ----


class CurateJudge:
    """Per-row keep mask for the incremental path — only the PER-DOC
    deterministic stages (language, token-length bounds,
    decontamination): an updated doc's verdict must not depend on what
    else happens to be in the window, so a crash-retried sync rejudges
    identically. Built once per actor; live rows that fail any filter
    flip to TOMBSTONES (the doc may already live in the curated lake
    from an earlier sync and must be vacated), upstream tombstones pass
    through untouched."""

    def __init__(
        self,
        keep_langs=None,
        min_tokens=None,
        max_tokens=None,
        eval_grams_ref=None,
        decontam_max_hits: int = 0,
        text_col: str = "text",
    ):
        from clever_canal_ray.functions.corpus import Decontaminator
        from clever_canal_ray.functions.text import LangId

        self.langid = LangId() if keep_langs else None
        self.keep_langs = list(keep_langs or ())
        self.lo = None if min_tokens is None else int(min_tokens)
        self.hi = None if max_tokens is None else int(max_tokens)
        self.decon = Decontaminator(eval_grams_ref) if eval_grams_ref is not None else None
        self.max_hits = int(decontam_max_hits)
        self.text_col = text_col

    def mask(self, df: pd.DataFrame) -> np.ndarray:
        m = np.ones(len(df), bool)
        body = df.rename(columns={self.text_col: "text"})[["doc_id", "text"]].reset_index(
            drop=True
        )
        if self.langid is not None:
            pred = self.langid(body)["pred_lang"].to_numpy()
            m &= np.isin(pred, self.keep_langs)
        if self.lo is not None or self.hi is not None:
            n = df[self.text_col].str.count(" ").to_numpy() + 1
            if self.lo is not None:
                m &= n >= self.lo
            if self.hi is not None:
                m &= n <= self.hi
        if self.decon is not None:
            hits = self.decon(body)["n_hits"].to_numpy()
            m &= hits <= self.max_hits
        return m

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        out = df.copy()
        live = ~df["__deleted"].to_numpy(bool)
        # judge ONLY live rows: tombstones carry NULL payloads (the
        # delta sink writes no text on deletes) and must pass through
        # without ever reaching the text kernels
        keep = np.zeros(len(df), bool)
        if live.any():
            keep[live] = self.mask(df[live])
        out["__deleted"] = ~(live & keep)
        return out


def _window_exact_dedup(feed, text_col: str, id_col: str, num_buckets: int = 16):
    """Within one sync window: among LIVE rows sharing an exact text,
    keep the minimum-id doc and flip the rest to tombstones (they may
    shadow earlier curated rows). One bucketed exchange over the window
    only — the window is the changed-rows set, tiny next to the lake."""
    from clever_canal_ray.functions.corpus import _fast_u64

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        live = ~df["__deleted"].to_numpy(bool)
        h = np.zeros(len(df), np.uint64)
        if live.any():
            h[live] = _fast_u64(df.loc[live, text_col].to_numpy())
        out["__b"] = (h % np.uint64(num_buckets)).astype(np.int64)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.reset_index(drop=True)
        live = ~g["__deleted"].to_numpy(bool)
        sub = g[live].sort_values([text_col, id_col], kind="mergesort")
        dup_idx = sub.index[sub.duplicated(text_col)]
        if len(dup_idx):
            g.loc[dup_idx, "__deleted"] = True
        return g.drop(columns="__b")

    return feed.map_batches(bucket, batch_format="pandas").groupby("__b").map_groups(
        fold, batch_format="pandas"
    )


def curate_bootstrap(
    src,
    dst_dir: str,
    num_partitions: int | None = None,
    src_version: int | None = None,
    keep_langs=None,
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    eval_texts=None,
    decontam_max_hits: int = 0,
    text_col: str = "text",
):
    """Create a CURATED lake from a pinned version of a source lake —
    the bootstrap half of incremental curation. Same distributed
    snapshot copy as ``mirror_bootstrap`` (cursor stamped to the pinned
    source version), with the per-doc filters + exact dedup applied in
    stream. Single-table sources only (the curated projection is one
    documents table)."""
    from clever_canal_ray.pipelines.mirror import mirror_bootstrap

    if src.current().tables is not None:
        raise ValueError("curate_bootstrap: single-table source lakes only")

    def transform(ds):
        cur, _ = curate_corpus(
            ds,
            text_col=text_col,
            keep_langs=keep_langs,
            min_tokens=min_tokens,
            max_tokens=max_tokens,
            exact_dedup=True,
            eval_texts=eval_texts,
            decontam_max_hits=decontam_max_hits,
        )
        return cur

    return mirror_bootstrap(
        src, dst_dir, num_partitions=num_partitions, src_version=src_version,
        transform=transform,
    )


def curate_sync(
    src,
    dst,
    to_version: int | None = None,
    keep_langs=None,
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    eval_texts=None,
    decontam_max_hits: int = 0,
    window_exact_dedup: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Advance a curated lake over the source's change-feed window —
    the CDC side and the curation side composed: the raw documents lake
    is maintained by replay; this keeps the training-set projection in
    lockstep, exactly-once (cursor = ``dst.last_batch_id`` = applied
    source version, one atomic commit — all of ``mirror_sync``'s
    machinery, window-refusal rules included).

    Per changed key the verdict is independent and deterministic
    (CurateJudge): passes the filters → upsert; fails OR deleted
    upstream → tombstone (vacates any earlier curated copy).
    ``window_exact_dedup`` additionally keeps one live row per exact
    text WITHIN the window (min id). Cross-window/global dedup stays a
    batch job over the curated lake (near_dedup_corpus /
    cross_corpus_dedup) — an incremental judge must not depend on
    state outside the window.
    """
    import ray

    from clever_canal_ray.functions.corpus import Decontaminator
    from clever_canal_ray.pipelines.mirror import mirror_sync

    if src.current().tables is not None:
        raise ValueError("curate_sync: single-table source lakes only")
    eval_ref = (
        ray.put(Decontaminator.build_eval_grams(eval_texts)) if eval_texts is not None else None
    )

    def transform(feed):
        judged = feed.map_batches(
            CurateJudge,
            fn_constructor_kwargs={
                "keep_langs": keep_langs,
                "min_tokens": min_tokens,
                "max_tokens": max_tokens,
                "eval_grams_ref": eval_ref,
                "decontam_max_hits": decontam_max_hits,
                "text_col": text_col,
            },
            batch_format="pandas",
            concurrency=actor_pool_free(),
        )
        if window_exact_dedup:
            judged = _window_exact_dedup(judged, text_col, id_col)
        return judged

    return mirror_sync(src, dst, to_version=to_version, transform=transform)
