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
                concurrency=(2, 8),
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
                concurrency=(2, 8),
            ),
        )

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
