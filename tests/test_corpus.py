"""Corpus-level operator tests (functions/corpus.py): vocabulary
histogram, deterministic hash sampling, group-wise top-k, exact
quantiles, and sequence packing — each checked against a serial
pandas/numpy oracle on seeded data, with the edge cases that the
sf-table driver gate can't reach (bucket-boundary prefix sums, tied
scores, ragged value domains)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from clever_canal_ray.functions.corpus import (
    exact_quantiles,
    hash_sample,
    pack_sequences,
    token_histogram,
    topk_per_group,
)


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df).repartition(4)


def test_token_histogram_counts_and_tiebreak(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i:02d}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(200)]
    out = token_histogram(_ds(pd.DataFrame({"text": texts})), top_n=10)

    exploded = pd.Series(" ".join(texts).split(" "))
    expect = exploded.value_counts().rename_axis("word").reset_index(name="n")
    expect = expect.sort_values(["n", "word"], ascending=[False, True], kind="mergesort").head(10)
    assert list(out["word"]) == list(expect["word"])
    assert list(out["n"]) == list(expect["n"])


def test_hash_sample_matches_md5_rule(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(1000), "source": "s"})
    out = hash_sample(_ds(df), id_col="doc_id", denom=7, select_rem=3, mirror=True).to_pandas()

    def h(v):
        return int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:16], "little")

    expect = sorted(v for v in range(1000) if h(v) % 7 == 3)
    assert sorted(out["doc_id"]) == expect
    assert 1000 / 7 * 0.5 < len(out) < 1000 / 7 * 2  # sanity: rate ~1/7


def test_topk_per_group_with_ties(ray_session):
    # many tied scores: deterministic tie-break on id must hold
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b", "c"], 40),
            "score": np.tile([5, 5, 3, 1], 30),
            "id": np.arange(120),
        }
    )
    out = (
        topk_per_group(_ds(df), group_col="g", score_col="score", k=4, tie_col="id")
        .to_pandas()
        .sort_values(["g", "score", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    expect = (
        df.sort_values(["score", "id"], ascending=[False, True], kind="mergesort")
        .groupby("g", sort=False)
        .head(4)
        .sort_values(["g", "score", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["g", "score", "id"]], expect[["g", "score", "id"]])


def test_exact_quantiles_percentile_disc_rule(ray_session):
    # percentile_disc: smallest value with cumulative fraction >= q
    vals = np.array([1, 2, 3, 4], dtype="int64")
    out = exact_quantiles(_ds(pd.DataFrame({"x": vals})), col="x", qs=[0.25, 0.5, 0.75, 1.0])
    assert list(out["value"]) == [1, 2, 3, 4]

    rng = np.random.default_rng(11)
    big = rng.integers(0, 50, size=5000).astype("int64")
    out2 = exact_quantiles(_ds(pd.DataFrame({"x": big})), col="x", qs=[0.5, 0.9, 0.99])
    s = np.sort(big)
    for q, v in zip(out2["q"], out2["value"]):
        # oracle: ceil(q*N)-th order statistic (1-based)
        k = int(np.ceil(q * len(s) - 1e-9))
        assert v == s[k - 1], (q, v, s[k - 1])


def test_exact_quantiles_distinct_cap_guard(ray_session):
    """The bounded-distinct scale assumption is enforced before the
    driver pull, pointing at approx_quantiles."""
    vals = np.arange(500, dtype="int64")  # all distinct
    with pytest.raises(ValueError, match="approx_quantiles"):
        exact_quantiles(_ds(pd.DataFrame({"x": vals})), col="x", qs=[0.5], max_distinct=100)


@pytest.mark.parametrize("bucket_size", [8, 64, 1000])
def test_pack_sequences_prefix_sum_across_buckets(ray_session, bucket_size):
    # ids NOT dense (gaps) and n_tok varied: offsets must equal the
    # serial cumsum in id order regardless of bucket granularity
    rng = np.random.default_rng(3)
    ids = np.sort(rng.choice(np.arange(0, 700), size=300, replace=False)).astype("int64")
    ntok = rng.integers(1, 97, size=300).astype("int64")
    df = pd.DataFrame({"doc_id": ids, "n_tok": ntok})
    out = (
        pack_sequences(_ds(df.sample(frac=1, random_state=5)), "doc_id", "n_tok", ctx=100,
                       bucket_size=bucket_size)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    excl = np.concatenate(([0], np.cumsum(ntok)[:-1]))
    assert (out["tok_offset"].to_numpy() == excl).all()
    assert (out["first_window"].to_numpy() == excl // 100).all()
    assert (out["last_window"].to_numpy() == (excl + ntok - 1) // 100).all()
    # windows tile the token stream: every token index 0..total-1 covered
    total = int(ntok.sum())
    assert out["last_window"].max() == (total - 1) // 100


def test_hash_sample_fast_default_deterministic(ray_session):
    """The C-speed default hash: deterministic across runs, ~1/denom
    rate, and disjoint remainder classes partition the input."""
    df = pd.DataFrame({"doc_id": np.arange(3000), "source": "s"})
    a = sorted(hash_sample(_ds(df), id_col="doc_id", denom=8, select_rem=2).to_pandas()["doc_id"])
    b = sorted(hash_sample(_ds(df), id_col="doc_id", denom=8, select_rem=2).to_pandas()["doc_id"])
    assert a == b and 3000 / 8 * 0.6 < len(a) < 3000 / 8 * 1.6
    seen = []
    for r in range(8):
        seen += list(hash_sample(_ds(df), id_col="doc_id", denom=8, select_rem=r).to_pandas()["doc_id"])
    assert sorted(seen) == list(range(3000))


def _budget_serial(df, budget, score_col="score", tok_col="n_tok", id_col="doc_id"):
    b = df.dropna(subset=[score_col]).sort_values(
        [score_col, id_col], ascending=[False, True], kind="mergesort"
    )
    csum = b[tok_col].to_numpy("int64").cumsum()
    take = int(np.searchsorted(csum, budget, side="right"))
    return set(b[id_col].to_numpy("int64")[:take])


def test_select_by_token_budget_matches_serial(ray_session):
    """Distributed histogram-refinement selection == the serial
    sort-cumsum prefix, across budgets, with NaN scores excluded."""
    import ray.data as rd

    from clever_canal_ray.functions.corpus import select_by_token_budget

    rng = np.random.default_rng(23)
    n = 5000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "score": rng.standard_normal(n),
            "n_tok": rng.integers(1, 400, n).astype(np.int64),
        }
    )
    df.loc[::97, "score"] = np.nan
    total = int(df.dropna(subset=["score"])["n_tok"].sum())
    for budget in [0, 1, 1000, total // 10, total // 2, total, total + 5]:
        sel, info = select_by_token_budget(
            rd.from_pandas(df).repartition(6), budget, num_bins=64, boundary_cap=500
        )
        p = sel.to_pandas()
        got = set(p["doc_id"].to_numpy("int64")) if len(p) else set()
        ref = _budget_serial(df, budget)
        assert got == ref, f"budget={budget}: {len(got)} vs {len(ref)}"
        toks = int(df[df["doc_id"].isin(got)]["n_tok"].sum())
        assert toks <= budget or budget >= total
        assert info["tokens_selected"] == toks
        assert info["budget_tokens"] == budget


def test_select_by_token_budget_ties_and_guard(ray_session):
    """Tie-heavy (quantized) scores resolve exactly by id prefix; a tie
    mass beyond boundary_cap raises the documented error."""
    import ray.data as rd

    from clever_canal_ray.functions.corpus import select_by_token_budget

    rng = np.random.default_rng(4)
    n = 2000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "score": rng.integers(0, 5, n).astype(np.float64),  # 5 distinct values
            "n_tok": np.full(n, 10, np.int64),
        }
    )
    budget = 10 * 700  # cuts mid-tie inside one score value
    sel, info = select_by_token_budget(
        rd.from_pandas(df).repartition(4), budget, num_bins=16, boundary_cap=1000
    )
    got = set(sel.to_pandas()["doc_id"].to_numpy("int64"))
    assert got == _budget_serial(df, budget)
    assert info["tokens_selected"] == budget

    with pytest.raises(ValueError, match="boundary_cap"):
        select_by_token_budget(
            rd.from_pandas(df), budget, num_bins=16, boundary_cap=50, max_refine=3
        )


def test_select_by_token_budget_constant_score_guard(ray_session):
    """REGRESSION (round-5 advice): a CONSTANT score column makes the
    very first window degenerate (w_hi == w_lo); the boundary_cap
    guard must fire from a COUNT — before any driver materialization
    of the window — not after an OOM-prone to_pandas()."""
    import ray.data as rd

    from clever_canal_ray.functions.corpus import select_by_token_budget

    n = 2000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "score": np.full(n, 1.5),
            "n_tok": np.full(n, 10, np.int64),
        }
    )
    with pytest.raises(ValueError, match="boundary_cap"):
        select_by_token_budget(
            rd.from_pandas(df), 10 * (n // 2), num_bins=16, boundary_cap=100
        )
    # under the cap the degenerate window still resolves exactly
    sel, info = select_by_token_budget(
        rd.from_pandas(df), 10 * (n // 2), num_bins=16, boundary_cap=n + 1
    )
    got = set(sel.to_pandas()["doc_id"].to_numpy("int64"))
    assert got == _budget_serial(df, 10 * (n // 2))
    assert info["tokens_selected"] == 10 * (n // 2)


def test_select_by_token_budget_empty_and_all_nan(ray_session):
    import ray.data as rd

    from clever_canal_ray.functions.corpus import select_by_token_budget

    df = pd.DataFrame(
        {"doc_id": [1, 2], "score": [np.nan, np.nan], "n_tok": [5, 5]}
    )
    sel, info = select_by_token_budget(rd.from_pandas(df), 100)
    assert sel.count() == 0 and info["tokens_selected"] == 0


def test_select_by_token_budget_matches_duckdb_oracle(ray_session):
    """Budget prefix == the SQL window-cumsum oracle (csum is strictly
    increasing, so `csum <= budget` IS the prefix)."""
    import duckdb
    import ray.data as rd

    from clever_canal_ray.functions.corpus import select_by_token_budget

    rng = np.random.default_rng(77)
    n = 3000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "score": np.round(rng.standard_normal(n), 3),  # some ties
            "n_tok": rng.integers(1, 300, n).astype(np.int64),
        }
    )
    budget = int(df["n_tok"].sum()) // 3
    sel, info = select_by_token_budget(
        rd.from_pandas(df).repartition(5), budget, num_bins=128, boundary_cap=400
    )
    got = sorted(sel.to_pandas()["doc_id"])
    ref = duckdb.sql(
        f"""
        WITH ranked AS (
          SELECT doc_id,
                 SUM(n_tok) OVER (ORDER BY score DESC, doc_id ASC
                                  ROWS UNBOUNDED PRECEDING) AS csum
          FROM df
        )
        SELECT doc_id FROM ranked WHERE csum <= {budget} ORDER BY doc_id
        """
    ).df()["doc_id"].tolist()
    assert got == ref


def test_corpus_report_card(ray_session):
    import ray.data as rd

    from clever_canal_ray.functions.corpus import corpus_report

    df = pd.DataFrame(
        {
            "doc_id": np.arange(100, dtype=np.int64),
            "text": ["alpha beta gamma"] * 50 + [f"delta epsilon {i} zeta" for i in range(50)],
            "source": ["web"] * 70 + ["books"] * 30,
        }
    )
    rep = corpus_report(rd.from_pandas(df).repartition(4), source_col="source", top_words=3)
    assert rep["n_docs"] == 100
    assert rep["total_tokens"] == 50 * 3 + 50 * 4
    assert rep["by_source"] == {"web": 70, "books": 30}
    # 51 distinct texts; HLL within its ~2% band
    assert abs(rep["distinct_texts"] - 51) <= 3
    assert 0.4 <= rep["approx_dup_ratio"] <= 0.55
    words = {w["word"] for w in rep["top_words"]}
    assert {"delta", "epsilon", "zeta"} & words or {"alpha", "beta", "gamma"} & words
    qs = rep["token_quantiles"]
    assert set(qs) == {0.5, 0.9, 0.99} and all(3 <= v <= 4.1 for v in qs.values())


def test_pack_bins_ffd_invariants(ray_session):
    """Every doc lands in exactly one bin; regular bins never exceed
    ctx; offsets tile each bin; oversize docs sit alone flagged;
    deterministic across block layouts; utilization beats naive
    one-doc-per-bin."""
    import ray.data as rd

    from clever_canal_ray.functions.corpus import pack_bins

    rng = np.random.default_rng(9)
    n = 3000
    ctx = 1024
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "n_tok": rng.integers(10, 900, n).astype(np.int64),
        }
    )
    df.loc[:4, "n_tok"] = ctx + 100  # oversize

    out = (
        pack_bins(rd.from_pandas(df).repartition(5), ctx, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == df["doc_id"].tolist()
    assert (out[out["oversize"] == 1]["doc_id"] < 5).all() and (out["oversize"] == 1).sum() == 5

    g = out[out["oversize"] == 0].groupby("bin_id")
    assert (g["n_tok"].sum() <= ctx).all()
    # offsets tile: sorted offsets per bin == cumsum of sizes in that order
    for _, grp in g:
        grp = grp.sort_values("bin_off")
        expect = np.concatenate(([0], grp["n_tok"].to_numpy()[:-1].cumsum()))
        assert (grp["bin_off"].to_numpy() == expect).all()
    # oversize bins are solo
    solo = out[out["oversize"] == 1].groupby("bin_id").size()
    assert (solo == 1).all()

    out2 = (
        pack_bins(rd.from_pandas(df).repartition(2), ctx, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)

    # utilization: BFD bins should run well above 80% full on this mix
    util = g["n_tok"].sum().mean() / ctx
    assert util > 0.8, util
