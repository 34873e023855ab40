"""Round-2 text/corpus ops: Gopher repetition stats, train/eval
decontamination (broadcast eval-gram set), and stratified per-source
sampling — edge cases the sf-table gate can't reach (single-token docs,
fully repeated docs, boundary-straddling n-grams, unknown sources)."""

import hashlib
from collections import Counter

import numpy as np
import pandas as pd

from clever_canal_ray.functions.corpus import Decontaminator, decontaminate, stratified_sample
from clever_canal_ray.functions.text import repetition_stats


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df).repartition(3)


def _e6(x: float) -> int:
    return int(np.floor(x * 1_000_000 + 0.5))


def test_repetition_stats_exact():
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a b a b a b",  # bigrams: ab ba ab ba ab -> top 3/5; tris: aba bab aba bab -> dup 1/2
                "x",  # too short: 0, 0
                "p q",  # one bigram -> top 1/1; no trigram -> 0
                "u v w z",  # all distinct
            ],
        }
    )
    out = repetition_stats(df)
    assert out["top_bigram_e6"].tolist() == [_e6(3 / 5), 0, _e6(1.0), _e6(1 / 3)]
    assert out["dup_trigram_e6"].tolist() == [_e6(1 / 2), 0, 0, 0]


def test_repetition_no_cross_doc_grams():
    # doc boundary: "a b" + "b a" must NOT create the bigram "b b"
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "b a"]})
    out = repetition_stats(df)
    assert out["top_bigram_e6"].tolist() == [_e6(1.0), _e6(1.0)]


def test_repetition_matches_serial_oracle():
    rng = np.random.default_rng(5)
    vocab = list("abcdefgh")
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 30))) for _ in range(300)]
    out = repetition_stats(pd.DataFrame({"doc_id": range(300), "text": texts}))
    for i, t in enumerate(texts):
        w = t.split(" ")
        bi = [f"{w[j]} {w[j+1]}" for j in range(len(w) - 1)]
        tri = [f"{w[j]} {w[j+1]} {w[j+2]}" for j in range(len(w) - 2)]
        want_top = _e6(max(Counter(bi).values()) / len(bi)) if bi else 0
        want_dup = _e6(1 - len(set(tri)) / len(tri)) if tri else 0
        assert out["top_bigram_e6"].iloc[i] == want_top, (i, t)
        assert out["dup_trigram_e6"].iloc[i] == want_dup, (i, t)


def test_decontaminator_hand_cases(ray_session):
    eval_texts = ["the quick brown fox jumps over", "tiny"]
    # grams: "the quick brown fox jumps", "quick brown fox jumps over", "tiny"
    train = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "z the quick brown fox jumps y",  # contains gram 1 -> 1 hit
                "the quick brown fox jumps over x",  # grams 1+2 -> 2 hits
                "totally clean text with no overlap at all",
                "tiny",  # short doc == eval short text -> 1 hit
            ],
        }
    )
    out = decontaminate(_ds(train), eval_texts, n=5, concurrency=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["n_hits"].tolist() == [1, 2, 0, 1]
    assert out["contaminated"].tolist() == [1, 1, 0, 1]


def test_decontaminator_distinct_hits_counted_once(ray_session):
    # the same eval gram appearing twice in one doc counts once
    eval_texts = ["a b c d e"]
    train = pd.DataFrame({"doc_id": [0], "text": ["a b c d e z a b c d e"]})
    out = decontaminate(_ds(train), eval_texts, n=5).to_pandas()
    assert out["n_hits"].tolist() == [1]


def test_build_eval_grams_short_and_long():
    g = Decontaminator.build_eval_grams(["a b", "p q r s t u"], n=5)
    assert "a b" in g  # short text as one gram
    assert "p q r s t" in g and "q r s t u" in g
    assert len(g) == 3


def test_stratified_sample_rule_and_determinism(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(2000),
            "source": np.tile(["a", "b", "unknown"], 667)[:2000],
        }
    )
    rates = {"a": 1000, "b": 250}  # a: keep all, b: ~quarter, unknown: drop
    out = stratified_sample(_ds(df), rates, source_col="source", id_col="doc_id", mirror=True).to_pandas()
    assert (out[out["source"] == "a"].shape[0]) == (df["source"] == "a").sum()
    assert (out["source"] == "unknown").sum() == 0
    nb = (out["source"] == "b").sum()
    total_b = (df["source"] == "b").sum()
    assert 0.1 * total_b < nb < 0.45 * total_b

    def h(i, s):
        return int.from_bytes(hashlib.md5(f"{i}:{s}".encode()).digest()[8:16], "little")

    expect_b = {
        int(i)
        for i, s in zip(df["doc_id"], df["source"])
        if s == "b" and h(i, s) % 1000 < 250
    }
    assert set(out[out["source"] == "b"]["doc_id"]) == expect_b


def test_redact_pii_shapes(ray_session):
    from clever_canal_ray.functions.text import redact

    df = pd.DataFrame(
        {
            "i": range(4),
            "t": [
                "mail me at bob.smith+x@example.co.uk today",
                "server 192.168.0.1 rebooted",
                "call +1 (555) 123-4567 now",
                "order 1234 shipped 5 units",
            ],
        }
    )
    import ray.data as rd

    out = (
        redact(rd.from_pandas(df).repartition(2), "t", out_col="masked", count_col="n_first")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    assert out["masked"].tolist() == [
        "mail me at <EMAIL> today",
        "server <IP> rebooted",
        "call <PHONE> now",
        "order # shipped # units",
    ]
    # count_col counts the FIRST pattern (email) matches
    assert out["n_first"].tolist() == [1, 0, 0, 0]


def test_stratified_sample_fast_default(ray_session):
    """Fast-hash default: same rule shape (rate honored, unknown source
    dropped, deterministic) without the md5 mirror."""
    df = pd.DataFrame(
        {"doc_id": np.arange(3000), "source": np.tile(["a", "b", "x"], 1000)}
    )
    rates = {"a": 1000, "b": 300}
    out1 = stratified_sample(_ds(df), rates, source_col="source", id_col="doc_id").to_pandas()
    out2 = stratified_sample(_ds(df), rates, source_col="source", id_col="doc_id").to_pandas()
    # the sample MEMBERSHIP is deterministic; row order is not (the
    # _ds helper repartitions, and all-to-all output order may vary
    # run-to-run under load)
    assert sorted(out1["doc_id"].tolist()) == sorted(out2["doc_id"].tolist())
    assert (out1[out1["source"] == "a"].shape[0]) == 1000
    assert (out1["source"] == "x").sum() == 0
    nb = (out1["source"] == "b").sum()
    assert 0.15 * 1000 < nb < 0.45 * 1000


def test_chunk_tokens_vs_duckdb_oracle(ray_session):
    """Context-window chunking vs a generate_series SQL oracle, with
    overlap (stride < ctx) and a doc shorter than one window."""
    import duckdb
    import ray

    from clever_canal_ray.functions.corpus import chunk_tokens

    df = pd.DataFrame({"doc_id": np.arange(50), "n_tok": (np.arange(50) * 37) % 700})
    out = (
        chunk_tokens(
            ray.data.from_pandas([df.iloc[:20], df.iloc[20:]]),
            ctx=128,
            stride=96,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", df)
    oracle = con.execute(
        """
        WITH k AS (SELECT doc_id, n_tok,
                          1 + CAST(ceil(greatest(n_tok - 128, 0) / 96.0) AS BIGINT) AS nk
                   FROM docs),
        c AS (SELECT doc_id, n_tok, unnest(generate_series(0, nk - 1)) AS chunk_idx FROM k)
        SELECT doc_id, chunk_idx, chunk_idx * 96 AS tok_start,
               greatest(least(n_tok - chunk_idx * 96, 128), 0) AS tok_len
        FROM c ORDER BY doc_id, chunk_idx
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(
        out.astype("int64"), oracle.astype("int64"), check_dtype=False
    )
    # every token covered: union of [start, start+len) per doc == [0, n)
    g = out[out["doc_id"] == 49]
    assert g["tok_start"].iloc[0] == 0
    assert (g["tok_start"] + g["tok_len"]).max() == df["n_tok"].iloc[49]


def _mix_df(seed=5):
    rng = np.random.default_rng(seed)
    n = 6000
    src = rng.choice(["web", "books", "code"], size=n, p=[0.7, 0.2, 0.1])
    return pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "source": src,
            "n_tok": rng.integers(50, 150, size=n),
        }
    )


def test_mix_rates_no_upsampling_budget(ray_session):
    """With no explicit budget, the binding source keeps rate 1000 and
    the others downsample so realized token shares hit the weights."""
    from clever_canal_ray.functions.corpus import mix_rates

    df = _mix_df()
    w = {"web": 0.5, "books": 0.3, "code": 0.2}
    info = mix_rates(_ds(df), w)
    avail = df.groupby("source")["n_tok"].sum().astype(float).to_dict()
    assert info["available"] == {s: avail[s] for s in w}
    # binding source = argmin A_s/w_s; here code (10% of rows, 20% weight)
    assert min(avail[s] / w[s] for s in w) == avail["code"] / w["code"]
    assert info["rates_permille"]["code"] == 1000
    assert info["deficit"] == {}
    b = info["budget_tokens"]
    for s, ws in w.items():
        assert info["rates_permille"][s] == min(1000, int(1000 * ws * b / avail[s]))


def test_mix_sample_realized_token_shares(ray_session):
    """End to end: the sampled corpus' per-source token shares land on
    the target mix (permille granularity + hash noise tolerance), and
    the op is deterministic."""
    from clever_canal_ray.functions.corpus import mix_sample

    df = _mix_df()
    w = {"web": 0.5, "books": 0.3, "code": 0.2}
    out, info = mix_sample(_ds(df), w)
    got = out.to_pandas()
    shares = got.groupby("source")["n_tok"].sum() / got["n_tok"].sum()
    for s, ws in w.items():
        assert abs(shares[s] - ws) < 0.04, (s, shares[s], ws)
    got2, _ = mix_sample(_ds(df), w)
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        got2.to_pandas().sort_values("doc_id").reset_index(drop=True),
    )


def test_mix_rates_deficit_and_guards(ray_session):
    """An over-asked budget caps rates at 1000 and reports the deficit
    (never duplicates rows); unknown/dry sources and empty weights
    raise; unweighted sources drop to rate 0 in the sample."""
    import pytest

    from clever_canal_ray.functions.corpus import mix_rates, mix_sample

    df = _mix_df()
    w = {"web": 0.5, "code": 0.5}
    total = float(df["n_tok"].sum()) * 2  # more than the corpus holds
    info = mix_rates(_ds(df), w, total_tokens=total)
    assert info["rates_permille"] == {"web": 1000, "code": 1000}
    assert info["deficit"]["code"] > 0 and info["deficit"]["web"] > 0
    with pytest.raises(ValueError, match="no tokens"):
        mix_rates(_ds(df), {"web": 1.0, "wikipedia": 1.0})
    with pytest.raises(ValueError, match="positive weight"):
        mix_rates(_ds(df), {"web": 0.0})
    out, _ = mix_sample(_ds(df), w)
    assert (out.to_pandas()["source"] == "books").sum() == 0


def test_mix_sample_upsampling_epochs(ray_session):
    """allow_upsampling: a scarce domain repeats across epochs to hit
    the asked budget — full copies per floor(rate/1000), a fractional
    epoch on an independent hash, epoch 0 bit-identical to the plain
    sampler, deterministic."""
    from clever_canal_ray.functions.corpus import (
        mix_sample,
        stratified_sample,
        stratified_sample_epochs,
    )

    df = _mix_df()
    w = {"web": 0.5, "code": 0.5}
    total = float(df[df["source"] != "books"]["n_tok"].sum()) * 1.2
    out, info = mix_sample(
        _ds(df), w, total_tokens=total, allow_upsampling=True
    )
    got = out.to_pandas()
    assert info["deficit"] == {}
    assert info["rates_permille"]["code"] > 1000  # scarce domain upsampled
    # realized per-source token totals land on the targets
    tok = got.groupby("source")["n_tok"].sum()
    for s in w:
        assert abs(tok[s] - info["target"][s]) / info["target"][s] < 0.03, s
    # full epochs are exact copies: every code row appears >= floor(r/1000) times
    n_full = info["rates_permille"]["code"] // 1000
    counts = got[got["source"] == "code"].groupby("doc_id").size()
    assert (counts >= n_full).all() and counts.max() == n_full + 1
    # epoch 0 == the plain (capped) sampler's keep-set for rates <= 1000
    capped = {s: min(1000, r) for s, r in info["rates_permille"].items()}
    plain = stratified_sample(_ds(df), capped, "source", "doc_id").to_pandas()
    e0 = got[got["epoch"] == 0]
    web_plain = set(plain[plain["source"] == "web"]["doc_id"])
    web_e0 = set(e0[e0["source"] == "web"]["doc_id"])
    assert web_plain == web_e0
    # determinism
    again = stratified_sample_epochs(
        _ds(df), info["rates_permille"], "source", "doc_id"
    ).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["doc_id", "epoch"]).reset_index(drop=True),
        again.sort_values(["doc_id", "epoch"]).reset_index(drop=True),
    )
    # runaway-epoch guard
    import pytest

    with pytest.raises(ValueError, match="epochs"):
        mix_sample(_ds(df), w, total_tokens=total * 50, allow_upsampling=True)
