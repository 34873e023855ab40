"""End-to-end curation pipeline: every stage drops exactly its planted
category, and the composition streams corpus-in → corpus-out."""

import numpy as np
import pandas as pd

from clever_canal_ray.pipelines.curation import curate_corpus


def _corpus():
    rng = np.random.default_rng(42)
    filler = [f"word{i}" for i in range(200)]
    rows = []

    def en_text(i):
        body = " ".join(rng.choice(filler, size=12))
        return f"the quick item {i} is in that box and {body}"

    # 40 good unique en docs: ids 0..39
    for i in range(40):
        rows.append((i, en_text(i)))
    # 10 german docs: ids 100..109 (lang filter)
    for i in range(10):
        body = " ".join(rng.choice(filler, size=10))
        rows.append((100 + i, f"der hund ist nicht ein und die katze {body}"))
    # 5 too-short en docs: ids 200..204 (length filter)
    for i in range(5):
        rows.append((200 + i, "the and of"))
    # 10 exact duplicates of docs 0..9 at higher ids 300..309 (exact dedup)
    for i in range(10):
        rows.append((300 + i, rows[i][1]))
    # 5 contaminated docs embedding an eval sentence: ids 400..404
    eval_sent = "september benchmark answers must never leak into training"
    for i in range(5):
        rows.append((400 + i, f"the {eval_sent} is in that set {i}"))
    return pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}), eval_sent


def test_curate_corpus_stages_drop_planted_categories(ray_session):
    import ray.data as rd

    df, eval_sent = _corpus()
    # reference corpus contains the exact text of docs 20..24
    ref = pd.DataFrame(
        {"doc_id": range(5), "text": df[df["doc_id"].isin(range(20, 25))]["text"].tolist()}
    )

    curated, report = curate_corpus(
        rd.from_pandas(df).repartition(4),
        keep_langs=("en",),
        min_tokens=6,
        exact_dedup=True,
        reference_ds=rd.from_pandas(ref),
        eval_texts=[eval_sent],
        report=True,
    )
    got = curated.to_pandas().sort_values("doc_id").reset_index(drop=True)
    # survivors: en docs 0..39, minus 20..24 (reference dups); shorts,
    # german, exact dups (300s, higher id), contaminated (400s) gone
    expect = sorted(set(range(40)) - set(range(20, 25)))
    assert got["doc_id"].tolist() == expect
    assert list(got.columns) == ["doc_id", "text"]
    names = [s for s, _ in report]
    assert names == [
        "input", "lang_filter", "length_filter", "exact_dedup",
        "cross_corpus_dedup", "decontaminate",
    ]
    counts = dict(report)
    assert counts["input"] == len(df)
    assert counts["lang_filter"] == len(df) - 10
    assert counts["length_filter"] == counts["lang_filter"] - 5
    assert counts["exact_dedup"] == counts["length_filter"] - 10
    assert counts["cross_corpus_dedup"] == counts["exact_dedup"] - 5
    assert counts["decontaminate"] == counts["cross_corpus_dedup"] - 5


def test_curate_corpus_budget_and_dsir_selection(ray_session):
    import ray.data as rd

    df, _ = _corpus()
    en_only = df[df["doc_id"] < 40]

    # budget selection: default score prefers longer docs; total stays
    # within the budget and is maximal among (len desc, id asc) prefix
    curated, report = curate_corpus(
        rd.from_pandas(en_only),
        exact_dedup=False,
        budget_tokens=200,
        report=True,
    )
    got = curated.to_pandas()
    n_tok = got["text"].str.count(" ") + 1
    assert n_tok.sum() <= 200 and len(got) > 0
    assert [s for s, _ in report] == ["input", "budget_select"]
    assert list(got.columns) == ["doc_id", "text"]

    # DSIR selection toward an all-en target prefers en docs from a mixed pool
    mixed = df[(df["doc_id"] < 40) | (df["doc_id"] >= 100) & (df["doc_id"] < 110)]
    curated2, _ = curate_corpus(
        rd.from_pandas(mixed).repartition(3),
        exact_dedup=False,
        target_ds=rd.from_pandas(en_only),
        dsir_n_select=20,
        dsir_temperature=0.01,
        dsir_n_buckets=4096,
    )
    sel = curated2.to_pandas()
    assert len(sel) == 20
    assert (sel["doc_id"] < 40).mean() >= 0.9


def test_curate_cli_subprocess(tmp_path):
    """The curate subcommand runs the chain in its own process:
    parquet in → curated parquet out, stage report on stdout."""
    import json
    import os
    import subprocess
    import sys

    df, eval_sent = _corpus()
    src = str(tmp_path / "in.parquet")
    out = str(tmp_path / "out")
    evalf = str(tmp_path / "eval.txt")
    df.to_parquet(src)
    with open(evalf, "w") as fh:
        fh.write(eval_sent + "\n")
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    r = subprocess.run(
        [
            sys.executable, "-m", "clever_canal_ray", "curate",
            "--in", src, "--out", out, "--langs", "en",
            "--min-tokens", "6", "--eval-file", evalf, "--report",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["stages"]["decontaminate"] == 40  # the en docs 0..39
    import pandas as pd

    got = pd.read_parquet(out).sort_values("doc_id")
    # en docs 0..39 survive lang+length; 300s are exact dups (dropped);
    # contaminated 400s dropped; no reference corpus in this run
    assert got["doc_id"].tolist() == list(range(40))


def test_curate_cli_dsir_selection(tmp_path):
    import json
    import os
    import subprocess
    import sys

    df, _ = _corpus()
    en = df[df["doc_id"] < 40]
    mixed = df[(df["doc_id"] < 40) | ((df["doc_id"] >= 100) & (df["doc_id"] < 110))]
    src = str(tmp_path / "mixed.parquet")
    tgt = str(tmp_path / "target.parquet")
    out = str(tmp_path / "sel")
    mixed.to_parquet(src)
    en.to_parquet(tgt)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    r = subprocess.run(
        [
            sys.executable, "-m", "clever_canal_ray", "curate",
            "--in", src, "--out", out, "--no-exact-dedup",
            "--target", tgt, "--dsir-select", "20", "--dsir-temperature", "0.01",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import pandas as pd

    sel = pd.read_parquet(out)
    assert len(sel) == 20 and (sel["doc_id"] < 40).mean() >= 0.9


def test_curate_corpus_gopher_preset(ray_session):
    import ray.data as rd

    filler = " ".join(f"word{i} the of and be to that have with" for i in range(12))
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [filler, "tiny doc", " ".join(["123 456"] * 40)],
        }
    )
    curated, report = curate_corpus(
        rd.from_pandas(df), quality_preset="gopher", exact_dedup=False, report=True
    )
    got = curated.to_pandas()
    assert got["doc_id"].tolist() == [0]
    assert dict(report)["gopher_quality"] == 1
    import pytest

    with pytest.raises(ValueError, match="quality_preset"):
        curate_corpus(rd.from_pandas(df), quality_preset="nope")


def test_curate_corpus_c4_preset(ray_session):
    import ray.data as rd

    good = "this line has plenty of words and ends properly."
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "\n".join([good] * 3 + ["junk line no punctuation"]),
                good,  # < 3 kept lines -> page dropped
                "\n".join([good] * 4) + "\ncode { x }",  # curly brace page
            ],
        }
    )
    curated, report = curate_corpus(
        rd.from_pandas(df), quality_preset="c4", exact_dedup=False, report=True
    )
    got = curated.to_pandas()
    assert got["doc_id"].tolist() == [0]
    assert got["text"].iloc[0] == "\n".join([good] * 3)  # junk line removed
    assert dict(report)["c4_clean"] == 1
