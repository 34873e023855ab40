"""BPE tokenizer training + encode: histogram parity, known-merge
check, losslessness, cache/layout invariance, vocab guard."""

import numpy as np
import pandas as pd
import pytest

from clever_canal_ray.functions.bpe import (
    END_MARKER,
    BpeEncoder,
    bpe_encode,
    bpe_train,
    bpe_train_corpus,
    encode_word,
    word_histogram,
)


def _hist(d: dict) -> pd.DataFrame:
    return pd.DataFrame({"w": list(d.keys()), "c": list(d.values())})


def test_bpe_train_known_merges():
    """The classic hug/pug/pun/bun/hugs histogram: ('u','g') is the
    first merge (count 20: hug 10 + pug 5 + hugs 5); training is
    deterministic and merged symbols compose."""
    hist = _hist({"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5})
    merges = bpe_train(hist, num_merges=4)
    assert merges[0] == ("u", "g")
    assert len(merges) == 4
    # deterministic re-run
    assert bpe_train(hist, num_merges=4) == merges


def test_bpe_encode_reproduces_training_segmentation():
    """Greedy rank-order apply == the trainer's final word state (the
    standard BPE property), checked by replaying merges over the
    histogram words serially."""
    hist = _hist({"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5, "bug": 3})
    merges = bpe_train(hist, num_merges=6, min_count=1)
    ranks = {m: i for i, m in enumerate(merges)}

    from clever_canal_ray.functions.bpe import _merge_word

    state = {w: tuple(w) + (END_MARKER,) for w in hist["w"]}
    for a, b in merges:
        state = {w: _merge_word(s, (a, b), a + b) for w, s in state.items()}
    for w in hist["w"]:
        assert encode_word(w, ranks) == state[w], w


def test_bpe_encode_lossless_and_oov():
    hist = _hist({"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges = bpe_train(hist, num_merges=10, min_count=1)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in ["low", "lowest", "newer", "zzz", "a"]:
        pieces = encode_word(w, ranks)
        assert "".join(pieces) == w + END_MARKER, w


def test_word_histogram_matches_counter_and_guard(ray_session):
    import ray.data as rd
    from collections import Counter

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "the cat sat",
                "the cat",
                "a dog sat on the mat",
                "",
                "the the the",
                "cat",
            ],
        }
    )
    hist = word_histogram(rd.from_pandas(docs).repartition(3), num_buckets=4)
    ref = Counter(w for t in docs["text"] for w in t.split(" ") if w)
    assert dict(zip(hist["w"], hist["c"])) == dict(ref)
    # sorted by count desc then word
    assert hist["c"].is_monotonic_decreasing or (
        hist.sort_values(["c", "w"], ascending=[False, True])["w"].tolist()
        == hist["w"].tolist()
    )
    # top_v cap keeps the most frequent
    top = word_histogram(rd.from_pandas(docs), num_buckets=4, top_v=2)
    assert len(top) == 2 and top["w"].iloc[0] == "the"
    with pytest.raises(ValueError, match="max_vocab"):
        word_histogram(rd.from_pandas(docs), num_buckets=4, max_vocab=3)


def test_bpe_encode_distributed_matches_serial(ray_session):
    """Distributed encode == per-word serial reference; invariant to
    block layout; the actor cache returns identical results for words
    repeating across batches."""
    import ray.data as rd

    rng = np.random.default_rng(17)
    vocab = ["hugging", "puns", "bunting", "hug", "pun", "lower", "newest", "wide"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 9))) for _ in range(60)]
    texts += ["", "hug"]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(docs)

    merges = bpe_train_corpus(ds, num_merges=30, min_count=1, num_buckets=4)
    ranks = {m: i for i, m in enumerate(merges)}

    got = (
        bpe_encode(rd.from_pandas(docs).repartition(5), merges, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == ["doc_id", "pieces", "n_pieces"]
    for _, r in got.iterrows():
        t = docs["text"].iloc[int(r["doc_id"])]
        ref = [p for w in t.split(" ") if w for p in encode_word(w, ranks)]
        assert list(r["pieces"]) == ref, r["doc_id"]
        assert int(r["n_pieces"]) == len(ref)
    # empty doc -> empty pieces
    empty = got[got["doc_id"] == len(texts) - 2]["pieces"].iloc[0]
    assert len(list(empty)) == 0

    got2 = (
        bpe_encode(rd.from_pandas(docs).repartition(2), merges, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_pieces"].tolist() == got2["n_pieces"].tolist()
    assert [list(p) for p in got["pieces"]] == [list(p) for p in got2["pieces"]]


def test_bpe_encoder_batch_kernel_direct():
    """The vectorized ragged gather inside BpeEncoder.__call__ matches
    a plain loop on a crafted batch (no Ray needed)."""
    merges = bpe_train(_hist({"aaab": 4, "ab": 6, "ba": 5}), num_merges=5, min_count=1)
    enc = BpeEncoder(merges, id_col="doc_id", text_col="text")
    df = pd.DataFrame(
        {"doc_id": [7, 8, 9], "text": ["ab aaab", "", "ba ba ab"]},
        index=[10, 20, 30],  # non-default index must not break the gather
    )
    t = enc(df)
    ranks = {m: i for i, m in enumerate(merges)}
    rows = t.to_pylist()
    for row in rows:
        text = df[df["doc_id"] == row["doc_id"]]["text"].iloc[0]
        ref = [p for w in text.split(" ") if w for p in encode_word(w, ranks)]
        assert row["pieces"] == ref
        assert row["n_pieces"] == len(ref)
    # cache hit path: second call over the same words, same answer
    t2 = enc(df)
    assert t2.to_pylist() == rows


def test_bpe_encode_ids_lake_schema(ray_session):
    """bpe_encode_ids emits the engine's tokenized-sequence payload
    (doc_id, tokens: list<int32>, n_tok: int32, source): ids decode
    back to the piece stream via the vocab, unknown chars map to <unk>,
    and the output feeds Lake.create_from_dataset unchanged."""
    import ray.data as rd

    from clever_canal_ray.functions.bpe import (
        UNK,
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
        encode_word,
        word_histogram,
    )

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": ["hug pug", "pun bun hug", "hugs", "", "hug hug", "zzz"],
            "source": ["web"] * 3 + ["books"] * 3,
        }
    )
    train = rd.from_pandas(docs[docs["doc_id"] < 5])  # 'z' stays unseen
    hist = word_histogram(train, num_buckets=4)
    merges = bpe_train(hist, num_merges=10, min_count=1)
    vocab = bpe_vocab(hist, merges)
    ranks = {m: i for i, m in enumerate(merges)}
    inv = {v: k for k, v in vocab.items()}

    out = (
        bpe_encode_ids(rd.from_pandas(docs).repartition(3), merges, vocab, source_col="source")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["doc_id", "tokens", "n_tok", "source"]
    for _, r in out.iterrows():
        text = docs["text"].iloc[int(r["doc_id"])]
        ref = [p for w in text.split(" ") if w for p in encode_word(w, ranks)]
        got = [inv[int(t)] for t in r["tokens"]]
        if "z" in text:  # unseen char: every z-piece maps to <unk>
            assert got and all(g in (UNK, "</w>") or "z" not in g for g in got)
        else:
            assert got == ref
        assert int(r["n_tok"]) == len(ref)
    assert out["tokens"].iloc[3] is not None and len(list(out["tokens"].iloc[3])) == 0

    # the output IS a valid lake payload
    from clever_canal_ray.state.manifest import Lake

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        lake = Lake.create_from_dataset(
            d + "/lake",
            bpe_encode_ids(rd.from_pandas(docs), merges, vocab, source_col="source"),
            num_partitions=2,
        )
        t = lake.read_table().to_pandas()
        assert len(t) == 6 and set(t.columns) >= {"doc_id", "tokens", "n_tok", "source"}


def test_tokenizer_cli_train_and_encode(tmp_path):
    """train-tokenizer → encode in real subprocesses: corpus parquet in,
    tokenized-sequence parquet out, round-trippable via the artifact."""
    import json
    import os
    import subprocess
    import sys

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": [f"hug pug pun bun item {i % 7}" for i in range(40)],
            "src": ["web"] * 40,
        }
    )
    src = str(tmp_path / "docs.parquet")
    docs.to_parquet(src)
    tok = str(tmp_path / "tok.json")
    out = str(tmp_path / "encoded")
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "clever_canal_ray", *args],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    t = run("train-tokenizer", "--in", src, "--out", tok, "--merges", "30", "--min-count", "1")
    assert t["merges"] > 0 and t["vocab"] > 2

    e = run("encode", "--in", src, "--out", out, "--tokenizer", tok, "--source-col", "src")
    assert e["rows"] == 40
    got = pd.read_parquet(out).sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == ["doc_id", "tokens", "n_tok", "source"]
    assert (got["n_tok"] > 0).all() and (got["source"] == "web").all()

    # artifact round trip == in-process encode
    from clever_canal_ray.functions.bpe import encode_word, load_tokenizer

    merges, vocab = load_tokenizer(tok)
    inv = {v: k for k, v in vocab.items()}
    ranks = {m: i for i, m in enumerate(merges)}
    row = got.iloc[3]
    ref = [p for w in docs["text"].iloc[3].split(" ") for p in encode_word(w, ranks)]
    assert [inv[int(x)] for x in row["tokens"]] == ref


def test_bpe_encode_survives_actor_death(ray_session, tmp_path):
    """REGRESSION (ray issue 53727 warning in bench tails): the encoder
    actor's constructor args must be inline-able (packed bytes), never
    object-store refs — otherwise an actor RESTART after a worker death
    can fail to reconstruct. Kill one encode actor mid-stream with
    os._exit and require the job to complete with correct output."""
    import os

    import numpy as np
    import ray.data as rd

    from clever_canal_ray.functions.bpe import (
        BpeEncoder,
        _pack_tokenizer,
        bpe_train,
        word_histogram,
    )

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "tok"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64),
            "text": [" ".join(rng.choice(vocab, 6)) for _ in range(400)],
        }
    )
    merges = bpe_train(word_histogram(rd.from_pandas(docs)), num_merges=20, min_count=1)
    flag = str(tmp_path / "crashed_once.flag")

    class CrashingEncoder(BpeEncoder):
        def __call__(self, df):
            if not os.path.exists(flag):
                with open(flag, "w") as fh:
                    fh.write("x")
                os._exit(1)  # hard worker death, not an exception
            return super().__call__(df)

    out = (
        rd.from_pandas(docs)
        .repartition(8)
        .map_batches(
            CrashingEncoder,
            fn_constructor_kwargs={"merges": _pack_tokenizer(merges)},
            batch_format="pandas",
            concurrency=2,
        )
        .to_pandas()
    )
    assert os.path.exists(flag)  # an actor really died mid-stream
    assert sorted(out["doc_id"]) == list(range(400))
    ref = BpeEncoder(merges)(docs).to_pandas().set_index("doc_id")
    got = out.set_index("doc_id").loc[ref.index]
    assert (got["n_pieces"].to_numpy() == ref["n_pieces"].to_numpy()).all()
