"""Operator-library tests: near-dup detection on constructed
near-duplicates, LSH ANN recall vs brute force, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest

from clever_canal_ray.functions.ann import brute_force_topk, lsh_topk
from clever_canal_ray.functions.dedup import (
    char_jaccard,
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    simhash64,
)
from clever_canal_ray.functions.multimodal import extract_features, synthesize_media_table
from clever_canal_ray.functions.text import rolling_fingerprints


def _near_dup_docs(n=40, seed=3):
    """Docs in near-dup pairs: (2k, 2k+1) differ by one word."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for k in range(n // 2):
        words = list(rng.choice(vocab, size=60))
        rows.append({"doc_id": 2 * k, "text": " ".join(words)})
        mutated = list(words)
        mutated[int(rng.integers(0, 60))] = "XX"
        rows.append({"doc_id": 2 * k + 1, "text": " ".join(mutated)})
    return pd.DataFrame(rows)


def test_minhash_finds_planted_near_dups(ray_session):
    import ray.data as rd

    docs = _near_dup_docs()
    ds = rd.from_pandas(docs)
    pairs = minhash_lsh_pairs(ds, threshold=0.6).to_pandas()
    found = {(min(a, b), max(a, b)) for a, b in zip(pairs["a"], pairs["b"])}
    planted = {(2 * k, 2 * k + 1) for k in range(len(docs) // 2)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"minhash recall {recall}"
    # unrelated docs shouldn't pair up en masse
    assert len(found - planted) < len(planted) * 0.5


def test_exact_dedup_keep_first(ray_session):
    import ray.data as rd

    docs = pd.DataFrame(
        {"doc_id": [5, 3, 9, 7, 1], "text": ["aa", "bb", "aa", "bb", "cc"]}
    )
    out = exact_dedup(rd.from_pandas(docs)).to_pandas().sort_values("keep_id")
    assert out["keep_id"].tolist() == [1, 3, 5]
    assert out.set_index("keep_id")["n_dups"].to_dict() == {1: 1, 3: 2, 5: 2}


def test_simhash_near_dups_close(ray_session):
    import ray.data as rd

    docs = _near_dup_docs(n=10)
    out = simhash64(docs).set_index("doc_id")["simhash"]
    M = (1 << 64) - 1  # int64 two's-complement -> uint64 bit pattern
    for k in range(5):
        d = bin((int(out[2 * k]) & M) ^ (int(out[2 * k + 1]) & M)).count("1")
        assert d <= 12, f"hamming {d} too large for near-dups"


def test_char_jaccard_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    # DuckDB's jaccard() rejects empty strings; non-empty cases only
    cases = [("abcd", "abce"), ("hello world", "help"), ("xyz", "abc"), ("a", "a")]
    for a, b in cases:
        sql = con.execute("select jaccard(?, ?)", [a, b]).fetchone()[0]
        assert abs(char_jaccard(a, b) - sql) < 1e-12, (a, b)


def test_lsh_ann_recall_vs_brute_force(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(8)
    emb = pd.DataFrame(
        {"vec_id": np.arange(500), "embedding": list(rng.standard_normal((500, 32)))}
    )
    q = np.stack(emb["embedding"].iloc[:2].to_numpy())
    ds = rd.from_pandas(emb)
    exact = brute_force_topk(ds, q, k=5)
    approx = lsh_topk(rd.from_pandas(emb), q, k=5, n_bits=4)
    # the query vector itself must always be found (same bucket)
    for qi in (0, 1):
        ids = set(approx[approx["query_i"] == qi]["vec_id"])
        assert qi in ids
        exact_ids = set(exact[exact["query_i"] == qi]["vec_id"])
        recall = len(ids & exact_ids) / 5
        assert recall >= 0.2  # 4-bit single-table LSH: weak but nonzero

def test_embedding_dup_pairs_symmetric_threshold(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    base = rng.standard_normal((20, 16))
    # plant exact duplicates 0<->10
    base[10] = base[0]
    emb = pd.DataFrame({"vec_id": np.arange(20), "embedding": list(base)})
    pairs = embedding_dup_pairs(rd.from_pandas(emb), threshold=0.99).to_pandas()
    assert ((pairs["a"] == 0) & (pairs["b"] == 10)).any()


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    tbl = synthesize_media_table(100, seed=4)
    ds = rd.from_arrow(tbl)
    out = extract_features(ds, concurrency=2, batch_size=16).to_pandas()
    assert len(out) == 100
    assert set(out.columns) == {"media_id", "media_type", "width", "height", "features", "n_bytes"}
    assert all(len(f) == 8 for f in out["features"])
    # deterministic across runs
    out2 = extract_features(rd.from_arrow(tbl), concurrency=2, batch_size=32).to_pandas()
    m1 = out.sort_values("media_id")["features"].map(tuple).tolist()
    m2 = out2.sort_values("media_id")["features"].map(tuple).tolist()
    assert m1 == m2


def test_real_decoder_gated():
    with pytest.raises(NotImplementedError):
        from clever_canal_ray.functions.multimodal import ImageFeatureExtractor

        ImageFeatureExtractor(fake=False)


def test_rolling_fingerprints_deterministic():
    docs = _near_dup_docs(n=6)
    a = rolling_fingerprints(docs)["rolling_fp"].to_pylist()
    b = rolling_fingerprints(docs)["rolling_fp"].to_pylist()
    assert a == b
    assert len(set(a)) > 1


def test_rolling_fingerprints_empty_and_null_batches():
    """Empty batches and all-None text columns (Arrow infers a null
    type with no offsets buffer) must not crash — fp is 0, like
    zero-byte text."""
    empty = rolling_fingerprints(pd.DataFrame({"doc_id": [], "text": []}))
    assert empty.num_rows == 0
    nulls = rolling_fingerprints(pd.DataFrame({"doc_id": [1, 2], "text": [None, None]}))
    assert nulls["rolling_fp"].to_pylist() == [0, 0]


def test_rolling_fingerprints_matches_row_reference():
    """The flat batch kernel (Arrow buffer bytes, masked flat k-gram
    hashes, van Herk sliding min, lexsort unique-xor) reproduces the
    per-row reference bit-for-bit, incl. the <k-byte, single-window
    and boundary-length edge cases."""
    from clever_canal_ray.functions.text import _rolling_fp_row

    rng = np.random.default_rng(11)
    texts = ["", "a", "abcdefg", "abcdefgh", "x" * 7, "x" * 8, "x" * 23, "x" * 24]
    vocab = list("abcdefghij KLMNO.,!?")
    texts += [
        "".join(rng.choice(vocab, size=int(rng.integers(0, 200)))) for _ in range(400)
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = rolling_fingerprints(df)["rolling_fp"].to_pylist()
    ref = [int(_rolling_fp_row(t)) for t in texts]
    assert out == ref


def test_minhash_verified_pairs(ray_session):
    import ray.data as rd

    from clever_canal_ray.functions.dedup import minhash_lsh_pairs_verified, shingle_jaccard

    docs = _near_dup_docs(n=30)
    out = minhash_lsh_pairs_verified(rd.from_pandas(docs), threshold=0.6).to_pandas()
    out["a"] = out["a"].astype(int)  # ids ride the shuffle join as strings
    out["b"] = out["b"].astype(int)
    assert len(out) > 0
    # every surviving pair really has jaccard >= threshold (exact)
    by_id = dict(zip(docs["doc_id"], docs["text"]))
    for a, b, j in zip(out["a"], out["b"], out["jaccard"]):
        assert abs(shingle_jaccard(by_id[a], by_id[b]) - j) < 1e-9
        assert j >= 0.6
    planted = {(2 * k, 2 * k + 1) for k in range(15)}
    found = {(min(a, b), max(a, b)) for a, b in zip(out["a"], out["b"])}
    assert len(found & planted) / len(planted) >= 0.9


def test_connected_components_chains_and_singletons(ray_session):
    """Min-label propagation resolves multi-hop chains (a-b, b-c, c-d
    -> one cluster) and separate components independently."""
    import pandas as pd
    import ray.data as rd

    from clever_canal_ray.functions.dedup import connected_components

    pairs = pd.DataFrame({"a": [1, 2, 3, 50, 80, 81], "b": [2, 3, 4, 51, 81, 82]})
    out = connected_components(rd.from_pandas(pairs)).to_pandas().sort_values("node")
    got = dict(zip(out["node"], out["cluster"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 50: 50, 51: 50, 80: 80, 81: 80, 82: 80}


def test_neardup_survivors_drops_non_min_members(ray_session):
    """neardup_survivors keeps each component's min-id doc plus every
    unclustered doc, via the bucketed anti-join (no driver set)."""
    import pandas as pd
    import ray.data as rd

    from clever_canal_ray.functions.dedup import connected_components, neardup_survivors

    docs = pd.DataFrame(
        {"doc_id": list(range(10)), "text": [f"t{i}" for i in range(10)]}
    )
    pairs = pd.DataFrame({"a": [1, 2, 7], "b": [2, 3, 8]})  # {1,2,3} and {7,8}
    comps = connected_components(rd.from_pandas(pairs))
    out = neardup_survivors(rd.from_pandas(docs), comps, num_buckets=4).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 4, 5, 6, 7, 9]
    # payload columns survive the round trip
    assert set(out.columns) == {"doc_id", "text"}
    assert dict(zip(out["doc_id"], out["text"]))[7] == "t7"


def test_minhash_small_and_large_paths_identical(ray_session):
    """The gate-scale single-execution path and the 100-TB
    signature-free path return the SAME pair set and est values."""
    import ray.data as rd

    from clever_canal_ray.functions.dedup import minhash_lsh_pairs

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(300)]
    texts, ids = [], []
    for i in range(120):
        words = list(rng.choice(vocab, size=30))
        ids.append(2 * i)
        texts.append(" ".join(words))
        if i % 3 == 0:  # planted near-dup: 2 words changed
            w2 = list(words)
            w2[5], w2[17] = "zzz", "qqq"
            ids.append(2 * i + 1)
            texts.append(" ".join(w2))
    docs = pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64), "text": texts})

    outs = {}
    for small in (True, False):
        df = (
            minhash_lsh_pairs(rd.from_pandas(docs), threshold=0.5, small_input=small)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        outs[small] = df
    assert len(outs[True]) > 0
    pd.testing.assert_frame_equal(
        outs[True][["a", "b", "est_jaccard"]].astype({"a": "int64", "b": "int64"}),
        outs[False][["a", "b", "est_jaccard"]].astype({"a": "int64", "b": "int64"}),
    )


def test_charset_jaccard_pairs_matches_serial(ray_session):
    """Distributed charset triangle join == serial all-pairs char_jaccard."""
    import itertools

    import ray.data as rd

    from clever_canal_ray.functions.dedup import char_jaccard, charset_jaccard_pairs

    rng = np.random.default_rng(7)
    alphabet = list("abcdefghijklmnop XYZ0123!éü")  # incl. latin-1
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": ["".join(rng.choice(alphabet, size=rng.integers(3, 30))) for _ in range(40)],
        }
    )
    out = (
        charset_jaccard_pairs(rd.from_pandas(docs), threshold=0.5, n_groups=3)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    expect = []
    for (ia, ta), (ib, tb) in itertools.combinations(zip(docs["doc_id"], docs["text"]), 2):
        j = char_jaccard(ta, tb)
        if j >= 0.5:
            expect.append((min(ia, ib), max(ia, ib), j))
    expect = pd.DataFrame(expect, columns=["a", "b", "jac"]).sort_values(["a", "b"]).reset_index(drop=True)
    assert len(out) == len(expect) > 0
    assert list(out["a"]) == list(expect["a"]) and list(out["b"]) == list(expect["b"])
    assert np.allclose(out["jac"], expect["jac"], atol=1e-12)


def test_charset_jaccard_unicode_bound_raises(ray_session):
    import ray.data as rd

    from clever_canal_ray.functions.dedup import charset_jaccard_pairs

    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["ok", "中文 text"]})
    with pytest.raises(Exception, match="minhash_lsh_pairs"):
        charset_jaccard_pairs(rd.from_pandas(docs)).to_pandas()


def test_ivf_ann_recall_vs_brute_force(ray_session):
    """IVF (k-means cells + n_probe search) finds most of the exact
    top-k; probing all cells recovers it exactly."""
    import ray.data as rd

    from clever_canal_ray.functions.ann import brute_force_topk, ivf_build_centroids, ivf_topk

    rng = np.random.default_rng(12)
    # clustered data so cells are meaningful
    centers = rng.standard_normal((6, 24)) * 3
    vecs = np.concatenate([c + rng.standard_normal((80, 24)) * 0.5 for c in centers])
    emb = pd.DataFrame({"vec_id": np.arange(len(vecs)), "embedding": list(vecs)})
    ds = rd.from_pandas(emb)
    cents = ivf_build_centroids(ds, n_centroids=6, iters=2)
    assert cents.shape == (6, 24)
    q = vecs[:2]
    exact = brute_force_topk(rd.from_pandas(emb), q, k=10)
    approx = ivf_topk(rd.from_pandas(emb), q, cents, k=10, n_probe=2)
    for qi in (0, 1):
        e = set(exact[exact["query_i"] == qi]["vec_id"])
        a = set(approx[approx["query_i"] == qi]["vec_id"])
        assert len(a & e) / 10 >= 0.7, f"ivf recall too low for q{qi}"
    # probing every cell degenerates to exact search
    full = ivf_topk(rd.from_pandas(emb), q, cents, k=10, n_probe=6)
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), exact.reset_index(drop=True), check_dtype=False
    )


def test_cluster_assign_matches_serial_and_separates(ray_session):
    """cluster_assign == serial argmax-cosine per row; on well-separated
    clusters every planted group lands in one cluster (purity 1)."""
    import ray.data as rd

    from clever_canal_ray.functions.ann import cluster_assign, ivf_build_centroids

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 16)) * 10  # far apart
    vecs = np.concatenate([c + rng.standard_normal((50, 16)) * 0.1 for c in centers])
    truth = np.repeat(np.arange(4), 50)
    emb = pd.DataFrame({"vec_id": np.arange(len(vecs)), "embedding": list(vecs)})
    # serial parity against TRAINED centroids (whatever Lloyd produced)
    cents = ivf_build_centroids(rd.from_pandas(emb), n_centroids=4, iters=3)
    out = (
        cluster_assign(rd.from_pandas(emb), cents)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    c = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    sims = n @ c.T
    ref_id = np.argmax(sims, axis=1)
    assert (out["cluster_id"].to_numpy() == ref_id).all()
    assert np.allclose(out["cluster_sim"], sims[np.arange(len(ref_id)), ref_id], atol=1e-5)
    # purity against the TRUE centers (assign quality is a property of
    # the centroids — Lloyd's deterministic first-k seeding may merge
    # planted groups, so that is not asserted here)
    out_true = (
        cluster_assign(rd.from_pandas(emb), centers)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    for g in range(4):
        assert out_true["cluster_id"][truth == g].nunique() == 1
    assert out_true["cluster_id"].nunique() == 4


def test_lsh_multiprobe_improves_recall(ray_session):
    import ray.data as rd

    from clever_canal_ray.functions.ann import brute_force_topk, lsh_topk

    rng = np.random.default_rng(21)
    emb = pd.DataFrame(
        {"vec_id": np.arange(400), "embedding": list(rng.standard_normal((400, 16)))}
    )
    q = np.stack(emb["embedding"].iloc[:2].to_numpy())
    exact = brute_force_topk(rd.from_pandas(emb), q, k=8)

    def recall(out):
        r = 0
        for qi in (0, 1):
            e = set(exact[exact["query_i"] == qi]["vec_id"])
            a = set(out[out["query_i"] == qi]["vec_id"])
            r += len(a & e)
        return r / 16

    single = recall(lsh_topk(rd.from_pandas(emb), q, k=8, n_bits=8))
    multi = recall(lsh_topk(rd.from_pandas(emb), q, k=8, n_bits=8, n_probe_bits=2))
    assert multi >= single
    assert multi >= 0.5


def test_multimodal_resize_and_frame_sample(ray_session):
    """Resize + frame-sample actor stages: correct output shapes,
    deterministic across batch sizes, real 1->N frame explosion."""
    import ray.data as rd

    from clever_canal_ray.functions.multimodal import (
        resize_images,
        sample_frames,
        synthesize_media_table,
    )

    tbl = synthesize_media_table(60, seed=6)
    resized = resize_images(rd.from_arrow(tbl), width=16, height=8).to_pandas()
    assert len(resized) == 60
    assert (resized["width"] == 16).all() and (resized["height"] == 8).all()
    assert all(len(p) == 16 * 8 for p in resized["payload"])
    # deterministic across batch sizes
    resized2 = resize_images(rd.from_arrow(tbl), width=16, height=8, batch_size=7).to_pandas()
    a = resized.sort_values("media_id")["payload"].tolist()
    b = resized2.sort_values("media_id")["payload"].tolist()
    assert a == b

    frames = sample_frames(rd.from_arrow(tbl), frame_bytes=128, stride=3).to_pandas()
    assert len(frames) > 60  # exploded
    assert (frames["frame_idx"] % 3 == 0).all()
    sizes = frames.groupby("media_id").size()
    assert (sizes >= 1).all()


def test_langid_batch_matches_row_reference(ray_session):
    """The columnar LangId kernel must reproduce the per-row reference
    implementation exactly (marker overlap, lexicographic tie-break,
    CJK head-slice gate, zero-score -> en)."""
    import pandas as pd

    from clever_canal_ray.functions.text import LangId

    texts = [
        "the quick brown fox and the lazy dog is in town",
        "der hund und die katze das ist nicht ein problem",
        "le chat et la maison est une belle pas",
        "el perro y la casa es una no bueno",
        "一二三四五六七 " * 3,  # CJK head
        "xyzzy plugh qwop",  # zero score -> en
        "la " * 1,  # fr/es tie candidates
        "",  # empty
        "the der le el y und et and is ist est es",  # multi-lang mix
        "LA LE EL the the DER",  # case folding
        ("und " * 300) + "the and of is to a in that",  # >500 chars: truncation must match
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    li = LangId()
    got = li(df)["pred_lang"].tolist()
    want = [li.predict_row(t) for t in texts]
    assert got == want


def test_langid_model_passthrough(ray_session):
    """model_factory loads once per actor and replaces the heuristic."""
    import pandas as pd

    from clever_canal_ray.functions.text import LangId

    def stub_factory():
        def model(texts):
            return ["xx" for _ in texts]

        return model

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]})
    out = LangId(model_factory=stub_factory)(df)
    assert out["pred_lang"].tolist() == ["xx", "xx"]


def test_unigram_lm_scores_matches_serial(ray_session):
    """Distributed two-pass LM scorer == serial reference; a doc made
    of rare tokens scores higher NLL than one made of common tokens;
    top_v cap floors out-of-vocab counts at 1."""
    import math
    from collections import Counter

    import ray.data as rd

    from clever_canal_ray.functions.text import unigram_lm_scores

    texts = (
        ["the cat sat on the mat"] * 20
        + ["the dog ran to the park"] * 10
        + ["zyx qwv jkl pqr stu vwx"]  # rare-token soup
        + ["", "the", "a  b"]  # empty / single / double-space edges
    )
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})

    cnt = Counter(w for t in texts for w in t.split(" "))
    total = sum(cnt.values())

    def serial_nll(t):
        ws = t.split(" ")
        return math.floor(
            1e4 * (math.log(total) - sum(math.log(cnt[w]) for w in ws) / len(ws)) + 0.5
        )

    out = (
        unigram_lm_scores(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["lm_nll_e4"].tolist() == [serial_nll(t) for t in texts]
    nll = dict(zip(out["doc_id"], out["lm_nll_e4"]))
    assert nll[30] > nll[0]  # rare soup scores worse than common text

    # top_v cap: OOV words floor at count 1 -> ln(1)=0 -> nll = ln(total)
    capped = (
        unigram_lm_scores(rd.from_pandas(df), top_v=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    kept = [w for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:2]]

    def capped_nll(t):
        ws = t.split(" ")
        s = sum(math.log(cnt[w]) if w in kept else 0.0 for w in ws) / len(ws)
        return math.floor(1e4 * (math.log(total) - s) + 0.5)

    assert capped["lm_nll_e4"].tolist() == [capped_nll(t) for t in texts]

    # top_v=0 (empty broadcast vocab): every token OOV -> nll = ln(total)
    zero = (
        unigram_lm_scores(rd.from_pandas(df), top_v=0)
        .to_pandas()["lm_nll_e4"]
        .unique()
        .tolist()
    )
    assert zero == [math.floor(1e4 * math.log(total) + 0.5)]


def test_quality_scores_stopword_columnar(ray_session):
    """Columnar stopword count equals the per-row loop."""
    import pandas as pd

    from clever_canal_ray.functions.text import STOPWORDS, quality_scores

    texts = ["the a and of to in is", "no stop words here", "", "the the the", "x " * 200]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = quality_scores(df)  # Arrow table out (pandas input coerced)
    for t, ratio in zip(texts, out["stop_ratio"].to_pylist()):
        ws = t.split(" ")
        assert ratio == round(sum(1 for w in ws if w in STOPWORDS) / len(ws), 6)


def test_exact_dedup_survivors_distributed_no_driver_pull(ray_session, monkeypatch):
    """The default survivors path must be fully distributed: on a
    corpus of ~100% distinct texts (the keeper set ≈ the corpus), no
    Dataset may be collected to the driver. to_pandas is patched to
    raise; the semi-join must still produce the right survivors and
    preserve Arrow payload types."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from clever_canal_ray.functions.dedup import exact_dedup_survivors

    n = 2000
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [f"unique text number {i}" for i in range(n - 4)]
            + ["dup text"] * 4,  # ids n-4..n-1 collapse to n-4
        }
    )
    ds = rd.from_pandas(df)

    monkeypatch.setattr(
        rd.Dataset,
        "to_pandas",
        lambda self, *a, **k: (_ for _ in ()).throw(AssertionError("driver-side to_pandas in survivors path")),
    )
    out = exact_dedup_survivors(ds, text_col="text", id_col="doc_id")
    got = sorted(r["doc_id"] for r in out.take_all())
    assert got == list(range(n - 3))  # keepers: all uniques + min dup id
    sch = out.schema()
    base = getattr(sch, "base_schema", sch)
    assert base.field("text").type == pa.string()


def test_exact_dedup_survivors_broadcast_matches_distributed(ray_session):
    import pandas as pd
    import ray.data as rd

    from clever_canal_ray.functions.dedup import exact_dedup_survivors

    df = pd.DataFrame(
        {
            "doc_id": range(300),
            "text": [f"t{i % 90}" for i in range(300)],  # heavy duplication
        }
    )
    ds = rd.from_pandas(df)
    a = sorted(r["doc_id"] for r in exact_dedup_survivors(ds).take_all())
    b = sorted(r["doc_id"] for r in exact_dedup_survivors(ds, broadcast=True).take_all())
    assert a == b == list(range(90))


def test_embedding_dup_pairs_triangle_join_exact(ray_session, monkeypatch):
    """The triangle block-join must equal brute-force all-pairs exactly
    (every unordered pair lands in exactly ONE group-pair bucket) with
    no driver-side candidate matrix (to_pandas patched to raise)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from clever_canal_ray.functions.dedup import embedding_dup_pairs

    rng = np.random.default_rng(5)
    n, d = 400, 16
    m = rng.standard_normal((n, d))
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(m)})
    ds = rd.from_pandas(df)
    monkeypatch.setattr(
        rd.Dataset,
        "to_pandas",
        lambda self, *a, **k: (_ for _ in ()).throw(AssertionError("driver pull")),
    )
    got = pd.DataFrame(embedding_dup_pairs(ds, threshold=0.5, n_groups=5).take_all())
    mm = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mm @ mm.T
    iu = np.triu_indices(n, 1)
    hits = sims[iu] >= 0.5
    want = sorted(zip(iu[0][hits].tolist(), iu[1][hits].tolist()))
    assert len(want) > 5  # fixture actually exercises the path
    assert sorted(zip(got["a"], got["b"])) == want
    # rounded sims match too
    want_cs = {(int(a), int(b)): round(float(sims[a, b]), 4) for a, b in want}
    for a, b, cs in zip(got["a"], got["b"], got["cos_sim"]):
        assert want_cs[(int(a), int(b))] == cs


def test_tokenize_stage_default_and_passthrough(ray_session):
    """Tokenize actor stage: default regex-hash path is deterministic
    with the lake payload layout; a real tokenizer callable loads once
    in __init__ and replaces it (import-gated pattern)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from clever_canal_ray.functions.text import Tokenize

    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["hello, world", "a b", ""]})
    out = Tokenize()(df)
    assert out["n_tokens"].tolist() == [3, 2, 0]  # hello , world | a b |
    out2 = Tokenize()(df)
    assert [t.tolist() for t in out["tokens"]] == [t.tolist() for t in out2["tokens"]]
    assert all(t.dtype == np.int32 for t in out["tokens"])

    loads = []

    def factory():
        loads.append(1)  # once per actor, not per batch
        return lambda texts: [[7] * len(t.split()) for t in texts]

    stage = Tokenize(tokenizer_factory=factory)
    a = stage(df)
    b = stage(df)
    assert loads == [1]
    assert a["n_tokens"].tolist() == [2, 2, 0]
    assert [t.tolist() for t in a["tokens"]][0] == [7, 7]
    # through the actor-pool map_batches path
    ds = rd.from_pandas(df)
    got = ds.map_batches(
        Tokenize, fn_constructor_kwargs={"vocab": 101}, batch_format="pandas", concurrency=1
    ).to_pandas()
    assert got["n_tokens"].tolist() == [3, 2, 0]
    assert max((max(t) for t in got["tokens"] if len(t)), default=0) < 101


def test_session_windows_gap_and_ties(ray_session):
    """Sessionization: gaps > gap_ms cut sessions; equal timestamps
    never cut; sessions split across input blocks still merge (the
    bucketed shuffle brings a key's events together)."""
    import ray

    from clever_canal_ray.functions.joins import session_windows

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # user 1: three events close together, then a 2h gap, then two more
    for off_min in (0, 10, 10, 130, 140):  # includes an exact tie at 10
        rows.append({"user_id": 1, "ts": base + pd.Timedelta(minutes=off_min)})
    # user 2: single event
    rows.append({"user_id": 2, "ts": base})
    df = pd.DataFrame(rows)
    # two blocks splitting user 1's first session across inputs
    ds = ray.data.from_pandas([df.iloc[:2], df.iloc[2:]])
    out = (
        session_windows(ds, key_col="user_id", ts_col="ts", gap_ms=3_600_000)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["session_id"].tolist() == [0, 1, 0]
    assert out["n_events"].tolist() == [3, 2, 1]
    assert out.loc[0, "session_start"] == base
    assert out.loc[0, "session_end"] == base + pd.Timedelta(minutes=10)
    assert out.loc[1, "session_start"] == base + pd.Timedelta(minutes=130)


def test_hopping_window_reduces_to_tumbling(ray_session):
    """hop == window must equal the tumbling aggregate exactly."""
    import ray

    from clever_canal_ray.functions.joins import hopping_window_agg, tumbling_window_agg

    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-03-01") + pd.to_timedelta(rng.integers(0, 86_400, n), unit="s"),
            "grp": rng.choice(["a", "b"], n),
            "v": rng.integers(0, 100, n),
        }
    )
    ds = ray.data.from_pandas(df)
    agg = {"n": ("v", "count"), "s": ("v", "sum")}
    hop = (
        hopping_window_agg(ds, "ts", 3_600_000, 3_600_000, ["grp"], agg)
        .to_pandas()
        .sort_values(["window_start", "grp"])
        .reset_index(drop=True)
    )
    tum = (
        tumbling_window_agg(ds, "ts", 3_600_000, ["grp"], agg)
        .to_pandas()
        .sort_values(["window_start", "grp"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(hop[["window_start", "grp", "n", "s"]], tum[["window_start", "grp", "n", "s"]], check_dtype=False)


def test_hopping_window_membership(ray_session):
    """Every event lands in exactly window/hop hopping windows, each of
    which contains its timestamp."""
    import ray

    from clever_canal_ray.functions.joins import hopping_window_agg

    t0 = pd.Timestamp("2024-03-01 00:37:00")
    df = pd.DataFrame({"ts": [t0], "grp": ["a"], "v": [1]})
    out = (
        hopping_window_agg(
            ray.data.from_pandas(df), "ts", 3_600_000, 900_000, ["grp"],
            {"n": ("v", "count")},
        )
        .to_pandas()
        .sort_values("window_start")
    )
    assert len(out) == 4
    tms = int(t0.value // 1_000_000)
    for ws in out["window_start"]:
        assert ws <= tms < ws + 3_600_000


def test_streaming_dedup_across_passes(ray_session):
    """StreamingDeduper: first-seen state persists across replay calls;
    exactly one copy of each distinct text survives the union of all
    passes (the cross-batch shared-index semantics a groupby can't
    give)."""
    import ray

    from clever_canal_ray.functions.dedup import StreamingDeduper

    texts1 = [f"doc {i % 50}" for i in range(200)]  # 50 distinct, heavy dups
    texts2 = [f"doc {i % 80}" for i in range(200)]  # 30 new distinct
    d = StreamingDeduper(num_shards=4, text_col="text")
    out1 = d.filter_new(
        ray.data.from_pandas([pd.DataFrame({"text": c}) for c in np.array_split(np.array(texts1, dtype=object), 4)])
    ).to_pandas()
    out2 = d.filter_new(
        ray.data.from_pandas([pd.DataFrame({"text": c}) for c in np.array_split(np.array(texts2, dtype=object), 4)])
    ).to_pandas()
    assert sorted(out1["text"]) == sorted(f"doc {i}" for i in range(50))
    # pass 2 only surfaces the 30 texts never seen in pass 1
    assert sorted(out2["text"]) == sorted(f"doc {i}" for i in range(50, 80))
    assert d.distinct_seen() == 80


def test_streaming_dedup_bloom_mode_never_false_keeps(ray_session):
    """Bloom mode: bounded memory; may false-DROP but never emits a
    duplicate."""
    import ray

    from clever_canal_ray.functions.dedup import StreamingDeduper

    texts = [f"t{i % 300}" for i in range(1200)]
    d = StreamingDeduper(num_shards=4, text_col="text", fp_bits=1 << 16)
    out = d.filter_new(
        ray.data.from_pandas([pd.DataFrame({"text": c}) for c in np.array_split(np.array(texts, dtype=object), 6)])
    ).to_pandas()
    assert out["text"].is_unique
    # at 65k bits / 300 items the fp rate is negligible: all survive
    assert len(out) >= 295


def test_hll_approx_distinct_error_bound(ray_session):
    import ray

    from clever_canal_ray.functions.corpus import approx_distinct

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 20_000, 100_000)
    ds = ray.data.from_pandas([pd.DataFrame({"v": c}) for c in np.array_split(vals, 7)])
    exact = len(np.unique(vals))
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - exact) / exact < 0.05
    # split-invariance: a different block layout gives the same estimate
    ds2 = ray.data.from_pandas([pd.DataFrame({"v": c}) for c in np.array_split(vals, 3)])
    assert approx_distinct(ds2, "v", p=12) == est


def test_approx_quantiles_within_bin_width(ray_session):
    import ray

    from clever_canal_ray.functions.corpus import approx_quantiles

    rng = np.random.default_rng(6)
    x = rng.normal(0, 1, 50_000)
    ds = ray.data.from_pandas([pd.DataFrame({"v": c}) for c in np.array_split(x, 5)])
    out = approx_quantiles(ds, "v", [0.1, 0.5, 0.9], num_bins=2048)
    width = (x.max() - x.min()) / 2048
    for qq, got in zip(out["q"], out["value"]):
        assert abs(got - np.quantile(x, qq)) <= 2 * width


def test_random_projection_preserves_similarity(ray_session):
    import ray

    from clever_canal_ray.functions.ann import random_projection

    rng = np.random.default_rng(8)
    # cluster-structured vectors: similarity carries signal (isotropic
    # noise would make the off-diagonal Gram entries pure noise and the
    # correlation test meaningless)
    centers = rng.standard_normal((10, 64)).astype(np.float32) * 3
    emb = (centers[np.arange(200) % 10] + rng.standard_normal((200, 64)).astype(np.float32) * 0.5)
    df = pd.DataFrame({"vec_id": np.arange(200), "embedding": list(emb)})
    ds = ray.data.from_pandas([df.iloc[:100], df.iloc[100:]])
    out = random_projection(ds, dim_out=32, seed=3).to_pandas().sort_values("vec_id")
    red = np.stack(out["embedding"].to_numpy())
    assert red.shape == (200, 32)
    # determinism: same seed, any split -> identical matrix
    out2 = random_projection(ray.data.from_pandas(df), dim_out=32, seed=3).to_pandas().sort_values("vec_id")
    assert np.allclose(red, np.stack(out2["embedding"].to_numpy()))
    # JL property: inner products roughly preserved (loose bound)
    g0 = emb @ emb.T
    g1 = red @ red.T
    corr = np.corrcoef(g0.ravel(), g1.ravel())[0, 1]
    assert corr > 0.7


def test_simhash_dup_pairs_matches_serial(ray_session):
    """Banded SimHash hamming pairs == serial all-pairs reference, and
    the pigeonhole recall guarantee holds (bands = max_hamming + 1
    misses NO pair within the bound)."""
    import itertools

    import ray.data as rd

    from clever_canal_ray.functions.dedup import simhash_dup_pairs, simhash_u64

    rng = np.random.default_rng(9)
    vocab = [f"tok{i}" for i in range(400)]
    texts, ids = [], []
    for i in range(80):
        words = list(rng.choice(vocab, size=60))
        ids.append(2 * i)
        texts.append(" ".join(words))
        if i % 2 == 0:  # planted near-dup: one word swapped
            w2 = list(words)
            w2[7] = "swapped"
            ids.append(2 * i + 1)
            texts.append(" ".join(w2))
    docs = pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64), "text": texts})

    max_h = 6
    out = (
        simhash_dup_pairs(rd.from_pandas(docs), max_hamming=max_h)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # serial reference: exact all-pairs hamming
    sims = simhash_u64(np.asarray(texts, dtype=object))
    by_id = dict(zip(ids, sims))
    want = {}
    for x, y in itertools.combinations(sorted(ids), 2):
        h = bin(int(by_id[x]) ^ int(by_id[y])).count("1")
        if h <= max_h:
            want[(x, y)] = h
    got = {(int(r.a), int(r.b)): int(r.hamming) for r in out.itertuples()}
    assert got == want
    assert len(want) > 0  # the planted near-dups actually qualify


def test_near_dedup_corpus_matches_serial_union_find(ray_session):
    """The one-call chain (banding -> exact verify -> components ->
    survivors) == a serial union-find over exact all-pairs shingle
    Jaccard: identical survivor sets, schema preserved."""
    import itertools

    import ray.data as rd

    from clever_canal_ray.functions.dedup import near_dedup_corpus, shingle_jaccard

    docs = _near_dup_docs(n=30)
    docs["source"] = [f"s{i % 3}" for i in range(len(docs))]  # schema carry-through

    out = near_dedup_corpus(rd.from_pandas(docs), threshold=0.6).to_pandas()
    assert set(out.columns) == {"doc_id", "text", "source"}

    # serial reference: union-find over exact-jaccard pairs
    ids = docs["doc_id"].tolist()
    by_id = dict(zip(docs["doc_id"], docs["text"]))
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(ids, 2):
        if shingle_jaccard(by_id[a], by_id[b]) >= 0.6:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    keep = {i for i in ids if find(i) == i}
    assert set(out["doc_id"]) == keep
    assert len(keep) < len(ids)  # the planted dups actually deduped


def test_range_join_semantics_and_fanout(ray_session):
    """Interval join: half-open [lo, hi) bounds, per-key isolation,
    multi-match fanout, and rows split across input blocks (the
    bucketed shuffle must co-locate a key's rows)."""
    import ray

    from clever_canal_ray.functions.joins import range_join

    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    left = pd.DataFrame(
        {
            "l_id": [1, 2, 3, 4, 5],
            "l_key": [10, 10, 10, 20, 30],
            "l_ts": [base, base + 5 * m, base + 10 * m, base, base],
        }
    )
    right = pd.DataFrame(
        {
            "r_id": [100, 101, 102, 103],
            "r_key": [10, 10, 20, 40],
            "lo": [base, base + 5 * m, base, base],
            "hi": [base + 10 * m, base + 6 * m, base + 1 * m, base + 60 * m],
        }
    )
    lds = ray.data.from_pandas([left.iloc[:2], left.iloc[2:]])
    rds = ray.data.from_pandas([right.iloc[:2], right.iloc[2:]])
    out = (
        range_join(
            lds, rds, left_by="l_key", right_by="r_key",
            left_on="l_ts", right_lo="lo", right_hi="hi",
        )
        .to_pandas()
        .sort_values(["l_id", "r_id"])
        .reset_index(drop=True)
    )
    # l1@0: in [0,10) of r100 only; l2@5: in r100 AND r101 (fanout);
    # l3@10: hi is EXCLUSIVE -> no match in r100, outside r101;
    # l4 (key 20): lo inclusive -> matches r102; l5 (key 30): no right key
    pairs = list(zip(out["l_id"].astype(int), out["r_id"].astype(int)))
    assert pairs == [(1, 100), (2, 100), (2, 101), (4, 102)]
    # joined rows carry both sides' columns
    assert {"l_id", "l_key", "l_ts", "r_id", "r_key", "lo", "hi"} <= set(out.columns)


def test_range_join_numeric_bands_and_empty_side(ray_session):
    """Numeric band columns stay numeric (no datetime coercion), and an
    empty side yields an empty result rather than an error."""
    import ray

    from clever_canal_ray.functions.joins import range_join

    left = pd.DataFrame({"a_id": [1, 2], "a_key": ["x", "x"], "v": [5.0, 50.0]})
    right = pd.DataFrame({"b_id": [7], "b_key": ["x"], "vlo": [0.0], "vhi": [10.0]})
    out = range_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        left_by="a_key", right_by="b_key", left_on="v", right_lo="vlo", right_hi="vhi",
    ).to_pandas()
    assert list(zip(out["a_id"].astype(int), out["b_id"].astype(int))) == [(1, 7)]

    empty_right = ray.data.from_pandas(right.iloc[:0])
    out2 = range_join(
        ray.data.from_pandas(left),
        empty_right,
        left_by="a_key", right_by="b_key", left_on="v", right_lo="vlo", right_hi="vhi",
    ).to_pandas()
    assert len(out2) == 0

    with pytest.raises(ValueError, match="disjoint"):
        range_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(left),
            left_by="a_key", right_by="a_key", left_on="v", right_lo="v", right_hi="v",
        )


def test_pq_ann_recall_and_compression(ray_session):
    """Product quantization: codes are n_sub uint8 per row; ADC top-k
    in the compressed domain recovers most of the exact top-k on
    clustered data; ADC scores equal explicit reconstruction scores."""
    import ray.data as rd

    from clever_canal_ray.functions.ann import (
        _normalize,
        brute_force_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((6, 24)) * 3
    vecs = np.concatenate([c + rng.standard_normal((120, 24)) * 0.4 for c in centers])
    emb = pd.DataFrame({"vec_id": np.arange(len(vecs)), "embedding": list(vecs)})
    ds = rd.from_pandas(emb).repartition(4)

    books = pq_train(ds, n_sub=8, n_codes=256, sample_n=400, iters=8)
    assert books.shape == (8, 256, 3)
    codes = pq_encode(ds, books).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert len(codes) == len(vecs)
    c0 = np.stack(codes["pq_code"].to_numpy())
    assert c0.dtype == np.uint8 and c0.shape == (len(vecs), 8)  # 24 floats -> 8 bytes

    q = vecs[:3]
    exact = brute_force_topk(rd.from_pandas(emb), q, k=10)
    approx = pq_topk(rd.from_pandas(codes).repartition(3), q, books, k=10)
    for qi in range(3):
        e = set(exact[exact["query_i"] == qi]["vec_id"])
        a = set(approx[approx["query_i"] == qi]["vec_id"])
        assert len(a & e) / 10 >= 0.6, f"pq recall too low for q{qi}"

    # the deployment pattern: over-fetch in the compressed domain, then
    # exact-rerank the candidate slice -> recall recovers to ~1
    over = pq_topk(rd.from_pandas(codes), q, books, k=40)
    for qi in range(3):
        cand_ids = set(over[over["query_i"] == qi]["vec_id"])
        sub = emb[emb["vec_id"].isin(cand_ids)]
        rr = brute_force_topk(rd.from_pandas(sub), q[qi : qi + 1], k=10)
        e = set(exact[exact["query_i"] == qi]["vec_id"])
        assert len(set(rr["vec_id"]) & e) / 10 >= 0.9, f"rerank recall low for q{qi}"

    # ADC == q · (reconstructed vector), up to float summation order
    qn = _normalize(np.asarray(q, dtype=np.float64))
    recon = books[np.arange(8)[None, :], c0].reshape(len(vecs), 24)
    for _, r in approx.iterrows():
        expect = float(qn[int(r["query_i"])] @ recon[int(r["vec_id"])])
        assert abs(r["adc_sim"] - expect) < 1e-3  # adc_sim is rounded to 4dp

    # block-layout invariance
    b = pq_topk(rd.from_pandas(codes).repartition(9), q, books, k=10)
    pd.testing.assert_frame_equal(
        approx.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )


def test_linear_probe_matches_closed_form_and_separates(ray_session):
    """Distributed ridge == the single-machine closed form (same
    sufficient statistics); a planted two-cluster labeling separates
    cleanly; result invariant to block layout."""
    import ray.data as rd

    from clever_canal_ray.functions.probe import linear_probe_score, linear_probe_train

    rng = np.random.default_rng(44)
    pos = rng.standard_normal((150, 12)) + 2.5
    neg = rng.standard_normal((150, 12)) - 2.5
    x = np.concatenate([pos, neg])
    y = np.concatenate([np.ones(150), -np.ones(150)])
    df = pd.DataFrame({"vec_id": np.arange(300), "embedding": list(x), "label": y})

    w = linear_probe_train(rd.from_pandas(df).repartition(5), "label", l2=0.1)
    # closed form on the driver: identical statistics, same solve
    xd = np.concatenate([x, np.ones((300, 1))], axis=1)
    reg = np.eye(13) * 0.1
    reg[-1, -1] = 0.0
    w_ref = np.linalg.solve(xd.T @ xd + reg, xd.T @ y)
    np.testing.assert_allclose(w, w_ref, rtol=1e-8)

    w2 = linear_probe_train(rd.from_pandas(df).repartition(11), "label", l2=0.1)
    np.testing.assert_allclose(w, w2, rtol=1e-8)  # layout invariance

    scored = (
        linear_probe_score(rd.from_pandas(df).repartition(4), w)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    acc = ((scored["probe_score"] > 0).to_numpy() == (y > 0)).mean()
    assert acc >= 0.99
    np.testing.assert_allclose(
        scored["probe_score"].to_numpy(), xd @ w, rtol=1e-9
    )


def _semdedup_serial(ids, vecs, centroids, threshold):
    """Serial reference of the SemDeDup rule: per cluster, order by
    (centroid_sim asc, id asc); drop i iff any earlier j has
    cos(i, j) >= threshold."""
    from clever_canal_ray.functions.ann import _normalize

    c = _normalize(np.asarray(centroids, dtype=np.float64))
    m = _normalize(np.asarray(vecs, dtype=np.float64))
    sims = m @ c.T
    cid = np.argmax(sims, axis=1)
    csim = sims[np.arange(len(cid)), cid]
    kept = {}
    for k in np.unique(cid):
        idx = np.where(cid == k)[0]
        order = idx[np.lexsort((np.asarray(ids)[idx], csim[idx]))]
        for pos, i in enumerate(order):
            dup = any(
                float(m[i] @ m[j]) >= threshold for j in order[:pos]
            )
            kept[int(ids[i])] = (int(k), float(csim[i]), 0 if dup else 1)
    return kept


def test_semdedup_matches_serial_reference(ray_session):
    """Distributed semdedup == the serial paper rule, exactly, and is
    invariant to block layout."""
    import ray.data as rd

    from clever_canal_ray.functions.ann import ivf_build_centroids
    from clever_canal_ray.functions.dedup import semdedup

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((3, 12)) * 4
    base = np.concatenate([c + rng.standard_normal((40, 12)) * 0.6 for c in centers])
    # plant near-duplicates: copies with tiny noise
    dups = base[::5] + rng.standard_normal((24, 12)) * 0.01
    vecs = np.concatenate([base, dups])
    ids = np.arange(len(vecs))
    emb = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    ds = rd.from_pandas(emb)
    cents = ivf_build_centroids(ds, n_centroids=3, iters=2)
    got = (
        semdedup(rd.from_pandas(emb), threshold=0.95, centroids=cents, num_buckets=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ref = _semdedup_serial(ids, vecs, cents, 0.95)
    assert len(got) == len(ids)
    for _, r in got.iterrows():
        k, csim, kept = ref[int(r["vec_id"])]
        assert int(r["cluster"]) == k
        assert abs(float(r["centroid_sim"]) - csim) < 1e-9
        assert int(r["kept"]) == kept, f"vec {r['vec_id']}: kept {r['kept']} != {kept}"
    # planted dups actually got caught
    assert (got["kept"] == 0).sum() >= 20
    # block-layout invariance
    got2 = (
        semdedup(
            rd.from_pandas(emb).repartition(7), threshold=0.95, centroids=cents, num_buckets=4
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)


def test_semdedup_survivors_and_cluster_guard(ray_session):
    """Survivors drop exactly the kept==0 ids (distributed anti-join);
    oversized clusters raise with the n_clusters hint."""
    import pytest
    import ray.data as rd

    from clever_canal_ray.functions.dedup import semdedup, semdedup_survivors

    rng = np.random.default_rng(7)
    base = rng.standard_normal((60, 8))
    vecs = np.concatenate([base, base + 1e-4 * rng.standard_normal((60, 8))])
    emb = pd.DataFrame({"vec_id": np.arange(120), "embedding": list(vecs)})
    ds = rd.from_pandas(emb)
    decisions = semdedup(ds, threshold=0.999, n_clusters=4, num_buckets=4)
    dec = decisions.to_pandas()
    dropped = set(dec[dec["kept"] == 0]["vec_id"])
    assert len(dropped) >= 50  # each twin pair loses one member
    surv = semdedup_survivors(
        rd.from_pandas(emb), decisions, id_col="vec_id"
    ).to_pandas()
    assert set(surv["vec_id"]) == set(emb["vec_id"]) - dropped
    assert list(surv.columns) == ["vec_id", "embedding"]

    with pytest.raises(Exception, match="n_clusters"):
        semdedup(ds, threshold=0.9, n_clusters=2, max_cluster_rows=10).to_pandas()


def test_cross_corpus_dedup_exact_and_bloom(ray_session):
    """Exact mode drops precisely the texts present in the reference;
    bloom mode never admits a duplicate (false-drop-only) and at ample
    bits matches exact; new-corpus-internal dups are NOT touched."""
    import ray.data as rd

    from clever_canal_ray.functions.dedup import cross_corpus_dedup

    ref = pd.DataFrame({"doc_id": range(100), "text": [f"ref text {i}" for i in range(100)]})
    new = pd.DataFrame(
        {
            "doc_id": range(1000, 1060),
            "text": (
                [f"ref text {i}" for i in range(30)]          # 30 dups of ref
                + [f"new text {i}" for i in range(20)]        # 20 fresh
                + ["same new text"] * 10                      # internal dups (kept)
            ),
        }
    )
    got = cross_corpus_dedup(
        rd.from_pandas(new).repartition(4), rd.from_pandas(ref).repartition(3),
        num_buckets=4,
    ).to_pandas()
    assert set(got["doc_id"]) == set(range(1030, 1060))
    assert list(got.columns) == ["doc_id", "text"]

    blm = cross_corpus_dedup(
        rd.from_pandas(new).repartition(4), rd.from_pandas(ref).repartition(3),
        mode="bloom", fp_bits=1 << 16,
    ).to_pandas()
    # never admits a true duplicate; at 64k bits / 100 keys fp ~ 0
    assert set(blm["doc_id"]) == set(range(1030, 1060))

    # tiny filter: false positives may drop fresh docs but NEVER admit a dup
    tiny = cross_corpus_dedup(
        rd.from_pandas(new), rd.from_pandas(ref), mode="bloom", fp_bits=256, k=2
    ).to_pandas()
    kept = set(tiny["doc_id"]) if len(tiny) else set()
    assert kept <= set(range(1030, 1060))


def test_cross_corpus_dedup_matches_duckdb_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from clever_canal_ray.functions.dedup import cross_corpus_dedup

    rng = np.random.default_rng(13)
    ref = pd.DataFrame(
        {"doc_id": range(300), "text": [f"t {int(i)}" for i in rng.integers(0, 200, 300)]}
    )
    new = pd.DataFrame(
        {"doc_id": range(500, 900), "text": [f"t {int(i)}" for i in rng.integers(100, 500, 400)]}
    )
    got = sorted(
        cross_corpus_dedup(
            rd.from_pandas(new).repartition(4), rd.from_pandas(ref).repartition(3), num_buckets=8
        ).to_pandas()["doc_id"]
    )
    oracle = duckdb.sql(
        "SELECT doc_id FROM new WHERE text NOT IN (SELECT text FROM ref) ORDER BY doc_id"
    ).df()["doc_id"].tolist()
    assert got == oracle


def test_gopher_quality_matches_row_reference(ray_session):
    """Vectorized Gopher rules == a plain per-row implementation on
    crafted docs hitting each rule; distributed == local kernel."""
    import ray.data as rd

    from clever_canal_ray.functions.text import GOPHER_STOPWORDS, gopher_quality

    filler = " ".join(f"word{i} the of and be to that have with" for i in range(12))
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                filler,                                    # passes everything
                "tiny doc",                                # too few words
                " ".join(["a"] * 60),                      # mean word len < 3
                filler + " " + "#" * 1 + " #" * 30,        # symbol ratio > 0.1
                "\n".join(["• item " + filler[:20]] * 10), # bullets
                "\n".join([f"line {i} trailing..." for i in range(10)]) + " " + filler[:0],  # ellipsis ends
                " ".join(["123 456"] * 40),                # no alpha words
                " ".join(["foo bar baz"] * 30),            # no gopher stopwords
            ],
        }
    )

    def ref_row(t):
        words = [w for w in t.split(" ") if w != ""] or [""]
        words = t.split(" ")
        n = len(words)
        nonspace = len(t) - t.count(" ")
        mwl = nonspace / n if n else 0.0
        sym = (t.count("#") + t.count("...") + t.count("…")) / n if n else 0.0
        lines = t.split("\n")
        import re

        bf = sum(bool(re.match(r"^\s*(•|\*|-|‣|◦)", ln)) for ln in lines) / len(lines)
        ef = sum(bool(re.search(r"(\.\.\.|…)\s*$", ln)) for ln in lines) / len(lines)
        af = sum(bool(re.search("[A-Za-z]", w)) for w in words) / n if n else 0.0
        sd = sum(1 for w in GOPHER_STOPWORDS if w in [x.lower() for x in words])
        return (
            (50 <= n <= 100_000) and (3.0 <= mwl <= 10.0) and sym <= 0.1
            and bf < 0.9 and ef < 0.3 and af >= 0.8 and sd >= 2
        )

    got = (
        rd.from_pandas(docs)
        .repartition(3)
        .map_batches(gopher_quality, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        t = docs["text"].iloc[int(r["doc_id"])]
        assert bool(r["gopher_pass"]) == ref_row(t), (r["doc_id"], dict(r))
    assert got["gopher_pass"].tolist() == [1, 0, 0, 0, 0, 0, 0, 0]


def test_c4_clean_matches_row_reference(ray_session):
    """Vectorized C4 rules == a plain per-row implementation; cleaned
    text preserves kept-line order; page verdicts match."""
    import re

    import ray.data as rd

    from clever_canal_ray.functions.text import c4_clean

    good = "this line has plenty of words and ends properly."
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(7, dtype=np.int64),
            "text": [
                "\n".join([good, "short line.", "no terminal punctuation here at all",
                           good + " indeed!", 'a quoted ending with five words "', good]),
                good,  # single sentence -> < 3 kept lines
                "\n".join([good] * 3) + "\nenable javascript to view this page.",
                "\n".join([good] * 4) + "\nlorem ipsum dolor sit amet.",
                "\n".join([good] * 4) + "\nsome code { return 1; }",
                "",
                "\n".join([good] * 3),
            ],
        }
    )

    def ref(t):
        kept = [
            ln
            for ln in t.split("\n")
            if re.search(r'[.!?"]\s*$', ln)
            and re.match(r"^\s*(?:\S+\s+){4,}\S+", ln)
            and not re.search(r"(?i)javascript", ln)
        ]
        keep_page = len(kept) >= 3 and not re.search(r"(?i)lorem ipsum|\{", t)
        return "\n".join(kept), int(keep_page)

    got = (
        rd.from_pandas(docs)
        .repartition(3)
        .map_batches(c4_clean, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        txt, keep = ref(docs["text"].iloc[int(r["doc_id"])])
        assert r["text"] == txt, r["doc_id"]
        assert int(r["c4_keep"]) == keep, r["doc_id"]
    assert got["c4_keep"].tolist() == [1, 0, 1, 0, 0, 0, 1]


def test_line_repetition_stats_matches_row_reference(ray_session):
    import ray.data as rd

    from clever_canal_ray.functions.text import line_repetition_stats

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "aaa\nbbb\naaa\nccc",          # 1 of 4 lines is surplus dup
                "p one\n\np one\n\np two",     # paragraph dup
                "unique one\nunique two",
                "",
            ],
        }
    )

    def ref(t):
        def pair(sep):
            units = [u for u in t.split(sep) if u]
            if not units:
                return 0, 0
            seen, surplus, surplus_chars = set(), 0, 0
            for u in units:
                if u in seen:
                    surplus += 1
                    surplus_chars += len(u)
                seen.add(u)
            tot_chars = sum(len(u) for u in units)
            e6 = lambda x: int(np.floor(x * 1_000_000 + 0.5))  # noqa: E731
            return e6(surplus / len(units)), e6(surplus_chars / tot_chars)

        return pair("\n"), pair("\n\n")

    got = (
        rd.from_pandas(docs)
        .repartition(2)
        .map_batches(line_repetition_stats, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        (l_u, l_c), (p_u, p_c) = ref(docs["text"].iloc[int(r["doc_id"])])
        assert (r["dup_line_e6"], r["dup_line_char_e6"]) == (l_u, l_c), r["doc_id"]
        assert (r["dup_para_e6"], r["dup_para_char_e6"]) == (p_u, p_c), r["doc_id"]
    assert got["dup_line_e6"].iloc[0] == 250000


def test_minhash_no_self_pairs_on_duplicate_ids(ray_session):
    """A doc_id appearing twice (self-unioned corpus) must not emit
    a==b self-pairs — the a<b contract holds for every LSH pair path."""
    import ray.data as rd

    from clever_canal_ray.functions.dedup import minhash_lsh_pairs, simhash_dup_pairs

    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b c d e f g h"] * 3})
    doubled = pd.concat([docs, docs], ignore_index=True)
    pairs = minhash_lsh_pairs(rd.from_pandas(doubled), threshold=0.5, num_buckets=4).to_pandas()
    assert len(pairs) and (pairs["a"] < pairs["b"]).all()
    sp = simhash_dup_pairs(rd.from_pandas(doubled), num_buckets=4).to_pandas()
    if len(sp):
        assert (sp["a"] < sp["b"]).all()
