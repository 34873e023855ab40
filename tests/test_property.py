"""Property-based replay convergence: random generator knobs (seed,
event mix, skew, segmentation, sink mode) -> engine == serial oracle.
Bounded example count: each example runs a full Ray pipeline."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clever_canal_ray.config import ReplayConfig
from clever_canal_ray.fixtures.generator import EventLogSpec, generate_events, generate_lake, write_fixture
from clever_canal_ray.oracle import apply_events_serial
from clever_canal_ray.pipelines.replay import replay
from clever_canal_ray.state.manifest import Lake
from tests.util import assert_tables_equal


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 10_000),
    p_insert=st.floats(0.1, 0.8),
    p_delete=st.floats(0.0, 0.3),
    hot_mass=st.floats(0.0, 0.9),
    n_segments=st.integers(1, 7),
    segments_per_batch=st.integers(1, 4),
    sink_mode=st.sampled_from(["delta", "compact"]),
    include_before=st.booleans(),
)
def test_random_replay_converges(
    ray_session, tmp_path_factory, seed, p_insert, p_delete, hot_mass, n_segments,
    segments_per_batch, sink_mode, include_before,
):
    p_update = max(0.0, 1.0 - p_insert - p_delete)
    total = p_insert + p_update + p_delete
    spec = EventLogSpec(
        seed=seed,
        n_initial_docs=80,
        n_events=500,
        n_segments=n_segments,
        p_insert=p_insert / total,
        p_update=p_update / total,
        p_delete=p_delete / total,
        hot_mass=hot_mass,
        include_before=include_before,
    )
    root = tmp_path_factory.mktemp("fx_prop")
    info = write_fixture(spec, str(root))
    lake_tbl = generate_lake(spec)
    segs, _ = generate_events(spec)
    oracle = apply_events_serial(lake_tbl, segs)
    lake = Lake.create(str(root / "lake"), lake_tbl, num_partitions=4)
    replay(
        lake,
        info["segment_paths"],
        ReplayConfig(
            num_partitions=4,
            segments_per_batch=segments_per_batch,
            sink_mode=sink_mode,
            pipeline_depth=2 if sink_mode == "delta" else 1,
        ),
    )
    assert_tables_equal(lake.read_table(), oracle)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 10_000),
    n_tables=st.integers(2, 4),
    n_segments=st.integers(2, 6),
    segments_per_batch=st.integers(1, 3),
    sink_mode=st.sampled_from(["delta", "compact"]),
)
def test_random_multi_table_replay_converges(
    ray_session, tmp_path_factory, seed, n_tables, n_segments, segments_per_batch, sink_mode
):
    """Multi-table convergence: one mixed stream over K tables ==
    per-table partition of the serial oracle, for random seeds, table
    counts, segmentation, and sink modes."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from clever_canal_ray.fixtures.generator import write_multi_table_fixture

    spec = EventLogSpec(
        seed=seed, n_initial_docs=60, n_events=400, n_segments=n_segments,
    )
    root = tmp_path_factory.mktemp("fx_prop_multi")
    info = write_multi_table_fixture(spec, str(root), n_tables=n_tables)
    lake = Lake.create_multi(str(root / "lake"), info["initials"], partitions_per_table=3)
    replay(
        lake,
        info["segment_paths"],
        ReplayConfig(segments_per_batch=segments_per_batch, sink_mode=sink_mode),
    )
    segs, _ = generate_events(spec)
    full = apply_events_serial(generate_lake(spec), segs)
    km = (
        pd.Series(full["doc_id"].to_numpy(zero_copy_only=False)).str.slice(3).astype(np.int64)
        % n_tables
    ).to_numpy()
    for i in range(n_tables):
        expected = full.filter(pa.array(km == i))
        assert_tables_equal(lake.read_table(table=f"lake.t{i}"), expected)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 300),
    n_keys=st.integers(1, 10),
    gap_min=st.integers(1, 120),
    n_blocks=st.integers(1, 5),
)
def test_session_windows_match_serial_reference(ray_session, seed, n, n_keys, gap_min, n_blocks):
    """Distributed sessionization == a serial per-key pandas reference,
    at any block layout (ties and duplicate timestamps included)."""
    import numpy as np
    import pandas as pd
    import ray

    from clever_canal_ray.functions.joins import session_windows

    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-06-01")
    df = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n),
            "ts": base + pd.to_timedelta(rng.integers(0, 100_000, n), unit="s"),
        }
    )
    gap_ms = gap_min * 60_000
    out = (
        session_windows(
            ray.data.from_pandas(np.array_split(df, n_blocks)),
            key_col="k",
            ts_col="ts",
            gap_ms=gap_ms,
        )
        .to_pandas()
        .sort_values(["k", "session_id"])
        .reset_index(drop=True)
    )
    # serial reference
    ref_rows = []
    for k, g in df.groupby("k"):
        ts = g["ts"].sort_values().reset_index(drop=True)
        sid, start, last, count = 0, ts[0], ts[0], 0
        for t in ts:
            if (t - last).total_seconds() * 1000 > gap_ms:
                ref_rows.append((k, sid, start, last, count))
                sid += 1
                start, count = t, 0
            last = t
            count += 1
        ref_rows.append((k, sid, start, last, count))
    ref = pd.DataFrame(
        ref_rows, columns=["k", "session_id", "session_start", "session_end", "n_events"]
    ).sort_values(["k", "session_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 10_000),
    ctx=st.integers(1, 300),
    stride_frac=st.floats(0.1, 1.0),
)
def test_chunk_tokens_covers_every_token_once_per_window(ray_session, seed, ctx, stride_frac):
    """Chunking invariants at random (ctx, stride): chunk 0 starts at 0;
    consecutive starts differ by stride; tok_len in (0, ctx] except the
    single zero-len chunk of an empty doc; last chunk reaches n_tok."""
    import numpy as np
    import pandas as pd
    import ray

    from clever_canal_ray.functions.corpus import chunk_tokens

    stride = max(1, int(ctx * stride_frac))
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({"doc_id": np.arange(30), "n_tok": rng.integers(0, 1000, 30)})
    out = (
        chunk_tokens(ray.data.from_pandas(df), ctx=ctx, stride=stride)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    for doc_id, g in out.groupby("doc_id"):
        n = int(df.loc[df["doc_id"] == doc_id, "n_tok"].iloc[0])
        starts = g["tok_start"].to_numpy()
        lens = g["tok_len"].to_numpy()
        assert starts[0] == 0
        assert (np.diff(starts) == stride).all()
        if n == 0:
            assert len(g) == 1 and lens[0] == 0
            continue
        assert (lens > 0).all() and (lens <= ctx).all()
        assert starts[-1] + lens[-1] == n
        # no window is redundant: every chunk after the first starts
        # inside the doc
        assert (starts < n).all()


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=9, max_codepoint=0x2FF),
            max_size=80,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_rolling_fingerprints_property(texts):
    """Flat batch winnowing kernel == per-row reference on arbitrary
    (incl. multi-byte-utf8, whitespace-only, boundary-length) texts."""
    import numpy as np
    import pandas as pd

    from clever_canal_ray.functions.text import _rolling_fp_row, rolling_fingerprints

    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = rolling_fingerprints(df)["rolling_fp"].to_pylist()
    assert out == [int(_rolling_fp_row(t)) for t in texts]


@settings(max_examples=30, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60),
        min_size=1,
        max_size=20,
    ),
    k=st.integers(2, 4),
)
def test_minhash_signatures_property(texts, k):
    """Arrow-split batch signature kernel == per-doc reference for
    arbitrary ASCII texts and shingle sizes (empty-token boundary
    parity with python str.split)."""
    import numpy as np

    from clever_canal_ray.functions.dedup import MinHasher

    mh = MinHasher(num_hashes=16, bands=4, k=k)
    ref = np.stack([mh.signature(t) for t in texts])
    got = mh.signatures_batch(texts)
    assert np.array_equal(ref, got)


@settings(max_examples=40, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=8), min_size=1, max_size=25
    ),
    counts=st.lists(st.integers(1, 50), min_size=25, max_size=25),
    num_merges=st.integers(0, 40),
)
def test_bpe_train_encode_property(words, counts, num_merges):
    """For ANY word histogram: training is deterministic; greedy-rank
    encode of a training word == the trainer's final segmentation;
    encode is lossless for arbitrary words (incl. OOV)."""
    import pandas as pd

    from clever_canal_ray.functions.bpe import (
        END_MARKER,
        _merge_word,
        bpe_train,
        encode_word,
    )

    uniq = sorted(set(words))
    hist = pd.DataFrame({"w": uniq, "c": counts[: len(uniq)]})
    merges = bpe_train(hist, num_merges=num_merges, min_count=1)
    assert merges == bpe_train(hist, num_merges=num_merges, min_count=1)
    ranks = {m: i for i, m in enumerate(merges)}
    state = {w: tuple(w) + (END_MARKER,) for w in uniq}
    for a, b in merges:
        state = {w: _merge_word(s, (a, b), a + b) for w, s in state.items()}
    for w in uniq:
        enc = encode_word(w, ranks)
        assert enc == state[w]
        assert "".join(enc) == w + END_MARKER
    for w in ["zzz", "abcabc", "a"]:
        assert "".join(encode_word(w, ranks)) == w + END_MARKER


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 400),
    budget_frac=st.floats(0.0, 1.2),
    quantize=st.booleans(),
    num_bins=st.sampled_from([4, 16, 64]),
)
def test_select_by_token_budget_property(ray_session, seed, n, budget_frac, quantize, num_bins):
    """ANY score distribution (incl. heavy ties via quantization), ANY
    budget: distributed selection == the serial sort-cumsum prefix."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from clever_canal_ray.functions.corpus import select_by_token_budget

    rng = np.random.default_rng(seed)
    score = rng.standard_normal(n)
    if quantize:
        score = np.round(score, 1)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "score": score,
            "n_tok": rng.integers(1, 60, n).astype(np.int64),
        }
    )
    budget = int(df["n_tok"].sum() * budget_frac)
    sel, info = select_by_token_budget(
        rd.from_pandas(df).repartition(3), budget, num_bins=num_bins, boundary_cap=n + 1
    )
    p = sel.to_pandas()
    got = set(p["doc_id"].to_numpy("int64")) if len(p) else set()
    b = df.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
    csum = b["n_tok"].to_numpy("int64").cumsum()
    take = int(np.searchsorted(csum, budget, side="right"))
    assert got == set(b["doc_id"].to_numpy("int64")[:take])
    assert info["tokens_selected"] == (int(csum[take - 1]) if take else 0)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(5, 120),
    dim=st.sampled_from([4, 8, 16]),
    threshold=st.floats(0.5, 0.999),
    n_clusters=st.integers(1, 6),
)
def test_semdedup_property(ray_session, seed, n, dim, threshold, n_clusters):
    """ANY vector set / threshold / cluster count: distributed semdedup
    == the serial paper rule."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from clever_canal_ray.functions.ann import ivf_build_centroids
    from clever_canal_ray.functions.dedup import semdedup
    from tests.test_functions import _semdedup_serial

    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim))
    # sprinkle exact duplicates and near-duplicates
    for i in range(0, n, 7):
        j = (i * 3 + 1) % n
        vecs[i] = vecs[j] + rng.standard_normal(dim) * 1e-6
    emb = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})
    ds = rd.from_pandas(emb).repartition(3)
    cents = ivf_build_centroids(ds, n_centroids=min(n_clusters, n), iters=1)
    got = (
        semdedup(rd.from_pandas(emb).repartition(2), threshold=threshold,
                 centroids=cents, num_buckets=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ref = _semdedup_serial(np.arange(n), vecs, cents, threshold)
    assert len(got) == n
    for _, r in got.iterrows():
        k, csim, kept = ref[int(r["vec_id"])]
        assert int(r["cluster"]) == k and int(r["kept"]) == kept


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 10_000),
    n_new=st.integers(1, 150),
    n_ref=st.integers(0, 150),
    vocab=st.integers(1, 40),
)
def test_cross_corpus_dedup_property(ray_session, seed, n_new, n_ref, vocab):
    """ANY overlap profile: exact cross-corpus dedup == the set
    difference on text membership (new-internal dups preserved)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from clever_canal_ray.functions.dedup import cross_corpus_dedup

    rng = np.random.default_rng(seed)
    new = pd.DataFrame(
        {
            "doc_id": np.arange(n_new, dtype=np.int64),
            "text": [f"t {int(x)}" for x in rng.integers(0, vocab, n_new)],
        }
    )
    ref = pd.DataFrame(
        {
            "doc_id": np.arange(1000, 1000 + n_ref, dtype=np.int64),
            "text": [f"t {int(x)}" for x in rng.integers(0, vocab, n_ref)],
        }
    )
    got = cross_corpus_dedup(
        rd.from_pandas(new).repartition(3), rd.from_pandas(ref).repartition(2), num_buckets=4
    ).to_pandas()
    ref_texts = set(ref["text"])
    expect = sorted(new[~new["text"].isin(ref_texts)]["doc_id"])
    have = sorted(got["doc_id"]) if len(got) else []
    assert have == expect


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 10_000),
    n_txns=st.integers(1, 12),
    data=st.data(),
)
def test_live_pump_txn_framing_property(tmp_path_factory, seed, n_txns, data):
    """ANY sequence of external transactions chopped at ANY poll
    boundaries: pump publishes every record exactly once, in order,
    each external txn maps to exactly ONE internal txn (never split),
    and commit flags sit on true txn-last rows only."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clever_canal_ray.schema import lake_schema
    from clever_canal_ray.sources.live import SegmentPublisher, pump
    from clever_canal_ray.sources.segments import discover_segments

    BASE = {"op": "base_schema", "fields": [["doc_id", "string"], ["val", "string"]]}
    PAYLOAD = lake_schema([BASE])
    rng = np.random.default_rng(seed)
    recs = []
    for t in range(n_txns):
        for i in range(int(rng.integers(1, 6))):
            d = f"t{t}_r{i}"
            recs.append(
                {"op": "I", "doc_id": d, "after": {"doc_id": d, "val": "x"},
                 "txn_id": 100 + t, "_seq": len(recs) + 1}
            )
    # chop into arbitrary non-empty polls
    cuts = sorted(
        data.draw(
            st.sets(st.integers(1, max(len(recs) - 1, 1)), max_size=min(6, len(recs) - 1))
        )
    ) if len(recs) > 1 else []
    polls = [recs[a:b] for a, b in zip([0] + cuts, cuts + [len(recs)])]

    from tests.util import ScriptedSource as Scripted

    seg = str(tmp_path_factory.mktemp("live_prop"))
    pub = SegmentPublisher(seg, PAYLOAD)
    n = pump(Scripted(polls), pub, poll_interval=0.0, idle_rounds_to_stop=4)
    assert n == len(recs)
    tabs = [pq.read_table(p) for p in discover_segments(seg)]
    t = pa.concat_tables(tabs) if len(tabs) > 1 else tabs[0]
    assert t.num_rows == len(recs)
    # exactly once, in order
    assert t["doc_id"].to_pylist() == [r["doc_id"] for r in recs]
    txn = t["txn_id"].to_pylist()
    commit = t["txn_commit"].to_pylist()
    # each EXTERNAL txn -> exactly one internal id, contiguous
    ext = [r["txn_id"] for r in recs]
    mapping: dict = {}
    for e, i in zip(ext, txn):
        mapping.setdefault(e, set()).add(i)
    assert all(len(v) == 1 for v in mapping.values()), mapping
    # distinct external txns never share an internal id
    ids = [next(iter(v)) for v in mapping.values()]
    assert len(ids) == len(set(ids))
    # commit on true last rows only
    for i in range(len(txn)):
        assert commit[i] == (i + 1 == len(txn) or txn[i + 1] != txn[i])
