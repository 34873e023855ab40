"""BM25 keyword retrieval (functions/retrieval): batch kernel vs the
per-row serial reference, a DuckDB CTE oracle, block-layout
invariance, and retrieval-semantics edges."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from clever_canal_ray.functions.retrieval import bm25_topk, bm25_topk_serial

VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "ray", "data", "lake", "stream", "batch", "arrow", "shuffle",
    "merge", "upsert", "binlog", "event", "schema",
]


def _corpus(n=400, seed=11) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(VOCAB, size=rng.integers(3, 40)))
        for _ in range(n)
    ]
    # planted strong match: repeats every term of query q_ray many times
    texts[7] = " ".join(["ray", "data", "upsert"] * 12)
    return pd.DataFrame({"doc_id": [f"d{i:05d}" for i in range(n)], "text": texts})


QUERIES = [("q_ray", "ray data upsert"), ("q_fox", "quick brown fox"), ("q_none", "zzzz")]


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


def _ds(df: pd.DataFrame, parts=5):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


def test_bm25_matches_serial_reference(ray_session, corpus):
    out = bm25_topk(_ds(corpus), QUERIES, k=12).to_pandas()
    ref = bm25_topk_serial(corpus["text"].tolist(), corpus["doc_id"].tolist(), QUERIES, k=12)
    got = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = ref.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    # matmul vs serial summation may differ in the last ulp -> ±1 e6
    assert (got["score_e6"] - exp["score_e6"]).abs().max() <= 1
    # the planted all-terms doc wins its query
    assert got[got["query_id"] == "q_ray"].iloc[0]["doc_id"] == "d00007"
    # a query with no matching term returns nothing
    assert (got["query_id"] == "q_none").sum() == 0


def test_bm25_block_layout_invariant(ray_session, corpus):
    a = bm25_topk(_ds(corpus, parts=1), QUERIES, k=10).to_pandas()
    b = bm25_topk(_ds(corpus, parts=13), QUERIES, k=10).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["query_id", "rank"]).reset_index(drop=True),
        b.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_bm25_duckdb_oracle(ray_session, corpus):
    """Exact-formula CTE oracle: Lucene idf, k1=1.2 b=0.75, rank by
    (score desc, doc_id)."""
    out = bm25_topk(_ds(corpus), QUERIES[:2], k=8).to_pandas()
    con = duckdb.connect()
    con.register("corpus", corpus)
    for query_id, qtext in QUERIES[:2]:
        terms = sorted(set(qtext.split(" ")))
        tlist = ",".join(f"'{t}'" for t in terms)
        sql = f"""
        WITH docs AS (
          SELECT doc_id, len(string_split(text, ' ')) AS dl FROM corpus
        ),
        tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM corpus
        ),
        stats AS (
          SELECT count(*) AS n, avg(dl) AS avgdl FROM docs
        ),
        tf AS (
          SELECT doc_id, w, count(*) AS tf FROM tok WHERE w IN ({tlist}) GROUP BY 1, 2
        ),
        df AS (
          SELECT w, count(DISTINCT doc_id) AS df FROM tok WHERE w IN ({tlist}) GROUP BY 1
        )
        SELECT tf.doc_id,
               sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS s
        FROM tf JOIN df USING (w) JOIN docs USING (doc_id) CROSS JOIN stats
        GROUP BY tf.doc_id
        ORDER BY s DESC, tf.doc_id
        LIMIT 8
        """
        oracle = con.execute(sql).df()
        mine = out[out["query_id"] == query_id].sort_values("rank")
        assert mine["doc_id"].tolist() == oracle["doc_id"].tolist()
        np.testing.assert_allclose(
            mine["score_e6"].to_numpy() / 1e6, oracle["s"].to_numpy(), rtol=1e-9, atol=2e-6
        )


def test_bm25_edges(ray_session):
    df = pd.DataFrame({"doc_id": ["a", "b"], "text": ["ray ray ray", "ray data"]})
    # tf saturation: the 3x-repeat doc wins single-term query, but not 3x
    out = bm25_topk(_ds(df, parts=2), [("q", "ray")], k=5).to_pandas()
    assert out["doc_id"].tolist() == ["a", "b"]
    assert out["score_e6"].iloc[0] < 3 * out["score_e6"].iloc[1]
    # k smaller than matches
    out = bm25_topk(_ds(df, parts=2), [("q", "ray")], k=1).to_pandas()
    assert len(out) == 1 and out["rank"].tolist() == [1]
    # empty queries
    assert bm25_topk(_ds(df), [], k=3).num_rows == 0


def test_bm25_ties_and_nulls(ray_session):
    """Exact score ties (duplicate texts) at the local-k boundary break
    by doc_id at EVERY block layout; null text scores like empty."""
    df = pd.DataFrame(
        {
            "doc_id": ["z", "a", "m", "q"],
            "text": ["ray data", "ray data", "ray data", None],
        }
    )
    for parts in (1, 2, 4):
        out = bm25_topk(_ds(df, parts=parts), [("q", "ray")], k=2).to_pandas()
        assert out["doc_id"].tolist() == ["a", "m"], f"layout {parts}: {out}"
