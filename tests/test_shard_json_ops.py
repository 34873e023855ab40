"""Distributed row_number (shard_positions) and JSON payload decode
(extract_json_int) — edge cases beyond the sf-table gate: cross-bucket
rank continuity, duplicate hash ordering, empty input, missing /
negative / whitespace JSON fields."""

import hashlib

import numpy as np
import pandas as pd

from clever_canal_ray.functions.cdc_ops import extract_json_int
from clever_canal_ray.functions.corpus import _md5_u64, shard_positions


def _ds(df: pd.DataFrame, parts: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


def _h(v) -> int:
    return int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:16], "little")


def test_md5_u64_matches_reference():
    vals = [0, 1, 42, "x"]
    assert _md5_u64(pd.Series(vals)).tolist() == [_h(v) for v in vals]


def test_shard_positions_serial_oracle(ray_session):
    n, shards = 3000, 8
    df = pd.DataFrame({"doc_id": np.arange(n)})
    out = (
        shard_positions(_ds(df), "doc_id", num_shards=shards, num_buckets=16, mirror=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # serial oracle: per shard, order by (h, id), 0-based rank
    ref = pd.DataFrame({"doc_id": np.arange(n)})
    ref["h"] = [_h(i) for i in ref["doc_id"]]
    ref["shard"] = [h % shards for h in ref["h"]]
    ref = ref.sort_values(["shard", "h", "doc_id"]).reset_index(drop=True)
    ref["pos"] = ref.groupby("shard").cumcount()
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    assert out["shard"].tolist() == ref["shard"].tolist()
    assert out["pos"].tolist() == ref["pos"].tolist()
    # positions are a permutation of 0..count-1 within every shard
    for s, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))


def test_shard_positions_single_shard_is_global_rank(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(200)})
    out = shard_positions(_ds(df), "doc_id", num_shards=1, num_buckets=4).to_pandas()
    assert sorted(out["pos"]) == list(range(200))
    assert (out["shard"] == 0).all()


def test_shard_positions_rejects_bad_buckets(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2]})
    try:
        shard_positions(_ds(df, 1), "doc_id", num_buckets=48)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_extract_json_int_edge_cases(ray_session):
    df = pd.DataFrame(
        {
            "i": range(6),
            "props": [
                '{"k": 87}',
                '{"k":-4,"z":1}',
                '{ "k" :  12 }',
                '{"z": 9}',  # field absent -> null
                "not json",  # -> null
                '{"kk": 5}',  # different key -> null
            ],
        }
    )
    out = (
        extract_json_int(_ds(df, 2), "props", "k", "k")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    assert out["k"].tolist()[:3] == [87, -4, 12]
    assert out["k"].isna().tolist() == [False, False, False, True, True, True]


def test_mq_partition_keys_stay_together(ray_session):
    from clever_canal_ray.functions.cdc_ops import mq_partition

    df = pd.DataFrame(
        {"event_id": np.arange(1000), "user_id": np.arange(1000) % 37}
    )
    out = mq_partition(_ds(df), "user_id", 8, mirror=True).to_pandas()
    out_fast = mq_partition(_ds(df), "user_id", 8).to_pandas()
    assert (out_fast.groupby("user_id")["mq_partition"].nunique() == 1).all()
    # every key maps to exactly one partition, and the map is the md5 rule
    per_key = out.groupby("user_id")["mq_partition"].nunique()
    assert (per_key == 1).all()
    for uid in range(37):
        assert (
            out[out["user_id"] == uid]["mq_partition"].iloc[0]
            == _h(uid) % 8
        )
    # no partition empty at this key count (sanity of the spread)
    assert out["mq_partition"].nunique() == 8


def test_span_dedup_hand_case(ray_session):
    from clever_canal_ray.functions.corpus import span_dedup

    # spans of 3 tokens; doc 0 and doc 2 share span "a b c"
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a b c d e",  # spans: "a b c", "d e"
                "x y z",  # span: "x y z"
                "a b c",  # duplicate of doc 0 span 0
            ],
        }
    )
    out = (
        span_dedup(_ds(df, 3), span_tokens=3)
        .to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    assert out[["doc_id", "span_idx"]].values.tolist() == [[0, 0], [0, 1], [1, 0], [2, 0]]
    assert out["kept"].tolist() == [1, 1, 1, 0]


def test_span_dedup_serial_oracle(ray_session):
    from collections import defaultdict

    from clever_canal_ray.functions.corpus import span_dedup

    rng = np.random.default_rng(11)
    vocab = list("abcd")
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 25))) for _ in range(200)
    ]
    df = pd.DataFrame({"doc_id": range(200), "text": texts})
    out = (
        span_dedup(_ds(df), span_tokens=5)
        .to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    seen = {}
    want = []
    for i, t in enumerate(texts):
        w = t.split(" ")
        for j in range(0, (len(w) + 4) // 5):
            span = " ".join(w[j * 5 : j * 5 + 5])
            kept = 1 if span not in seen else 0
            seen.setdefault(span, (i, j))
            want.append([i, j, kept])
    assert out[["doc_id", "span_idx", "kept"]].values.tolist() == want


def test_mq_topic_routing_first_match_wins(ray_session):
    """dynamicTopic analog: ordered topic:regex rules, first match wins,
    default topic for unmatched tables (MQMessageUtils.matchTopics)."""
    from clever_canal_ray.functions.cdc_ops import mq_topic

    df = pd.DataFrame(
        {
            "table": [
                "shop.orders", "shop.users", "logs.clicks", "logs.errors",
                "misc.other", "shop.orders_archive",
            ]
        }
    )
    rules = [
        ("t_orders", r"shop\.orders"),          # exact: must NOT catch orders_archive
        ("t_shop", r"shop\..*"),
        ("t_logs", r"logs\.clicks,logs\.errors"),  # comma alternation form
    ]
    out = mq_topic(_ds(df), "table", rules, default_topic="t_default").to_pandas()
    got = dict(zip(out["table"], out["mq_topic"]))
    assert got == {
        "shop.orders": "t_orders",
        "shop.users": "t_shop",
        "shop.orders_archive": "t_shop",
        "logs.clicks": "t_logs",
        "logs.errors": "t_logs",
        "misc.other": "t_default",
    }
