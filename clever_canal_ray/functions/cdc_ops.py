"""Generic CDC-style operators over arbitrary keyed event streams.

These re-express the engine's core semantics (O9 last-writer-wins,
A1/A2 counters, O7 k-way merge, D3 position dedup, FlatMessage
projection) as reusable Ray Data transforms over any
(key, position, payload) event table — used by ``__ray_entry__``'s
queries over the generic ``events`` test table and exercised against
DuckDB oracles.

Pattern: combiner-in-map_batches (partial LWW per batch) → ONE
``groupby(bucket)`` shuffle of the combined rows → vectorized
per-bucket finalize. Never a per-key map_groups (millions of tiny
groups); always a per-bucket one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from clever_canal_ray.state.partitioning import stable_hash


def _lww_partial(df: pd.DataFrame, key: str, pos: str) -> pd.DataFrame:
    order = np.lexsort((df[pos].to_numpy(), df[key].to_numpy()))
    codes = df[key].to_numpy()[order]
    last = np.ones(len(order), dtype=bool)
    last[:-1] = codes[:-1] != codes[1:]
    return df.iloc[order[last]]


def lww_latest(ds, key: str, pos: str, num_buckets: int = 64):
    """Last event per key by position (the O9 reduce without the lake
    merge). Returns the full winning rows."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = _lww_partial(batch, key, pos)
        out = out.copy()
        out["__bucket"] = (stable_hash(out[key].astype(str).to_numpy()) % np.uint64(num_buckets)).astype(
            np.int64
        )
        return out

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        return _lww_partial(group, key, pos).drop(columns="__bucket")

    return ds.map_batches(partial, batch_format="pandas").groupby("__bucket").map_groups(
        finalize, batch_format="pandas"
    )


def changelog_counts(ds, op_col: str):
    """A1 running-counter analog: events per op class."""
    return ds.groupby(op_col).count()


def position_bounds(ds, key: str, pos: str):
    """A2 min/max position per key (CanalEventUtils.min / first-last)."""
    from ray.data.aggregate import Count, Max, Min

    return ds.groupby(key).aggregate(
        Min(pos, alias_name="min_pos"), Max(pos, alias_name="max_pos"), Count(alias_name="n_events")
    )


def kway_merge_head(shard_datasets, ts_col: str, pos_col: str, head: int):
    """O7 GroupEventSink analog: union N shard streams, order by
    (execute-ts, position) with position as the regression tiebreak,
    take the first ``head`` events."""
    ds = shard_datasets[0]
    for other in shard_datasets[1:]:
        ds = ds.union(other)
    return ds.sort([ts_col, pos_col]).limit(head)


def dedup_positions(ds, pos_col: str, group_cols: list[str]):
    """D3 exact position dedup: count distinct positions per group —
    duplicated delivery collapses (partial per-batch distinct, then a
    small groupby merge)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[group_cols + [pos_col]].drop_duplicates()

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        out = g.head(1)[group_cols].copy()
        out["n_distinct"] = g[pos_col].nunique()
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_cols[0] if len(group_cols) == 1 else group_cols)
        .map_groups(finalize, batch_format="pandas")
    )


def write_flat_messages(events_ds, out_dir: str, database: str = "lake", table: str = "sequences"):
    """Serialize canonical change events to FlatMessage-shaped JSON
    files (protocol/FlatMessage.java:10-35: one object per row change
    with database/table/pkNames/type/es/data/old) — the client-facing
    wire format, written distributed via ``Dataset.write_json``.
    """
    def project(t: pa.Table) -> pa.Table:
        n = t.num_rows
        after = t["after"].combine_chunks() if isinstance(t["after"], pa.ChunkedArray) else t["after"]
        return pa.Table.from_pydict(
            {
                "database": pa.array([database] * n, pa.string()),
                "table": pa.array([table] * n, pa.string()),
                "pkNames": pa.array([["doc_id"]] * n, pa.list_(pa.string())),
                "isDdl": pc.equal(t["op"], "DDL"),
                "type": t["op"],
                "es": t["execute_ts"].cast(pa.int64()),
                "data": after,
                "old": t["before"].combine_chunks()
                if "before" in t.column_names and isinstance(t["before"], pa.ChunkedArray)
                else (t["before"] if "before" in t.column_names else pa.nulls(n, after.type)),
            }
        )

    events_ds.map_batches(project, batch_format="pyarrow").write_json(out_dir)
    return out_dir


def flat_message(ds, database: str, table: str, pk_col: str, op_col: str, ts_col: str, data_cols: list[str]):
    """FlatMessage projection (protocol/FlatMessage.java:10-35): one
    flat row per change with routing metadata columns."""

    def project(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "database": database,
                "table": table,
                "pk": df[pk_col].to_numpy(),
                "type": df[op_col].to_numpy(),
                "es": df[ts_col].to_numpy(),
            }
        )
        for c in data_cols:
            out[f"data_{c}"] = df[c].to_numpy()
        return out

    return ds.map_batches(project, batch_format="pandas")
