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
    take the first ``head`` events.

    Scale shape: each BLOCK first reduces to its local head-N (cheap
    partial top-k inside map_batches), so the global sort ranks only
    ~blocks x head rows instead of every event — a head-N over a
    union must not be an all-data sort."""

    def local_head(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(head, [ts_col, pos_col])

    ds = shard_datasets[0].map_batches(local_head, batch_format="pandas")
    for other in shard_datasets[1:]:
        ds = ds.union(other.map_batches(local_head, batch_format="pandas"))
    # final head on the driver over the ≤ blocks × head candidates —
    # NOT ds.limit(): a LimitOperator cancels in-flight tasks, and
    # accumulated cancellations segfault Ray 2.49's raylet at shutdown
    # (see dedup._arrow_schema_of)
    import ray.data as rd

    merged = ds.sort([ts_col, pos_col]).to_pandas().head(head).reset_index(drop=True)
    return rd.from_pandas(merged)


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


def _field_changed(a: pa.Array, b: pa.Array) -> np.ndarray:
    """Row mask: payload field value differs between two struct children
    (validity difference counts as changed). Vectorized for scalars AND
    list columns (length compare, then flat-aligned value compare)."""
    va = ~np.asarray(pc.is_null(a).to_numpy(zero_copy_only=False), dtype=bool)
    vb = ~np.asarray(pc.is_null(b).to_numpy(zero_copy_only=False), dtype=bool)
    changed = va != vb
    both = va & vb
    if not both.any():
        return changed
    if pa.types.is_list(a.type) or pa.types.is_large_list(a.type):
        la = np.diff(np.asarray(a.offsets))
        lb = np.diff(np.asarray(b.offsets))
        len_diff = la != lb
        changed |= both & len_diff
        cand = both & ~len_diff
        if cand.any():
            idx = np.where(cand)[0]
            fa = a.take(pa.array(idx)).flatten().to_numpy(zero_copy_only=False)
            fb = b.take(pa.array(idx)).flatten().to_numpy(zero_copy_only=False)
            neq = fa != fb
            counts = la[idx]
            any_neq = np.zeros(len(idx), dtype=bool)
            nz = counts > 0
            if nz.any():
                # reduceat over the non-empty segments only (an empty
                # segment would alias its neighbor's first element)
                c2 = counts[nz]
                offs2 = np.zeros(len(c2), np.int64)
                np.cumsum(c2[:-1], out=offs2[1:])
                any_neq[nz] = np.add.reduceat(neq.astype(np.int64), offs2) > 0
            changed[idx] |= any_neq
        return changed
    neq = pc.not_equal(a, b)
    neq_np = np.asarray(neq.fill_null(False).to_numpy(zero_copy_only=False), dtype=bool)
    changed |= both & neq_np
    return changed


def write_flat_messages(
    events_ds, out_dir: str, database: str = "lake", table: str = "sequences",
    minimal_old: bool = True,
):
    """Serialize canonical change events to FlatMessage-shaped JSON
    files (protocol/FlatMessage.java:10-35: one object per row change
    with database/table/pkNames/type/es/data/old) — the client-facing
    wire format, written distributed via ``Dataset.write_json``.

    ``minimal_old``: for UPDATE rows, ``old`` carries only the columns
    whose value actually changed (others null) and ``updated`` lists
    their names — the per-column change mask
    (LogEventConvert.isUpdate:875-899; FlatMessage.old holds changed
    before-values only, FlatMessage.java:16).
    """
    def project(t: pa.Table) -> pa.Table:
        n = t.num_rows
        # XA branch internals cannot ride the flat surface: a consumer
        # of the JSON stream has no verdict fixpoint, so exporting an
        # unresolved branch would make rolled-back rows applyable.
        # Replay through the engine (which resolves branches) first.
        ops_np = np.asarray(t["op"].to_numpy(zero_copy_only=False), dtype=object)
        has_xa_rows = bool(np.isin(ops_np, ("XC", "XR")).any()) or (
            "xa_id" in t.column_names and t["xa_id"].null_count < n
        )
        if has_xa_rows:
            raise ValueError(
                "stream carries XA branch events/verdicts — resolve them by "
                "replaying through the engine before FlatMessage export"
            )
        after = t["after"].combine_chunks() if isinstance(t["after"], pa.ChunkedArray) else t["after"]
        before = (
            t["before"].combine_chunks()
            if "before" in t.column_names and isinstance(t["before"], pa.ChunkedArray)
            else (t["before"] if "before" in t.column_names else pa.nulls(n, after.type))
        )
        is_u = np.asarray(pc.equal(t["op"], "U").to_numpy(zero_copy_only=False), dtype=bool)
        fields = [after.type.field(i) for i in range(after.type.num_fields)]
        updated_lists = pa.nulls(n, pa.list_(pa.string()))
        if minimal_old and is_u.any() and before.null_count < n:
            old_children = []
            changed_by_field = {}
            for f in fields:
                a_child = pc.struct_field(before, f.name)
                b_child = pc.struct_field(after, f.name)
                ch = _field_changed(a_child, b_child) & is_u
                changed_by_field[f.name] = ch
                # U rows: null out unchanged cells; non-U rows keep before as-is
                keep = ch | ~is_u
                old_children.append(
                    pc.if_else(pa.array(keep), a_child, pa.nulls(n, f.type))
                )
            before_invalid = np.asarray(
                pc.is_null(before).to_numpy(zero_copy_only=False), dtype=bool
            )
            old = pa.StructArray.from_arrays(
                old_children, fields=fields, mask=pa.array(before_invalid)
            )
            # updated = changed column names per U row (list<string>)
            names = [f.name for f in fields]
            mat = np.stack([changed_by_field[nm] for nm in names], axis=1)  # (n, F)
            counts = mat.sum(axis=1).astype(np.int64)  # all-False rows for non-U
            offsets = np.zeros(n + 1, np.int64)
            np.cumsum(counts, out=offsets[1:])
            name_arr = np.asarray(names, dtype=object)
            # np.where iterates row-major: flat names align with offsets
            flat = name_arr[np.where(mat)[1]] if counts.sum() else np.array([], dtype=object)
            updated_lists = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(flat, pa.string()),
                mask=pa.array(~is_u),
            )
        else:
            old = before
        # FlatMessage.sql (FlatMessage.java:15): DDL rows carry their
        # statement — here the structured DDL JSON — so a consumer can
        # replay schema evolution from the flat stream alone
        sql = t["ddl"] if "ddl" in t.column_names else pa.nulls(n, pa.string())
        return pa.Table.from_pydict(
            {
                "database": pa.array([database] * n, pa.string()),
                "table": pa.array([table] * n, pa.string()),
                "pkNames": pa.array([["doc_id"]] * n, pa.list_(pa.string())),
                "isDdl": pc.equal(t["op"], "DDL"),
                "type": t["op"],
                "es": t["execute_ts"].cast(pa.int64()),
                "sql": sql,
                "data": after,
                "old": old,
                "updated": updated_lists,
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


def extract_json_int(ds, col: str, field: str, out_col: str):
    """Decode one integer field out of a JSON-string payload column —
    the semi-structured row-image decode step (the reference parses
    typed column values out of serialized row payloads,
    LogEventConvert row-data → typed columns; FlatMessage consumers do
    the same on the JSON side).

    Vectorized: one compiled-regex ``str.extract`` per batch (pandas'
    C regex loop), no per-row json.loads. Handles ``{"f": 123}`` /
    ``{"f": -4}`` with arbitrary whitespace; a row whose payload lacks
    the field (or isn't valid in that shape) yields null — mirrors
    DuckDB ``CAST(json_extract_string(col, '$.f') AS BIGINT)``.

    FLAT-OBJECT ASSUMPTION: the payload must be a single-level JSON
    object (``{"k": 1, ...}``) — the regex requires the key to follow a
    ``{`` or ``,`` delimiter, which rejects occurrences inside string
    values, but it cannot distinguish nesting DEPTHS (``{"a":{"k":1}}``
    would still match ``k``). For nested payloads, decode with a real
    JSON path (per-row json.loads in an actor stage) instead —
    mirroring ``$.k`` top-level semantics on non-flat data needs a
    parser, not a regex.
    """
    import re

    pat = re.compile(r'[{,]\s*"%s"\s*:\s*(-?\d+)\s*[,}]' % re.escape(field))

    def ext(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out_col] = df[col].str.extract(pat, expand=False).astype("Int64")
        return df

    return ds.map_batches(ext, batch_format="pandas")


def mq_partition(ds, pk_col: str, num_partitions: int, out_col: str = "mq_partition", mirror: bool = False):
    """MQ partition routing (MQMessageUtils.messagePartition analog:
    canal hashes each row's pk to pick the MQ partition so ALL changes
    of one key land in one partition and per-key order survives the
    fan-out). Default hash = C-speed ``_fast_u64`` (deterministic
    across runs/cluster sizes); ``mirror=True`` = md5 of the
    stringified pk (DuckDB ``md5_number_lower``) so an external SQL
    engine can recompute the exact routing — the oracle-gate mode.
    Pure per-batch map — no shuffle; the downstream writer groups by
    ``out_col``.
    """
    from clever_canal_ray.functions.corpus import _hash_u64

    npart = np.uint64(num_partitions)

    def route(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out_col] = (_hash_u64(df[pk_col], mirror) % npart).astype(np.int64)
        return df

    return ds.map_batches(route, batch_format="pandas")


def mq_topic(ds, table_col: str, rules, default_topic: str, out_col: str = "mq_topic"):
    """MQ TOPIC routing (MQMessageUtils.messageTopics / matchTopics
    analog: canal's ``dynamicTopic`` maps ``schema.table`` names to MQ
    topics through an ordered ``topic:regex`` rule list; the first
    matching rule wins, unmatched tables fall through to the static
    default topic).

    ``rules``: ordered ``[(topic, regex_str), ...]`` — each regex is
    ``^…$``-anchored like the table filters (AviaterRegexFilter
    semantics). Vectorized: one RE2 ``match_substring_regex`` pass per
    rule over the (low-cardinality, dictionary-friendly) table column;
    no shuffle — the downstream writer groups by ``(out_col,
    mq_partition)``. Compose with ``mq_partition`` for the full
    topic+partition fan-out.
    """
    from clever_canal_ray.stages.combine import _anchor_regex

    compiled = [(topic, _anchor_regex(rx).pattern) for topic, rx in rules]

    def route(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        out = np.full(n, default_topic, dtype=object)
        unassigned = np.ones(n, dtype=bool)
        tbl = t[table_col]
        for topic, pattern in compiled:
            if not unassigned.any():
                break
            m = pc.match_substring_regex(tbl, pattern).to_numpy(zero_copy_only=False)
            hit = unassigned & np.asarray(m, dtype=bool)
            out[hit] = topic
            unassigned &= ~hit
        return t.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(route, batch_format="pyarrow")
