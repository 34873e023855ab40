"""Distributed temporal joins — operators Ray Data lacks natively.

``asof_join``: for every left row, attach the right row with the
greatest ``right_on`` <= ``left_on`` among rows sharing the key — the
event-time enrichment join (market-data / CDC-snapshot lookup shape).

Scale design: ONE bucketed hash shuffle per side on the join key
(co-partitioning), then a vectorized per-bucket ``pandas.merge_asof``
(sort-merge within the bucket). No broadcast, no all-pairs; skewed
keys are bounded by the bucket granularity. The partitioning
assumption: a single key's rows (both sides) fit one bucket group —
the same assumption a range-partitioned MPP asof join makes per key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from clever_canal_ray.state.partitioning import stable_hash


def asof_join(
    left_ds,
    right_ds,
    left_by: str,
    right_by: str,
    left_on: str,
    right_on: str,
    num_buckets: int = 32,
):
    """Backward as-of join (inner): rows of ``left_ds`` matched to the
    latest ``right_ds`` row with ``right_on <= left_on`` per key.

    Column sets of the two sides must be disjoint. ``left_on`` /
    ``right_on`` must be comparable after pandas datetime coercion.
    Returns a Dataset with the left columns plus the matched right
    columns (unmatched left rows dropped — inner semantics).
    """
    left_cols = left_ds.schema().names
    right_cols = right_ds.schema().names
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"asof_join requires disjoint column names; shared: {sorted(overlap)}")
    all_cols = list(left_cols) + list(right_cols)

    def tag(side: int, on_col: str, by_col: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out[on_col] = pd.to_datetime(out[on_col])
            for c in all_cols:
                if c not in out.columns:
                    out[c] = np.nan
            out = out[all_cols]
            out["__side"] = np.int8(side)
            out["__bucket"] = (
                stable_hash(df[by_col].astype(str).to_numpy()) % np.uint64(num_buckets)
            ).astype(np.int64)
            return out

        return fn

    tagged = left_ds.map_batches(tag(0, left_on, left_by), batch_format="pandas").union(
        right_ds.map_batches(tag(1, right_on, right_by), batch_format="pandas")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == 0][list(left_cols)].copy()
        rf = g[g["__side"] == 1][list(right_cols)].copy()
        if len(lf) == 0 or len(rf) == 0:
            return pd.DataFrame(columns=all_cols)
        # the union's NaN-padding can promote the on-columns to object
        # in some block layouts — re-coerce before the ordered merge
        lf[left_on] = pd.to_datetime(lf[left_on])
        rf[right_on] = pd.to_datetime(rf[right_on])
        out = pd.merge_asof(
            lf.sort_values(left_on, kind="stable"),
            rf.sort_values(right_on, kind="stable"),
            left_on=left_on,
            right_on=right_on,
            left_by=left_by,
            right_by=right_by,
            direction="backward",
            allow_exact_matches=True,
        )
        return out.dropna(subset=[right_on])[all_cols]

    return (
        tagged.groupby("__bucket")
        .map_groups(lambda g: merge(g.drop(columns="__bucket")), batch_format="pandas")
    )


def range_join(
    left_ds,
    right_ds,
    left_by: str,
    right_by: str,
    left_on: str,
    right_lo: str,
    right_hi: str,
    num_buckets: int = 32,
):
    """Interval (range) join, inner: every ``left_ds`` row is matched to
    EVERY ``right_ds`` row sharing the key whose half-open interval
    ``[right_lo, right_hi)`` contains ``left_on`` — the point-in-interval
    band join (validity-history lookup, events-into-windows shape).

    Unlike :func:`asof_join` (latest single match) each left row can
    produce many output rows; the per-key cost is |L_k| x |R_k| inside
    the bucket — the standard MPP band-join inner loop (hash join on the
    key, vectorized band filter). The bounded side should be the
    interval (right) side, e.g. a version/validity history.

    Scale design mirrors asof_join: ONE bucketed hash shuffle per side
    on the join key, vectorized per-bucket merge+mask. Partitioning
    assumption: one key's rows (both sides) fit a bucket group.

    ``left_on`` / ``right_lo`` / ``right_hi`` may be numeric or
    datetime-coercible; column sets of the two sides must be disjoint.
    """
    left_cols = left_ds.schema().names
    right_cols = right_ds.schema().names
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"range_join requires disjoint column names; shared: {sorted(overlap)}")
    all_cols = list(left_cols) + list(right_cols)

    def coerce(s: pd.Series) -> pd.Series:
        # numeric bands stay numeric; everything else (datetime64,
        # strings, object Timestamps after the union's NaN-padding)
        # goes through to_datetime
        if pd.api.types.is_numeric_dtype(s):
            return s
        return pd.to_datetime(s)

    def tag(side: int, on_cols: list[str], by_col: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            for c in on_cols:
                out[c] = coerce(out[c])
            for c in all_cols:
                if c not in out.columns:
                    out[c] = np.nan
            out = out[all_cols]
            out["__side"] = np.int8(side)
            out["__bucket"] = (
                stable_hash(df[by_col].astype(str).to_numpy()) % np.uint64(num_buckets)
            ).astype(np.int64)
            return out

        return fn

    tagged = left_ds.map_batches(tag(0, [left_on], left_by), batch_format="pandas").union(
        right_ds.map_batches(tag(1, [right_lo, right_hi], right_by), batch_format="pandas")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == 0][list(left_cols)].copy()
        rf = g[g["__side"] == 1][list(right_cols)].copy()
        if len(lf) == 0 or len(rf) == 0:
            return pd.DataFrame(columns=all_cols)
        # union NaN-padding can promote columns to object in mixed
        # blocks — restore real dtypes, then re-coerce the band columns
        lf = lf.infer_objects()
        rf = rf.infer_objects()
        lf[left_on] = coerce(lf[left_on])
        rf[right_lo] = coerce(rf[right_lo])
        rf[right_hi] = coerce(rf[right_hi])
        out = lf.merge(rf, left_on=left_by, right_on=right_by, how="inner")
        mask = (out[right_lo].to_numpy() <= out[left_on].to_numpy()) & (
            out[left_on].to_numpy() < out[right_hi].to_numpy()
        )
        return out.loc[mask, all_cols]

    return (
        tagged.groupby("__bucket")
        .map_groups(lambda g: merge(g.drop(columns="__bucket")), batch_format="pandas")
    )


def session_windows(ds, key_col: str, ts_col: str, gap_ms: int):
    """Gap-based sessionization: a key's events sorted by event time are
    cut into sessions wherever the gap to the previous event exceeds
    ``gap_ms``. Returns one row per (key, session): ``session_id``
    (0-based per key), ``session_start``, ``session_end``, ``n_events``.

    Scale design: ONE bucketed hash shuffle on the key (a key's events
    land in one bucket group), then a fully vectorized per-bucket pass —
    sort by (key, ts), diff, cumsum of break flags, groupby agg. No
    driver materialization; skew is bounded by the bucket granularity.
    Partitioning assumption (documented, same as asof_join): one key's
    events fit a bucket group.

    Determinism under ts ties: equal timestamps can never exceed the
    gap, so session membership and (start, end, count) are independent
    of tie order.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key_col, ts_col]].copy()
        out[ts_col] = pd.to_datetime(out[ts_col])
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                columns=[key_col, "session_id", "session_start", "session_end", "n_events"]
            )
        g = g.sort_values([key_col, ts_col], kind="stable")
        ts = g[ts_col].astype("datetime64[ms]").astype("int64").to_numpy()
        key = g[key_col].to_numpy()
        new_key = np.empty(len(g), dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        brk = np.empty(len(g), dtype=np.int64)
        brk[0] = 0
        brk[1:] = ((ts[1:] - ts[:-1]) > gap_ms) & ~new_key[1:]
        # session_id restarts at 0 per key: global cumsum of (new_key|brk)
        # minus the value at the key's first row
        sid_global = np.cumsum(new_key | (brk > 0))
        first_of_key = np.where(new_key)[0]
        key_base = sid_global[first_of_key]
        sid = sid_global - np.repeat(key_base, np.diff(np.append(first_of_key, len(g))))
        g = g.assign(session_id=sid)
        return (
            g.groupby([key_col, "session_id"], sort=False)
            .agg(
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
                n_events=(ts_col, "size"),
            )
            .reset_index()
        )

    from clever_canal_ray.stages.agg import bucketed_groupby

    return bucketed_groupby(ds, [key_col], partial, per_bucket, num_buckets=32)


def hopping_window_agg(
    ds, ts_col: str, window_ms: int, hop_ms: int, group_cols: list[str], agg_map: dict
):
    """Hopping (sliding) window aggregate: windows of ``window_ms``
    advancing every ``hop_ms`` (``hop_ms == window_ms`` degenerates to
    tumbling). Each event contributes to ``window_ms / hop_ms`` windows;
    the explode is vectorized per batch (np.repeat + tiled offsets), the
    merge is the same partial→bucketed-final shape as tumbling — the
    shuffle moves per-window PARTIALS, never the exploded events.

    ``window_ms`` must be a multiple of ``hop_ms``.
    """
    if window_ms % hop_ms:
        raise ValueError("window_ms must be a multiple of hop_ms")
    k = window_ms // hop_ms

    specs = {
        out: (src, "size" if how == "count" else how) for out, (src, how) in agg_map.items()
    }
    merge_how = {
        out: ("sum" if how in ("count", "sum") else how) for out, (_, how) in agg_map.items()
    }

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        ts = pd.to_datetime(df[ts_col]).astype("datetime64[ms]").astype("int64").to_numpy()
        # the k windows containing ts: starts floor(ts/hop)*hop - j*hop,
        # j in [0, k). All k satisfy start > ts - window because
        # window == k*hop and base > ts - hop — no membership filter
        # is needed.
        base = (ts // hop_ms) * hop_ms
        idx = np.repeat(np.arange(len(df)), k)
        starts = np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64) * hop_ms, len(df))
        rep = df.iloc[idx].copy()
        rep["window_start"] = starts
        keys = ["window_start"] + group_cols
        return rep.groupby(keys, sort=False).agg(**specs).reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        keys = ["window_start"] + group_cols
        return g.groupby(keys, sort=False).agg(
            **{out: (out, merge_how[out]) for out in agg_map}
        ).reset_index()

    from clever_canal_ray.stages.agg import bucketed_groupby

    return bucketed_groupby(ds, ["window_start"] + group_cols, partial, final, num_buckets=16)


def tumbling_window_agg(ds, ts_col: str, window_ms: int, group_cols: list[str], agg_map: dict):
    """Tumbling-window aggregate: floor(ts / window) windows per group.
    Partial per-batch pandas agg, ONE small groupby on
    (window, *group_cols) — the windowed-aggregate shape over event
    time. ``agg_map``: out_col -> (src_col, 'sum'|'count'|'min'|'max').
    """

    # partial spec + how partials merge (count partials merge by sum)
    specs = {
        out: (src, "size" if how == "count" else how) for out, (src, how) in agg_map.items()
    }
    merge_how = {
        out: ("sum" if how in ("count", "sum") else how) for out, (_, how) in agg_map.items()
    }

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # explicit ms unit: pandas keeps arrow timestamps in their
        # native unit (us/ns), so a bare astype(int64) is unit-dependent
        ts = pd.to_datetime(df[ts_col]).astype("datetime64[ms]").astype("int64")
        df["window_start"] = (ts // window_ms) * window_ms
        keys = ["window_start"] + group_cols
        return df.groupby(keys, sort=False).agg(**specs).reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        keys = ["window_start"] + group_cols
        return g.groupby(keys, sort=False).agg(
            **{out: (out, merge_how[out]) for out in agg_map}
        ).reset_index()

    from clever_canal_ray.stages.agg import bucketed_groupby

    return bucketed_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["window_start"] + group_cols,
        lambda df: df,
        final,
        num_buckets=16,
    )
