"""Relational operator surface — the reference's reader/filter/join/agg ops
(SURVEY.md §2.1/2.3/2.5/2.6) re-expressed as composable Ray Data stages.

Reference analogs are cited per function.  Common design rules:
- predicates are vectorized Arrow kernels inside ``map_batches`` (never a
  per-row ``ds.filter(fn)``);
- small sides are broadcast via ``ray.put`` handles, probed with ``pc.is_in``
  / pandas merges (J1/J6/J7 — never a shuffle);
- aggregations are two-phase (per-batch partial, then a small groupby) so
  hot keys cost O(#batches), not O(#rows) — the skew defense.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

_PART = "__part"


def _hash_part(vals: np.ndarray, num_partitions: int) -> np.ndarray:
    """Partition id from a key array: NUMERIC keys route by their
    canonical value bits (``context.numeric_route_bits`` — stable under
    pandas null-promotion, where an int64 column with a null in SOME
    batches arrives as float64 in exactly those batches; a per-dtype
    branch would split one key across partitions and silently break
    per-partition-disjoint invariants like ``type_profile``'s summed
    nunique).  Everything non-numeric hashes its string form.  The
    backbone of the partitioned-vectorized pattern (below): group on
    ``__part`` and process EVERY key of the partition in one vectorized
    call, instead of ``groupby(key).map_groups(fn)``'s one interpreter
    round-trip per key (10⁸ keys = 10⁸ Python calls — the classic
    map_groups overhead trap; see ``dedup.exact_dedup``)."""
    from ..context import hash64, numeric_route_bits

    vals = np.asarray(vals)
    if vals.dtype.kind in "iuf":
        u = numeric_route_bits(vals)
    else:
        u = hash64(vals.astype(object)).astype(np.uint64)
    return (u % np.uint64(num_partitions)).astype(np.int32)


_PART_BYTES = 1 << 28  # target input bytes per hash-route partition task


def _resolve_partitions(
    ds: rd.Dataset, num_partitions: "int | None", *, floor: int = 32, cap: int = 4096
) -> int:
    """Partition count for the ``__part`` hash route.  An explicit value
    wins.  ``None`` scales with input size when read metadata makes the
    byte count knowable WITHOUT executing the plan (≈256 MiB of input per
    partition, clamped to [floor, cap]); un-metadata'd inputs fall back
    to ``floor`` — each reduce task then holds ~1/floor of the table, so
    callers shuffling huge derived datasets should pass ``num_partitions``
    explicitly.  (ADVICE r4: a hardcoded 32 capped reduce parallelism and
    per-task memory at web scale.)"""
    if num_partitions is not None:
        return int(num_partitions)
    size = None
    try:
        size = ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        size = None
    if size is None:
        return floor
    return int(min(cap, max(floor, -(-size // _PART_BYTES))))


def _seg_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Per-row start index of the row's key segment in a key-sorted array
    (the numpy segment-op backbone: combine with diff/reduceat/flatnonzero
    for per-key aggregates without per-key calls)."""
    n = len(sorted_keys)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = sorted_keys[1:] != sorted_keys[:-1]
    return np.maximum.accumulate(np.where(new, np.arange(n), -1))


def _segmented_searchsorted(
    vals: np.ndarray,
    seg_lo: np.ndarray,
    seg_hi: np.ndarray,
    queries: np.ndarray,
    side: str,
) -> np.ndarray:
    """Per-segment binary search, vectorized over queries: for query i,
    the insertion position of ``queries[i]`` within
    ``vals[seg_lo[i]:seg_hi[i]]`` (position returned as a GLOBAL index).
    log₂(max segment) bisection iterations of whole-array numpy ops — the
    per-key ``np.searchsorted`` loop without the per-key Python."""
    lo = np.asarray(seg_lo, dtype=np.int64).copy()
    hi = np.asarray(seg_hi, dtype=np.int64).copy()
    while True:
        active = lo < hi
        if not active.any():
            return lo
        mid = (lo + hi) >> 1
        m = np.where(active, mid, 0)  # keep inactive lanes in-bounds
        if side == "right":
            go = vals[m] <= queries
        else:
            go = vals[m] < queries
        lo = np.where(active & go, mid + 1, lo)
        hi = np.where(active & ~go, mid, hi)


def semi_join(ds: rd.Dataset, col: str, values: Sequence, negate: bool = False):
    """Broadcast semi/anti join vs a value list (S2/S3 ``$in`` readers,
    M2 hot-wallet exclusion — ``databases/blockchain_etl.py:44-66``,
    ``jobs/exchange_deposit_wallets_job.py:107-109``)."""
    vs = pa.array(list(values))

    def f(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[col], value_set=vs)
        if negate:
            mask = pc.invert(mask)
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def grouped_distinct(ds: rd.Dataset, col: str) -> rd.Dataset:
    """Distinct values of one column via local pre-distinct + groupby count
    (S8 grouped-distinct senders — ``databases/postgresql.py:27-37``)."""
    from ray.data.aggregate import Count

    pre = ds.select_columns([col]).map_batches(
        lambda t: pa.table({col: pc.unique(t[col].combine_chunks())}),
        batch_format="pyarrow",
    )
    agg = pre.groupby(col).aggregate(Count(alias_name="__n"))
    return agg.select_columns([col])


def set_union_groupby(
    ds: rd.Dataset,
    key: str,
    val: str,
    *,
    out_col: str = "tags",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Per key: sorted-distinct values joined with "," + distinct count —
    the reference's accumulate-then-``$addToSet`` merge semantics (A1/K1,
    ``jobs/exchange_deposit_wallets_job.py:106-119`` +
    ``databases/mongodb.py:110-118``).  Two-phase: per-batch partial sets
    shrink the shuffle; the per-key merge is idempotent (re-runs converge),
    which is the engine's late-data strategy (§2.10).

    Partitioned-vectorized: keys are hash-routed to ``num_partitions``
    groups and EVERY key of a partition is merged in one call — sort +
    segment offsets feed one Arrow ``ListArray`` whose cells
    ``binary_join`` into the joined strings (zero per-key Python)."""
    num_partitions = _resolve_partitions(ds, num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key, val]].drop_duplicates()
        out = out.copy()
        out[_PART] = _hash_part(out[key].to_numpy(), num_partitions)
        return out

    def merge_part(g: pd.DataFrame) -> pa.Table:
        # sort by NATIVE value dtype (pinned: the merge sorts values before
        # stringifying — ints sort numerically, not lexically)
        g = g[[key, val]].drop_duplicates().sort_values(
            [key, val], kind="mergesort"
        )
        keys_arr = g[key].to_numpy()
        starts = np.flatnonzero(
            np.r_[True, keys_arr[1:] != keys_arr[:-1]]
        ) if len(g) else np.empty(0, np.int64)
        bounds = np.r_[starts, len(g)]
        vals_str = g[val].astype(str).to_numpy()
        la = pa.ListArray.from_arrays(
            pa.array(bounds.astype(np.int32)),
            pa.array(vals_str, type=pa.string()),
        )
        return pa.table(
            {
                key: pa.array(keys_arr[starts]),
                out_col: pc.binary_join(la, ","),
                "n_distinct": pa.array(np.diff(bounds), type=pa.int64()),
            }
        )

    return (
        ds.select_columns([key, val])
        .map_batches(partial, batch_format="pandas")
        .groupby(_PART)
        .map_groups(merge_part, batch_format="pandas")
    )


def set_union_groupby_list(
    ds: rd.Dataset,
    key: str,
    val: str,
    *,
    out_col: str = "tags",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Arrow-native K1 set-union: per key a sorted-distinct ``list<string>``
    column (the SURVEY §1.2 vertex-document shape — ``tags: list<string>``,
    ``databases/mongodb.py:110-118`` ``$addToSet``), not a joined string.
    Same partitioned-vectorized shape as ``set_union_groupby``; cells sort
    as STRINGS (pinned — this variant stringifies before sorting) and the
    output is a real Arrow ListArray built straight from segment offsets."""
    num_partitions = _resolve_partitions(ds, num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key, val]].drop_duplicates().copy()
        out[_PART] = _hash_part(out[key].to_numpy(), num_partitions)
        return out

    def merge_part(g: pd.DataFrame) -> pa.Table:
        g = g[[key, val]].copy()
        g[val] = g[val].astype(str)
        g = g.drop_duplicates().sort_values([key, val], kind="mergesort")
        keys_arr = g[key].to_numpy()
        starts = np.flatnonzero(
            np.r_[True, keys_arr[1:] != keys_arr[:-1]]
        ) if len(g) else np.empty(0, np.int64)
        bounds = np.r_[starts, len(g)]
        la = pa.ListArray.from_arrays(
            pa.array(bounds.astype(np.int32)),
            pa.array(g[val].to_numpy(), type=pa.string()),
        )
        return pa.table(
            {
                key: pa.array(keys_arr[starts], type=pa.int64()),
                out_col: la,
                "n_distinct": pa.array(np.diff(bounds), type=pa.int64()),
            }
        )

    return (
        ds.select_columns([key, val])
        .map_batches(partial, batch_format="pandas")
        .groupby(_PART)
        .map_groups(merge_part, batch_format="pandas")
    )


def explode_list(ds: rd.Dataset, list_col: str, *, out_col: str) -> rd.Dataset:
    """Flatten a ``list<T>`` column to one row per element (carries every
    other column) — vectorized Arrow ``list_parent_indices`` + ``flatten``,
    no Python per-row loop."""

    def f(t: pa.Table) -> pa.Table:
        lc = t[list_col].combine_chunks()
        if isinstance(lc, pa.ChunkedArray):  # empty-chunk edge
            lc = pa.concat_arrays(lc.chunks) if lc.num_chunks else pa.array(
                [], type=lc.type
            )
        parent = pc.list_parent_indices(lc)
        cols = {
            c: pc.take(t[c], parent)
            for c in t.column_names
            if c != list_col
        }
        cols[out_col] = pc.list_flatten(lc)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def map_union_groupby(
    ds: rd.Dataset,
    key: str,
    map_key_col: str,
    map_val_col: str,
    *,
    out_col: str = "protocols",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Nested map-merge (K1's ``protocols: map<string,int64>`` shape): per
    key, sum ``map_val_col`` per distinct ``map_key_col`` and emit one Arrow
    ``map<string,int64>`` cell with sorted keys.  Two-phase: per-batch
    (key, mkey) partial sums shrink the shuffle before the groupby."""
    num_partitions = _resolve_partitions(ds, num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby([key, map_key_col], sort=False)[map_val_col]
            .sum()
            .reset_index()
        )
        out[map_val_col] = out[map_val_col].astype(np.int64)
        out[_PART] = _hash_part(out[key].to_numpy(), num_partitions)
        return out

    def merge_part(g: pd.DataFrame) -> pa.Table:
        # ONE vectorized groupby-sum over the whole partition (C path),
        # then the map cells come straight from segment offsets — sort by
        # NATIVE map-key dtype before stringifying (pinned order)
        agg = (
            g.groupby([key, map_key_col], sort=False)[map_val_col]
            .sum()
            .reset_index()
            .sort_values([key, map_key_col], kind="mergesort")
        )
        keys_arr = agg[key].to_numpy()
        starts = np.flatnonzero(
            np.r_[True, keys_arr[1:] != keys_arr[:-1]]
        ) if len(agg) else np.empty(0, np.int64)
        bounds = np.r_[starts, len(agg)]
        ma = pa.MapArray.from_arrays(
            pa.array(bounds.astype(np.int32)),
            pa.array(agg[map_key_col].astype(str).to_numpy(), pa.string()),
            pa.array(
                agg[map_val_col].to_numpy().astype(np.int64), pa.int64()
            ),
        )
        return pa.table(
            {
                key: pa.array(keys_arr[starts], type=pa.int64()),
                out_col: ma,
            }
        )

    return (
        ds.select_columns([key, map_key_col, map_val_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(_PART)
        .map_groups(merge_part, batch_format="pandas")
    )


def window_bucket(
    ds: rd.Dataset,
    ts_col: str,
    width_s: int,
    keys: Sequence[str] = (),
    *,
    value_col: str | None = None,
) -> rd.Dataset:
    """Tumbling-window aggregation: ``window_start_s = ⌊epoch_s/width⌋·width``
    (M11 ``round_timestamp`` — ``utils/time_utils.py:10-14``), grouped by
    (window, *keys): count + optional value sum (rounded to 6 dp)."""
    from ray.data.aggregate import Count, Sum

    def bucket(t: pa.Table) -> pa.Table:
        us = pc.cast(t[ts_col], pa.int64())  # timestamp[us] → µs since epoch
        sec = pc.divide(us, 1_000_000)
        ws = pc.multiply(pc.floor(pc.divide(sec, width_s)), width_s)
        t = t.append_column("window_start_s", pc.cast(ws, pa.int64()))
        cols = ["window_start_s", *keys]
        if value_col:
            cols.append(value_col)
        return t.select(cols)

    g = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [Count(alias_name="n_events")]
    if value_col:
        aggs.append(Sum(value_col, alias_name="sum_value"))
    out = g.groupby(["window_start_s", *keys]).aggregate(*aggs)
    if value_col:
        out = out.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("sum_value"),
                "sum_value",
                pc.round(t["sum_value"], 6),
            ),
            batch_format="pyarrow",
        )
    return out


def dedup_first(
    ds: rd.Dataset, key_cols: Sequence[str], order_col: str
) -> rd.Dataset:
    """Keyed dedup keeping the row with min(order_col) — the composite-key
    ``_id`` upsert semantics (K4, ``databases/mongodb.py:277-288``)."""
    from .dedup import exact_dedup

    return exact_dedup(ds, key_cols, num_partitions=16, keep_order_col=order_col)


def broadcast_dim_join(
    ds: rd.Dataset, dim: pd.DataFrame, on: str, dim_cols: Sequence[str]
):
    """Broadcast small-dimension hash join (J1/J3 —
    ``jobs/dex_wallets/export_lp_contracts_job.py:137-146``): the dim table
    is ``ray.put`` once and probed per batch with a pandas merge."""
    ref = ray.put(dim[[on, *dim_cols]])

    class Probe:
        def __init__(self):
            self.dim = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.dim, on=on, how="inner")

    return ds.map_batches(Probe, batch_format="pandas", concurrency=(1, 4))


def sessionize(
    events: rd.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap to the
    previous event exceeds ``gap_s`` (streaming-shaped op per the guide:
    partition by key, sort by ts within the group).  Output one row per
    session: (user_id, session_id, n_events, start_s, end_s).

    Partitioned-vectorized: ONE hash-partition shuffle on the user key,
    then every user in the partition sessionizes in a single call — sort
    by (user, sec), session breaks from one diff, per-session stats from
    segment offsets.  No per-user Python."""
    num_partitions = _resolve_partitions(events, num_partitions)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        users = df[user_col].to_numpy()
        return pd.DataFrame(
            {
                user_col: users,
                "sec": df[ts_col].astype("int64").to_numpy() // 1_000_000,
                _PART: _hash_part(users, num_partitions),
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "sec"], kind="mergesort")
        users = g[user_col].to_numpy()
        sec = g["sec"].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    user_col: np.array([], users.dtype),
                    "session_id": np.array([], np.int64),
                    "n_events": np.array([], np.int64),
                    "start_s": np.array([], np.int64),
                    "end_s": np.array([], np.int64),
                }
            )
        new_user = np.r_[True, users[1:] != users[:-1]]
        new_sess = new_user | np.r_[False, np.diff(sec) > gap_s]
        starts = np.flatnonzero(new_sess)
        bounds = np.r_[starts, n]
        # per-user session numbering: session index minus the index of the
        # user's first session, +1
        sidx = np.arange(len(starts))
        user_first = np.maximum.accumulate(
            np.where(new_user[starts], sidx, -1)
        )
        return pd.DataFrame(
            {
                user_col: users[starts],
                "session_id": (sidx - user_first + 1).astype(np.int64),
                "n_events": np.diff(bounds).astype(np.int64),
                "start_s": sec[starts].astype(np.int64),
                "end_s": sec[bounds[1:] - 1].astype(np.int64),
            }
        )

    return (
        events.select_columns([user_col, ts_col])
        .map_batches(add_part, batch_format="pandas")
        .groupby(_PART)
        .map_groups(per_part, batch_format="pandas")
    )


def carry_forward_merge(
    events: rd.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    types: Sequence[str] = ("click", "view"),
    handler_func=None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """N-ary carry-forward series merge (A7 — ``utils/list_dict_utils.py:
    98-112`` ``combined_logs(*logs, handler_func)``): per key, take the
    union of all ``types`` series' timestamps, forward-fill each series,
    and reduce across series with ``handler_func``.

    ``handler_func`` receives a ``(len(types), n_rows)`` float64 matrix of
    the forward-filled series (missing values already 0.0) and returns the
    combined length-``n_rows`` vector; ``None`` means element-wise sum
    (the reference's default).  ``handler_func`` must be ELEMENT-WISE (the
    reference's is): the matrix now spans every user in a hash partition,
    not one user.  Pinned order within a key: (epoch second, event_id)
    with stable input order; output one row per contributing event:
    (user_id, sec, merged_e2) fixed-point ×100 int for hash-exact compare.

    Partitioned-vectorized: ONE hash-partition shuffle on the user key;
    within a partition the per-type forward-fill is a
    ``maximum.accumulate`` over last-valid indices, fenced at user-segment
    starts so no value leaks across users.  No per-user Python."""
    num_partitions = _resolve_partitions(events, num_partitions)
    if handler_func is not None:
        # runtime contract probe (ADVICE r4): the matrix spans EVERY user
        # in a hash partition, so a non-element-wise handler (per-user
        # normalization, cumulative ops, …) silently returns wrong values.
        # Element-wise ⇢ column i of the output depends only on column i
        # of the input; check by comparing the full-matrix result against
        # per-column applications on a fixed probe.
        probe = np.arange(len(types) * 4, dtype=np.float64).reshape(
            len(types), 4
        )
        full = np.asarray(handler_func(probe), dtype=np.float64).reshape(-1)
        cols = np.array(
            [
                np.asarray(handler_func(probe[:, [i]])).reshape(-1)[0]
                for i in range(probe.shape[1])
            ],
            dtype=np.float64,
        )
        if full.shape != (4,) or not np.allclose(full, cols, equal_nan=True):
            raise ValueError(
                "carry_forward_merge: handler_func must be element-wise "
                "(output column i may depend only on input column i); the "
                "series matrix spans every user in a hash partition, not "
                "one user — a per-user handler would be silently wrong. "
                "Pre-aggregate per user instead, or use handler_func=None."
            )

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[type_col].isin(list(types))]
        out = df[[user_col, "event_id", ts_col, type_col, value_col]].copy()
        out[_PART] = _hash_part(df[user_col].to_numpy(), num_partitions)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {user_col: [], "sec": [], "merged_e2": []}
            ).astype(
                {user_col: np.int64, "sec": np.int64, "merged_e2": np.int64}
            )
        g = g.sort_values([user_col, ts_col, "event_id"], kind="mergesort")
        n = len(g)
        users = g[user_col].to_numpy()
        sec = g[ts_col].astype("int64").to_numpy() // 1_000_000
        seg_start = _seg_starts(users)
        tarr = g[type_col].to_numpy()
        vals = g[value_col].to_numpy().astype(np.float64)
        ar = np.arange(n)
        series = np.empty((len(types), n), dtype=np.float64)
        for j, t in enumerate(types):
            last = np.maximum.accumulate(np.where(tarr == t, ar, -1))
            ok = last >= seg_start  # fence: never fill across users
            series[j] = np.where(
                ok, vals[np.maximum(last, 0)], 0.0
            )
        total = (
            series.sum(axis=0) if handler_func is None else handler_func(series)
        )
        return pd.DataFrame(
            {
                user_col: users,
                "sec": sec,
                "merged_e2": np.round(np.asarray(total) * 100).astype(
                    np.int64
                ),
            }
        )

    return (
        events.select_columns(
            [user_col, "event_id", ts_col, type_col, value_col]
        )
        .map_batches(add_part, batch_format="pandas")
        .groupby(_PART)
        .map_groups(per_part, batch_format="pandas")
    )


def asof_last_before(
    events: rd.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    target_type: str = "purchase",
    lookup_type: str = "click",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Per-row as-of lookup (A9 — ``utils/utils.py:9-28`` latest change-log
    value ≤ t): for every ``target_type`` event, the event_id of the last
    ``lookup_type`` event of the same user STRICTLY BEFORE it in the pinned
    (ts, event_id) order.  Output: (event_id, asof_event_id).  "No prior
    lookup event" is encoded as -1 (not NULL) so the column is plain int64
    end-to-end — nullable ints canonicalize differently (pandas ``Int64``
    NA vs DuckDB NULL→float NaN) across fetch paths and break strict
    value-hash comparison.

    Partitioned-vectorized: ONE hash-partition shuffle on the user key;
    the carried index is a shifted ``maximum.accumulate`` fenced at
    user-segment starts.  No per-user Python."""
    num_partitions = _resolve_partitions(events, num_partitions)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[user_col, "event_id", ts_col, type_col]].copy()
        out[_PART] = _hash_part(df[user_col].to_numpy(), num_partitions)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"event_id": np.array([], np.int64),
                 "asof_event_id": np.array([], np.int64)}
            )
        g = g.sort_values([user_col, ts_col, "event_id"], kind="mergesort")
        n = len(g)
        users = g[user_col].to_numpy()
        ids = g["event_id"].to_numpy()
        tarr = g[type_col].to_numpy()
        seg_start = _seg_starts(users)
        last = np.maximum.accumulate(np.where(tarr == lookup_type, np.arange(n), -1))
        prev = np.r_[-1, last[:-1]]  # strictly-before shift
        ok = prev >= seg_start
        asof = np.where(ok, ids[np.maximum(prev, 0)], -1).astype(np.int64)
        sel = tarr == target_type
        return pd.DataFrame(
            {"event_id": ids[sel], "asof_event_id": asof[sel]}
        )

    return (
        events.select_columns([user_col, "event_id", ts_col, type_col])
        .map_batches(add_part, batch_format="pandas")
        .groupby(_PART)
        .map_groups(per_part, batch_format="pandas")
    )


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    ts_col: str = "ts",
    value_cols: Sequence[str],
    strict: bool = False,
    num_partitions: int | None = None,
    default: int = -1,
) -> rd.Dataset:
    """Generic two-Dataset as-of join (J+ family): for every left row, the
    ``value_cols`` of the right row with the greatest ``ts_col`` ≤ (or <
    when ``strict``) the left row's, within the same ``by`` key.

    Ray-Data-first shape: tag both sides, union, ONE hash-partition
    shuffle on ``by``, then EVERY key of a partition merges in one
    vectorized call — the right side sorts once by (key, ts, values),
    per-key slice bounds come from two ``searchsorted`` calls over the
    key codes, and the as-of probe is a segmented binary search
    (``_segmented_searchsorted``: log-depth whole-array bisection).  No
    per-key Python, no driver-side work, no broadcast.  Ties on right
    ``ts_col`` resolve to the row that sorts LAST by (ts, *value_cols) —
    pinned so the DuckDB oracle can reproduce it.  Unmatched left rows
    get ``default`` (plain int64, not NULL — hash-stable; see
    ``asof_last_before``).  Output: all left columns + ``asof_<value_col>``
    columns.
    """
    num_partitions = _resolve_partitions(left, num_partitions)
    value_cols = list(value_cols)
    left_cols = list(left.schema().names)
    rv_cols = [f"__r_{c}" for c in value_cols]

    # both sides emit ONE superset schema (left cols + right value cols +
    # kind) so the union is schema-aligned; absent cells get dtype-matched
    # fills — (value, numpy dtype) pairs — computed once from the real
    # schemas (int → default, float → float(default), timestamp → epoch,
    # other → ""), so a float right value column gets float64 fill arrays
    # (an int64 fill would make the two union branches carry mismatched
    # Arrow schemas and break block concat / silently change dtype)
    def _fill_spec(t) -> tuple[object, object]:
        import pyarrow as pa_

        if isinstance(t, pa_.DataType):
            if pa_.types.is_timestamp(t):
                return np.datetime64(0, "us"), "datetime64[us]"
            if pa_.types.is_integer(t):
                return int(default), np.int64
            if pa_.types.is_floating(t):
                return float(default), np.float64
            if pa_.types.is_boolean(t):
                return False, np.bool_
            return "", object
        t = np.dtype(t)
        if np.issubdtype(t, np.datetime64):
            return np.datetime64(0, "us"), "datetime64[us]"
        if np.issubdtype(t, np.floating):
            return float(default), np.float64
        if np.issubdtype(t, np.integer):
            return int(default), np.int64
        if np.issubdtype(t, np.bool_):
            return False, np.bool_
        return "", object

    def _schema_types(ds: rd.Dataset) -> dict:
        sch = ds.schema()
        return dict(zip(sch.names, sch.types))

    lfills = {c: _fill_spec(t) for c, t in _schema_types(left).items()}
    rtypes = _schema_types(right)
    rfills = {c: _fill_spec(rtypes[c]) for c in value_cols}

    def _full(n: int, spec):
        v, dt = spec
        return np.full(n, v, dtype=dt)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[left_cols].copy()
        for c, rc in zip(value_cols, rv_cols):
            out[rc] = _full(len(df), rfills[c])
        out["__kind"] = np.int8(0)
        out[_PART] = _hash_part(df[by].to_numpy(), num_partitions)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=df.index)
        for c in left_cols:
            if c == by or c == ts_col:
                out[c] = df[c].to_numpy()
            else:
                out[c] = _full(len(df), lfills[c])
        for c, rc in zip(value_cols, rv_cols):
            out[rc] = df[c].to_numpy()
        out["__kind"] = np.int8(1)
        out[_PART] = _hash_part(df[by].to_numpy(), num_partitions)
        return out

    tagged = left.map_batches(tag_left, batch_format="pandas").union(
        right.select_columns(
            sorted({by, ts_col, *value_cols})
        ).map_batches(tag_right, batch_format="pandas")
    )

    out_cols = [*left_cols, *(f"asof_{c}" for c in value_cols)]

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        is_r = g["__kind"].to_numpy() == 1
        lf = g[~is_r]
        if not len(lf):
            return pd.DataFrame({c: [] for c in out_cols})
        # joint key coding so both sides share segment ids
        codes_all = pd.factorize(g[by], sort=True)[0]
        lcode = codes_all[~is_r]
        rt = g[is_r]
        rcode = codes_all[is_r]
        out = {c: lf[c].to_numpy() for c in left_cols}
        if not len(rt):
            for c in value_cols:
                out[f"asof_{c}"] = _full(len(lf), rfills[c])
            return pd.DataFrame(out)
        # right side sorted ONCE by (key, ts, values) — the pinned
        # last-wins tie order within each key slice
        rt = rt.assign(__code=rcode).sort_values(
            ["__code", ts_col, *rv_cols], kind="mergesort"
        )
        rcode_s = rt["__code"].to_numpy()
        rts = rt[ts_col].to_numpy()
        seg_lo = np.searchsorted(rcode_s, lcode, side="left")
        seg_hi = np.searchsorted(rcode_s, lcode, side="right")
        lts = lf[ts_col].to_numpy()
        side = "left" if strict else "right"
        pos = _segmented_searchsorted(rts, seg_lo, seg_hi, lts, side) - 1
        matched = pos >= seg_lo
        for c, rc in zip(value_cols, rv_cols):
            vals = rt[rc].to_numpy()
            picked = np.where(
                matched, vals[np.maximum(pos, 0)], rfills[c][0]
            )
            out[f"asof_{c}"] = np.asarray(picked)
        return pd.DataFrame(out)

    return tagged.groupby(_PART).map_groups(per_part, batch_format="pandas")


def range_join_count(
    intervals: rd.Dataset,
    points: rd.Dataset,
    *,
    by: str,
    lo_col: str,
    hi_col: str,
    ts_col: str,
    out_col: str = "n_points",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Range (interval) join, count form: for every interval row, the
    number of points of the same ``by`` key with ``lo ≤ ts ≤ hi``.

    Partitioning assumption (documented per the custom-operator contract):
    both sides co-partition on ``by`` with ONE hash-partition shuffle;
    within a PARTITION the points sort once by (key, ts) and every
    interval's count is two segmented binary searches over its key's
    point slice — #(ts ≥ lo) − #(ts > hi), overlapping intervals fully
    supported (each point may count toward many intervals).  No per-key
    Python.  Output: all interval columns + ``out_col``.
    """
    num_partitions = _resolve_partitions(points, num_partitions)

    int_cols = list(intervals.schema().names)

    # dtype-matched fills for the point rows' padded interval columns (an
    # int64 zero for a float/string/timestamp interval column would make
    # the union branches carry mismatched Arrow schemas)
    def _pad_spec(t) -> tuple[object, object]:
        import pyarrow as pa_

        if isinstance(t, pa_.DataType):
            if pa_.types.is_timestamp(t):
                return np.datetime64(0, "us"), "datetime64[us]"
            if pa_.types.is_floating(t):
                return 0.0, np.float64
            if pa_.types.is_integer(t):
                return 0, np.int64
            if pa_.types.is_boolean(t):
                return False, np.bool_
            return "", object
        try:
            t = np.dtype(t)
        except TypeError:
            return "", object
        if np.issubdtype(t, np.datetime64):
            return np.datetime64(0, "us"), "datetime64[us]"
        if np.issubdtype(t, np.floating):
            return 0.0, np.float64
        if np.issubdtype(t, np.integer):
            return 0, np.int64
        if np.issubdtype(t, np.bool_):
            return False, np.bool_
        return "", object

    _isch = intervals.schema()
    _pads = {
        c: _pad_spec(t) for c, t in zip(_isch.names, _isch.types)
    }

    def tag_int(df: pd.DataFrame) -> pd.DataFrame:
        out = df[int_cols].copy()
        out["__pt"] = np.full(len(df), -1, dtype=np.int64)
        out["__kind"] = np.int8(0)
        out[_PART] = _hash_part(df[by].to_numpy(), num_partitions)
        return out

    def tag_pt(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=df.index)
        for c in int_cols:
            if c == by:
                out[c] = df[c].to_numpy()
            else:
                v, dt = _pads[c]
                out[c] = np.full(len(df), v, dtype=dt)
        out["__pt"] = df[ts_col].to_numpy().astype(np.int64)
        out["__kind"] = np.int8(1)
        out[_PART] = _hash_part(df[by].to_numpy(), num_partitions)
        return out

    tagged = intervals.map_batches(tag_int, batch_format="pandas").union(
        points.select_columns([by, ts_col]).map_batches(
            tag_pt, batch_format="pandas"
        )
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        is_pt = g["__kind"].to_numpy() == 1
        iv = g[~is_pt]
        if not len(iv):
            return pd.DataFrame(
                {**{c: [] for c in int_cols}, out_col: []}
            )
        codes_all = pd.factorize(g[by], sort=True)[0]
        icode = codes_all[~is_pt]
        pcode = codes_all[is_pt]
        pts = g["__pt"].to_numpy()[is_pt]
        # points sorted once by (key, ts); per-interval slice bounds from
        # the key codes, then two segmented binary searches
        order = np.lexsort((pts, pcode))
        pcode_s, pts_s = pcode[order], pts[order]
        seg_lo = np.searchsorted(pcode_s, icode, side="left")
        seg_hi = np.searchsorted(pcode_s, icode, side="right")
        lo = iv[lo_col].to_numpy().astype(np.int64)
        hi = iv[hi_col].to_numpy().astype(np.int64)
        n = _segmented_searchsorted(
            pts_s, seg_lo, seg_hi, hi, "right"
        ) - _segmented_searchsorted(pts_s, seg_lo, seg_hi, lo, "left")
        out = {c: iv[c].to_numpy() for c in int_cols}
        out[out_col] = n.astype(np.int64)
        return pd.DataFrame(out)

    return tagged.groupby(_PART).map_groups(per_part, batch_format="pandas")


def keep_first_per_bucket(
    events: rd.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: int = 86400,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Change-log compaction (A10 — ``utils/list_dict_utils.py:75-95``
    ``prune_change_logs``: keep the first entry per day bucket).  Output one
    row per (user, day bucket): (user_id, bucket_s, first_event_id).

    Partitioned-vectorized: hash-partition on the user key, then ONE
    sort + ``drop_duplicates`` picks every (user, bucket)'s winner — no
    per-bucket Python."""
    num_partitions = _resolve_partitions(events, num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        sec = df[ts_col].astype("int64") // 1_000_000
        df["bucket_start_s"] = (sec // bucket_s * bucket_s).astype(np.int64)
        df = df.sort_values([ts_col, "event_id"], kind="stable")
        df = df.drop_duplicates(subset=[user_col, "bucket_start_s"])[
            [user_col, "bucket_start_s", "event_id", ts_col]
        ]
        df[_PART] = _hash_part(df[user_col].to_numpy(), num_partitions)
        return df

    def pick_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"], kind="mergesort")
        g = g.drop_duplicates(subset=[user_col, "bucket_start_s"], keep="first")
        return pd.DataFrame(
            {
                user_col: g[user_col].to_numpy(),
                "bucket_start_s": g["bucket_start_s"].to_numpy(),
                "first_event_id": g["event_id"].to_numpy(),
            }
        )

    return (
        events.select_columns([user_col, "event_id", ts_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(_PART)
        .map_groups(pick_part, batch_format="pandas")
    )


def type_profile(
    events: rd.Dataset,
    *,
    type_col: str = "event_type",
    user_col: str = "user_id",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Per event type: total events + distinct users (A4 per-project counts
    — ``databases/mongodb.py:212-234``).  Three-phase: per-batch
    (type, user, partial count) combine; then a USER-hash-partitioned
    distinct pass (users are disjoint across partitions, so per-partition
    ``nunique`` sums exactly — the per-type group never materializes all
    of a type's distinct users in one task); then a final groupby over
    ≤ num_partitions tiny pre-aggregated rows per type."""
    num_partitions = _resolve_partitions(events, num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby([type_col, user_col], sort=False)
            .size()
            .rename("partial")
            .reset_index()
        )
        out[_PART] = _hash_part(out[user_col].to_numpy(), num_partitions)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        gg = (
            g.groupby(type_col, sort=False)
            .agg(n_events=("partial", "sum"), n_users=(user_col, "nunique"))
            .reset_index()
        )
        return gg

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                type_col: [g[type_col].iloc[0]],
                "n_events": [np.int64(g["n_events"].sum())],
                "n_users": [np.int64(g["n_users"].sum())],
            }
        )

    return (
        events.select_columns([type_col, user_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(_PART)
        .map_groups(per_part, batch_format="pandas")
        .groupby(type_col)
        .map_groups(merge, batch_format="pandas")
    )


def last_per_key(
    ds: rd.Dataset,
    key: str,
    order_col,
    value_cols: Sequence[str],
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Latest row per key by (order_col desc, stable) — the reference's
    sort-desc + limit(1) pattern (S10/S11, ``databases/mongodb.py:51-57,
    167-174``); per-key as-of endpoint of the change-log semantics (A9).

    Partitioned-vectorized: local per-batch combiner, hash-partition
    shuffle, then ONE sort + ``drop_duplicates(keep="last")`` picks every
    key's winner — no per-key Python."""
    num_partitions = _resolve_partitions(ds, num_partitions)

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)

    def pick_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        return g.drop_duplicates(subset=[key], keep="last")[
            [key, *order_cols, *value_cols]
        ]

    # local partial: keep only each batch's last row per key (combiner)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, kind="stable")
        df = df.drop_duplicates(subset=[key], keep="last")[
            [key, *order_cols, *value_cols]
        ]
        df = df.copy()
        df[_PART] = _hash_part(df[key].to_numpy(), num_partitions)
        return df

    return (
        ds.select_columns([key, *order_cols, *value_cols])
        .map_batches(partial, batch_format="pandas")
        .groupby(_PART)
        .map_groups(pick_part, batch_format="pandas")
    )
