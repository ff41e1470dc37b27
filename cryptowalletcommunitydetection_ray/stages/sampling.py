"""Deterministic sampling / data-mixing primitives.

Large-scale training-data pipelines sample by CONSISTENT HASH, not RNG:
hash(id) < rate·2^64 keeps a reproducible, partition-invariant subset
(re-runs, retries and resumes all agree on membership; two pipelines
sampling the same rate pick the SAME rows, and rate r2 > r1 yields a
superset — nested samples for scaling-law curves).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..context import hash64

_FULL = float(2**64)


def _keep_mask(ids: np.ndarray, rate: float, salt: str) -> np.ndarray:
    if rate >= 1.0:
        return np.ones(len(ids), dtype=bool)
    if rate <= 0.0:
        return np.zeros(len(ids), dtype=bool)
    salted = np.array([f"{salt}\x1f{i}" for i in ids], dtype=object)
    h = hash64(salted).astype(np.uint64)
    return h < np.uint64(int(rate * _FULL))


def consistent_sample(
    ds: rd.Dataset, id_col: str, rate: float, *, salt: str = ""
) -> rd.Dataset:
    """Keep ~rate of rows, membership a pure function of (salt, id):
    reproducible across runs/partitionings; larger rates are supersets
    of smaller ones (same salt)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return df[_keep_mask(df[id_col].to_numpy(), rate, salt)]

    return ds.map_batches(f, batch_format="pandas")


def stratified_sample(
    ds: rd.Dataset,
    key_col: str,
    id_col: str,
    rates: dict,
    *,
    default_rate: float = 0.0,
    salt: str = "",
) -> rd.Dataset:
    """Per-stratum consistent sampling (data-mixing rates by source/lang):
    rows of stratum k kept at rates.get(k, default_rate).  The rate table
    is closed over (broadcast with the task, tiny); membership stays a
    pure function of (salt, id)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        keys = df[key_col].to_numpy()
        h = hash64(
            np.array([f"{salt}\x1f{i}" for i in ids], dtype=object)
        ).astype(np.uint64)
        rate_arr = np.array(
            [float(rates.get(k, default_rate)) for k in keys]
        )
        # full-rate strata short-circuit (mirrors _keep_mask's guard):
        # (1.0 * 2**64) does not fit uint64, so the float→uint cast is
        # undefined (yields 0 on x86-64) and would silently DROP the
        # whole stratum instead of keeping it
        thresh = np.minimum(
            np.clip(rate_arr, 0.0, 1.0) * _FULL, _FULL - 2**11
        ).astype(np.uint64)
        keep = (rate_arr >= 1.0) | (h < thresh)
        return df[keep]

    return ds.map_batches(f, batch_format="pandas")


def mix_datasets(
    parts: list,
    id_col: str,
    *,
    salt: str = "mix",
) -> rd.Dataset:
    """Weighted mixture: ``parts`` is [(Dataset, rate), ...]; each source
    is consistent-sampled at its rate (a distinct salt per source index)
    and the survivors unioned — the deterministic data-mixing step of a
    training corpus build.  Streaming end-to-end (no materialization)."""
    sampled = [
        consistent_sample(ds, id_col, rate, salt=f"{salt}:{i}")
        for i, (ds, rate) in enumerate(parts)
    ]
    out = sampled[0]
    return out.union(*sampled[1:]) if len(sampled) > 1 else out


def pack_sequences(
    ds: rd.Dataset,
    id_col: str,
    tokens_col: str,
    max_tokens: int,
    *,
    num_partitions: int = 64,
) -> rd.Dataset:
    """Greedy sequence packing: assign docs to training sequences so each
    sequence's token sum stays ≤ ``max_tokens`` (docs longer than the
    budget get a sequence of their own).

    Partitioning contract (documented): docs are hash-routed by id into
    ``num_partitions`` groups and packed INDEPENDENTLY per group in
    ascending id order — deterministic for a fixed ``num_partitions``
    regardless of input partitioning, and embarrassingly parallel (no
    global sequential scan, which cannot stream at 100 TB).  Sequence ids
    are globally unique: ``partition * 2^40 + local_seq``.

    Output: (id, tokens, seq_id, seq_tokens) — seq_tokens is the packed
    total of that sequence (repeated per member).
    """

    def route(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy().astype(np.int64)
        out = df[[id_col, tokens_col]].copy()
        out["__part"] = (
            ids.astype(np.uint64) % np.uint64(num_partitions)
        ).astype(np.int32)
        return out

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        part = int(g["__part"].iloc[0])
        toks = np.minimum(
            g[tokens_col].to_numpy().astype(np.int64), max_tokens
        )
        seq = np.empty(len(g), dtype=np.int64)
        sums: list[int] = []
        cur, cur_sum = 0, 0
        for i, t in enumerate(toks):
            if cur_sum + t > max_tokens and cur_sum > 0:
                sums.append(cur_sum)
                cur += 1
                cur_sum = 0
            seq[i] = cur
            cur_sum += int(t)
        sums.append(cur_sum)
        seq_tokens = np.array(sums, dtype=np.int64)[seq]
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                tokens_col: g[tokens_col].to_numpy(),
                "seq_id": (np.int64(part) << np.int64(40)) + seq,
                "seq_tokens": seq_tokens,
            }
        )

    return (
        ds.select_columns([id_col, tokens_col])
        .map_batches(route, batch_format="pandas")
        .groupby("__part")
        .map_groups(pack, batch_format="pandas")
    )


def cap_per_key(
    ds: rd.Dataset,
    key_col: str,
    k: int,
    order_cols: list[str],
    *,
    salt: str | None = None,
) -> rd.Dataset:
    """Keep at most ``k`` rows per key — the per-domain document cap of a
    webtext curation pipeline (no single host may dominate the corpus).

    Deterministic selection: the first ``k`` rows by ``order_cols``
    ascending (ties must be broken by the caller including a unique
    column last).  Pass ``salt`` to order by a consistent hash instead —
    ``hash64(salt ⊕ order_cols[0])`` is appended as the primary sort key,
    giving a uniform "random but reproducible" cap (same property as
    ``consistent_sample``: partition- and rerun-invariant).

    TWO-PHASE, one hash-partition shuffle: each batch pre-trims to its
    local first-k per key (a block contributes ≤ k rows per key it
    contains), then the partition-level pass trims EVERY key of the
    partition with one vectorized sort + grouped head — no per-key
    Python.  A hot key (a domain with 10^8 docs) arrives at its reduce
    partition with ≤ k·num_blocks rows, not 10^8 — the skew defense.
    Reference parity: the reference caps crawler output per pair via its
    50-page cap (``services/crawlers/base_crawler.py:19-27``); this is
    the corpus-side generalization.
    """
    sort_cols = list(order_cols)
    hash_col = "__cap_h"
    part_col = "__part"
    num_partitions = 32

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[hash_col] = hash64(
            np.array(
                [f"{salt}\x1f{v}" for v in df[order_cols[0]]], dtype=object
            )
        )
        return out

    if salt is not None:
        sort_cols = [hash_col, *order_cols]

    def _part_of(keys: np.ndarray) -> np.ndarray:
        # promotion-canonical routing (see relational._hash_part): an
        # int64 key column arriving as float64 in null-bearing batches
        # must route each key exactly as in its null-free batches
        from .relational import _hash_part

        return _hash_part(np.asarray(keys), num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if salt is not None:
            df = add_hash(df)
        out = (
            df.sort_values([key_col, *sort_cols], kind="mergesort")
            .groupby(key_col, sort=False)
            .head(k)
        )
        out = out.copy()
        out[part_col] = _part_of(out[key_col].to_numpy())
        return out

    def final_part(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values([key_col, *sort_cols], kind="mergesort")
            .groupby(key_col, sort=False)
            .head(k)
        )
        drop = [part_col] + ([hash_col] if salt is not None else [])
        return g.drop(columns=drop)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(part_col)
        .map_groups(final_part, batch_format="pandas")
    )
