"""Deduplication stages: exact (hash-partitioned) and near-dup (MinHash/LSH,
SimHash, n-gram Jaccard, embedding cosine).

Exact dedup re-expresses the reference's identity-set semantics —
``set[LPTransaction]`` keyed on tx_hash (``models/lp_transaction.py:9-13``),
``_id``-keyed upserts (``databases/mongodb.py:277-288``) — as a
hash-partition + per-partition vectorized ``drop_duplicates``:

    partition p = hash(key) % P  →  groupby("__part") → per-group pandas dedup

All duplicate keys land in the same partition, each partition is deduped with
one vectorized call (NOT one Python call per key group), and P bounds the
per-task memory (choose P so a partition fits a worker heap at scale).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from ..context import hash64

_PART = "__part"


def exact_dedup(
    ds: rd.Dataset,
    key_cols: Sequence[str],
    num_partitions: int = 64,
    keep_order_col: str | None = None,
) -> rd.Dataset:
    """Globally drop duplicate rows on ``key_cols`` (keeps one winner per key).

    If ``keep_order_col`` is given, the kept row is the one with the minimal
    value of that column (deterministic winner, e.g. min doc_id); otherwise
    an arbitrary-but-single row survives (sufficient for set semantics).
    """
    key_cols = list(key_cols)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        # local pre-dedup: shrinks the shuffle; correctness unaffected
        df = df.drop_duplicates(
            subset=key_cols if keep_order_col is None else None
        )
        if keep_order_col is not None:
            df = df.sort_values(keep_order_col, kind="stable").drop_duplicates(
                subset=key_cols, keep="first"
            )
        if len(key_cols) == 1 and df[key_cols[0]].dtype.kind in "ui":
            h = df[key_cols[0]].to_numpy().astype(np.uint64)
        else:
            h = hash64(
                df[key_cols].astype(str).agg("\x1f".join, axis=1).to_numpy()
            ) if len(key_cols) > 1 else hash64(df[key_cols[0]].to_numpy())
        df = df.copy()
        df[_PART] = (h % np.uint64(num_partitions)).astype(np.int32)
        return df

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        if keep_order_col is not None:
            g = g.sort_values(keep_order_col, kind="stable")
        return g.drop_duplicates(subset=key_cols, keep="first").drop(
            columns=[_PART]
        )

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby(_PART)
        .map_groups(dedup_part, batch_format="pandas")
    )
