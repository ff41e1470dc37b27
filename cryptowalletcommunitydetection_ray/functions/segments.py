"""Vectorized segment (per-key group) index arithmetic.

The backbone of the partitioned-vectorized pattern (see
``stages/relational.py``): rows of MANY keys arrive in one hash
partition, get sorted by key, and every key's work happens through whole-
array numpy ops over segment offsets — never a Python call per key.

``segment_pair_indices`` generates all within-segment unordered pairs
(i < j, both from the same segment) across EVERY segment at once — the
vectorized replacement for per-bucket ``np.triu_indices`` in the LSH /
SimHash candidate stages, where a partition holds thousands of small
buckets and per-bucket Python calls dominate.
"""

from __future__ import annotations

import numpy as np


def segment_bounds(sorted_keys: np.ndarray) -> np.ndarray:
    """Boundary offsets of equal-key runs in a key-sorted array:
    ``[0, end_of_seg_1, ..., n]`` (length = #segments + 1)."""
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(1, dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, sorted_keys[1:] != sorted_keys[:-1]])
    return np.r_[starts, n].astype(np.int64)


def segment_rank(bounds: np.ndarray) -> np.ndarray:
    """Per-row rank within its segment (0-based), for rows sorted by key:
    the vectorized ``groupby().cumcount()`` — used for per-key head(k)
    caps without a groupby call."""
    n = int(bounds[-1])
    lens = np.diff(bounds)
    return np.arange(n, dtype=np.int64) - np.repeat(bounds[:-1], lens)


def segment_pair_indices(
    bounds: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """All (i, j) global row-index pairs with i < j inside the same
    segment, across every segment, in one shot.

    For rows sorted by segment key with boundary ``bounds`` (from
    ``segment_bounds``): row r pairs with every later row of its segment,
    so r is the left element ``seg_end(r) − r − 1`` times; the right
    elements are the consecutive run ``r+1 .. seg_end(r)``.  Output pair
    order: by left row asc, then right row asc (deterministic).  Total
    output length Σ L·(L−1)/2 — cap segment sizes upstream (the skew
    guard) before calling."""
    n = int(bounds[-1])
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    lens = np.diff(bounds)
    seg_end = np.repeat(bounds[1:], lens)  # per-row segment end offset
    rows = np.arange(n, dtype=np.int64)
    reps = seg_end - rows - 1  # pairs where this row is the left element
    ii = np.repeat(rows, reps)
    block_start = np.r_[0, np.cumsum(reps)]
    jj = np.arange(len(ii), dtype=np.int64) - block_start[ii] + ii + 1
    return ii, jj
