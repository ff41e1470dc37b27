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


def pair_intersection_counts(
    set_arrays: list[np.ndarray],
    a_idx: np.ndarray,
    b_idx: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """|A ∩ B| and |A ∪ B| for MANY (a, b) pairs of sorted-unique arrays in
    one whole-array pass — the vectorized replacement for per-pair
    ``np.intersect1d`` in the Jaccard verify stages.

    ``set_arrays[i]`` must be sorted and duplicate-free (the
    ``shingle_hashes`` contract); ``a_idx``/``b_idx`` index into it.  The
    two sides of every pair are gathered into one flat stream tagged with
    the pair id, lexsorted by (pair, value), and an element is in the
    intersection iff it appears twice adjacently under the same pair —
    one sort over Σ(|A|+|B|) values instead of a Python loop with a sort
    per pair.  Returns int64 (inter, union) arrays of len(a_idx)."""
    npairs = len(a_idx)
    if npairs == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    lens = np.fromiter(
        (len(x) for x in set_arrays), np.int64, len(set_arrays)
    )
    offs = np.zeros(len(set_arrays) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = (
        np.concatenate(set_arrays)
        if offs[-1]
        else np.empty(0, dtype=np.uint64)
    )
    seg_doc = np.empty(2 * npairs, np.int64)
    seg_doc[0::2] = a_idx
    seg_doc[1::2] = b_idx
    seg_len = lens[seg_doc]
    total = int(seg_len.sum())
    # global gather indices: per segment, start .. start+len (segment arange)
    seg_cum = np.zeros(2 * npairs, np.int64)
    np.cumsum(seg_len[:-1], out=seg_cum[1:])
    gather = (
        np.arange(total, dtype=np.int64)
        - np.repeat(seg_cum, seg_len)
        + np.repeat(offs[seg_doc], seg_len)
    )
    vals = flat[gather]
    pid = np.repeat(np.repeat(np.arange(npairs, dtype=np.int64), 2), seg_len)
    order = np.lexsort((vals, pid))
    sv, sp = vals[order], pid[order]
    dup = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1])
    inter = np.bincount(sp[1:][dup], minlength=npairs).astype(np.int64)
    union = lens[a_idx] + lens[b_idx] - inter
    return inter, union
