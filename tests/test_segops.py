"""Unit tests for the numpy segment-op backbone of the partitioned-
vectorized relational family (no Ray needed — pure array math).

``_segmented_searchsorted`` is the log-depth whole-array bisection that
replaced the per-key ``np.searchsorted`` loop in ``asof_join`` /
``range_join_count``; these tests pin it against the obvious per-query
reference over randomized segment layouts (empty segments, single-row
segments, duplicate values, out-of-range queries).
"""

from __future__ import annotations

import numpy as np

from cryptowalletcommunitydetection_ray.stages.relational import (
    _hash_part,
    _seg_starts,
    _segmented_searchsorted,
)


def _reference(vals, seg_lo, seg_hi, queries, side):
    return np.array(
        [
            lo + np.searchsorted(vals[lo:hi], q, side=side)
            for lo, hi, q in zip(seg_lo, seg_hi, queries)
        ],
        dtype=np.int64,
    )


def test_segmented_searchsorted_randomized():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n_segs = rng.integers(1, 12)
        seg_lens = rng.integers(0, 9, n_segs)  # empty segments included
        bounds = np.r_[0, np.cumsum(seg_lens)]
        vals = np.concatenate(
            [np.sort(rng.integers(-5, 20, L)) for L in seg_lens]
        ) if bounds[-1] else np.empty(0, np.int64)
        n_q = int(rng.integers(1, 30))
        which = rng.integers(0, n_segs, n_q)
        seg_lo = bounds[which].astype(np.int64)
        seg_hi = bounds[which + 1].astype(np.int64)
        queries = rng.integers(-8, 24, n_q)
        for side in ("left", "right"):
            got = _segmented_searchsorted(vals, seg_lo, seg_hi, queries, side)
            want = _reference(vals, seg_lo, seg_hi, queries, side)
            np.testing.assert_array_equal(got, want, err_msg=f"{trial}/{side}")


def test_segmented_searchsorted_all_empty_segments():
    vals = np.empty(0, np.int64)
    lo = np.zeros(4, np.int64)
    hi = np.zeros(4, np.int64)
    q = np.array([1, 2, 3, 4])
    got = _segmented_searchsorted(vals, lo, hi, q, "right")
    np.testing.assert_array_equal(got, np.zeros(4, np.int64))


def test_seg_starts():
    keys = np.array([3, 3, 3, 7, 7, 9])
    np.testing.assert_array_equal(
        _seg_starts(keys), np.array([0, 0, 0, 3, 3, 5])
    )
    assert len(_seg_starts(np.empty(0, np.int64))) == 0


def test_segment_pair_indices_matches_triu():
    from cryptowalletcommunitydetection_ray.functions.segments import (
        segment_bounds,
        segment_pair_indices,
        segment_rank,
    )

    rng = np.random.default_rng(3)
    for _ in range(20):
        keys = np.sort(rng.integers(0, 8, rng.integers(0, 40)))
        bounds = segment_bounds(keys)
        ii, jj = segment_pair_indices(bounds)
        # reference: per-segment triu_indices
        ref_i, ref_j = [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            a, b = np.triu_indices(hi - lo, k=1)
            ref_i.extend((a + lo).tolist())
            ref_j.extend((b + lo).tolist())
        np.testing.assert_array_equal(ii, np.array(ref_i, np.int64))
        np.testing.assert_array_equal(jj, np.array(ref_j, np.int64))
        assert (keys[ii] == keys[jj]).all() if len(ii) else True
        # rank: vectorized cumcount
        rank = segment_rank(bounds)
        ref_rank = np.concatenate(
            [np.arange(hi - lo) for lo, hi in zip(bounds[:-1], bounds[1:])]
        ) if len(keys) else np.empty(0, np.int64)
        np.testing.assert_array_equal(rank, ref_rank)


def test_pair_intersection_counts_matches_intersect1d():
    from cryptowalletcommunitydetection_ray.functions.segments import (
        pair_intersection_counts,
    )

    rng = np.random.default_rng(11)
    for _ in range(50):
        nd = int(rng.integers(1, 10))
        arrays = [
            np.unique(
                rng.integers(0, 50, rng.integers(0, 30)).astype(np.uint64)
            )
            for _ in range(nd)
        ]
        npairs = int(rng.integers(0, 25))
        ai = rng.integers(0, nd, npairs)
        bi = rng.integers(0, nd, npairs)
        inter, union = pair_intersection_counts(arrays, ai, bi)
        for j in range(npairs):
            sa, sb = arrays[ai[j]], arrays[bi[j]]
            ni = len(np.intersect1d(sa, sb, assume_unique=True))
            assert inter[j] == ni
            assert union[j] == len(sa) + len(sb) - ni
    # empty-pairs and self-pair edge cases
    e_i, e_u = pair_intersection_counts(
        [np.array([1, 2], np.uint64)], np.empty(0, np.int64),
        np.empty(0, np.int64),
    )
    assert len(e_i) == 0 and len(e_u) == 0
    s_i, s_u = pair_intersection_counts(
        [np.array([1, 2, 9], np.uint64)], np.array([0]), np.array([0])
    )
    assert s_i[0] == 3 and s_u[0] == 3


def test_minhash_signatures_batch_matches_per_doc():
    from cryptowalletcommunitydetection_ray.functions.hashes import (
        minhash_params,
        minhash_signature,
        minhash_signatures_batch,
    )

    a, b = minhash_params(16)
    rng = np.random.default_rng(11)
    docs = [
        rng.integers(0, 2**63, rng.integers(0, 30)).astype(np.uint64)
        for _ in range(25)
    ]
    docs[3] = np.empty(0, np.uint64)  # empty doc → all-max sentinel row
    got = minhash_signatures_batch(docs, a, b)
    want = np.stack([minhash_signature(d, a, b) for d in docs])
    np.testing.assert_array_equal(got, want)
    assert minhash_signatures_batch([], a, b).shape == (0, 16)


def test_hash_part_in_range_and_deterministic():
    for vals in (
        np.arange(-4, 100),
        np.array(["a", "bb", "", "a"], dtype=object),
    ):
        p = _hash_part(vals, 7)
        assert p.dtype == np.int32
        assert ((p >= 0) & (p < 7)).all()
        np.testing.assert_array_equal(p, _hash_part(vals, 7))
    # string partitioning must be value-determined: equal values collide
    s = _hash_part(np.array(["a", "bb", "", "a"], dtype=object), 7)
    assert s[0] == s[3]
