"""Dtype-stability of partition routing under pandas null-promotion.

An Arrow int64 column whose BLOCK contains a null arrives in pandas as
float64 in exactly that block; blocks without a null arrive as int64.
Review r5 found the per-batch dtype branches in the routing hashes could
send the same key to different ``__part`` groups depending on which kind
of block it sat in — breaking per-partition-disjoint invariants (dedup
winners, summed nunique).  These tests pin the canonical, per-VALUE
routing that replaced them.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cryptowalletcommunitydetection_ray.context import numeric_route_bits
from cryptowalletcommunitydetection_ray.stages.dedup import (
    _col_str,
    _composite_key,
    _key_route_hash,
    exact_dedup,
)
from cryptowalletcommunitydetection_ray.stages.relational import (
    _hash_part,
    type_profile,
)


def _mixed_blocks_ds(rows_int: dict, rows_promoted: dict) -> rd.Dataset:
    """Two-block Dataset: block 1 null-free (pandas sees int64), block 2
    holding a null (pandas sees float64 for the int columns)."""
    t1 = pa.table(rows_int)
    t2 = pa.table(rows_promoted)
    return rd.from_arrow(t1).union(rd.from_arrow(t2))


def test_numeric_route_bits_int_vs_promoted_float():
    ints = np.array([0, 1, 5, -3, 2**40, -(2**40)], dtype=np.int64)
    floats = ints.astype(np.float64)  # what promotion does to these values
    assert np.array_equal(numeric_route_bits(ints), numeric_route_bits(floats))
    # uint64 path == raw bits
    u = np.array([1, 2**63 + 5], dtype=np.uint64)
    assert np.array_equal(numeric_route_bits(u), u)


def test_numeric_route_bits_fractional_and_nan():
    v = np.array([0.5, -0.0, 0.0, np.nan, 3.0])
    bits = numeric_route_bits(v)
    # -0.0 and +0.0 collide (equal keys), integral 3.0 == int 3
    assert bits[1] == bits[2]
    assert bits[4] == numeric_route_bits(np.array([3], dtype=np.int64))[0]
    # NaN gets the fixed sentinel — deterministic across calls
    assert bits[3] == numeric_route_bits(np.array([np.nan]))[0]
    # fractional values are deterministic and distinct from their floor
    assert bits[0] != numeric_route_bits(np.array([0], dtype=np.int64))[0]


def test_hash_part_stable_across_promotion():
    ints = np.arange(100, dtype=np.int64)
    floats = ints.astype(np.float64)
    assert np.array_equal(_hash_part(ints, 32), _hash_part(floats, 32))


def test_key_route_hash_stable_across_promotion():
    df_int = pd.DataFrame({"a": np.array([5, 7], dtype=np.int64),
                           "b": np.array([9, 11], dtype=np.int64)})
    df_flt = df_int.astype(np.float64)  # promoted form of the same keys
    assert np.array_equal(
        _key_route_hash(df_int, ["a", "b"]),
        _key_route_hash(df_flt, ["a", "b"]),
    )


def test_composite_key_canonical_across_promotion():
    df_int = pd.DataFrame({"a": np.array([5, 7], dtype=np.int64),
                           "b": ["x", "y"]})
    df_flt = df_int.copy()
    df_flt["a"] = df_flt["a"].astype(np.float64)
    assert np.array_equal(
        _composite_key(df_int, ["a", "b"]), _composite_key(df_flt, ["a", "b"])
    )
    # non-promoted dtypes keep their plain str form
    assert list(_col_str(pd.Series(["x", "y"]))) == ["x", "y"]
    assert list(_col_str(pd.Series([1.5, np.nan]))) == ["1.5", "nan"]


def test_exact_dedup_across_mixed_dtype_blocks(ray_session):
    # key 5 appears in a null-free block AND in a null-bearing block —
    # dedup must see them in the same partition and keep one winner
    ds = _mixed_blocks_ds(
        {"k": pa.array([5, 6], pa.int64()), "id": pa.array([1, 2], pa.int64())},
        {"k": pa.array([5, None], pa.int64()),
         "id": pa.array([3, 4], pa.int64())},
    )
    out = exact_dedup(ds, ["k"], num_partitions=8,
                      keep_order_col="id").to_pandas()
    kept = out[out["k"] == 5]
    assert len(kept) == 1 and int(kept["id"].iloc[0]) == 1
    assert len(out) == 3  # 5 (once), 6, null


def test_type_profile_distinct_users_across_mixed_dtype_blocks(ray_session):
    # user 5 in a promoted block and an int block of the SAME type must
    # count as ONE distinct user (the summed-nunique invariant)
    ds = _mixed_blocks_ds(
        {"event_type": ["a", "a"], "user_id": pa.array([5, 6], pa.int64())},
        {"event_type": ["a", "b"], "user_id": pa.array([5, None], pa.int64())},
    )
    out = type_profile(ds, num_partitions=8).to_pandas()
    row_a = out[out["event_type"] == "a"].iloc[0]
    assert int(row_a["n_users"]) == 2  # users {5, 6}, NOT 3
    assert int(row_a["n_events"]) == 3


def test_copartitioned_jaccard_missing_doc_raises(ray_session):
    from cryptowalletcommunitydetection_ray.stages.dedup import (
        copartitioned_jaccard,
    )

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([1, 2], dtype=np.int64),
         "text": ["a b c d", "a b c e"]}))
    # pair references b-id 99 with no doc row
    cands = rd.from_pandas(pd.DataFrame(
        {"a": np.array([1], dtype=np.int64),
         "b": np.array([99], dtype=np.int64)}))
    with pytest.raises(Exception) as ei:
        copartitioned_jaccard(cands, docs, num_partitions=4).to_pandas()
    assert "no document row" in str(ei.value)


def test_collect_communities_large_members_schema(ray_session):
    from cryptowalletcommunitydetection_ray.pipelines.communities import (
        _collect_communities,
    )

    tagged = rd.from_pandas(pd.DataFrame(
        {"vid": np.array([1, 2, 3], dtype=np.int64),
         "url": ["u1", "u2", "u3"],
         "is_user": [True, False, True],
         "label": np.array([1, 1, 1], dtype=np.int64)}))
    small = _collect_communities(tagged, "web", num_partitions=4)
    big = _collect_communities(
        tagged, "web", num_partitions=4, large_members=True
    )
    ts = dict(zip(small.schema().names, small.schema().types))
    tb = dict(zip(big.schema().names, big.schema().types))
    assert pa.types.is_list(ts["user_wallets"])
    assert pa.types.is_large_list(tb["user_wallets"])
    # same values either way
    assert small.to_pandas()["user_wallets"].map(list).tolist() == \
        big.to_pandas()["user_wallets"].map(list).tolist()


# ---------------------------------------------------------------------------
# property tests: the promotion-canonical invariants hold for ARBITRARY keys
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

# int64 values exactly representable in float64 (what promotion preserves)
_promotable = st.integers(min_value=-(2**53), max_value=2**53)


@settings(max_examples=200, deadline=None)
@given(st.lists(_promotable, min_size=1, max_size=50))
def test_prop_route_bits_promotion_invariant(keys):
    ints = np.array(keys, dtype=np.int64)
    floats = ints.astype(np.float64)
    assert np.array_equal(
        numeric_route_bits(ints), numeric_route_bits(floats)
    )


@settings(max_examples=200, deadline=None)
@given(st.lists(_promotable, min_size=1, max_size=50))
def test_prop_composite_key_promotion_invariant(keys):
    df_int = pd.DataFrame({"a": np.array(keys, dtype=np.int64)})
    df_flt = df_int.astype(np.float64)
    assert np.array_equal(
        _composite_key(df_int, ["a"]), _composite_key(df_flt, ["a"])
    )
    # canonical form matches the plain int stringification
    assert list(_composite_key(df_int, ["a"])) == [str(k) for k in keys]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=1,
        max_size=50,
    )
)
def test_prop_route_bits_float_equal_values_equal_bits(vals):
    # equal VALUES get equal bits regardless of array position/order,
    # and bits are deterministic across calls
    v = np.array(vals, dtype=np.float64)
    b1, b2 = numeric_route_bits(v), numeric_route_bits(v[::-1].copy())[::-1]
    assert np.array_equal(b1, b2)
    # value-equality implies bit-equality (NaN keys all share the sentinel)
    for i in range(len(v)):
        for j in range(i + 1, len(v)):
            if v[i] == v[j] or (np.isnan(v[i]) and np.isnan(v[j])):
                assert b1[i] == b1[j]


def test_bloom_screen_across_mixed_dtype_blocks(ray_session):
    # a seen key sitting next to a null (promoted block) must still be
    # dropped by the screen — "5" and "5.0" hashing differently would
    # silently LEAK the seen key through
    from cryptowalletcommunitydetection_ray.stages.bloom import (
        bloom_screen,
        build_bloom,
    )

    seen = rd.from_arrow(pa.table({"k": pa.array([5, 6], pa.int64())}))
    docs = _mixed_blocks_ds(
        {"k": pa.array([5, 7], pa.int64())},
        {"k": pa.array([6, None], pa.int64())},  # promoted block
    )
    bloom = build_bloom(seen, "k")
    out = bloom_screen(docs, bloom, "k", drop_seen=True).to_pandas()
    kept = set(out["k"].dropna().astype(np.int64).tolist())
    assert 5 not in kept and 6 not in kept  # both seen keys dropped
    assert 7 in kept
