"""Broadcast Bloom-filter membership screen.

The "remove documents already seen in a previous crawl" primitive: the
reference key set (last crawl's content keys — possibly billions) is
folded into a fixed-size bit array ONCE, broadcast via ``ray.put``, and
every corpus task reads the same object-store copy zero-copy.  At 10
bits/key a 10^9-key filter is ~1.2 GB — broadcastable where the raw key
set (shuffle join) is not.  Guarantee: NO false negatives (every truly
seen key is flagged); false-positive rate ≈ (1 − e^{−kn/m})^k.

Hashing: one ``hash64`` pass over the keys, then k probe positions by
double hashing ``h_i = h1 + i·h2`` with ``h2 = splitmix64(h1)`` — fully
vectorized, no second string hash (Kirsch–Mitzenmacher: double hashing
preserves the Bloom FP bound).

Reference parity note: the reference engine keeps its seen-sets as Mongo
collections queried per batch (``databases/mongodb.py`` reader loops);
this stage is the broadcast re-expression that avoids a per-batch
round-trip entirely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd
from ray.data.aggregate import AggregateFn

from ..context import hash64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public splitmix64 constants)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _probe_positions(h1: np.ndarray, k_hashes: int, m_bits: int):
    """Yield the k probe bit-positions for each key (vectorized)."""
    h1 = h1.astype(np.uint64)
    h2 = _splitmix64(h1) | np.uint64(1)  # odd → full-period stepping
    m = np.uint64(m_bits)
    for i in range(k_hashes):
        yield ((h1 + np.uint64(i) * h2) % m).astype(np.uint64)


def _key_hashes(values, salt: str) -> np.ndarray:
    """hash64 of salt-prefixed keys.  String keys take the vectorized
    np.char path (no per-row Python formatting in the probe hot loop);
    NUMERIC keys stringify canonically (``context.canonical_key_str`` —
    review r5: an int64 key column null-promoted to float64 in SOME
    blocks would hash ``5`` as ``"5.0"`` there but ``"5"`` in null-free
    blocks, so a seen key could silently LEAK through the screen when
    build and probe blocks promote differently); other dtypes fall back
    to per-row str()."""
    from ..context import canonical_key_str

    arr = np.asarray(values)
    if arr.dtype.kind in ("U", "S") or (
        arr.dtype == object and len(arr) and isinstance(arr[0], str)
    ):
        salted = np.char.add(f"{salt}\x1f", arr.astype(str)).astype(object)
    elif arr.dtype.kind in "iuf":
        salted = np.char.add(
            f"{salt}\x1f", canonical_key_str(arr).astype(str)
        ).astype(object)
    else:
        salted = np.array(
            [f"{salt}\x1f{v}" for v in values], dtype=object
        )
    return hash64(salted).astype(np.uint64)


def build_bloom(
    keys: rd.Dataset,
    key_col: str,
    *,
    m_bits: int = 1 << 20,
    k_hashes: int = 7,
    salt: str = "bloom",
) -> "ray.ObjectRef":
    """Fold a key Dataset into a Bloom bit array; returns a ``ray.put``
    handle to ``{"bits": uint64[m_bits/64], "m_bits", "k_hashes",
    "salt"}``.

    The key side STREAMS through the driver in batches (no full
    materialization) — the driver holds only the m_bits/8-byte array.
    This is the small-side baseline; at the north-rule scale use
    ``build_bloom_distributed`` (same bits, no driver loop).
    """
    m_words = (m_bits + 63) // 64
    bits = np.zeros(m_words, dtype=np.uint64)
    for batch in keys.select_columns([key_col]).iter_batches(
        batch_format="pandas", batch_size=65536
    ):
        h1 = _key_hashes(batch[key_col].to_numpy(), salt)
        for pos in _probe_positions(h1, k_hashes, m_bits):
            np.bitwise_or.at(
                bits, pos >> np.uint64(6),
                np.uint64(1) << (pos & np.uint64(63)),
            )
    return ray.put(
        {"bits": bits, "m_bits": m_bits, "k_hashes": k_hashes, "salt": salt}
    )


def bloom_fold(
    key_col: str,
    *,
    m_bits: int = 1 << 20,
    k_hashes: int = 7,
    salt: str = "bloom",
    alias_name: str | None = None,
) -> AggregateFn:
    """Mergeable Bloom fold as a native ``AggregateFn`` (the pattern shared
    with ``sketches.hll_distinct``): per-block accumulation ORs the block's
    probe bits into a uint64 word array, merges are element-wise OR — the
    associative, commutative combine that lets ``Dataset.aggregate`` build
    the filter with NO driver-side loop and a log-depth merge tree.

    Cost model at the north-rule scale: each merge moves the m_bits/8-byte
    word array (~1.2 GB at 10 bits/key for 10^9 keys), so the total merge
    traffic is O(blocks · m_bits/8) down a tree of depth log(blocks) — the
    keys themselves never shuffle.  Size ``m_bits`` for the key count, not
    the row count.
    """
    m_words = (m_bits + 63) // 64

    def accumulate_block(bits: np.ndarray, block) -> np.ndarray:
        import pyarrow as pa

        if isinstance(block, pa.Table):
            vals = block[key_col].to_numpy(zero_copy_only=False)
        else:
            vals = np.asarray(block[key_col])
        if len(vals) == 0:
            return bits
        out = bits.copy()  # never mutate the shared init/partial in place
        h1 = _key_hashes(vals, salt)
        for pos in _probe_positions(h1, k_hashes, m_bits):
            np.bitwise_or.at(
                out, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return out

    return AggregateFn(
        init=lambda k: np.zeros(m_words, dtype=np.uint64),
        accumulate_block=accumulate_block,
        merge=np.bitwise_or,
        # raw bytes — a flat Arrow binary cell.  A Python int64 list here
        # would materialize m_bits/64 boxed ints (several GB at the
        # north-rule ~1.2 GB filter size) inside the aggregate result
        # block; bytes keep it one buffer end to end
        finalize=lambda bits: bits.tobytes(),
        name=alias_name or f"bloom({key_col})",
    )


def build_bloom_distributed(
    keys: rd.Dataset,
    key_col: str,
    *,
    m_bits: int = 1 << 20,
    k_hashes: int = 7,
    salt: str = "bloom",
) -> "ray.ObjectRef":
    """Distributed counterpart of ``build_bloom``: the fold runs as a
    ``Dataset.aggregate`` over a mergeable ``bloom_fold`` accumulator
    (per-block OR + tree merge) instead of streaming every key through
    the driver.  Bit-identical to ``build_bloom`` on the same input (OR
    is order-free) — pinned by ``tests/test_bloom.py``."""
    out = keys.select_columns([key_col]).aggregate(
        bloom_fold(
            key_col, m_bits=m_bits, k_hashes=k_hashes, salt=salt,
            alias_name="bits",
        )
    )
    bits = np.frombuffer(out["bits"], dtype=np.uint64).copy()
    return ray.put(
        {"bits": bits, "m_bits": m_bits, "k_hashes": k_hashes, "salt": salt}
    )


class _BloomProbe:
    """Actor-pool stage: fetch the broadcast filter ONCE per actor
    (zero-copy numpy view of the object-store buffer), probe per batch."""

    def __init__(self, ref, key_col: str, flag_col: str):
        f = ray.get(ref)
        self.bits: np.ndarray = f["bits"]
        self.m_bits: int = f["m_bits"]
        self.k_hashes: int = f["k_hashes"]
        self.salt: str = f["salt"]
        self.key_col = key_col
        self.flag_col = flag_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        h1 = _key_hashes(df[self.key_col].to_numpy(), self.salt)
        member = np.ones(len(df), dtype=bool)
        for pos in _probe_positions(h1, self.k_hashes, self.m_bits):
            word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            member &= (
                (word >> (pos & np.uint64(63))) & np.uint64(1)
            ).astype(bool)
        out = df.copy()
        out[self.flag_col] = member
        return out


def bloom_screen(
    ds: rd.Dataset,
    bloom_ref,
    key_col: str,
    *,
    flag_col: str = "maybe_seen",
    drop_seen: bool = False,
    concurrency=(1, 8),
) -> rd.Dataset:
    """Flag (or drop) corpus rows whose ``key_col`` is possibly in the
    broadcast filter.  ``drop_seen=True`` keeps only definitely-unseen
    rows — safe for dedup-against-reference (false positives drop a few
    extra rows, never leak a duplicate); ``False`` keeps the bool column
    for a downstream exact verify of the flagged minority."""
    out = ds.map_batches(
        _BloomProbe,
        fn_constructor_args=(bloom_ref, key_col, flag_col),
        batch_format="pandas",
        concurrency=concurrency,
    )
    if drop_seen:
        out = out.map_batches(
            lambda df: df[~df[flag_col]].drop(columns=[flag_col]),
            batch_format="pandas",
        )
    return out
