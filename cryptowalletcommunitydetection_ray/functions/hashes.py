"""Sketch/hash primitives: shingles, MinHash, SimHash, LSH band keys.

All deterministic (fixed seed, fixed permutation parameters).  MinHash uses
k universal-hash permutations ``h_i(x) = (a_i·x + b_i) mod p`` over the
64-bit shingle hashes, p = 2^61-1 (a Mersenne prime), which is the standard
mergeable construction (Broder '97).
"""

from __future__ import annotations

import numpy as np

from ..context import hash64

MERSENNE = (1 << 61) - 1


def _shingle_strings(text: str, k: int) -> list[str]:
    words = text.split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """64-bit hashes of the word k-shingles of ``text`` (unique, sorted)."""
    sh = _shingle_strings(text, k)
    if not sh:
        return np.empty(0, dtype=np.uint64)
    return np.unique(hash64(np.array(sh, dtype=object)).astype(np.uint64))


def shingle_hashes_batch(texts, k: int = 3) -> list[np.ndarray]:
    """Per-doc unique shingle hashes for a whole batch with ONE vectorized
    hash call (the per-call overhead of ``hash64`` dominates per-doc
    hashing for short documents)."""
    all_sh: list[str] = []
    offsets = [0]
    for t in texts:
        all_sh.extend(_shingle_strings(t, k))
        offsets.append(len(all_sh))
    if not all_sh:
        return [np.empty(0, dtype=np.uint64) for _ in texts]
    hs = hash64(np.array(all_sh, dtype=object)).astype(np.uint64)
    return [
        np.unique(hs[offsets[i] : offsets[i + 1]]) for i in range(len(texts))
    ]


def minhash_params(num_perm: int = 64, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle-hash set.

    Permutations are ``a_i·x + b_i`` over uint64 with natural mod-2^64
    wraparound — fully vectorized (num_perm × n multiply), deterministic,
    and the standard large-scale variant of the universal-hash family.
    """
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        prods = shingles[None, :] * a[:, None] + b[:, None]
    return prods.min(axis=1)


_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 increment


def _splitmix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def band_keys_matrix(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) int64 bucket keys from an (n_docs, k) signature
    matrix — vectorized polynomial fold + splitmix64 finalizer per band."""
    n, k = sigs.shape
    r = k // bands
    chunks = sigs[:, : bands * r].reshape(n, bands, r)
    h = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(r):
            h = h * _MIX + chunks[:, :, j]
        h = _splitmix(h + np.uint64(bands))
    return h.view(np.int64)


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """Single-signature convenience wrapper around ``band_keys_matrix``."""
    return band_keys_matrix(sig[None, :], bands)[0]


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique uint64 arrays."""
    if len(a) == 0 and len(b) == 0:
        return 0.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (weight = term frequency)."""
    words = text.split()
    if not words:
        return 0
    toks, counts = np.unique(np.array(words, dtype=object), return_counts=True)
    hs = hash64(toks).astype(np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    votes = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
