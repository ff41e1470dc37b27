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


def minhash_signatures_batch(
    shingle_list: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_docs, num_perm) uint64 signatures for a whole batch — identical
    math to ``minhash_signature`` per doc, but one flat pass per
    permutation: the doc minima come from ``np.minimum.reduceat`` over the
    concatenated shingle stream (64 whole-array passes instead of n_docs
    tiny matmuls; duplicates need no dedup — min is idempotent).  Empty
    docs get the all-max sentinel row, matching the per-doc function."""
    n_docs, n_perm = len(shingle_list), len(a)
    out = np.full((n_docs, n_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n_docs == 0:
        return out
    lens = np.array([len(s) for s in shingle_list], dtype=np.int64)
    if not lens.sum():
        return out
    flat = np.concatenate([s for s in shingle_list if len(s)]).astype(
        np.uint64
    )
    nonempty = lens > 0
    starts = np.r_[0, np.cumsum(lens[nonempty])][:-1]
    with np.errstate(over="ignore"):
        for i in range(n_perm):
            prods = flat * a[i] + b[i]
            out[nonempty, i] = np.minimum.reduceat(prods, starts)
    return out


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


def simhash64_batch(texts) -> np.ndarray:
    """Batch-vectorized ``simhash64``: tokenizes every doc, hashes the
    UNIQUE tokens of the whole batch once, and accumulates all docs' bit
    votes with one ``np.add.at`` scatter — no per-doc Python beyond the
    ``str.split`` tokenization.  Value-identical to ``simhash64`` per doc
    (pinned by test_dedup); empty docs hash to 0."""
    n = len(texts)
    words_per = [t.split() for t in texts]
    lens = np.array([len(w) for w in words_per], dtype=np.int64)
    if lens.sum() == 0:
        return np.zeros(n, dtype=np.uint64)
    flat = np.array(
        [w for ws in words_per for w in ws], dtype=object
    )
    uniq, inv = np.unique(flat, return_inverse=True)
    hs = hash64(uniq).astype(np.uint64)
    # (n_uniq, 64) ±1 votes per unique token
    bits = (
        ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
        .astype(np.int32)
        * 2
        - 1
    )
    u = len(uniq)
    votes = np.zeros((n, 64), dtype=np.int64)
    if n * u <= 8_000_000:
        # dense path: per-(doc, token) counts via one bincount, then a
        # float64 matmul folds them into votes (exact: every dot product
        # is bounded by the doc's token count « 2^53).  ~1000× faster
        # than scatter-add/reduceat at typical batch vocabularies.
        docpos = np.repeat(np.arange(n, dtype=np.int64), lens)
        counts = np.bincount(docpos * u + inv, minlength=n * u).reshape(n, u)
        votes = (
            counts.astype(np.float64) @ bits.astype(np.float64)
        ).astype(np.int64)
    else:
        # huge-vocabulary fallback: bounded memory, per-doc slice-sum over
        # the pre-hashed occurrence matrix (hashing stays hoisted; the
        # Python loop does one vectorized sum per doc)
        gb = bits[inv]
        csum = np.concatenate(([0], np.cumsum(lens)))
        for i in np.flatnonzero(lens > 0):
            votes[i] = gb[csum[i] : csum[i + 1]].sum(axis=0)
    out = (
        (votes > 0).astype(np.uint64)
        << np.arange(64, dtype=np.uint64)[None, :]
    ).sum(axis=1, dtype=np.uint64)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
