"""Pinned text-analysis functions: tokens, quality, language-ID, fingerprint.

These are the engine's scalar-UDF surface (the analog of the reference's
parser/scrubber utilities, ``utils/format_utils.py:9-96``), defined over the
``documents`` table.  Every definition is pinned so the DuckDB oracle SQL can
reproduce it exactly:

- whitespace tokens: maximal runs of non-whitespace (``\\S+``);
- BPE-ish tokens: the GPT-2 pre-tokenizer regex (contractions, letter runs,
  digit runs, punctuation runs, whitespace runs collapse);
- punctuation: the 32 ASCII punctuation bytes; digits 0-9; uppercase A-Z;
- ratios are count/len(text) (0.0 for empty text), quantized to 6 dp with
  an explicit HALF-UP rule (floor(x*1e6+0.5)/1e6) — counts/len can be an
  exact binary fraction (e.g. 21/128 = .1640625) where half-even (numpy)
  and half-away (DuckDB) round differently;
- fingerprint: polynomial rolling hash (base 1000003, mod 2^61-1) over the
  64-bit hashes of the whitespace tokens;
- language-ID: argmax of per-language stopword hit counts over lowercased
  whitespace tokens, ties and zero-hits → "und"/first-by-order.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..context import hash64

WS_TOKEN_RE = re.compile(r"\S+")
BPE_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)
PUNCT_CLASS = r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""
_PUNCT_RE = re.compile(PUNCT_CLASS)
_DIGIT_RE = re.compile(r"[0-9]")
_UPPER_RE = re.compile(r"[A-Z]")

FP_BASE = 1000003
FP_MOD = (1 << 61) - 1

# tiny pinned stopword lists (deterministic heuristic, not a model)
STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "nicht"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "pas", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "no", "que"},
    "zh": set(),  # no whitespace-token stopwords; falls through to "und"
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def ws_token_count(text: str) -> int:
    return len(WS_TOKEN_RE.findall(text))


def bpe_token_count(text: str) -> int:
    """Count GPT-2-style pre-tokens, excluding pure-whitespace matches."""
    return sum(1 for m in BPE_RE.finditer(text) if not m.group().isspace())


# Pinned byte-pair merge table (rank order) — a REAL merge-loop tokenizer
# over it, not a regex proxy.  The merge rule is pinned to "apply each
# merge in rank order, one left-to-right non-overlapping replace pass over
# the space-delimited symbol string" — exactly the semantics of chained
# ``replace()`` calls, so the DuckDB oracle reproduces it verbatim.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("e", "n"),
    ("a", "t"), ("e", "s"), ("o", "u"), ("i", "t"), ("i", "s"),
    ("o", "f"), ("a", "l"), ("e", "d"), ("s", "t"), ("t", "o"),
    ("in", "g"), ("a", "r"), ("the", "r"), ("l", "e"), ("c", "h"),
    ("r", "o"), ("u", "r"), ("a", "s"), ("e", "l"), ("l", "l"),
]


def load_merges_file(path: str) -> list[tuple[str, str]]:
    """Parse a GPT-2-style ``merges.txt`` (one ``left right`` pair per
    line, rank order; ``#``-prefixed header lines skipped) into the merge
    table ``bpe_real_token_count`` consumes — the optional-deps hook for
    running the real merge-loop tokenizer against a production vocab
    instead of the pinned ``BPE_MERGES`` table the oracles check."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            # rstrip CRLF too: a merges.txt saved with Windows line
            # endings would otherwise leave \r on every right-hand
            # symbol, silently matching no merge and inflating counts
            line = line.rstrip("\r\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(
                    f"{path}: malformed merges line {line!r} "
                    "(expected 'left right')"
                )
            merges.append((parts[0], parts[1]))
    return merges


def bpe_real_token_count(
    text: str,
    cache: dict | None = None,
    merges: list[tuple[str, str]] | None = None,
) -> int:
    """Total symbol count after applying ``merges`` (default: the pinned
    ``BPE_MERGES``) to every non-space pre-token (GPT-2 pre-tokenizer
    regex; the pre-token's leading space marker is dropped before
    symbolizing so the space char never collides with the symbol
    delimiter).  ``cache`` memoizes per unique pre-token — per-ACTOR
    state at scale (natural text repeats words heavily); callers passing
    a non-default merge table must use a distinct cache."""
    if merges is None:
        merges = BPE_MERGES
    n = 0
    for m in BPE_RE.finditer(text):
        tok = m.group()
        if tok.isspace():
            continue
        tok = tok.lstrip(" ")
        cnt = cache.get(tok) if cache is not None else None
        if cnt is None:
            s = " " + " ".join(tok) + " "
            for a, b in merges:
                s = s.replace(f" {a} {b} ", f" {a}{b} ")
            cnt = s.count(" ") - 1
            if cache is not None:
                cache[tok] = cnt
        n += cnt
    return n


def quality_frame(texts: pd.Series) -> pd.DataFrame:
    """Vectorized quality stats for a batch of texts (pandas str kernels)."""
    s = texts.fillna("")
    n_chars = s.str.len().astype(np.int64)
    n_tokens = s.str.count(r"\S+").astype(np.int64)
    denom = n_chars.replace(0, 1).astype(np.float64)
    def r6(v):
        return np.floor(v.to_numpy() * 1e6 + 0.5) / 1e6

    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "punct_ratio": r6(s.str.count(PUNCT_CLASS) / denom),
            "digit_ratio": r6(s.str.count(r"[0-9]") / denom),
            "upper_ratio": r6(s.str.count(r"[A-Z]") / denom),
            "space_ratio": r6(s.str.count(r" ") / denom),
        }
    )


def fingerprint(text: str) -> int:
    """Deterministic document fingerprint: rolling hash of token hashes."""
    return fingerprint_with_hashes(text)[0]


def fingerprint_with_hashes(text: str) -> tuple[int, np.ndarray]:
    """(fingerprint, ordered token-hash vector).  The hash vector is the
    exportable intermediate: the rolling fold ``fp ← (fp·BASE + h) mod
    (2^61−1)`` over it is pure integer arithmetic a SQL oracle reproduces
    exactly (DuckDB ``list_reduce`` over HUGEINT), independently pinning
    the FOLD while hash64 itself is pinned by pytest."""
    toks = WS_TOKEN_RE.findall(text)
    if not toks:
        return 0, np.empty(0, dtype=np.int64)
    hs = hash64(np.array(toks, dtype=object)).astype(np.uint64)
    fp = 0
    for h in hs:
        fp = (fp * FP_BASE + int(h)) % FP_MOD
    return fp, hs.view(np.int64)


def _mulmod_base(fp: np.ndarray) -> np.ndarray:
    """(fp · FP_BASE) mod FP_MOD for fp < 2^61, vectorized WITHOUT 128-bit
    ints: split fp = hi·2^32 + lo, then reduce hi·BASE·2^32 via the
    Mersenne identity 2^61 ≡ 1 (mod 2^61−1).  Bounds: hi·BASE < 2^49 so
    its top 20 bits fold to an additive term < 2^20; every intermediate
    stays < 2^62 (fits uint64)."""
    M = np.uint64(FP_MOD)
    hi = fp >> np.uint64(32)
    lo = fp & np.uint64(0xFFFFFFFF)
    a = hi * np.uint64(FP_BASE)                       # < 2^49
    b = lo * np.uint64(FP_BASE)                       # < 2^52
    # a·2^32 = (a >> 29)·2^61 + (a & (2^29−1))·2^32  ≡  (a>>29) + low·2^32
    t = (a >> np.uint64(29)) + ((a & np.uint64((1 << 29) - 1)) << np.uint64(32)) + b
    t = (t >> np.uint64(61)) + (t & M)
    return np.where(t >= M, t - M, t)


def _mod_m(x: np.ndarray) -> np.ndarray:
    """x mod FP_MOD for x < 2^62 + 2^61 (one shift-fold + one subtract)."""
    M = np.uint64(FP_MOD)
    t = (x >> np.uint64(61)) + (x & M)
    t = (t >> np.uint64(61)) + (t & M)
    return np.where(t >= M, t - M, t)


def fingerprints_batch(texts) -> tuple[np.ndarray, list[np.ndarray]]:
    """Batch-vectorized ``fingerprint_with_hashes``: ONE hash64 call over
    the batch's concatenated token stream, then the rolling fold advances
    all documents one token position per iteration (numpy ops over the
    active-doc set) — the per-token Python loop becomes a per-POSITION
    vector loop, ~median-doc-length× fewer interpreter round-trips.
    Returns (uint64 fingerprints, per-doc int64 token-hash vectors).
    Value-identical to the per-doc path (pinned by test_text)."""
    toks_per_doc = [WS_TOKEN_RE.findall(t or "") for t in texts]
    n = len(texts)
    lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    flat = [t for doc in toks_per_doc for t in doc]
    hs_all = (
        hash64(np.array(flat, dtype=object)).astype(np.uint64)
        if flat
        else np.empty(0, np.uint64)
    )
    offsets = np.concatenate(([0], np.cumsum(lens)))
    fps = np.zeros(n, dtype=np.uint64)
    active = np.flatnonzero(lens > 0)
    pos = 0
    with np.errstate(over="ignore"):
        while len(active):
            h = hs_all[offsets[active] + pos]
            hm = _mod_m(h)
            fps[active] = _mod_m(_mulmod_base(fps[active]) + hm)
            pos += 1
            active = active[lens[active] > pos]
    vecs = [
        hs_all[offsets[i] : offsets[i + 1]].view(np.int64) for i in range(n)
    ]
    return fps, vecs


def langid(text: str) -> str:
    """Stopword-hit heuristic; deterministic tie-break by LANG_ORDER."""
    toks = [t.lower() for t in WS_TOKEN_RE.findall(text)]
    if not toks:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in LANG_ORDER:
        hits = sum(1 for t in toks if t in STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang
