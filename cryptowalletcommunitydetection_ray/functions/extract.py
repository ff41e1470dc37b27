"""Pinned HTML extraction contract: html bytes → text, outlinks.

This is the engine's per-record extractor — the analog of the reference's
HTML-table row extraction (``services/crawlers/dextools_crawler.py:54-67``)
and valid-edge predicate (``databases/blockchain_etl.py:68-79``).  The
contract is PINNED and byte-exact:

``extract_text(html)``:
  1. drop ``<script>…</script>`` and ``<style>…</style>`` blocks (case
     insensitive, dot-matches-newline), replacing each with one space;
  2. drop every remaining ``<…>`` tag, replacing with one space;
  3. collapse runs of ASCII whitespace to a single space, strip ends;
  4. decode UTF-8 with ``errors="replace"`` (explicit policy — never lossy
     on the bytes side, U+FFFD for undecodable sequences).
No HTML-entity decoding is performed (pinned: entities pass through
verbatim).  The synthetic corpus generator writes the ``text`` column with
this exact function, so "byte-identical extracted text per url" is testable
end-to-end.

``extract_links(html, base_url)``:
  - matches ``<a … href="…">`` (double/single/unquoted attribute forms);
  - skips empty, fragment-only, ``javascript:`` and ``mailto:`` hrefs;
  - resolves relative hrefs against ``base_url`` (RFC 3986 via urljoin);
  - drops the fragment; keeps the query;
  - lowercases scheme and netloc; an empty path becomes ``/``;
  - keeps only http/https; preserves in-page order and duplicates
    (global ``(src, dst)`` dedup happens in the edge-table build).

Both functions operate on *bytes* so no decode can corrupt link bytes before
matching; compiled regexes live at module scope (compiled once per worker
process — the stateless-stage analog of per-actor setup).
"""

from __future__ import annotations

import re
from urllib.parse import urldefrag, urljoin, urlsplit, urlunsplit

import numpy as np

_SCRIPT_RE = re.compile(rb"<script\b.*?</script\s*>", re.I | re.S)
_STYLE_RE = re.compile(rb"<style\b.*?</style\s*>", re.I | re.S)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"[ \t\r\n\f\v]+")
_HREF_RE = re.compile(
    rb"<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+))", re.I | re.S
)


def extract_text(html: bytes) -> str:
    """Byte-exact pinned text extraction (see module docstring)."""
    h = _SCRIPT_RE.sub(b" ", html)
    h = _STYLE_RE.sub(b" ", h)
    h = _TAG_RE.sub(b" ", h)
    h = _WS_RE.sub(b" ", h).strip()
    return h.decode("utf-8", errors="replace")


def normalize_url(url: str) -> str:
    """Normalization applied to every vertex url (src and dst sides alike).

    Lowercase scheme+netloc, drop fragment, empty path → "/".  The analog of
    the reference's unconditional address lowercasing
    (``utils/utils.py:31-34``).
    """
    url, _ = urldefrag(url)
    p = urlsplit(url)
    return urlunsplit((p.scheme.lower(), p.netloc.lower(), p.path or "/", p.query, ""))


def host_of(url: str) -> str:
    """Community grouping key: the lowercased netloc (chain-id analog)."""
    return urlsplit(url).netloc.lower()


def hosts_of(urls) -> "pa.Array":
    """Vectorized ``host_of`` over an Arrow string array: one
    ``extract_regex`` kernel for the absolute-URL fast path (valid RFC-3986
    scheme + ``://``), falling back to ``urlsplit`` per row ONLY for the
    rare shapes the pattern can't see (scheme-relative ``//host/...``,
    relative refs, bare ids — all of which hash to "" or need urllib's
    exact semantics).  Byte-equivalence to ``host_of`` is pinned by
    tests/test_extract.py::test_hosts_of_equivalence."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ex = pc.extract_regex(urls, r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<h>[^/?#]*)")
    fast = pc.utf8_lower(pc.struct_field(ex, "h"))
    # ASCII tab/CR/LF anywhere in the url: urlsplit STRIPS them (bpo-43882)
    # while the regex would keep them inside the netloc — force such rows
    # (and null entries, which the fast path would hand to host_of(None))
    # onto the urlsplit route; null inputs map to ""
    ctrl = pc.fill_null(pc.match_substring_regex(urls, "[\t\r\n]"), False)
    miss = pc.or_(pc.is_null(fast), ctrl)
    if pc.any(miss).as_py():
        idx = np.flatnonzero(miss.to_numpy(zero_copy_only=False))
        slow = pa.array(
            [host_of(urls[int(i)].as_py() or "") for i in idx],
            type=pa.string(),
        )
        fast = pc.replace_with_mask(fast, miss, slow)
    return fast


def _normalize_absolute(href: str) -> str:
    """Fast path for absolute http(s) hrefs — byte-identical to the
    urljoin+urlsplit+urlunsplit route (equivalence pinned by
    tests/test_extract.py::test_fast_normalize_equivalence), but without
    urllib's per-call overhead (the extraction hot loop runs this once per
    link)."""
    i = href.find("://")
    scheme = href[:i].lower()
    rest = href[i + 3 :]
    j = len(rest)
    for ch in "/?#":
        k = rest.find(ch)
        if k != -1 and k < j:
            j = k
    netloc = rest[:j].lower()
    tail = rest[j:]
    h = tail.find("#")
    if h != -1:
        tail = tail[:h]
    q = tail.find("?")
    if q != -1:
        path, query = tail[:q], tail[q + 1 :]
    else:
        path, query = tail, ""
    if not path:
        path = "/"
    return f"{scheme}://{netloc}{path}?{query}" if query else f"{scheme}://{netloc}{path}"


def extract_links(html: bytes, base_url: str) -> list[str]:
    """Ordered outlink urls of one page (normalized; duplicates preserved)."""
    out: list[str] = []
    for m in _HREF_RE.finditer(html):
        raw = m.group(1)
        if raw is None:
            raw = m.group(2)
        if raw is None:
            raw = m.group(3)
        href = raw.decode("utf-8", errors="replace").strip()
        if "\t" in href or "\r" in href or "\n" in href:
            # urlsplit (≥3.10, WHATWG) strips ASCII tab/newline anywhere in
            # the url; mirror that here so the fast path below stays
            # byte-identical to the urllib route for such hrefs
            href = href.replace("\t", "").replace("\r", "").replace("\n", "")
        if not href or href.startswith("#"):
            continue
        low = href.lower()
        if low.startswith(("javascript:", "mailto:")):
            continue
        if low.startswith(("http://", "https://")):
            out.append(_normalize_absolute(href))
            continue
        u = urljoin(base_url, href)
        p = urlsplit(u)
        if p.scheme not in ("http", "https"):
            continue
        out.append(
            urlunsplit((p.scheme.lower(), p.netloc.lower(), p.path or "/", p.query, ""))
        )
    return out
