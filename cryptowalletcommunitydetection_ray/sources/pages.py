"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

Schema (authoritative, from BASELINE.json ``input_hint`` / FIXTURES.md F1):
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``.

Generation is a pure function of ``(seed, row_index)`` — per-row
``np.random.SeedSequence([seed, i])`` — so the corpus is identical
regardless of batch boundaries, partitioning, or parallelism.  Link targets
follow a Zipf-ish power law (``target = floor(n * u**zipf)``), creating hub
vertices with very high in-degree for skew testing.  The ``text`` column is
written with the engine's own pinned extractor, making the byte-identical
extraction contract testable end-to-end.

Fixed edge-case rows (FIXTURES.md F1):
  - row 0: page with zero links
  - row 1: duplicate links
  - row 2: self-link
  - row 3: html containing a non-UTF8 byte sequence
  - row 4: relative hrefs (resolved against the page url)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.extract import extract_text

_WORDS = (
    "web crawl graph rank link host page anchor corpus shard block stream "
    "arrow batch actor shuffle vertex edge hub community label triangle "
    "partition checkpoint lineage superstep dangling teleport zipf skew"
).split()
_LANGS = ["en", "de", "fr", "es", "vi", "ja"]

_EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z, seconds


def page_url(i: int, n_hosts: int) -> str:
    return f"http://host{i % n_hosts}.example/p{i}"


def _gen_one(i: int, n_pages: int, n_hosts: int, seed: int, zipf: float):
    rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
    url = page_url(i, n_hosts)
    n_links = 0 if i == 0 else int(rng.integers(1, 16))
    u = rng.random(n_links)
    targets = np.minimum((n_pages * u**zipf).astype(np.int64), n_pages - 1)
    hrefs = [page_url(int(t), n_hosts) for t in targets]
    if i == 1 and hrefs:  # duplicate links
        hrefs = hrefs + hrefs[:2]
    if i == 2:  # self-link
        hrefs.append(url)
    if i == 4:  # relative hrefs
        hrefs = [f"/p{int(t)}" if (int(t) % n_hosts) == (i % n_hosts) else h
                 for t, h in zip(targets, hrefs)]
    words = rng.choice(_WORDS, size=int(rng.integers(8, 40)))
    filler = " ".join(words.tolist())
    anchors = "".join(
        f'<a href="{h}">{_WORDS[k % len(_WORDS)]}</a> ' for k, h in enumerate(hrefs)
    )
    html = (
        f"<html><head><title>Page {i}</title>"
        f"<style>body {{ margin: 0; }}</style>"
        f"<script>var page = {i};</script></head>"
        f"<body><h1>Page {i}</h1><p>{filler}</p>{anchors}</body></html>"
    ).encode("utf-8")
    if i == 3:
        html = html.replace(b"<h1>", b"<h1>\xff\xfe\x80 ")  # non-UTF8 bytes
    lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
    ts = (_EPOCH_2024 + i) * 1_000_000  # timestamp[us]
    return url, ts, html, extract_text(html), lang


def _gen_batch(batch, *, n_pages: int, n_hosts: int, seed: int, zipf: float):
    ids = np.asarray(batch["id"])
    rows = [_gen_one(int(i), n_pages, n_hosts, seed, zipf) for i in ids]
    urls, tss, htmls, texts, langs = zip(*rows)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(list(tss), pa.timestamp("us")),
            "html": pa.array(list(htmls), pa.binary()),
            "text": pa.array(list(texts), pa.string()),
            "lang": pa.array(list(langs), pa.string()),
        }
    )


def synth_pages(
    n_pages: int,
    *,
    n_hosts: int | None = None,
    seed: int = 42,
    zipf: float = 3.0,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Lazy Dataset of ``n_pages`` deterministic synthetic pages."""
    import functools

    n_hosts = n_hosts or max(2, n_pages // 20)
    fn = functools.partial(
        _gen_batch, n_pages=n_pages, n_hosts=n_hosts, seed=seed, zipf=zipf
    )
    ds = rd.range(n_pages, override_num_blocks=override_num_blocks)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=2048)


def write_pages(out_dir: str, n_pages: int, **kwargs) -> str:
    """Materialize a synthetic corpus to parquet (one file per block)."""
    synth_pages(n_pages, **kwargs).write_parquet(out_dir)
    return out_dir


def read_pages(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read a pages corpus, pruning columns at the read."""
    return rd.read_parquet(path, columns=columns)
