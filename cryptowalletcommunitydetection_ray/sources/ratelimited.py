"""Rate-limited stateful source stage (S18 — the reference's crawler
contract, ``services/crawlers/base_crawler.py:19-72``):

- call-count throttling: after ``calls_limit`` consecutive fetches the
  actor sleeps ``sleep_time`` seconds and resets the counter (the
  reference's ``_get_url_soup`` throttle, :55-62);
- bounded retry: each fetch is retried up to ``max_retry_times``; an
  exhausted seed yields a null-item row instead of failing the batch (the
  reference returns ``data = None``, :40-52);
- pagination fixpoint: a fetch may return a continuation cursor; the
  actor keeps fetching until the cursor is exhausted (or ``max_pages``),
  emitting one output row per item.

Ray-Data-first shape: seeds are a Dataset column; the fetcher is a
CALLABLE CLASS on an actor pool (``map_batches(RateLimitedFetcher,
concurrency=N)``) so throttle state, retry counters and any session
objects live per actor — per-actor rate ≈ global_rate / concurrency.
The network fetch itself is injected (``fetch_page``), because this
engine's contract is the orchestration, not HTTP: tests drive it with a
deterministic fake; a real deployment passes a requests/browser closure.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import numpy as np
import pandas as pd

import ray.data as rd

# fetch_page(seed, cursor) -> {"items": [...], "next": cursor | None}
FetchPage = Callable[[Any, Any], dict]


class RateLimitedFetcher:
    """Actor-pool source stage: seed rows in, one row per fetched item out.

    Output columns: (seed, item, page_idx, attempts) — ``item`` is None
    (null) when every retry failed for the seed's current page.
    """

    def __init__(
        self,
        fetch_page: FetchPage,
        *,
        seed_col: str = "seed",
        calls_limit: int = 5,
        sleep_time: float = 1.0,
        max_retry_times: int = 3,
        max_pages: int = 1000,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.fetch_page = fetch_page
        self.seed_col = seed_col
        self.calls_limit = calls_limit
        self.sleep_time = sleep_time
        self.max_retry_times = max_retry_times
        self.max_pages = max_pages
        self.sleep = sleep
        self._calls = 0  # consecutive calls since last throttle sleep

    def _throttled_fetch(self, seed, cursor):
        if self._calls >= self.calls_limit:
            self.sleep(self.sleep_time)
            self._calls = 0
        self._calls += 1
        return self.fetch_page(seed, cursor)

    def _fetch_with_retry(self, seed, cursor):
        for attempt in range(1, self.max_retry_times + 1):
            try:
                return self._throttled_fetch(seed, cursor), attempt
            except Exception:
                continue
        return None, self.max_retry_times

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        seeds_out, items, pages, attempts_out = [], [], [], []
        for seed in df[self.seed_col]:
            cursor = None
            for page_idx in range(self.max_pages):
                page, attempts = self._fetch_with_retry(seed, cursor)
                if page is None:
                    seeds_out.append(seed)
                    items.append(None)
                    pages.append(page_idx)
                    attempts_out.append(attempts)
                    break
                for item in page.get("items", []):
                    seeds_out.append(seed)
                    items.append(item)
                    pages.append(page_idx)
                    attempts_out.append(attempts)
                cursor = page.get("next")
                if cursor is None:
                    break
        return pd.DataFrame(
            {
                "seed": seeds_out,
                "item": pd.array(items, dtype=object),
                "page_idx": np.array(pages, dtype=np.int64),
                "attempts": np.array(attempts_out, dtype=np.int64),
            }
        )


def fetch_all(
    seeds: rd.Dataset,
    fetch_page: FetchPage,
    *,
    seed_col: str = "seed",
    concurrency: int = 4,
    batch_size: int = 64,
    **cfg,
) -> rd.Dataset:
    """Run the rate-limited fetcher over a seed Dataset (one actor pool;
    throttle/session state per actor, work streamed batch-wise)."""
    return seeds.map_batches(
        RateLimitedFetcher,
        fn_constructor_kwargs=dict(
            fetch_page=fetch_page, seed_col=seed_col, **cfg
        ),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
