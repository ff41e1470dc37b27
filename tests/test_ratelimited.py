"""S18 rate-limited source: throttle cadence, bounded retry, pagination
fixpoint — driven by a deterministic fake fetcher (no network in this
container; the contract under test is the orchestration)."""

import numpy as np
import pandas as pd


def _mk_fetch(fail_first_for=None, pages_per_seed=1, items_per_page=2):
    """Deterministic fake: seed 'bad' always raises; ``fail_first_for``
    raises on its first N attempts then succeeds; others paginate."""
    state = {"failures": 0, "calls": 0}

    def fetch(seed, cursor):
        state["calls"] += 1
        if seed == "bad":
            raise RuntimeError("always down")
        if fail_first_for and seed == fail_first_for[0]:
            if state["failures"] < fail_first_for[1]:
                state["failures"] += 1
                raise RuntimeError("transient")
        page = 0 if cursor is None else cursor
        items = [f"{seed}/p{page}/i{j}" for j in range(items_per_page)]
        nxt = page + 1 if page + 1 < pages_per_seed else None
        return {"items": items, "next": nxt}

    return fetch, state


def test_pagination_and_retry_inline():
    from cryptowalletcommunitydetection_ray.sources.ratelimited import (
        RateLimitedFetcher,
    )

    fetch, _ = _mk_fetch(fail_first_for=("s1", 2), pages_per_seed=3)
    f = RateLimitedFetcher(fetch, max_retry_times=3, sleep=lambda s: None)
    out = f(pd.DataFrame({"seed": ["s0", "s1", "bad"]}))

    s0 = out[out["seed"] == "s0"]
    assert s0["item"].tolist() == [
        "s0/p0/i0", "s0/p0/i1", "s0/p1/i0", "s0/p1/i1", "s0/p2/i0", "s0/p2/i1",
    ]
    assert s0["page_idx"].tolist() == [0, 0, 1, 1, 2, 2]

    # transient failures: first page took 3 attempts, then succeeded
    s1 = out[out["seed"] == "s1"]
    assert len(s1) == 6
    assert s1["attempts"].iloc[0] == 3 and s1["attempts"].iloc[-1] == 1

    # permanent failure: one null row after exhausting retries
    bad = out[out["seed"] == "bad"]
    assert len(bad) == 1
    assert bad["item"].isna().all()
    assert bad["attempts"].iloc[0] == 3


def test_throttle_sleeps_after_calls_limit():
    from cryptowalletcommunitydetection_ray.sources.ratelimited import (
        RateLimitedFetcher,
    )

    fetch, state = _mk_fetch(pages_per_seed=1)
    slept = []
    f = RateLimitedFetcher(
        fetch, calls_limit=4, sleep_time=7.0, sleep=slept.append
    )
    f(pd.DataFrame({"seed": [f"s{i}" for i in range(10)]}))
    # 10 calls with limit 4 → sleeps before calls 5 and 9
    assert slept == [7.0, 7.0]
    assert state["calls"] == 10


def test_fetch_all_on_dataset(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.sources.ratelimited import (
        fetch_all,
    )

    fetch, _ = _mk_fetch(pages_per_seed=2, items_per_page=1)
    seeds = rd.from_pandas(
        pd.DataFrame({"seed": [f"u{i}" for i in range(20)]})
    )
    out = fetch_all(seeds, fetch, concurrency=2, sleep_time=0.0).to_pandas()
    assert len(out) == 40  # 20 seeds × 2 pages × 1 item
    assert set(out["page_idx"]) == {0, 1}
    assert (out["attempts"] == 1).all()
