"""Per-graph shard actor pools, shared across kernels.

``get_pool(graph_dir)`` returns (and caches) the P ``KernelShard`` actors
for a graph's artifacts, so a pipeline that runs several kernels (PageRank
→ CC → communities → triangles) pays actor spawn and partition load ONCE.

The cache key is the absolute graph dir; if artifacts are REBUILT in place
the cached pool would hold stale data — call ``close_pool(graph_dir)`` (or
use a fresh directory, which the builders do).
"""

from __future__ import annotations

import os

import ray

from ..pipelines.edges import read_meta
from .csr import KernelShard

_POOLS: dict[str, tuple[list, int]] = {}


def get_pool(graph_dir: str) -> tuple[list, int]:
    key = os.path.abspath(graph_dir)
    got = _POOLS.get(key)
    if got is None:
        P = read_meta(graph_dir)["P"]
        shards = [KernelShard.remote(graph_dir, p, P) for p in range(P)]
        got = (shards, P)
        _POOLS[key] = got
    return got


def close_pool(graph_dir: str) -> None:
    got = _POOLS.pop(os.path.abspath(graph_dir), None)
    if got:
        for a in got[0]:
            ray.kill(a)


def close_all_pools() -> None:
    for key in list(_POOLS):
        shards, _ = _POOLS.pop(key)
        for a in shards:
            ray.kill(a)
