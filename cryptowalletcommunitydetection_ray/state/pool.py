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

_POOLS: dict[tuple[str, int], tuple[list, int, str]] = {}


def _session_token() -> str:
    """Identity of the current Ray CLUSTER.  Cached pools from a previous
    ``ray.init`` cycle (CLI ``main()`` calls shut Ray down when they
    finish) hold dead actor handles; job ids restart at the same value on
    every fresh cluster, so the GCS address — unique per cluster instance
    — is the invalidation token."""
    try:
        return str(ray.get_runtime_context().gcs_address)
    except Exception:
        return ""


def default_pool_size(sp: int) -> int:
    """Largest divisor of SP that is ≤ the session CPU count (pool size
    tracks the cluster; the artifact layout does not)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    p = 1
    for cand in range(1, sp + 1):
        if sp % cand == 0 and cand <= cpus:
            p = cand
    return max(2, p)


def get_pool(graph_dir: str, nparts: int | None = None) -> tuple[list, int]:
    sp = read_meta(graph_dir)["P"]
    P = nparts or default_pool_size(sp)
    if sp % P != 0:
        raise ValueError(f"pool size {P} must divide SP={sp}")
    key = (os.path.abspath(graph_dir), P)
    tok = _session_token()
    got = _POOLS.get(key)
    if got is not None and got[2] != tok:
        _POOLS.pop(key)  # actors belong to a previous (dead) cluster
        got = None
    if got is None:
        shards = [KernelShard.remote(graph_dir, p, P) for p in range(P)]
        got = (shards, P, tok)
        _POOLS[key] = got
    return got[0], got[1]


def _kill_entry(shards) -> None:
    for a in shards:
        try:
            ray.kill(a)
        except Exception:
            pass  # cluster already gone


def close_pool(graph_dir: str) -> None:
    key_dir = os.path.abspath(graph_dir)
    for key in [k for k in _POOLS if k[0] == key_dir]:
        _kill_entry(_POOLS.pop(key)[0])


def close_all_pools() -> None:
    for key in list(_POOLS):
        _kill_entry(_POOLS.pop(key)[0])
