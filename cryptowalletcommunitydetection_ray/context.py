"""Engine-wide defaults and deterministic hashing/partitioning helpers.

Vertex ids are 64-bit hashes of the *normalized* url (coordination-free
dictionary encoding — the Ray analog of the reference's lowercased
hex-address identity, ``utils/utils.py:31-34``).  At 1e12 urls a 64-bit
fingerprint has an expected handful of collisions; this is the standard
web-graph tradeoff (document it, don't coordinate).  A dictionary-encoding
actor would give collision-free ids at the cost of a global synchronization
point; hash ids keep edge building embarrassingly parallel.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

# Fixed key => pd.util.hash_array (SipHash-based) is deterministic across
# processes, runs and platforms.  This is the engine's identity function.
_HASH_KEY = "0123456789123456"


def default_parallelism() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)


def default_num_partitions() -> int:
    """Number of CSR shards / hash partitions for graph state."""
    return min(16, max(2, default_parallelism() // 2))


def hash64(values) -> np.ndarray:
    """Deterministic uint64 hash of an array of strings (vectorized).

    Used for url → vid dictionary encoding and for exact-dedup content keys.
    """
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def partition_of(vids: np.ndarray, num_partitions: int) -> np.ndarray:
    """Owning shard of each vertex id: ``vid % P`` (vids are uniform hashes)."""
    return (np.asarray(vids, dtype=np.uint64) % np.uint64(num_partitions)).astype(
        np.int32
    )


def quiet_data_context() -> None:
    """Make Ray Data quiet and streaming-friendly for tests/benchmarks."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
