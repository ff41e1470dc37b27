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
    """Deterministic 64-bit hash of an array of strings (vectorized).

    Used for url → vid dictionary encoding and for exact-dedup content keys.
    Returned as **int64** (the same 64 bits reinterpreted): Arrow/pandas
    shuffle paths and DuckDB (BIGINT) all handle int64 natively, whereas
    uint64 > 2^63 breaks type promotion in mixed-block concatenation.
    """
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False).view(
        np.int64
    )


def partition_of(vids: np.ndarray, num_partitions: int) -> np.ndarray:
    """Owning shard of each vertex id: ``uint64(vid) % P`` (uniform bits).

    int64 vids are reinterpreted as uint64 (wrap-around) before the modulo,
    so negative ids partition uniformly.
    """
    u = np.asarray(vids).astype(np.uint64)
    return (u % np.uint64(num_partitions)).astype(np.int32)


def rename_cols(ds, mapping: dict):
    """Rename Dataset columns via a zero-copy Arrow batch op.

    (``Dataset.rename_columns`` breaks on pandas-format blocks in Ray
    2.49 — its Project operator calls ``block.rename_columns``, which only
    exists on Arrow tables.)
    """
    import pyarrow as pa

    def _r(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.schema.names])

    return ds.map_batches(_r, batch_format="pyarrow", zero_copy_batch=True)


def quiet_data_context() -> None:
    """Make Ray Data quiet and streaming-friendly for tests/benchmarks."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
