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


_NULL_ROUTE_BITS = np.uint64(0x9E3779B97F4A7C15)


def numeric_route_bits(vals: np.ndarray) -> np.ndarray:
    """Canonical uint64 routing bits of a NUMERIC key array, stable under
    pandas null-promotion (review r5): an Arrow int64 column whose batch
    contains a null arrives in pandas as float64, so a per-batch
    dtype branch routes the same key to different partitions in promoted
    vs null-free batches.  The decision here is PER-VALUE, not per-dtype:

    - int/uint arrays: the raw two's-complement bits;
    - float arrays: integral values (the promotion case) yield the SAME
      bits as their int64 form; fractional values hash their normalized
      float64 bit pattern (−0.0 → +0.0, so 0-keys collide as they
      should); NaN/null gets a fixed sentinel.

    Equal keys therefore produce equal bits in every batch regardless of
    promotion.  (Integer keys with |v| ≥ 2⁵³ in a NULLABLE column lose
    float64 precision at the pandas layer itself — nothing downstream of
    the promotion can recover them; such keys must be non-null, as every
    internally generated vid/label column is.)
    """
    vals = np.asarray(vals)
    if vals.dtype.kind in "iu":
        return vals.astype(np.uint64)
    v = vals.astype(np.float64)
    nan = np.isnan(v)
    v = np.where(nan | (v == 0.0), 0.0, v)  # NaN parked; −0.0 → +0.0
    integral = (v == np.rint(v)) & (np.abs(v) < 2.0**63)
    ibits = np.where(integral, v, 0.0).astype(np.int64).astype(np.uint64)
    u = np.where(integral, ibits, v.view(np.uint64))
    u[nan] = _NULL_ROUTE_BITS
    return u


def canonical_key_str(vals: np.ndarray) -> np.ndarray:
    """Canonical string form of a NUMERIC key array, stable under pandas
    null-promotion (the string twin of ``numeric_route_bits``): integral
    floats — what promotion makes of int64 values — print as integers
    (``"5"``, never ``"5.0"``), NaN/null prints ``"nan"``, fractional
    floats keep their plain ``str`` form.  Used wherever keys are MATCHED
    by their string form across batches (Bloom build/probe, composite
    dedup keys); plain value-column formatting keeps ordinary ``str``.
    Returns an object array of Python strings."""
    vals = np.asarray(vals)
    if vals.dtype.kind != "f":
        return vals.astype(str).astype(object)
    v = vals.astype(np.float64)
    nan = np.isnan(v)
    safe = np.where(nan, 0.0, v)
    integral = (safe == np.rint(safe)) & (np.abs(safe) < 2.0**63)
    out = v.astype(str).astype(object)
    ints = np.where(integral, safe, 0.0).astype(np.int64).astype(str)
    out[integral] = ints[integral]
    out[nan] = "nan"
    return out


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


def enforce_schema(ds, schema):
    """Force every block to a fixed Arrow schema.

    Ray 2.49 groupby/aggregate and map_groups emit ZERO-COLUMN empty Arrow
    tables for empty hash partitions; such blocks crash downstream
    ``Dataset.join`` ("No match ... for key field").  This stage rewrites
    empty blocks as ``schema.empty_table()`` and column-orders/casts the
    rest.
    """
    import pyarrow as pa

    def _f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        return t.select(schema.names).cast(schema)

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def sanitize_for_join(ds, schema):
    """Rebuild a Dataset from its non-empty blocks, schema-enforced.

    Ray 2.49's groupby/aggregate and map_groups emit ZERO-COLUMN empty
    blocks for empty hash partitions, and ``map_batches`` never invokes the
    UDF on an empty block — so such blocks flow through untouched and crash
    ``Dataset.join`` ("No match ... for key field").  This helper executes
    the upstream plan (a join is an all-to-all barrier anyway), drops empty
    blocks, and re-wraps the rest.  Use it on any join input that came out
    of a groupby.
    """
    import ray
    import ray.data as rd

    refs = []
    for rb in ds.iter_internal_ref_bundles():
        for br, meta in zip(rb.block_refs, rb.metadata):
            if meta.num_rows:
                refs.append(br)
    if not refs:
        return rd.from_arrow(schema.empty_table())
    import pandas as pd

    first = ray.get(refs[0])
    if isinstance(first, pd.DataFrame):
        out = rd.from_pandas_refs(refs)
    else:
        out = rd.from_arrow_refs(refs)
    return enforce_schema(out, schema)


def quiet_data_context() -> None:
    """Make Ray Data quiet and streaming-friendly for tests/benchmarks."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
