"""Mergeable sketch aggregates — HyperLogLog approximate distinct count.

Expressed as a native ``ray.data.aggregate.AggregateFn`` so it composes
with ``Dataset.aggregate`` / ``groupby().aggregate`` exactly like Sum or
Count: per-block accumulation builds a register vector (vectorized numpy,
no per-row Python), merges are element-wise max — the associative,
commutative combine that makes the sketch shuffle-friendly (a hot key
costs O(blocks·m), never O(rows)).

Deterministic: registers derive from the engine's pinned ``hash64``, so
the estimate is bit-reproducible across runs and partitionings (register
assignment depends only on the value, and max() is order-free).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd
from ray.data.aggregate import AggregateFn

from ..context import hash64


def _registers(values: np.ndarray, p: int) -> np.ndarray:
    """Register vector (length 2^p) for a batch of values: register index
    = top p hash bits, rho = 1 + leading zeros of the remaining 64-p bits
    (capped).  One vectorized pass."""
    m = 1 << p
    h = hash64(values).astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | ((np.uint64(1) << np.uint64(p)) - np.uint64(1))
    # leading zeros of `rest` via bit_length: rho = 64 - bit_length + 1
    bl = np.zeros(len(rest), dtype=np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = r >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        r[mask] >>= np.uint64(shift)
    bl += (r > 0).astype(np.int64)
    rho = (64 - bl + 1).astype(np.int64)
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, idx, rho.astype(np.int8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting)
    correction."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else 0.697
    regs = regs.astype(np.float64)
    est = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(col: str, *, p: int = 12, alias_name: str | None = None):
    """AggregateFn: approximate COUNT(DISTINCT col) as an int64 estimate.

    Accumulator = int8 register vector; merge = element-wise max.  Use in
    ``ds.aggregate(hll_distinct("user_id"))`` or after a groupby."""
    m = 1 << p

    def accumulate_block(regs: np.ndarray, block) -> np.ndarray:
        import pyarrow as pa

        if isinstance(block, pa.Table):
            vals = block[col].to_numpy(zero_copy_only=False)
        else:
            vals = np.asarray(block[col])
        if len(vals) == 0:
            return regs
        return np.maximum(regs, _registers(vals, p))

    return AggregateFn(
        init=lambda k: np.zeros(m, dtype=np.int8),
        accumulate_block=accumulate_block,
        merge=np.maximum,
        # half-UP rounding — the repo-wide cross-engine fixed-point rule
        finalize=lambda regs: int(np.floor(hll_estimate(regs) + 0.5)),
        name=alias_name or f"approx_distinct({col})",
    )


def hll_registers(col: str, *, p: int = 12, alias_name: str | None = None):
    """AggregateFn variant that finalizes to the raw REGISTER VECTOR (a
    ``list<int64>`` of 2^p values) instead of the estimate — the
    deterministic, mergeable intermediate an external oracle can fold the
    estimator over independently (the export pattern shared with the
    SimHash signature table)."""
    m = 1 << p

    def accumulate_block(regs: np.ndarray, block) -> np.ndarray:
        import pyarrow as pa

        if isinstance(block, pa.Table):
            vals = block[col].to_numpy(zero_copy_only=False)
        else:
            vals = np.asarray(block[col])
        if len(vals) == 0:
            return regs
        return np.maximum(regs, _registers(vals, p))

    return AggregateFn(
        init=lambda k: np.zeros(m, dtype=np.int8),
        accumulate_block=accumulate_block,
        merge=np.maximum,
        finalize=lambda regs: regs.astype(np.int64).tolist(),
        name=alias_name or f"hll_registers({col})",
    )


def approx_distinct(ds: rd.Dataset, col: str, *, p: int = 12) -> int:
    """Global approximate distinct count of ``col`` (one streaming pass,
    no shuffle of the data — only 2^p-byte registers move)."""
    out = ds.aggregate(hll_distinct(col, p=p, alias_name="nd"))
    return int(out["nd"])


def approx_distinct_by(
    ds: rd.Dataset, key: str, col: str, *, p: int = 12,
    alias_name: str = "approx_nd",
    export_registers: str | None = None,
) -> rd.Dataset:
    """Per-key approximate distinct count — groupby merges register
    vectors, so a hot key costs O(blocks·2^p), never O(rows).

    ``export_registers`` writes the per-key (key, regs ``list<int64>``)
    table to parquet and derives the estimate FROM it, so an external
    oracle can recompute the pinned estimator (alpha·m²/Σ2^−reg with the
    linear-counting small-range branch, half-up rounded) over the exported
    registers — turning the sketch from rows-only into hash-checkable."""
    if export_registers is None:
        return ds.groupby(key).aggregate(
            hll_distinct(col, p=p, alias_name=alias_name)
        )
    regs = ds.groupby(key).aggregate(
        hll_registers(col, p=p, alias_name="regs")
    ).materialize()
    regs.write_parquet(export_registers)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        est = [
            int(np.floor(hll_estimate(np.asarray(r, dtype=np.int64)) + 0.5))
            for r in df["regs"]
        ]
        return pd.DataFrame(
            {key: df[key].to_numpy(), alias_name: np.array(est, np.int64)}
        )

    return regs.map_batches(finish, batch_format="pandas")


def histogram_quantiles(
    ds: rd.Dataset,
    col: str,
    qs,
    *,
    bins: int = 1024,
) -> pd.DataFrame:
    """Approximate quantiles via a fixed-bin histogram sketch — TWO
    streaming passes (min/max, then bin counts), no shuffle of the data
    (only the 8·bins-byte count vector merges).

    The estimator is pinned so a SQL oracle can reproduce it EXACTLY
    (both sides do the same IEEE-double ops):
        w     = (hi - lo) / bins
        bin(v)= min(bins-1, floor((v - lo) / w))
        for target t = q·n: find first bin with cumulative count ≥ t,
        estimate = lo + w · (bin + 1)   (right edge of that bin)
    Right-edge (not interpolated) keeps the formula branch-free and
    float-robust.  Returns DataFrame(q, est) with est as float64.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = float(mm["lo"]), float(mm["hi"])
    if hi <= lo:
        return pd.DataFrame({"q": list(qs), "est": [lo] * len(list(qs))})
    w = (hi - lo) / bins

    def bin_counts(regs: np.ndarray, block) -> np.ndarray:
        if isinstance(block, pa.Table):
            vals = block[col].to_numpy(zero_copy_only=False)
        else:
            vals = np.asarray(block[col])
        if len(vals) == 0:
            return regs
        b = np.floor((vals.astype(np.float64) - lo) / w).astype(np.int64)
        b = np.minimum(b, bins - 1)
        out = regs.copy()
        np.add.at(out, b, 1)
        return out

    agg = AggregateFn(
        init=lambda k: np.zeros(bins, dtype=np.int64),
        accumulate_block=bin_counts,
        merge=lambda a, b: a + b,
        finalize=lambda regs: regs,
        name="hist",
    )
    regs = np.asarray(ds.aggregate(agg)["hist"])
    cum = np.cumsum(regs)
    n = int(cum[-1])
    out_q, out_e = [], []
    for q in qs:
        t = q * n
        b = int(np.searchsorted(cum, t, side="left"))
        b = min(b, bins - 1)
        out_q.append(float(q))
        out_e.append(lo + w * (b + 1))
    return pd.DataFrame({"q": out_q, "est": out_e})
