"""Generic synchronous label propagation (community detection, north-rule op).

Pinned deterministic rule (see ``state/csr.py:ModeLabelState``): each
superstep every vertex adopts the smallest label among those with maximal
count over its (undirected) neighbors; no-neighbor vertices keep their
label.  Synchronous LPA can oscillate on bipartite structures, so the loop
caps at ``max_iter`` and also stops when no label changes.
"""

from __future__ import annotations

import ray
import ray.data as rd

from ..state import checkpoint as ck
from .iterative import run_supersteps

_K = "lpa"


def label_propagation(
    graph_dir: str,
    *,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    pool_size: int | None = None,
) -> tuple[rd.Dataset, dict]:
    """Returns (Dataset(vid: int64, label: int64), run metrics)."""

    def init(shards, P):
        pass

    def restore(shards, ckpt_dir, it):
        ray.get(
            [
                s.call.remote(_K, "restore", ck.slice_path(ckpt_dir, it, p))
                for p, s in enumerate(shards)
            ]
        )

    def step(shards, P, iteration):
        refs = [
            s.call_live.options(num_returns=P + 1).remote(_K, "compute") for s in shards
        ]
        changed_refs = [
            s.call_live.remote(_K, "apply", [refs[p][q] for p in range(P)])
            for q, s in enumerate(shards)
        ]
        return {"changed": changed_refs}

    def converged(metrics):
        return metrics["changed"] == 0

    return run_supersteps(
        algorithm="label_propagation",
        kernel=_K,
        graph_dir=graph_dir,
        init=init,
        step=step,
        converged=converged,
        restore=restore,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
        pool_size=pool_size,
    )
