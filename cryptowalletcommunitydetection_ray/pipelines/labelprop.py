"""Generic synchronous label propagation (community detection, north-rule op).

Pinned deterministic rule (see ``state/csr.py:ModeLabelShard``): each
superstep every vertex adopts the smallest label among those with maximal
count over its (undirected) neighbors; no-neighbor vertices keep their
label.  Synchronous LPA can oscillate on bipartite structures, so the loop
caps at ``max_iter`` and also stops when no label changes.
"""

from __future__ import annotations

import ray
import ray.data as rd

from ..state import checkpoint as ck
from ..state.csr import ModeLabelShard
from .iterative import run_supersteps


def label_propagation(
    graph_dir: str,
    *,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> tuple[rd.Dataset, dict]:
    """Returns (Dataset(vid: uint64, label: uint64), run metrics)."""

    def make_actor(p: int, P: int):
        return ModeLabelShard.remote(graph_dir, p, P)

    def restore(actors, ckpt_dir, it):
        ray.get(
            [
                a.restore.remote(ck.slice_path(ckpt_dir, it, p))
                for p, a in enumerate(actors)
            ]
        )

    def step(actors, P, iteration):
        refs = [a.compute.options(num_returns=P + 1).remote() for a in actors]
        changed = ray.get(
            [
                a.apply.remote([refs[p][q] for p in range(P)])
                for q, a in enumerate(actors)
            ]
        )
        return {"changed": int(sum(changed))}

    def converged(metrics):
        return metrics["changed"] == 0

    return run_supersteps(
        algorithm="label_propagation",
        graph_dir=graph_dir,
        make_actor=make_actor,
        step=step,
        converged=converged,
        restore=restore,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
