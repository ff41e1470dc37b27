"""Connected components: hash-min label propagation to fixpoint.

Re-expresses the reference's ``nx.connected_components``
(``services/wallet_clustering.py:15-18``) without ever holding the graph on
the driver: every vertex starts labeled with its own vid; each superstep
every frontier vertex sends its label along its undirected edges and every
vertex keeps the minimum label seen; converged when no label changed.  The
final label of a component is the minimum member vid — the deterministic id
that replaces the reference's ``uuid4`` group ids
(``services/wallet_clustering.py:33,65``) for testability.
"""

from __future__ import annotations

import ray
import ray.data as rd

from ..state import checkpoint as ck
from ..state.csr import MinLabelShard
from .iterative import run_supersteps


def connected_components(
    graph_dir: str,
    *,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> tuple[rd.Dataset, dict]:
    """Returns (Dataset(vid: uint64, label: uint64), run metrics)."""

    def make_actor(p: int, P: int):
        return MinLabelShard.remote(graph_dir, p, P)

    def restore(actors, ckpt_dir, it):
        ray.get(
            [
                a.restore.remote(ck.slice_path(ckpt_dir, it, p))
                for p, a in enumerate(actors)
            ]
        )

    def step(actors, P, iteration):
        refs = [a.compute.options(num_returns=P + 1).remote() for a in actors]
        active = sum(ray.get([refs[p][P] for p in range(P)]))
        changed = ray.get(
            [
                a.apply.remote([refs[p][q] for p in range(P)])
                for q, a in enumerate(actors)
            ]
        )
        return {"frontier": int(active), "changed": int(sum(changed))}

    def converged(metrics):
        return metrics["changed"] == 0

    return run_supersteps(
        algorithm="connected_components",
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
