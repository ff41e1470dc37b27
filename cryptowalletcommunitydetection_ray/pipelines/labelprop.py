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
from .iterative import resolve_message_mode, run_supersteps

_K = "lpa"


def label_propagation(
    graph_dir: str,
    *,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    pool_size: int | None = None,
    fuse_volleys: bool = True,
    message_mode: str = "auto",
) -> tuple[rd.Dataset, dict]:
    """Returns (Dataset(vid: int64, label: int64), run metrics).

    ``fuse_volleys`` (default): one fused apply+compute task wave per
    superstep; ``message_mode``: packed vs slots — see
    ``pagerank.pagerank``; bit-identical labels on every path (pinned by
    test_labelprop / test_pagerank)."""

    def init(shards, P):
        pass

    def restore(shards, ckpt_dir, it):
        ray.get(
            [
                s.call.remote(_K, "restore", ck.slice_path(ckpt_dir, it, p))
                for p, s in enumerate(shards)
            ]
        )

    carry = {"next": None, "msgs": None, "mode": None}

    def step(shards, P, iteration):
        if carry["mode"] is None:
            carry["mode"] = resolve_message_mode(message_mode)
        msgs = carry["msgs"]
        fresh = msgs is None or carry["next"] != iteration
        if fuse_volleys and carry["mode"] == "packed":
            if fresh:
                msgs = [s.call_live.remote(_K, "compute") for s in shards]
            nxt = [
                s.fused_packed.options(num_returns=2).remote(_K, msgs, q, False)
                for q, s in enumerate(shards)
            ]
            carry["msgs"] = [r[0] for r in nxt]
            carry["next"] = iteration + 1
            return {"changed": [r[1] for r in nxt]}
        if fresh or not fuse_volleys:
            msgs = [
                s.call_live.options(num_returns=P + 1).remote(_K, "compute")
                for s in shards
            ]
        if fuse_volleys:
            nxt = [
                s.apply_then_compute.options(num_returns=P + 2).remote(
                    _K, [msgs[p][q] for p in range(P)]
                )
                for q, s in enumerate(shards)
            ]
            carry["msgs"] = nxt
            carry["next"] = iteration + 1
            return {"changed": [nxt[q][P + 1] for q in range(P)]}
        changed_refs = [
            s.call_live.remote(_K, "apply", [msgs[p][q] for p in range(P)])
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
