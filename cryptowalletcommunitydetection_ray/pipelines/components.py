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
from .iterative import resolve_message_mode, run_supersteps

_K = "cc"


def connected_components(
    graph_dir: str,
    *,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    pipeline_depth: int = 4,
    pool_size: int | None = None,
    fuse_volleys: bool = True,
    message_mode: str = "auto",
) -> tuple[rd.Dataset, dict]:
    """Returns (Dataset(vid: int64, label: int64), run metrics).

    ``fuse_volleys`` (default): one fused apply+compute task wave per
    superstep; ``message_mode``: packed (single-node latency floor) vs
    slots (multi-node byte floor) — see ``pagerank.pagerank``;
    bit-identical labels on every path (pinned by test_components /
    test_pagerank)."""

    def init(shards, P):
        pass  # fresh state initializes labels = own vid

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
        frontier_refs = [msgs[p][P] for p in range(P)]
        if fuse_volleys:
            nxt = [
                s.apply_then_compute.options(num_returns=P + 2).remote(
                    _K, [msgs[p][q] for p in range(P)]
                )
                for q, s in enumerate(shards)
            ]
            carry["msgs"] = nxt
            carry["next"] = iteration + 1
            return {
                "frontier": frontier_refs,
                "changed": [nxt[q][P + 1] for q in range(P)],
            }
        changed_refs = [
            s.call_live.remote(_K, "apply", [msgs[p][q] for p in range(P)])
            for q, s in enumerate(shards)
        ]
        return {
            "frontier": frontier_refs,
            "changed": changed_refs,
        }

    def converged(metrics):
        return metrics["changed"] == 0

    return run_supersteps(
        algorithm="connected_components",
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
        pipeline_depth=pipeline_depth,
        pool_size=pool_size,
    )
