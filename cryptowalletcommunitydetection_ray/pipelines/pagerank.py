"""PageRank: power iteration with dangling-mass redistribution.

Semantics pinned to the standard (networkx-compatible) formulation over the
deduplicated directed edge table:

    r'(v) = (1-α)/N + α·(Σ_{u→v} r(u)/outdeg(u) + D/N),   D = Σ_{dangling u} r(u)

Convergence: L1 error < N·tol (the networkx criterion).  The dangling mass
is a per-superstep global scalar reduction — the one synchronization barrier
each superstep, gathered from P floats (cheap; noted in SURVEY.md §7.4).

Per-superstep checkpoints hold the full rank vector per partition, so a
killed job resumes mid-convergence bit-identically (fixed-order message
folding; see ``state/csr.py``).
"""

from __future__ import annotations

import ray
import ray.data as rd

from ..state import checkpoint as ck
from .iterative import resolve_message_mode, run_supersteps
from .edges import read_meta

_K = "pagerank"


def pagerank(
    graph_dir: str,
    *,
    alpha: float = 0.85,
    tol: float = 1e-10,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    pipeline_depth: int = 4,
    pool_size: int | None = None,
    fuse_volleys: bool = True,
    message_mode: str = "auto",
) -> tuple[rd.Dataset, dict]:
    """Returns (Dataset(vid: int64, rank: float64), run metrics).

    With ``fuse_volleys`` (default) each superstep is ONE fused
    apply+compute task wave: the messages a superstep consumes were
    produced by the previous superstep's fused calls, so only the very
    first superstep (and the first after a resume/rewind) pays a separate
    compute wave.  ``message_mode`` picks the message transport —
    ``"packed"`` (one object per shard per superstep; single-node
    latency floor) vs ``"slots"`` (per-destination ``num_returns``
    routing; multi-node byte floor); ``"auto"`` dispatches on cluster
    topology (see ``iterative.resolve_message_mode``).  All paths are
    bit-identical (fixed-order folds; pinned by test_pagerank)."""
    meta = read_meta(graph_dir)
    n_total = meta["num_vertices"]

    def init(shards, P):
        ray.get([s.call.remote(_K, "init_rank", n_total) for s in shards])

    def restore(shards, ckpt_dir, it):
        ray.get(
            [
                s.call.remote(_K, "restore", ck.slice_path(ckpt_dir, it, p), n_total)
                for p, s in enumerate(shards)
            ]
        )

    # loop-carried message refs for the fused paths; ``next`` tracks the
    # iteration those messages belong to, so a resume/rewind (iteration
    # jumps) or job start recomputes from current shard state
    carry = {"next": None, "msgs": None, "mode": None}

    def step(shards, P, iteration):
        # submit-only: no driver synchronization — the dangling scalars go
        # to apply() as refs/values and are summed shard-side in fixed order
        if carry["mode"] is None:
            carry["mode"] = resolve_message_mode(message_mode)
        msgs = carry["msgs"]
        fresh = msgs is None or carry["next"] != iteration
        if fuse_volleys and carry["mode"] == "packed":
            if fresh:
                msgs = [s.call_live.remote(_K, "compute") for s in shards]
            nxt = [
                s.fused_packed.options(num_returns=2).remote(
                    _K, msgs, q, True, alpha
                )
                for q, s in enumerate(shards)
            ]
            carry["msgs"] = [r[0] for r in nxt]
            carry["next"] = iteration + 1
            return {"l1_delta": [r[1] for r in nxt]}
        if fresh or not fuse_volleys:
            msgs = [
                s.call_live.options(num_returns=P + 1).remote(_K, "compute")
                for s in shards
            ]
        dang_refs = [msgs[p][P] for p in range(P)]
        if fuse_volleys:
            nxt = [
                s.apply_then_compute.options(num_returns=P + 2).remote(
                    _K, [msgs[p][q] for p in range(P)], dang_refs, alpha
                )
                for q, s in enumerate(shards)
            ]
            carry["msgs"] = nxt
            carry["next"] = iteration + 1
            return {
                "l1_delta": [nxt[q][P + 1] for q in range(P)],
                "dangling_mass": dang_refs,
            }
        delta_refs = [
            s.call_live.remote(
                _K, "apply", [msgs[p][q] for p in range(P)], dang_refs, alpha
            )
            for q, s in enumerate(shards)
        ]
        return {"l1_delta": delta_refs, "dangling_mass": dang_refs}

    def converged(metrics):
        return metrics["l1_delta"] < n_total * tol

    return run_supersteps(
        algorithm="pagerank",
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
