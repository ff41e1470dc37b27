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
from .iterative import run_supersteps
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
) -> tuple[rd.Dataset, dict]:
    """Returns (Dataset(vid: int64, rank: float64), run metrics)."""
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

    def step(shards, P, iteration):
        # submit-only: no driver synchronization — the dangling scalars go
        # to apply() as refs and are summed shard-side in fixed order
        refs = [
            s.call_live.options(num_returns=P + 1).remote(_K, "compute") for s in shards
        ]
        dang_refs = [refs[p][P] for p in range(P)]
        delta_refs = [
            s.call_live.remote(
                _K, "apply", [refs[p][q] for p in range(P)], dang_refs, alpha
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
