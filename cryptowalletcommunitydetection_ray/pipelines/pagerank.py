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
from ..state.csr import PageRankShard
from .edges import read_meta
from .iterative import run_supersteps


def pagerank(
    graph_dir: str,
    *,
    alpha: float = 0.85,
    tol: float = 1e-10,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> tuple[rd.Dataset, dict]:
    """Returns (Dataset(vid: uint64, rank: float64), run metrics)."""
    meta = read_meta(graph_dir)
    n_total = meta["num_vertices"]

    def make_actor(p: int, P: int):
        a = PageRankShard.remote(graph_dir, p, P)
        a.init_rank.remote(n_total)
        return a

    def restore(actors, ckpt_dir, it):
        ray.get(
            [
                a.restore.remote(ck.slice_path(ckpt_dir, it, p), n_total)
                for p, a in enumerate(actors)
            ]
        )

    def step(actors, P, iteration):
        refs = [a.compute.options(num_returns=P + 1).remote() for a in actors]
        dangling_total = sum(ray.get([refs[p][P] for p in range(P)]))
        deltas = ray.get(
            [
                a.apply.remote([refs[p][q] for p in range(P)], dangling_total, alpha)
                for q, a in enumerate(actors)
            ]
        )
        return {"l1_delta": float(sum(deltas)), "dangling_mass": dangling_total}

    def converged(metrics):
        return metrics["l1_delta"] < n_total * tol

    return run_supersteps(
        algorithm="pagerank",
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
