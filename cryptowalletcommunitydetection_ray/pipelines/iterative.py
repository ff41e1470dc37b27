"""Shared superstep driver for the iterative kernels.

Runs the actor-pool superstep loop (compute → route → apply), checkpointing
per-partition state slices + a lineage manifest every ``checkpoint_every``
supersteps, and resuming from the latest *complete* superstep when asked.
"""

from __future__ import annotations

from typing import Any, Callable

import ray
import ray.data as rd

from ..state import checkpoint as ck
from .edges import read_meta


def run_supersteps(
    *,
    algorithm: str,
    graph_dir: str,
    make_actor: Callable[[int, int], Any],
    step: Callable[[list, int, int], dict],
    converged: Callable[[dict], bool],
    restore: Callable[[list, str, int], None] | None = None,
    max_iter: int,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> tuple[rd.Dataset, dict]:
    """Generic superstep loop.  Returns (result Dataset, run metrics).

    ``step(actors, P, iteration)`` performs ONE superstep and returns its
    metrics dict; ``converged(metrics)`` decides termination; ``restore``
    loads checkpoint slices into actors.
    """
    meta = read_meta(graph_dir)
    P = meta["P"]
    actors = [make_actor(p, P) for p in range(P)]

    start_iter = 0
    manifest = None
    if checkpoint_dir is not None:
        manifest = ck.init_manifest(
            checkpoint_dir, algorithm, graph_dir, P, lineage=meta
        )
        last = ck.latest_complete(manifest) if resume else None
        if last is not None:
            it = last["iteration"]
            if restore is None:
                raise ValueError(f"{algorithm}: resume requested but unsupported")
            restore(actors, checkpoint_dir, it)
            start_iter = it + 1

    history: list[dict] = []
    iteration = start_iter
    for iteration in range(start_iter, max_iter):
        metrics = step(actors, P, iteration)
        history.append({"iteration": iteration, **metrics})
        if checkpoint_dir is not None and (
            (iteration % checkpoint_every == 0) or converged(metrics)
        ):
            done = ray.get(
                [
                    a.save.remote(ck.slice_path(checkpoint_dir, iteration, p))
                    for p, a in enumerate(actors)
                ]
            )
            del done
            ck.record_iteration(checkpoint_dir, manifest, iteration, metrics)
        if converged(metrics):
            break

    result = rd.from_arrow_refs([a.get_table.remote() for a in actors])
    run_metrics = {
        "algorithm": algorithm,
        "supersteps_run": len(history),
        "last_iteration": iteration,
        "num_vertices": meta["num_vertices"],
        "num_edges": meta["num_edges"],
        "P": P,
        "history": history,
    }
    return result, run_metrics
