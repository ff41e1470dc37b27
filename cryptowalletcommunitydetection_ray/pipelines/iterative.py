"""Shared superstep driver for the iterative kernels.

Runs the shard-pool superstep loop (compute → route → apply) over the
shared per-graph ``KernelShard`` pool, checkpointing per-partition state
slices + a lineage manifest every ``checkpoint_every`` supersteps, and
resuming from the latest *complete* superstep when asked.
"""

from __future__ import annotations

import time
from typing import Callable

import ray
import ray.data as rd

from ..state import checkpoint as ck
from ..state.pool import get_pool
from .edges import read_meta


def run_supersteps(
    *,
    algorithm: str,
    kernel: str,
    graph_dir: str,
    init: Callable[[list, int], None],
    step: Callable[[list, int, int], dict],
    converged: Callable[[dict], bool],
    restore: Callable[[list, str, int], None] | None = None,
    max_iter: int,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    pipeline_depth: int = 1,
    pool_size: int | None = None,
) -> tuple[rd.Dataset, dict]:
    """Generic superstep loop.  Returns (result Dataset, run metrics).

    ``step`` may return either a metrics dict (resolved) or a dict whose
    values are ObjectRef / lists of ObjectRefs; refs are resolved lazily.
    With ``pipeline_depth`` > 1, that many supersteps are SUBMITTED before
    the driver synchronizes on their metrics — actor mailbox ordering keeps
    per-shard state updates sequential, so results are identical; the
    convergence check simply lags, running up to depth-1 extra (no-op-ish)
    supersteps.  Depth > 1 removes driver round-trip latency from the
    critical path (the scaling lever); use depth 1 when exact
    stop-iteration bookkeeping matters (checkpoint bit-reproducibility
    tests).
    """
    if checkpoint_dir is not None:
        # checkpoint slices must correspond exactly to their iteration for
        # bit-identical resume — no lookahead when checkpointing
        pipeline_depth = 1
    t0 = time.time()
    meta = read_meta(graph_dir)
    shards, P = get_pool(graph_dir, pool_size)
    ray.get([s.reset.remote(kernel) for s in shards])  # fresh kernel state
    init(shards, P)

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
            restore(shards, checkpoint_dir, it)
            start_iter = it + 1
    t_setup = time.time() - t0

    def _resolve(raw: dict) -> dict:
        out = {}
        for k, v in raw.items():
            if isinstance(v, list):
                out[k] = float(sum(ray.get(v)))
            elif isinstance(v, ray.ObjectRef):
                out[k] = ray.get(v)
            else:
                out[k] = v
        return out

    t0 = time.time()
    history: list[dict] = []
    iteration = start_iter
    done = False
    while iteration < max_iter and not done:
        chunk_end = min(iteration + max(1, pipeline_depth), max_iter)
        submitted = [
            (it, step(shards, P, it)) for it in range(iteration, chunk_end)
        ]
        for it, raw in submitted:
            metrics = _resolve(raw)
            history.append({"iteration": it, **metrics})
            iteration = it + 1
            if checkpoint_dir is not None and (
                (it % checkpoint_every == 0) or converged(metrics)
            ):
                # state has already advanced past `it` when depth > 1; the
                # slice therefore reflects the LAST submitted superstep —
                # with depth 1 (the default for checkpointed runs) it is
                # exactly superstep `it`
                ray.get(
                    [
                        s.call.remote(
                            kernel, "save", ck.slice_path(checkpoint_dir, it, p)
                        )
                        for p, s in enumerate(shards)
                    ]
                )
                ck.record_iteration(checkpoint_dir, manifest, it, metrics)
            if converged(metrics):
                done = True
                break
    t_loop = time.time() - t0

    result = rd.from_arrow_refs(
        [s.call.remote(kernel, "get_table") for s in shards]
    )
    run_metrics = {
        "algorithm": algorithm,
        "supersteps_run": len(history),
        "last_iteration": iteration,
        "num_vertices": meta["num_vertices"],
        "num_edges": meta["num_edges"],
        "P": P,
        "setup_seconds": round(t_setup, 3),
        "loop_seconds": round(t_loop, 3),
        "history": history,
    }
    return result, run_metrics
