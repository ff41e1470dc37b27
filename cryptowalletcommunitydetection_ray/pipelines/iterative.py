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


def resolve_message_mode(mode: str) -> str:
    """``"auto"`` → ``"packed"`` on a single-node cluster (plasma reads are
    zero-copy, so shipping each shard's whole compute output as ONE object
    minimizes per-superstep object count — the measured latency floor),
    ``"slots"`` on multi-node (per-destination ``num_returns`` routing
    ships only the bytes each shard needs — the 100 TB shape)."""
    if mode == "auto":
        alive = [n for n in ray.nodes() if n.get("Alive")]
        return "packed" if len(alive) <= 1 else "slots"
    if mode not in ("packed", "slots"):
        raise ValueError(f"message_mode must be auto|packed|slots: {mode!r}")
    return mode


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

    manifest = None
    if checkpoint_dir is not None:
        manifest = ck.init_manifest(
            checkpoint_dir, algorithm, graph_dir, P, lineage=meta
        )

    def _setup(use_resume: bool) -> int:
        """(Re)initialise every shard's kernel state; returns start iter.
        Called once at job start and again after a shard failure — a
        restarted actor reloaded its partition artifacts in ``__init__``
        but holds no kernel state, so ALL shards rewind together to the
        latest complete checkpoint (or to a fresh init when the run is
        not checkpointed)."""
        ray.get([s.reset.remote(kernel) for s in shards])
        ray.get([s.ensure.remote(kernel) for s in shards])
        init(shards, P)
        if checkpoint_dir is not None:
            last = ck.latest_complete(read_or(manifest)) if use_resume else None
            if last is not None:
                it = last["iteration"]
                if restore is None:
                    raise ValueError(
                        f"{algorithm}: resume requested but unsupported"
                    )
                restore(shards, checkpoint_dir, it)
                return it + 1
        return 0

    def read_or(m):
        return ck.read_manifest(checkpoint_dir) or m

    def _rewind() -> int:
        """_setup with backoff: a freshly-restarted shard can be
        transiently UNAVAILABLE while its ``__init__`` reloads partition
        artifacts — without the retry that second error would escape the
        superstep loop's failure handler."""
        for attempt in range(6):
            try:
                return _setup(checkpoint_dir is not None)
            except ray.exceptions.RayActorError:
                time.sleep(0.5 * (attempt + 1))
        return _setup(checkpoint_dir is not None)

    start_iter = _setup(resume)
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
    restarts = 0
    max_restart_attempts = 4
    iteration = start_iter
    done = False
    while iteration < max_iter and not done:
        try:
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
                    # state has already advanced past `it` when depth > 1;
                    # the slice therefore reflects the LAST submitted
                    # superstep — with depth 1 (the default for
                    # checkpointed runs) it is exactly superstep `it`
                    ray.get(
                        [
                            s.call_live.remote(
                                kernel, "save",
                                ck.slice_path(checkpoint_dir, it, p),
                            )
                            for p, s in enumerate(shards)
                        ]
                    )
                    ck.record_iteration(checkpoint_dir, manifest, it, metrics)
                if converged(metrics):
                    done = True
                    break
        except (ray.exceptions.RayActorError, ray.exceptions.RayTaskError):
            # a shard died mid-superstep (Ray restarts it with fresh
            # artifacts but empty kernel state) — rewind everything to
            # the latest complete checkpoint, or re-init when the run
            # has no checkpoints
            restarts += 1
            if restarts > max_restart_attempts:
                raise
            history.append({"iteration": iteration, "restart": restarts})
            iteration = _rewind()
            done = False
    t_loop = time.time() - t0

    result = rd.from_arrow_refs(
        [s.call_live.remote(kernel, "get_table") for s in shards]
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
        "restarts": restarts,
        "history": history,
    }
    return result, run_metrics
