"""Per-vertex triangle counting (north-rule op; reuses the G1/G2 CSR
partitioning machinery — SURVEY.md §2.7).

Algorithm: the standard compact-forward scheme — orient each edge from the
endpoint smaller in the total order (degree, vid), generate the oriented
wedges of every apex, and close them against the undirected adjacency.
Execution: the actor protocol in ``state/triangles.py`` — four routed
message volleys over the shared ``KernelShard`` pool with ZERO Dataset
shuffles (a previous expression as Dataset joins/groupbys paid ~6
all-to-all exchanges; the shard actors already hold exact degrees and
sorted adjacency, so only wedge queries and pre-aggregated corner counts
move).

Skew handling: the (degree, vid) orientation bounds oriented out-degree by
O(sqrt(m)); wedge volleys are generated in apex blocks (``wedge_block``)
so peak in-flight message volume is bounded on dense shards; corner-count
messages are pre-aggregated per (source shard, dest shard) pair, so a hub
vertex receives at most P entries per volley.
"""

from __future__ import annotations

import time

import ray
import ray.data as rd

from ..state.pool import get_pool
from .edges import read_meta

_K = "triangles"


def triangle_counts(
    graph_dir: str,
    *,
    pool_size: int | None = None,
    wedge_block: int = 25_000,
    max_attempts: int = 3,
) -> tuple[rd.Dataset, dict]:
    """Returns (Dataset(vid: int64, triangles: int64), metrics).

    Fault tolerance: the volley protocol holds no cross-run state (every
    attempt starts from a ``reset``), so a shard death mid-volley — Ray
    restarts the actor with its artifacts reloaded — is recovered by
    simply re-running the whole protocol, up to ``max_attempts``."""
    last_err: Exception | None = None
    for attempt in range(max_attempts):
        try:
            return _triangle_counts_once(graph_dir, pool_size, wedge_block)
        except (ray.exceptions.RayActorError, ray.exceptions.RayTaskError) as e:
            last_err = e
    raise last_err


def _triangle_counts_once(
    graph_dir: str, pool_size: int | None, wedge_block: int
) -> tuple[rd.Dataset, dict]:
    t0 = time.time()
    meta = read_meta(graph_dir)
    shards, P = get_pool(graph_dir, pool_size)
    assert P >= 2, "triangle protocol requires >= 2 partitions"
    ray.get([s.reset.remote(_K) for s in shards])

    # phase 1+2: degree exchange, orientation.  Request arrays stay in the
    # object store (num_returns=P slot refs, passed as direct args so Ray
    # resolves them in the callee) — the driver never touches the data.
    reqs = [
        s.call.options(num_returns=P).remote(_K, "degree_requests")
        for s in shards
    ]
    replies = [
        [shards[q].call.remote(_K, "degrees_for", reqs[p][q]) for q in range(P)]
        for p in range(P)
    ]
    oriented = ray.get(
        [shards[p].call.remote(_K, "set_degrees", replies[p]) for p in range(P)]
    )

    # phase 3+4: wedge volleys in apex blocks
    n_blocks = max(
        ray.get([s.call.remote(_K, "n_blocks", wedge_block) for s in shards])
    )
    for b in range(n_blocks):
        wrefs = [
            s.call.options(num_returns=P + 1).remote(
                _K, "wedges_for_block", b, wedge_block
            )
            for s in shards
        ]
        incs = [
            shards[q].call.options(num_returns=P).remote(
                _K, "match_wedges", [wrefs[p][q] for p in range(P)]
            )
            for q in range(P)
        ]
        ray.get(
            [
                shards[r].call.remote(
                    _K, "apply_counts", [incs[q][r] for q in range(P)]
                )
                for r in range(P)
            ]
        )

    result = rd.from_arrow_refs(
        [s.call.remote(_K, "get_table") for s in shards]
    )
    return result, {
        "algorithm": "triangles",
        "P": P,
        "oriented_edges": int(sum(oriented)),
        "wedge_blocks": n_blocks,
        "seconds": round(time.time() - t0, 3),
    }
