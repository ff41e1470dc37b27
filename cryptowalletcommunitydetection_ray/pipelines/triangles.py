"""Per-vertex triangle counting (north-rule op; reuses the G1/G2 CSR
partitioning machinery — SURVEY.md §2.7).

Algorithm: the standard compact-forward scheme — orient each edge from the
endpoint smaller in the total order (degree, vid), generate the oriented
wedges of every apex, and close them against the undirected adjacency.
Execution: the actor protocol in ``state/triangles.py`` — four routed
message volleys over the partitioned CSR shards with ZERO Dataset shuffles
(a previous expression as Dataset joins/groupbys paid ~6 all-to-all
exchanges; the shard actors already hold exact degrees and sorted
adjacency, so only wedge queries and pre-aggregated corner counts move).

Skew handling: the (degree, vid) orientation bounds oriented out-degree by
O(sqrt(m)); wedge volleys are generated in apex blocks (``wedge_block``)
so peak in-flight message volume is bounded on dense shards; corner-count
messages are pre-aggregated per (source shard, dest shard) pair, so a hub
vertex receives at most P entries per volley.
"""

from __future__ import annotations

import ray
import ray.data as rd

from ..state.triangles import TriangleShard
from .edges import read_meta


def triangle_counts(
    graph_dir: str,
    *,
    num_partitions: int | None = None,
    wedge_block: int = 200_000,
) -> tuple[rd.Dataset, dict]:
    """Returns (Dataset(vid: int64, triangles: int64), metrics)."""
    meta = read_meta(graph_dir)
    P = meta["P"]  # routing must match the artifact partitioning
    assert P >= 2, "triangle protocol requires >= 2 partitions"

    shards = [TriangleShard.remote(graph_dir, p, P) for p in range(P)]

    # phase 1+2: degree exchange, orientation
    reqs = ray.get([s.degree_requests.remote() for s in shards])
    replies = [
        [shards[q].degrees_for.remote(reqs[p][q]) for q in range(P)]
        for p in range(P)
    ]
    oriented = ray.get(
        [shards[p].set_degrees.remote(replies[p]) for p in range(P)]
    )

    # phase 3+4: wedge volleys in apex blocks
    n_blocks = max(ray.get([s.n_blocks.remote(wedge_block) for s in shards]))
    matched_total = 0
    for b in range(n_blocks):
        wrefs = [
            s.wedges_for_block.options(num_returns=P + 1).remote(b, wedge_block)
            for s in shards
        ]
        incs = [
            shards[q].match_wedges.options(num_returns=P).remote(
                [wrefs[p][q] for p in range(P)]
            )
            for q in range(P)
        ]
        matched_total += sum(
            ray.get(
                [
                    shards[r].apply_counts.remote([incs[q][r] for q in range(P)])
                    for r in range(P)
                ]
            )
        )

    result = rd.from_arrow_refs([s.get_table.remote() for s in shards])
    return result, {
        "algorithm": "triangles",
        "P": P,
        "oriented_edges": int(sum(oriented)),
        "wedge_blocks": n_blocks,
    }
