"""Reference-style single-node clustering vs the engine, same input.

The reference's community pipeline is driver-memory pandas+networkx
(`/root/reference/services/wallet_clustering.py:10-65`): build an nx.Graph
from the edge list, enumerate connected components, split each into
user/deposit members.  This script re-implements those SEMANTICS faithfully
(independent code, not a copy), times them on the engine's own deduped edge
table, and times the engine's distributed path (CC kernel + community
sizes) on the same graph.

Usage:  python scripts/compare_reference.py [graph_dir]
        (defaults to building a 100k-page graph under /dev/shm)
"""

from __future__ import annotations

import json
import sys
import time


def reference_style(edges_df, src_set):
    """Faithful re-implementation of the reference semantics on one node."""
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(edges_df[["src", "dst"]].itertuples(index=False, name=None))
    out = []
    for comp in nx.connected_components(g):
        users = sorted(v for v in comp if v in src_set)
        depos = sorted(v for v in comp if v not in src_set)
        out.append((min(comp), len(users), len(depos)))
    return out


def main():
    import logging

    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    from cryptowalletcommunitydetection_ray.context import quiet_data_context

    quiet_data_context()
    import pyarrow.dataset as pads
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.pipelines.communities import (
        community_sizes,
    )
    from cryptowalletcommunitydetection_ray.pipelines.components import (
        connected_components,
    )
    from cryptowalletcommunitydetection_ray.pipelines.edges import build_graph
    from cryptowalletcommunitydetection_ray.sources.pages import write_pages
    import os
    import shutil

    if len(sys.argv) > 1:
        graph_dir = sys.argv[1]
    else:
        corpus = "/dev/shm/cwcd_bench/pages_100000"
        if not os.path.exists(f"{corpus}/_DONE"):
            shutil.rmtree(corpus, ignore_errors=True)
            write_pages(corpus, 100000, override_num_blocks=32)
            open(f"{corpus}/_DONE", "w").write("ok")
        graph_dir = "/dev/shm/cwcd_compare_g"
        if not os.path.exists(f"{graph_dir}/meta.json"):
            build_graph(rd.read_parquet(corpus), graph_dir, 32)

    # -------- reference style (single node, driver memory) ---------------
    t0 = time.time()
    edges_df = (
        pads.dataset(f"{graph_dir}/edges", partitioning="hive")
        .to_table(columns=["src", "dst"])
        .to_pandas()
    )
    src_set = set(edges_df["src"])
    ref = reference_style(edges_df, src_set)
    t_ref = time.time() - t0

    # -------- engine (distributed CC + sizes) -----------------------------
    t0 = time.time()
    labels, m = connected_components(graph_dir, pool_size=8)
    sizes = community_sizes(graph_dir, pool_size=8).to_pandas()
    t_eng = time.time() - t0

    # cross-check results
    eng = {
        int(r["_id"]): (int(r["num_user"]), int(r["num_depo"]))
        for _, r in sizes.iterrows()
    }
    ok = all(eng.get(cid) == (nu, nd) for cid, nu, nd in ref) and len(eng) == len(
        ref
    )
    print(
        json.dumps(
            {
                "num_edges": len(edges_df),
                "reference_style_sec": round(t_ref, 2),
                "engine_sec": round(t_eng, 2),
                "speedup_vs_reference": round(t_ref / t_eng, 2),
                "results_match": ok,
                "n_communities": len(eng),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
