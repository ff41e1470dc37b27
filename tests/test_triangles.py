"""Per-vertex triangle counts vs networkx."""

import networkx as nx

from cryptowalletcommunitydetection_ray.pipelines.triangles import triangle_counts


def test_triangles_exact(graph300, graph300_edges):
    tri, _ = triangle_counts(graph300)
    got = tri.to_pandas().set_index("vid")["triangles"]
    g = nx.Graph()
    g.add_edges_from(graph300_edges)
    g.remove_edges_from(nx.selfloop_edges(g))
    want = nx.triangles(g)
    for v, c in want.items():
        assert got.get(v, 0) == c
    assert int(got.sum()) % 3 == 0


def test_triangles_known_small(ray_session, tmp_path):
    """K4 minus one edge: two triangles sharing an edge."""
    import pandas as pd
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.context import hash64
    from cryptowalletcommunitydetection_ray.pipelines.edges import (
        build_graph_from_edges,
        edges_from_pairs,
    )

    pairs = pd.DataFrame(
        {"x": ["a", "a", "a", "b", "b"], "y": ["b", "c", "d", "c", "d"]}
    )
    d = str(tmp_path / "g")
    build_graph_from_edges(edges_from_pairs(rd.from_pandas(pairs), "x", "y"), d, 2)
    tri, _ = triangle_counts(d)
    got = tri.to_pandas().set_index("vid")["triangles"]
    import numpy as np

    va, vb, vc, vd_ = hash64(np.array(["a", "b", "c", "d"], dtype=object))
    assert got[va] == 2 and got[vb] == 2 and got[vc] == 1 and got[vd_] == 1


def test_triangles_survive_shard_kill(graph300):
    """Kill a shard mid-protocol: the actor restarts with artifacts
    reloaded and the stateless volley protocol re-runs to the same
    counts."""
    import threading
    import time as _time

    import ray

    from cryptowalletcommunitydetection_ray.pipelines.triangles import (
        triangle_counts,
    )
    from cryptowalletcommunitydetection_ray.state.pool import get_pool

    want = (
        triangle_counts(graph300)[0]
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )

    shards, _ = get_pool(graph300)

    def killer():
        _time.sleep(0.15)
        ray.kill(shards[1], no_restart=False)

    t = threading.Thread(target=killer)
    t.start()
    got = (
        triangle_counts(graph300)[0]
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    t.join()
    assert got.equals(want)
