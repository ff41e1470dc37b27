"""PageRank vs independent oracle; allclose 1e-6 (north-rule criterion)."""

import numpy as np

from cryptowalletcommunitydetection_ray.pipelines.pagerank import pagerank

from .oracles import oracle_pagerank


def test_pagerank_matches_oracle(graph300, graph300_edges):
    ranks, metrics = pagerank(graph300, tol=1e-12)
    pr = ranks.to_pandas().set_index("vid")["rank"]
    want = oracle_pagerank(graph300_edges, tol=1e-13)
    got = np.array([pr[v] for v in want])
    assert np.allclose(got, np.array(list(want.values())), atol=1e-6)
    assert abs(pr.sum() - 1.0) < 1e-9
    assert metrics["supersteps_run"] >= 2


def test_pagerank_dangling_chain(ray_session, tmp_path):
    """Chain a→b→c with dangling c; analytic fixed point must match."""
    import pandas as pd
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.pipelines.edges import (
        build_graph_from_edges,
        edges_from_pairs,
    )

    pairs = pd.DataFrame({"x": ["a", "b"], "y": ["b", "c"]})
    d = str(tmp_path / "g")
    build_graph_from_edges(edges_from_pairs(rd.from_pandas(pairs), "x", "y"), d, 2)
    ranks, _ = pagerank(d, tol=1e-14, max_iter=500)
    pr = ranks.to_pandas().set_index("vid")["rank"]
    from cryptowalletcommunitydetection_ray.context import hash64

    va, vb, vc = hash64(np.array(["a", "b", "c"], dtype=object))
    want = oracle_pagerank([(va, vb), (vb, vc)], tol=1e-15)
    for v in (va, vb, vc):
        assert abs(pr[v] - want[v]) < 1e-9
