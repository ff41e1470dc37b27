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


def test_fused_volleys_bit_identical(graph300):
    """fuse_volleys=True (one apply+compute task wave per superstep) must
    reproduce the two-wave path bit-for-bit for every superstep kernel:
    the actor mailbox ran apply then compute back-to-back anyway, and all
    folds are fixed-order."""
    from cryptowalletcommunitydetection_ray.pipelines.components import (
        connected_components,
    )
    from cryptowalletcommunitydetection_ray.pipelines.labelprop import (
        label_propagation,
    )

    for fn, col, kw in (
        (pagerank, "rank", dict(tol=1e-12)),
        (connected_components, "label", {}),
        (label_propagation, "label", dict(max_iter=10)),
    ):
        variants = [
            dict(fuse_volleys=True, message_mode="packed"),
            dict(fuse_volleys=True, message_mode="slots"),
            dict(fuse_volleys=False, message_mode="slots"),
        ]
        results = []
        for v in variants:
            out, met = fn(graph300, **v, **kw)
            df = out.to_pandas().sort_values("vid").reset_index(drop=True)
            results.append((df, met))
        base_df, base_met = results[0]
        for df, met in results[1:]:
            assert (base_df["vid"].to_numpy() == df["vid"].to_numpy()).all()
            assert (base_df[col].to_numpy() == df[col].to_numpy()).all()
            assert base_met["supersteps_run"] == met["supersteps_run"]
