"""Hub-vertex skew: an extreme-in-degree star must stay correct and its
per-superstep message volume must stay bounded by the local combine
(a hub receives ≤ P pre-aggregated entries per superstep, not in-degree)."""

import numpy as np
import pandas as pd


def test_hub_star_graph(ray_session, tmp_path):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.context import hash64
    from cryptowalletcommunitydetection_ray.pipelines.components import (
        connected_components,
    )
    from cryptowalletcommunitydetection_ray.pipelines.edges import (
        build_graph_from_edges,
        edges_from_pairs,
    )
    from cryptowalletcommunitydetection_ray.pipelines.pagerank import pagerank
    from cryptowalletcommunitydetection_ray.pipelines.triangles import (
        triangle_counts,
    )

    n = 20000
    pairs = pd.DataFrame(
        {"x": [f"u{i}" for i in range(n)], "y": ["hub"] * n}
    )
    d = str(tmp_path / "g")
    build_graph_from_edges(edges_from_pairs(rd.from_pandas(pairs), "x", "y"), d, 4)

    # analytic PageRank of a star: spokes get (1-a)/N + a*D/N; hub gets
    # (1-a)/N + a*(sum of spoke ranks + D/N-share)
    ranks, m = pagerank(d, tol=1e-14, max_iter=300, pipeline_depth=1)
    pr = ranks.to_pandas().set_index("vid")["rank"]
    hub = hash64(np.array(["hub"], dtype=object))[0]
    N = n + 1
    a = 0.85
    # fixed point: spoke = (1-a)/N + a*r_hub/N ; hub = (1-a)/N + a*(n*spoke + r_hub/N)
    # solve the 2x2 system
    import numpy.linalg as la

    A = np.array([[1, -a / N], [-a * n, 1 - a / N]])
    b = np.array([(1 - a) / N, (1 - a) / N])
    spoke_w, hub_w = la.solve(A, b)
    assert abs(pr[hub] - hub_w) < 1e-9
    some_spoke = hash64(np.array(["u0"], dtype=object))[0]
    assert abs(pr[some_spoke] - spoke_w) < 1e-9
    assert abs(pr.sum() - 1.0) < 1e-9

    # CC: single component labeled by the min vid; converges in few steps
    labels, mc = connected_components(d)
    lab = labels.to_pandas()["label"]
    assert lab.nunique() == 1
    assert mc["supersteps_run"] <= 4

    # triangles: a star has none
    tri, _ = triangle_counts(d)
    assert int(tri.to_pandas()["triangles"].sum()) == 0

    # the skew guarantee: each PageRank message slice carries UNIQUE dst
    # entries (local combine), so the hub receives at most P entries per
    # superstep regardless of its 20k in-degree
    from cryptowalletcommunitydetection_ray.state.csr import (
        PageRankState,
        ShardData,
    )

    data = ShardData(d, 0, 4)
    st = PageRankState(data)
    st.init_rank(N)
    out = st.compute()
    for q in range(4):
        msg = out[q]
        if msg is None:
            continue
        dst_ids = msg[0]
        assert len(np.unique(dst_ids)) == len(dst_ids)  # pre-aggregated
