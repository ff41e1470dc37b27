"""Connected components: exact labels vs networkx (min-member-vid canonical)."""

import networkx as nx

from cryptowalletcommunitydetection_ray.pipelines.components import (
    connected_components,
)


def test_cc_exact_single_giant(graph300, graph300_edges):
    labels, metrics = connected_components(graph300)
    lab = labels.to_pandas().set_index("vid")["label"]
    g = nx.Graph()
    g.add_edges_from(graph300_edges)
    for comp in nx.connected_components(g):
        want = min(comp)
        assert {lab[v] for v in comp} == {want}
    assert metrics["history"][-1]["changed"] == 0


def test_cc_multiple_components(pairs_graph):
    import pyarrow.dataset as pads

    d, pairs = pairs_graph
    labels, _ = connected_components(d)
    lab = labels.to_pandas().set_index("vid")["label"]
    verts = (
        pads.dataset(f"{d}/vertices", partitioning="hive")
        .to_table()
        .to_pandas()
        .set_index("url")["vid"]
    )
    g = nx.Graph()
    g.add_edges_from(zip(pairs["x"], pairs["y"]))
    comps = list(nx.connected_components(g))
    assert len(comps) == 3
    for comp in comps:
        vids = {verts[u] for u in comp}
        assert {lab[v] for v in vids} == {min(vids)}
