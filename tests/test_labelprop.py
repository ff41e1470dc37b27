"""Synchronous LPA vs pure-python oracle implementing the pinned rule."""

from cryptowalletcommunitydetection_ray.pipelines.labelprop import label_propagation

from .oracles import oracle_sync_lpa


def test_lpa_matches_oracle_small(pairs_graph):
    d, _ = pairs_graph
    labels, _ = label_propagation(d, max_iter=8)
    lab = labels.to_pandas().set_index("vid")["label"].to_dict()
    import pyarrow.dataset as pads

    t = pads.dataset(f"{d}/edges", partitioning="hive").to_table(
        columns=["src", "dst"]
    )
    el = list(zip(t["src"].to_pylist(), t["dst"].to_pylist()))
    want = oracle_sync_lpa(el, max_iter=8)
    assert lab == want


def test_lpa_matches_oracle_graph300(graph300, graph300_edges):
    labels, _ = label_propagation(graph300, max_iter=5)
    lab = labels.to_pandas().set_index("vid")["label"].to_dict()
    want = oracle_sync_lpa(graph300_edges, max_iter=5)
    assert lab == want
