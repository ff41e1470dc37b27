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


def test_lpa_frontier_quiesces(graph300):
    """Delta frontier: once no label changes, the next compute() sends no
    messages (all-None) and reports an empty frontier — message bytes are
    O(frontier), not O(E), per superstep."""
    from cryptowalletcommunitydetection_ray.pipelines.edges import read_meta
    from cryptowalletcommunitydetection_ray.state.csr import (
        ModeLabelState,
        ShardData,
    )

    P = read_meta(graph300)["P"]
    states = [ModeLabelState(ShardData(graph300, p, P)) for p in range(P)]

    # apply() accepts plain values as well as ObjectRefs (the packed
    # protocol's contract), so the supersteps run in-process directly
    changed, sent_after_converged, frontier_after = None, None, None
    for _ in range(30):
        outs = [s.compute() for s in states]
        msgs = [[outs[p][q] for p in range(P)] for q in range(P)]
        prev_changed = changed
        changed = sum(states[q].apply(msgs[q]) for q in range(P))
        if prev_changed == 0:
            # superstep AFTER convergence: nothing may be sent
            sent_after_converged = [
                outs[p][q] for p in range(P) for q in range(P)
            ]
            frontier_after = [o[-1] for o in outs]
            break
    assert sent_after_converged is not None, "never converged"
    assert all(m is None for m in sent_after_converged)
    assert all(f == 0 for f in frontier_after)
