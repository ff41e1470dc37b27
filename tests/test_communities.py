"""Community semantics vs reference behavior (CC + user/deposit split,
sizes, deterministic ids, top-k query) — mirrors
``/root/reference/services/wallet_clustering.py:10-65`` run on the pairs
fixture (with deterministic ids substituted for uuid4)."""

import networkx as nx
import pyarrow.dataset as pads

from cryptowalletcommunitydetection_ray.pipelines.communities import (
    community_edges,
    detect_communities,
    top_communities,
)


def _oracle(pairs):
    """Reference semantics: undirected CC over the pair graph; per component
    user = appears in the x column, deposit = the rest; sorted lists."""
    g = nx.Graph()
    g.add_edges_from(zip(pairs["x"], pairs["y"]))
    users_set = set(pairs["x"])
    out = {}
    for comp in nx.connected_components(g):
        users = sorted(u for u in comp if u in users_set)
        depos = sorted(u for u in comp if u not in users_set)
        out[frozenset(comp)] = (users, depos)
    return out


def test_membership_and_sizes(pairs_graph):
    d, pairs = pairs_graph
    comms, _ = detect_communities(d, chain="testchain")
    cdf = comms.to_pandas()
    want = _oracle(pairs)
    assert len(cdf) == len(want)
    verts = (
        pads.dataset(f"{d}/vertices", partitioning="hive")
        .to_table()
        .to_pandas()
        .set_index("url")["vid"]
    )
    for comp, (users, depos) in want.items():
        cid = min(verts[u] for u in comp)
        row = cdf[cdf["_id"] == cid].iloc[0]
        assert list(row["user_wallets"]) == users
        assert list(row["deposit_wallets"]) == depos
        assert row["num_user"] == len(users)
        assert row["num_depo"] == len(depos)
        assert row["chain"] == "testchain"


def test_top_communities_query(pairs_graph):
    d, _ = pairs_graph
    comms, _ = detect_communities(d)
    top = top_communities(comms, min_user=2, min_depo=1, k=2).to_pandas()
    assert list(top["num_user"]) == sorted(top["num_user"], reverse=True)
    assert (top["num_user"] >= 2).all() and (top["num_depo"] >= 1).all()


def test_community_edges(pairs_graph):
    from cryptowalletcommunitydetection_ray.pipelines.components import (
        connected_components,
    )

    d, pairs = pairs_graph
    labels, _ = connected_components(d)
    ce = community_edges(d, labels).to_pandas()
    total = sum(len(e) for e in ce["edges"])
    assert total == len(pairs.drop_duplicates())


def test_one_sided_component_dropped(ray_session, tmp_path):
    """Reference parity (get_user_depo INNER join,
    services/wallet_clustering.py:47): a component with no deposit-side
    member - here a pure src-src cycle - emits no community row; pass
    require_both_sides=False to keep every component."""
    import pandas as pd
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.pipelines.communities import (
        detect_communities,
        community_members_from_pool,
        community_sizes,
    )
    from cryptowalletcommunitydetection_ray.pipelines.edges import (
        build_graph_from_edges,
        edges_from_pairs,
    )

    pairs = pd.DataFrame(
        {
            # cycle a->b->c->a (every vertex a src) + bipartite u->d
            "x": ["a", "b", "c", "u"],
            "y": ["b", "c", "a", "d"],
        }
    )
    d = str(tmp_path / "g")
    build_graph_from_edges(edges_from_pairs(rd.from_pandas(pairs), "x", "y"), d, 2)

    comms, _ = detect_communities(d)
    got = comms.to_pandas()
    assert len(got) == 1
    assert got["user_wallets"].iloc[0] == ["u"] and got["num_depo"].iloc[0] == 1

    every = community_members_from_pool(d, require_both_sides=False).to_pandas()
    assert len(every) == 2  # the cycle appears again

    sizes = community_sizes(d).to_pandas()
    assert len(sizes) == 1
    sizes_all = community_sizes(d, require_both_sides=False).to_pandas()
    assert len(sizes_all) == 2


def test_host_community_edges(graph300):
    """page→host raw edges: dst is the 'host://'-prefixed lowercased netloc
    of the link target, vids are hash64 of the url strings (Arrow-native
    stage; hosts_of equivalence pinned in test_extract)."""
    from cryptowalletcommunitydetection_ray.context import hash64
    from cryptowalletcommunitydetection_ray.functions.extract import host_of
    from cryptowalletcommunitydetection_ray.pipelines.communities import (
        host_community_edges,
    )

    import pandas as pd

    he = host_community_edges(graph300).to_pandas()
    assert len(he) > 0
    assert he["dst_url"].str.startswith("host://").all()
    # spot-check one row end-to-end against the scalar path
    import pyarrow.dataset as pads

    raw = pads.dataset(f"{graph300}/edges", partitioning="hive").to_table(
        columns=["src_url", "dst_url"]
    ).to_pandas()
    want_dst = "host://" + raw["dst_url"].map(host_of)
    got = he.sort_values(["src_url", "dst_url"]).reset_index(drop=True)
    want = (
        pd.DataFrame({"src_url": raw["src_url"], "dst_url": want_dst})
        .sort_values(["src_url", "dst_url"])
        .reset_index(drop=True)
    )
    assert (got["src_url"] == want["src_url"]).all()
    assert (got["dst_url"] == want["dst_url"]).all()
    assert (got["src"].to_numpy() == hash64(got["src_url"].to_numpy())).all()
    assert (got["dst"].to_numpy() == hash64(got["dst_url"].to_numpy())).all()
