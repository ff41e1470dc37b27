"""S15: CSV wallet-pairs edge list → graph → communities (the reference's
``cli/export_transactions.py:26`` + clustering path, end to end)."""

import networkx as nx
import pandas as pd


def test_csv_pairs_to_communities(ray_session, tmp_path):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.pipelines.communities import (
        detect_communities,
    )
    from cryptowalletcommunitydetection_ray.pipelines.edges import (
        build_graph_from_edges,
        edges_from_pairs,
    )

    # reference CSV shape: header ",x,y" with an index column
    csv = tmp_path / "wallets_pairs.csv"
    df = pd.DataFrame(
        {
            "x": ["0xAAA", "0xBBB", "0xAAA", "0xCCC", "0xDDD"],
            "y": ["0xdep1", "0xdep1", "0xdep2", "0xdep3", "0xdep3"],
        }
    )
    df.to_csv(csv, index=True)

    # Arrow CSV type inference parses "0xAAA" as a hex INTEGER — address
    # columns must be pinned to string (see edges_from_pairs docstring)
    import pyarrow as pa
    import pyarrow.csv as pacsv

    pairs = rd.read_csv(
        str(csv),
        convert_options=pacsv.ConvertOptions(
            column_types={"x": pa.string(), "y": pa.string()}
        ),
    )
    g = str(tmp_path / "g")
    meta = build_graph_from_edges(edges_from_pairs(pairs, "x", "y"), g, 2)
    assert meta["num_edges"] == 5

    comms, _ = detect_communities(g, chain="0x1")
    cdf = comms.to_pandas()
    want = nx.Graph()
    want.add_edges_from(zip(df["x"], df["y"]))
    assert len(cdf) == len(list(nx.connected_components(want))) == 2
    by_users = {
        frozenset(r["user_wallets"]): sorted(r["deposit_wallets"])
        for _, r in cdf.iterrows()
    }
    assert by_users[frozenset({"0xAAA", "0xBBB"})] == ["0xdep1", "0xdep2"]
    assert by_users[frozenset({"0xCCC", "0xDDD"})] == ["0xdep3"]
    assert set(cdf["chain"]) == {"0x1"}
