import logging
import shutil

import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from cryptowalletcommunitydetection_ray.context import quiet_data_context

    quiet_data_context()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def graph300(ray_session, tmp_path_factory):
    """Shared graph artifacts for 300 synthetic pages (P=4)."""
    from cryptowalletcommunitydetection_ray.pipelines.edges import build_graph
    from cryptowalletcommunitydetection_ray.sources.pages import synth_pages

    d = str(tmp_path_factory.mktemp("graph300") / "g")
    build_graph(synth_pages(300, seed=42), d, num_partitions=4)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def graph300_edges(graph300):
    import pyarrow.dataset as pads

    t = pads.dataset(f"{graph300}/edges", partitioning="hive").to_table(
        columns=["src", "dst"]
    )
    return list(zip(t["src"].to_pylist(), t["dst"].to_pylist()))


@pytest.fixture(scope="session")
def pairs_graph(ray_session, tmp_path_factory):
    """Bipartite wallet-pairs-style fixture with several known components."""
    import pandas as pd
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.pipelines.edges import (
        build_graph_from_edges,
        edges_from_pairs,
    )

    # users u0..u9 → deposits d0..d3; components: {u0,u1,u2,d0},
    # {u3,u4,d1,d2} (d1,d2 bridged by u4), {u5,d3}, and u6→u5 chain edge
    pairs = pd.DataFrame(
        {
            "x": ["u0", "u1", "u2", "u3", "u4", "u4", "u5", "u6"],
            "y": ["d0", "d0", "d0", "d1", "d1", "d2", "d3", "u5"],
        }
    )
    d = str(tmp_path_factory.mktemp("pairs") / "g")
    build_graph_from_edges(edges_from_pairs(rd.from_pandas(pairs), "x", "y"), d, 4)
    yield d, pairs
    shutil.rmtree(d, ignore_errors=True)
