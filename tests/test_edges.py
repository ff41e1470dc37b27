"""Edge-table build: dedup, determinism, partition invariants."""

import numpy as np
import pyarrow.dataset as pads

from cryptowalletcommunitydetection_ray.pipelines.edges import (
    dedup_edges,
    extract_edges,
    read_meta,
    read_part,
)
from cryptowalletcommunitydetection_ray.sources.pages import synth_pages


def test_edges_are_deduped(graph300, graph300_edges):
    assert len(set(graph300_edges)) == len(graph300_edges)


def test_meta_counts(graph300):
    meta = read_meta(graph300)
    t = pads.dataset(f"{graph300}/edges", partitioning="hive").to_table()
    assert meta["num_edges"] == t.num_rows
    assert meta["P"] == 4


def test_partition_invariant_src_mod_p(graph300):
    for p in range(4):
        t = read_part(graph300, "edges", p, ["src"])
        if t.num_rows:
            src = np.asarray(t["src"].to_numpy()).astype(np.uint64)
            assert (src % 4 == p).all()
        tu = read_part(graph300, "edges_und", p, ["src"])
        if tu.num_rows:
            src = np.asarray(tu["src"].to_numpy()).astype(np.uint64)
            assert (src % 4 == p).all()
        tv = read_part(graph300, "vertices", p, ["vid"])
        if tv.num_rows:
            vid = np.asarray(tv["vid"].to_numpy()).astype(np.uint64)
            assert (vid % 4 == p).all()


def test_vertices_cover_all_endpoints(graph300, graph300_edges):
    verts = pads.dataset(f"{graph300}/vertices", partitioning="hive").to_table()
    vids = set(verts["vid"].to_pylist())
    for s, d in graph300_edges:
        assert s in vids and d in vids
    # and vids are unique
    assert len(vids) == verts.num_rows


def test_und_artifact_symmetric(graph300):
    t = pads.dataset(f"{graph300}/edges_und", partitioning="hive").to_table(
        columns=["src", "dst"]
    )
    pairs = set(zip(t["src"].to_pylist(), t["dst"].to_pylist()))
    assert all((d, s) in pairs for s, d in pairs)


def test_extraction_deterministic_across_partitionings(ray_session):
    a = (
        dedup_edges(extract_edges(synth_pages(120, seed=7)), 4)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    b = (
        dedup_edges(extract_edges(synth_pages(120, seed=7, override_num_blocks=5)), 8)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert a[["src", "dst"]].equals(b[["src", "dst"]])
