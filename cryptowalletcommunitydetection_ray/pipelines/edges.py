"""Pages → deduplicated edge table → hash-partitioned graph artifacts.

The engine analog of the reference's transaction-edge extraction
(``databases/blockchain_etl.py:33-79``: from_address→to_address events with a
validity predicate) and tx-hash set dedup (``models/lp_transaction.py:9-13``):

  1. ``extract_edges``: ``map_batches`` over zero-copy Arrow pages batches,
     running the pinned outlink extractor per page and exploding to
     ``(src, dst, src_url, dst_url)`` rows (vids = deterministic 64-bit url
     hashes, no coordination).
  2. ``dedup`` on ``(src, dst)`` via hash-partitioned vectorized dedup.
  3. ``build_graph``: writes resumable, hive-partitioned parquet artifacts —

        graph_dir/edges/part=p/      directed, deduped, partition = src % P
        graph_dir/edges_und/part=p/  both directions, deduped, part = src % P
        graph_dir/vertices/part=p/   (vid, url, host), partition = vid % P
        graph_dir/meta.json          {P, num_edges, num_vertices, lineage}

     Each CSR shard actor later reads ONLY its ``part=p`` directory — the
     partitioned write is the single up-front shuffle the iterative kernels
     amortize over all supersteps.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..context import hash64
from ..functions.extract import extract_links, host_of, normalize_url
from ..stages.dedup import exact_dedup


def extract_edges(pages: rd.Dataset, drop_self_links: bool = False) -> rd.Dataset:
    """Explode pages into raw (src, dst, src_url, dst_url) link rows."""

    def explode(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        src_urls: list[str] = []
        dst_urls: list[str] = []
        for u, h in zip(urls, htmls):
            su = normalize_url(u)
            for d in extract_links(h, su):
                if drop_self_links and d == su:
                    continue
                src_urls.append(su)
                dst_urls.append(d)
        return pa.table(
            {
                "src": pa.array(hash64(src_urls), pa.int64()),
                "dst": pa.array(hash64(dst_urls), pa.int64()),
                "src_url": pa.array(src_urls, pa.string()),
                "dst_url": pa.array(dst_urls, pa.string()),
            }
        )

    return pages.select_columns(["url", "html"]).map_batches(
        explode, batch_format="pyarrow", batch_size=1024, zero_copy_batch=True
    )


def edges_from_pairs(pairs: rd.Dataset, x_col: str, y_col: str) -> rd.Dataset:
    """Raw edge Dataset from a generic two-string-column edge list — the
    wallet-pairs CSV analog (``cli/export_transactions.py:26``, CSV columns
    ``x``/``y``).  Values share one namespace (as in the reference, where
    from/to addresses are all wallet addresses)."""

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].astype(str).to_numpy()
        y = df[y_col].astype(str).to_numpy()
        return pd.DataFrame(
            {
                "src": hash64(x),
                "dst": hash64(y),
                "src_url": x,
                "dst_url": y,
            }
        )

    return pairs.select_columns([x_col, y_col]).map_batches(
        to_edges, batch_format="pandas"
    )


def edges_from_vid_pairs(pairs: rd.Dataset, src_col: str, dst_col: str) -> rd.Dataset:
    """Raw edge Dataset from two INTEGER id columns — vids are the ids
    themselves (no hashing), so SQL oracles can reproduce labels/counts
    arithmetically.  Urls are the decimal string forms."""

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        s = df[src_col].to_numpy().astype(np.int64)
        d = df[dst_col].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "src": s,
                "dst": d,
                "src_url": s.astype(str),
                "dst_url": d.astype(str),
            }
        )

    return pairs.select_columns([src_col, dst_col]).map_batches(
        to_edges, batch_format="pandas"
    )


def dedup_edges(raw_edges: rd.Dataset, num_partitions: int = 64) -> rd.Dataset:
    """Exact global dedup on (src, dst) — the edge-identity contract (F2)."""
    return exact_dedup(raw_edges, ["src", "dst"], num_partitions=num_partitions)


def _side(df: pd.DataFrame, vid: str, url: str, rank: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "vid": df[vid].to_numpy(),
            "url": df[url].to_numpy(),
            # 0 = appeared as src, 1 = as dst; dedup keeps the min, so any
            # vertex with at least one outgoing edge ends with side_rank 0
            "side_rank": np.full(len(df), rank, dtype=np.int8),
        }
    )


def _vertices_from_edges(edge_table: rd.Dataset, num_partitions: int) -> rd.Dataset:
    srcs = edge_table.map_batches(
        lambda df: _side(df, "src", "src_url", 0), batch_format="pandas"
    )
    dsts = edge_table.map_batches(
        lambda df: _side(df, "dst", "dst_url", 1), batch_format="pandas"
    )
    verts = exact_dedup(
        srcs.union(dsts),
        ["vid"],
        num_partitions=num_partitions,
        keep_order_col="side_rank",
    )

    def add_attrs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["host"] = [host_of(u) for u in df["url"]]
        # "user" side of the reference's bipartite split: has an out-edge
        # (appears in the distinct-src list, wallet_clustering.py:53)
        df["is_user"] = df["side_rank"].to_numpy() == 0
        return df.drop(columns=["side_rank"])

    return verts.map_batches(add_attrs, batch_format="pandas")


def _write_partitioned(
    ds: rd.Dataset, path: str, part_key: str, num_partitions: int
) -> None:
    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = (
            df[part_key].to_numpy().astype(np.uint64) % np.uint64(num_partitions)
        ).astype(np.int32)
        return df

    ds.map_batches(add_part, batch_format="pandas").write_parquet(
        path, partition_cols=["part"]
    )


def _count_rows(path: str) -> int:
    import pyarrow.dataset as pads

    return pads.dataset(path, format="parquet", partitioning="hive").count_rows()


def build_graph_from_edges(
    raw_edges: rd.Dataset,
    graph_dir: str,
    num_partitions: int = 8,
    *,
    lineage: dict | None = None,
) -> dict:
    """Materialize all graph artifacts from a raw (src, dst, src_url,
    dst_url) Dataset; returns the meta dict."""
    os.makedirs(graph_dir, exist_ok=True)
    # the raw edge stream is consumed exactly ONCE; everything else derives
    # from the written edge-table parquet (columnar reads of needed columns)
    edges = dedup_edges(raw_edges, num_partitions=num_partitions)
    _write_partitioned(edges, f"{graph_dir}/edges", "src", num_partitions)

    edges_sd = rd.read_parquet(f"{graph_dir}/edges", columns=["src", "dst"])

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": np.concatenate([df["src"].to_numpy(), df["dst"].to_numpy()]),
                "dst": np.concatenate([df["dst"].to_numpy(), df["src"].to_numpy()]),
            }
        )

    und = exact_dedup(
        edges_sd.map_batches(both_dirs, batch_format="pandas"),
        ["src", "dst"],
        num_partitions=num_partitions,
    )
    _write_partitioned(und, f"{graph_dir}/edges_und", "src", num_partitions)

    edge_table = rd.read_parquet(
        f"{graph_dir}/edges", columns=["src", "dst", "src_url", "dst_url"]
    )
    verts = _vertices_from_edges(edge_table, num_partitions)
    _write_partitioned(verts, f"{graph_dir}/vertices", "vid", num_partitions)

    meta = {
        "P": num_partitions,
        "num_edges": _count_rows(f"{graph_dir}/edges"),
        "num_edges_und": _count_rows(f"{graph_dir}/edges_und"),
        "num_vertices": _count_rows(f"{graph_dir}/vertices"),
        "lineage": lineage or {},
    }
    with open(f"{graph_dir}/meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def build_graph(
    pages: rd.Dataset,
    graph_dir: str,
    num_partitions: int = 8,
    *,
    lineage: dict | None = None,
) -> dict:
    """pages → extraction → graph artifacts (extraction runs exactly once)."""
    return build_graph_from_edges(
        extract_edges(pages), graph_dir, num_partitions, lineage=lineage
    )


def read_meta(graph_dir: str) -> dict:
    with open(f"{graph_dir}/meta.json") as f:
        return json.load(f)


def read_part(graph_dir: str, artifact: str, part: int, columns=None) -> pa.Table:
    """Read one hash partition of an artifact (used inside shard actors)."""
    path = f"{graph_dir}/{artifact}/part={part}"
    if not os.path.isdir(path):
        return pa.table({c: pa.array([], pa.int64()) for c in (columns or [])})
    return pq.read_table(path, columns=columns)
