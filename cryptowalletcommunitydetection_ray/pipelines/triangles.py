"""Per-vertex triangle counting via degree-ordered wedge join.

North-rule addition (no triangle op in the reference; reuses the G1/G2
partitioning machinery — SURVEY.md §2.7).  Algorithm (the standard
O(m^{3/2}) compact-forward scheme, expressed in Ray Data):

  1. canonical edges: undirected artifact filtered to ``src < dst``
     (drops self-loops and the mirror duplicates);
  2. degree census: two-phase count (per-batch partial sums, then a small
     ``groupby(vid)`` over partials — the skew-safe pattern);
  3. orient every edge from the endpoint that is smaller in the total order
     ``(degree, vid)`` to the larger — bounds oriented out-degree by
     O(sqrt(m)), which bounds the wedge blowup at hub vertices (the
     explicit skew handling the north rule demands);
  4. wedges: hash-partition by apex, per-partition *vectorized* pandas
     self-merge (no per-vertex Python loop) emitting candidate closing
     pairs (x, y), x < y in the orientation order;
  5. close: hash-join wedges against canonical edges on (x, y) — each match
     is exactly one triangle (the apex is the order-minimal vertex);
  6. per-vertex counts: explode the 3 corners, two-phase count again; left
     join back onto vertices so triangle-free vertices report 0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd
from ray.data.aggregate import Sum

from ..context import enforce_schema, rename_cols, sanitize_for_join
from .edges import read_meta

_PART = "__part"


def _canonical_edges(graph_dir: str) -> rd.Dataset:
    edges = rd.read_parquet(f"{graph_dir}/edges_und", columns=["src", "dst"])

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["src"] < df["dst"]]

    return edges.map_batches(canon, batch_format="pandas")


def _degree_census(canon: rd.Dataset) -> rd.Dataset:
    """(vid, deg) via per-batch partial counts + small groupby-sum."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        both = np.concatenate([df["src"].to_numpy(), df["dst"].to_numpy()])
        u, c = np.unique(both, return_counts=True)
        return pd.DataFrame({"vid": u, "partial": c.astype(np.int64)})

    import pyarrow as pa

    return sanitize_for_join(
        canon.map_batches(partial, batch_format="pandas")
        .groupby("vid")
        .aggregate(Sum("partial", alias_name="deg")),
        pa.schema([("vid", pa.int64()), ("deg", pa.int64())]),
    )


def triangle_counts(
    graph_dir: str, *, num_partitions: int | None = None
) -> tuple[rd.Dataset, dict]:
    """Returns (Dataset(vid: uint64, triangles: int64), metrics)."""
    meta = read_meta(graph_dir)
    P = num_partitions or meta["P"]

    canon = _canonical_edges(graph_dir)
    deg = _degree_census(canon)

    # orient: join degree onto both endpoints, then order by (deg, vid)
    e1 = canon.join(
        rename_cols(deg, {"vid": "src", "deg": "deg_src"}), "inner", P, on=("src",)
    )
    e2 = e1.join(
        rename_cols(deg, {"vid": "dst", "deg": "deg_dst"}), "inner", P, on=("dst",)
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        s, d = df["src"].to_numpy(), df["dst"].to_numpy()
        ds_, dd = df["deg_src"].to_numpy(), df["deg_dst"].to_numpy()
        src_first = (ds_ < dd) | ((ds_ == dd) & (s < d))
        lo = np.where(src_first, s, d)
        hi = np.where(src_first, d, s)
        out = pd.DataFrame({"apex": lo.astype(np.int64), "nbr": hi.astype(np.int64)})
        out[_PART] = (out["apex"].to_numpy().astype(np.uint64) % np.uint64(P)).astype(np.int32)
        return out

    oriented = e2.map_batches(orient, batch_format="pandas")

    # wedges: per-apex neighbor pairs, vectorized self-merge per partition.
    # Orientation order within a wedge is pinned by (deg, vid) rank of the
    # two neighbors — but the closing edge lookup uses canonical (min,max)
    # vid order, so emit (x=min(v,w), y=max(v,w)).
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        df = g[["apex", "nbr"]]
        m = df.merge(df, on="apex")
        m = m[m["nbr_x"] < m["nbr_y"]]
        return pd.DataFrame(
            {
                "apex": m["apex"].to_numpy(),
                "x": np.minimum(m["nbr_x"].to_numpy(), m["nbr_y"].to_numpy()),
                "y": np.maximum(m["nbr_x"].to_numpy(), m["nbr_y"].to_numpy()),
            }
        )

    import pyarrow as pa

    wedge_ds = sanitize_for_join(
        oriented.groupby(_PART).map_groups(wedges, batch_format="pandas"),
        pa.schema([("apex", pa.int64()), ("x", pa.int64()), ("y", pa.int64())]),
    )

    closing = rename_cols(canon, {"src": "x", "dst": "y"})
    tris = wedge_ds.join(closing, "inner", P, on=("x", "y"))

    def corners(df: pd.DataFrame) -> pd.DataFrame:
        vids = np.concatenate(
            [df["apex"].to_numpy(), df["x"].to_numpy(), df["y"].to_numpy()]
        )
        u, c = np.unique(vids, return_counts=True)
        return pd.DataFrame({"vid": u, "partial": c.astype(np.int64)})

    counts = enforce_schema(
        tris.map_batches(corners, batch_format="pandas")
        .groupby("vid")
        .aggregate(Sum("partial", alias_name="triangles")),
        pa.schema([("vid", pa.int64()), ("triangles", pa.int64())]),
    )

    # zero-fill triangle-free vertices via union + groupby-sum (a left-outer
    # join on sparse partitions trips a Ray 2.49 empty-partition join bug)
    verts = rd.read_parquet(f"{graph_dir}/vertices", columns=["vid"])
    zeros = verts.map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "triangles": pa.array(np.zeros(t.num_rows, np.int64))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    result = enforce_schema(
        zeros.union(counts)
        .groupby("vid")
        .aggregate(Sum("triangles", alias_name="triangles")),
        pa.schema([("vid", pa.int64()), ("triangles", pa.int64())]),
    )
    return result, {"algorithm": "triangles", "P": P}
