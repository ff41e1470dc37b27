"""Community detection — the reference's core wallet-community semantics.

Re-expresses ``services/wallet_clustering.py:10-65`` (networkx on the
driver) as a distributed pipeline:

  1. connected components over the (undirected view of the) edge table —
     ``get_group`` / ``nx.connected_components`` (:12-18);
  2. per-component bipartite split into "user" members (vertices that
     appear on the *source* side of any edge — the reference's
     ``specific_list = df.from_address.unique()``, :53) and "deposit"
     members (:31-48);
  3. one output row per community with sorted member lists, sizes
     ``num_user``/``num_depo`` (:56-58), a ``chain`` tag (:64) and a
     DETERMINISTIC ``_id`` = min member vid (replacing uuid4 at :33,65 so
     results are testable);
  4. optional per-community edge list (``Edges``, :24-25).

In the web re-expression, "user" = source page url and "deposit" = shared
link-target url/host; the pipeline itself is input-agnostic: any raw edge
Dataset works (pages outlinks via ``extract_edges``, or a wallet-pairs CSV
via ``edges_from_pairs``).

Scale notes: member collection is a single hash-partition shuffle of the
(small) vertex table, not of the edge table — labels route to
``num_partitions`` groups (size-scaled by default, see
``relational._resolve_partitions``) and EVERY community of a partition
collects in one vectorized call (segment offsets → Arrow ListArrays —
``large_members=True`` selects ``large_list``/int64 offsets uniformly
when a partition's member rows can overflow int32, no per-label Python);
the edge-list variant
reshuffles edges once and is optional.
``top_communities`` re-expresses the reference's Mongo group query + sort
(``databases/mongodb.py:259-275``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .components import connected_components
from ..context import rename_cols
from .edges import read_meta


def _collect_communities(
    tagged: rd.Dataset,
    chain: str,
    require_both_sides: bool = True,
    num_partitions: int | None = None,
    large_members: bool = False,
) -> rd.Dataset:
    """(vid, url, is_user, label) rows → one row per community.

    ``require_both_sides`` pins the reference's semantics: ``get_user_depo``
    merges the user and deposit lists with an INNER join
    (``services/wallet_clustering.py:47``), so a component with zero
    deposit members (e.g. a pure src-src cycle) never emits a row; pass
    ``False`` to keep every component.

    ``large_members`` selects ``large_list`` (int64 offsets) member
    columns for corpora where one hash partition's member rows can exceed
    2³¹ (possible at 10¹²-edge scale).  The choice is a PARAMETER, not a
    per-task auto-upgrade, so every task emits the same Arrow schema —
    blocks with mixed list/large_list columns would fail downstream
    unification.  Without the flag an int32 offset overflow raises
    loudly instead of silently diverging the schema."""

    # partitioned-vectorized: labels hash-route to ``num_partitions``
    # groups and EVERY community of a partition collects in one call —
    # sort by (label, url), per-label user/depo counts via bincount over
    # segment ids, member ListArrays built straight from the
    # cumulative-count offsets (the masked rows stay url-sorted within
    # each label).  No per-label Python.
    import pyarrow as pa

    from ..functions.segments import segment_bounds
    from ..stages.relational import _hash_part, _resolve_partitions

    num_partitions = _resolve_partitions(tagged, num_partitions)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["label", "url", "is_user"]].copy()
        out["__part"] = _hash_part(df["label"].to_numpy(), num_partitions)
        return out

    def collect_part(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["label", "url"], kind="mergesort")
        labels = g["label"].to_numpy()
        urls = g["url"].to_numpy()
        is_user = g["is_user"].to_numpy(dtype=bool)
        bounds = segment_bounds(labels)
        lens = np.diff(bounds)
        seg_of_row = np.repeat(np.arange(len(lens)), lens)
        num_user = np.bincount(
            seg_of_row[is_user], minlength=len(lens)
        ).astype(np.int64)
        num_depo = lens - num_user
        keep = (
            (num_user > 0) & (num_depo > 0)
            if require_both_sides  # reference inner-join semantics
            else np.ones(len(lens), dtype=bool)
        )
        row_kept = keep[seg_of_row] if len(g) else np.zeros(0, bool)
        u_vals = urls[row_kept & is_user]
        d_vals = urls[row_kept & ~is_user]
        u_off = np.r_[0, np.cumsum(num_user[keep])]
        d_off = np.r_[0, np.cumsum(num_depo[keep])]
        n_out = int(keep.sum())

        # list<int32 offsets> by default (the schema every oracle pins);
        # large_list/int64 when the caller opted in — uniform across ALL
        # tasks either way (ADVICE r4 / review r5: a per-task auto-upgrade
        # emits mixed schemas exactly when the overflow it handles occurs)
        def _list_arr(off: np.ndarray, vals: np.ndarray) -> pa.Array:
            if large_members:
                return pa.LargeListArray.from_arrays(
                    pa.array(off.astype(np.int64)),
                    pa.array(vals, pa.string()),
                )
            if len(off) and off[-1] > np.iinfo(np.int32).max:
                raise OverflowError(
                    "community member list overflows int32 offsets in one "
                    "hash partition; re-run with large_members=True (and/or "
                    "a larger num_partitions)"
                )
            return pa.ListArray.from_arrays(
                pa.array(off.astype(np.int32)), pa.array(vals, pa.string())
            )

        return pa.table(
            {
                "_id": pa.array(
                    labels[bounds[:-1]][keep].astype(np.int64), pa.int64()
                ),
                "user_wallets": _list_arr(u_off, u_vals),
                "deposit_wallets": _list_arr(d_off, d_vals),
                "num_user": pa.array(num_user[keep], pa.int64()),
                "num_depo": pa.array(num_depo[keep], pa.int64()),
                "chain": pa.array([chain] * n_out, pa.string()),
            }
        )

    return (
        tagged.map_batches(add_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(collect_part, batch_format="pandas")
    )


def community_members_from_pool(
    graph_dir: str,
    *,
    chain: str = "web",
    pool_size: int | None = None,
    require_both_sides: bool = True,
    large_members: bool = False,
) -> rd.Dataset:
    """Fast path: read labeled vertices straight out of the converged CC
    shard states — the label⋈attributes "join" is partition-local and free
    (requires ``connected_components`` to have just run on this graph with
    the SAME pool size)."""
    import ray

    from ..state.pool import get_pool

    shards, _ = get_pool(graph_dir, pool_size)
    if not all(ray.get([s.has_kernel.remote("cc") for s in shards])):
        raise RuntimeError(
            "community_members_from_pool: no converged CC state in this "
            "pool — run connected_components(graph_dir, pool_size=...) with "
            "the same pool size first"
        )
    tagged = rd.from_arrow_refs(
        [s.call.remote("cc", "get_labeled_vertices") for s in shards]
    )
    return _collect_communities(
        tagged, chain, require_both_sides, large_members=large_members
    )


def community_sizes(
    graph_dir: str,
    *,
    chain: str = "web",
    pool_size: int | None = None,
    require_both_sides: bool = True,
) -> rd.Dataset:
    """Scalable community summary: (_id, num_user, num_depo, chain) — the
    membership TABLE stays distributed (labels in shard state / parquet);
    only per-component counts aggregate.  At 10^12 docs this is the usable
    output shape (a giant component's member LIST is not); two-phase sums,
    so the giant component costs O(P), not O(members)."""
    import ray
    from ray.data.aggregate import Sum

    from ..state.pool import get_pool

    shards, _ = get_pool(graph_dir, pool_size)
    if not all(ray.get([s.has_kernel.remote("cc") for s in shards])):
        raise RuntimeError("run connected_components on this pool first")
    tagged = rd.from_arrow_refs(
        [s.call.remote("cc", "get_labeled_vertices") for s in shards]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["is_user"].to_numpy(dtype=bool).astype(np.int64)
        out = (
            pd.DataFrame({"label": df["label"], "u": u, "d": 1 - u})
            .groupby("label", sort=False)
            .sum()
            .reset_index()
        )
        return out

    agg = (
        tagged.map_batches(partial, batch_format="pandas")
        .groupby("label")
        .aggregate(
            Sum("u", alias_name="num_user"), Sum("d", alias_name="num_depo")
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if require_both_sides:  # reference inner-join semantics (see
            # _collect_communities docstring)
            df = df[(df["num_user"] > 0) & (df["num_depo"] > 0)]
        return pd.DataFrame(
            {
                "_id": df["label"].to_numpy(),
                "num_user": df["num_user"].to_numpy(),
                "num_depo": df["num_depo"].to_numpy(),
                "chain": [chain] * len(df),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def community_members(
    graph_dir: str,
    labels: rd.Dataset,
    *,
    chain: str = "web",
    num_partitions: int | None = None,
    require_both_sides: bool = True,
    large_members: bool = False,
) -> rd.Dataset:
    """Join CC labels with vertex attributes and collect one row per
    community.

    Returns ``(_id: uint64, user_wallets: list<str>, deposit_wallets:
    list<str>, num_user: int64, num_depo: int64, chain: str)`` with member
    lists sorted (pinned deterministic order).
    """
    meta = read_meta(graph_dir)
    P = num_partitions or meta["P"]

    # the "user" side flag (appears in the distinct-src list —
    # wallet_clustering.py:53) is a build-time vertex attribute, so community
    # collection needs exactly ONE hash join (labels onto vertices)
    verts = rd.read_parquet(
        f"{graph_dir}/vertices", columns=["vid", "url", "is_user"]
    )
    tagged = verts.join(labels, "inner", P, on=("vid",))
    return _collect_communities(
        tagged,
        chain,
        require_both_sides,
        num_partitions=num_partitions,
        large_members=large_members,
    )


def community_edges(
    graph_dir: str, labels: rd.Dataset, num_partitions: int | None = None
) -> rd.Dataset:
    """Per-community edge lists (the reference's ``Edges`` column,
    ``services/wallet_clustering.py:24-25``) — one full edge-table shuffle,
    hence a separate optional pipeline."""
    meta = read_meta(graph_dir)
    P = meta["P"]
    edges = rd.read_parquet(
        f"{graph_dir}/edges", columns=["src", "dst", "src_url", "dst_url"]
    )
    lab = rename_cols(labels, {"vid": "src"})
    tagged = edges.join(lab, "inner", P, on=("src",))

    from ..functions.segments import segment_bounds
    from ..stages.relational import _hash_part, _resolve_partitions

    num_partitions = _resolve_partitions(tagged, num_partitions)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["label", "src_url", "dst_url"]].copy()
        out["__part"] = _hash_part(df["label"].to_numpy(), num_partitions)
        return out

    def collect_part(g: pd.DataFrame) -> pd.DataFrame:
        # one call per PARTITION (all labels at once): sort gives each
        # label's pairs in sorted order; cell slicing from segment bounds
        g = g.sort_values(["label", "src_url", "dst_url"], kind="mergesort")
        labels = g["label"].to_numpy()
        bounds = segment_bounds(labels)
        pairs = list(zip(g["src_url"].tolist(), g["dst_url"].tolist()))
        return pd.DataFrame(
            {
                "_id": labels[bounds[:-1]].astype(np.int64),
                "edges": [
                    pairs[lo:hi] for lo, hi in zip(bounds[:-1], bounds[1:])
                ],
            }
        )

    return (
        tagged.map_batches(add_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(collect_part, batch_format="pandas")
    )


def detect_communities(
    graph_dir: str,
    *,
    chain: str = "web",
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    pool_size: int | None = None,
) -> tuple[rd.Dataset, dict]:
    """End-to-end: CC to fixpoint, then per-community membership rows
    (the fast pool path: labels never leave their shard for the join)."""
    _, metrics = connected_components(
        graph_dir,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        pool_size=pool_size,
    )
    return community_members_from_pool(
        graph_dir, chain=chain, pool_size=pool_size
    ), metrics


def host_community_edges(graph_dir: str) -> rd.Dataset:
    """Raw page→HOST edges from the url-level edge table — the north-star
    re-expression of the reference's wallet-community semantics over web
    hosts: "user" = source page url, "deposit" = shared link-target host.
    Feed into ``build_graph_from_edges`` + ``detect_communities``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..context import hash64
    from ..functions.extract import hosts_of

    edges = rd.read_parquet(
        f"{graph_dir}/edges", columns=["src_url", "dst_url"]
    )

    def to_host_pairs(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        su = t["src_url"]
        hosts = pc.binary_join_element_wise(
            "host://", hosts_of(t["dst_url"]), ""
        )
        return pa.table(
            {
                "src": pa.array(
                    hash64(su.to_numpy(zero_copy_only=False))
                ),
                "dst": pa.array(
                    hash64(hosts.to_numpy(zero_copy_only=False))
                ),
                "src_url": su,
                "dst_url": hosts,
            }
        )

    return edges.map_batches(to_host_pairs, batch_format="pyarrow")


def top_communities(
    communities: rd.Dataset,
    *,
    min_user: int = 0,
    min_depo: int = 0,
    k: int | None = None,
) -> rd.Dataset:
    """Filter by member counts and sort desc by num_user (G6 —
    ``databases/mongodb.py:259-275``).  Ties on num_user break by _id asc
    (pinned — the reference's Mongo sort is unstable on ties; a
    deterministic total order makes the top-k cut reproducible)."""
    import pyarrow.compute as pc

    out = communities.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["num_user"], min_user),
                pc.greater_equal(t["num_depo"], min_depo),
            )
        ),
        batch_format="pyarrow",
    )
    if k is not None:
        # per-block partial top-k (the _merge_topk pattern): the global
        # sort then ranks <= k rows per block, never range-partitioning
        # the full community table
        def local_topk(t):
            idx = pc.sort_indices(
                t,
                sort_keys=[("num_user", "descending"), ("_id", "ascending")],
            )
            return t.take(idx[:k])

        out = out.map_batches(local_topk, batch_format="pyarrow")
    out = out.sort(["num_user", "_id"], descending=[True, False])
    return out.limit(k) if k is not None else out
