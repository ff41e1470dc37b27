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

        graph_dir/edges/part=s/      directed+urls, deduped, s = src % SP
        graph_dir/edges_und/part=s/  both directions, deduped, s = src % SP
        graph_dir/vertices/part=s/   (vid, url, host, is_user), s = vid % SP
        graph_dir/meta.json          {P: SP, num_edges, num_vertices, lineage}

     A kernel pool of any size P dividing SP later reads, per shard, the
     union of subpartitions ≡ p (mod P) — one artifact layout serves every
     cluster size, and the partitioned write is the single up-front shuffle
     the iterative kernels amortize over all supersteps.
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
from ..functions.extract import extract_links, hosts_of, normalize_url
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
    from/to addresses are all wallet addresses).

    CSV note: Arrow's CSV reader type-infers 0x-prefixed hex strings as
    INTEGERS — pin address columns to string via
    ``read_csv(..., convert_options=pyarrow.csv.ConvertOptions(
    column_types={"x": pa.string(), "y": pa.string()}))``."""

    def to_edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.combine_chunks()
        x = pc.cast(t[x_col], pa.string())
        y = pc.cast(t[y_col], pa.string())
        return pa.table(
            {
                "src": pa.array(hash64(x.to_numpy(zero_copy_only=False))),
                "dst": pa.array(hash64(y.to_numpy(zero_copy_only=False))),
                "src_url": x,
                "dst_url": y,
            }
        )

    return pairs.select_columns([x_col, y_col]).map_batches(
        to_edges, batch_format="pyarrow"
    )


def edges_from_vid_pairs(pairs: rd.Dataset, src_col: str, dst_col: str) -> rd.Dataset:
    """Raw edge Dataset from two INTEGER id columns — vids are the ids
    themselves (no hashing), so SQL oracles can reproduce labels/counts
    arithmetically.  Urls are the decimal string forms."""

    def to_edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.cast(t[src_col], pa.int64())
        d = pc.cast(t[dst_col], pa.int64())
        return pa.table(
            {
                "src": s,
                "dst": d,
                "src_url": pc.cast(s, pa.string()),
                "dst_url": pc.cast(d, pa.string()),
            }
        )

    return pairs.select_columns([src_col, dst_col]).map_batches(
        to_edges, batch_format="pyarrow"
    )


def dedup_edges(raw_edges: rd.Dataset, num_partitions: int = 64) -> rd.Dataset:
    """Exact global dedup on (src, dst) — the edge-identity contract (F2)."""
    return exact_dedup(raw_edges, ["src", "dst"], num_partitions=num_partitions)






def build_graph_from_edges(
    raw_edges: rd.Dataset,
    graph_dir: str,
    num_partitions: int = 8,
    *,
    lineage: dict | None = None,
) -> dict:
    """Materialize all graph artifacts from a raw (src, dst, src_url,
    dst_url) Dataset; returns the meta dict.

    ONE shuffle total: each raw edge is tagged into TWO routed rows —
    a BOTH row (the directed edge AND its src-side undirected orientation
    in one: → subpartition src%SP, carrying both urls) and a REV row (the
    dst-side undirected orientation: → dst%SP, carrying the dst url, and
    only on the batch's FIRST occurrence of that dst — repeats ship null,
    since the url is only needed once per vertex per partition) — then a
    single ``groupby(part)`` delivers every subpartition's rows to one
    task, which dedups each artifact vectorized, DERIVES the vertex table
    from the rows it receives (every vertex appears as row-src in its own
    subpartition; any BOTH row = appears as a directed src = is_user), and
    writes its partition files directly (tmp + atomic rename, so a crashed
    build never leaves a half-written partition and a re-run is idempotent
    — tested in tests/test_properties.py).  Partition counts come back as
    the group results — no post-hoc metadata scans.

    Shuffle-byte accounting (the engine's ONE all-to-all, the measured
    single-box bottleneck at the 8 M-page corpus — BASELINE.md batch
    r5l): vs the previous 3-rows/edge layout this ships 2 rows and
    ~2.1 url payloads per edge instead of 3 rows / 4 url payloads —
    roughly a 35-45 % byte cut at mean-url-length ≈ row-overhead scale.

    ``num_partitions`` here is SP, the STORAGE subpartition count: it sets
    reduce-stage parallelism and bounds per-task memory (a subpartition's
    ~3× edge rows must fit a worker heap — at 100 TB choose SP so
    edges/SP ≈ a few GB).  Kernel pools later pick any divisor of SP for
    their shard count (see ``read_shard``).
    """
    os.makedirs(graph_dir, exist_ok=True)
    # a rebuilt graph invalidates any cached shard pool for this dir
    from ..state.pool import close_pool

    close_pool(graph_dir)
    P = num_partitions

    # kind doubles as the vertex side rank: BOTH rows (0) mean the row's
    # src endpoint appears as a DIRECTED src (is_user); REV rows (1) mean
    # it appears only as a destination.
    KIND_BOTH, KIND_REV = 0, 1

    def _first_uniq_pairs(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Indices of the FIRST occurrence of each distinct (x, y) pair, in
        original order — drop_duplicates semantics over just the two int64
        key columns (pandas' HASH-based duplicated(), ~5x faster than a
        sort-based np.unique at this width; the string payload columns
        never leave Arrow)."""
        dup = pd.DataFrame({"x": x, "y": y}).duplicated().to_numpy()
        return np.flatnonzero(~dup)

    def _plain(col) -> pa.Array:
        """Table column → single plain Array (pa.chunked_array() over
        ChunkedArrays is pathologically slow — ~1.3 s per 800 k-row string
        column vs ~0 for plain Arrays, measured)."""
        if isinstance(col, pa.ChunkedArray):
            if col.num_chunks == 1:
                return col.chunk(0)
            return (
                pa.concat_arrays(col.chunks)
                if col.num_chunks
                else pa.array([], type=col.type)
            )
        return col

    def tag(t: pa.Table) -> pa.Table:
        # local pre-dedup shrinks the shuffle; Arrow-native throughout —
        # the url strings are take'd/concatenated as Arrow buffers and
        # never become Python objects (this stage touches every edge 2x)
        import pyarrow.compute as pc

        s0 = t["src"].to_numpy(zero_copy_only=False)
        d0 = t["dst"].to_numpy(zero_copy_only=False)
        keep = _first_uniq_pairs(s0, d0)
        t = t.combine_chunks().take(pa.array(keep))
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        su, du = _plain(t["src_url"]), _plain(t["dst_url"])
        n = len(t)
        # 2 routed rows per edge: the BOTH row (directed edge + src-side
        # und orientation, with both urls) and the REV row (dst-side und
        # orientation, carrying the dst url only on the batch's first
        # occurrence of that dst — a vertex url is needed once per
        # partition, not once per in-edge).  Partition p's vertex table is
        # derived from the rows it receives (every vertex appears as
        # row-src in its own partition), so no separate vertex rows travel.
        a = np.concatenate([s, d])
        b = np.concatenate([d, s])
        du_first = ~pd.Series(d).duplicated().to_numpy()
        du_masked = pc.if_else(
            pa.array(du_first), du, pa.scalar(None, pa.string())
        )
        url = pa.chunked_array([su, du_masked])
        url2 = pa.chunked_array([du, pa.nulls(n, pa.string())])
        kind = np.repeat(np.array([KIND_BOTH, KIND_REV], np.int8), n)
        part = (a.astype(np.uint64) % np.uint64(P)).astype(np.int32)
        return pa.table(
            {
                "part": pa.array(part),
                "kind": pa.array(kind),
                "a": pa.array(a),
                "b": pa.array(b),
                "url": url,
                "url2": url2,
            }
        )

    def write_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = g.combine_chunks()
        p = int(g["part"][0].as_py())
        kind = g["kind"].to_numpy(zero_copy_only=False)
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        counts = {}
        e_rows = np.flatnonzero(kind == KIND_BOTH)
        e_idx = e_rows[_first_uniq_pairs(a[e_rows], b[e_rows])]
        e = g.take(pa.array(e_idx))
        _atomic_write(
            f"{graph_dir}/edges/part={p}",
            pa.table(
                {
                    "src": e["a"],
                    "dst": e["b"],
                    "src_url": e["url"],
                    "dst_url": e["url2"],
                }
            ),
        )
        counts["e"] = len(e)
        # und: EVERY row carries one orientation — BOTH rows (src,dst),
        # REV rows (dst,src) — so the und artifact is a dedup over all rows
        u_idx = _first_uniq_pairs(a, b)
        u = g.take(pa.array(u_idx))
        _atomic_write(
            f"{graph_dir}/edges_und/part={p}",
            pa.table({"src": u["a"], "dst": u["b"]}),
        )
        counts["u"] = len(u)
        # vertices: min kind per vid = side rank (any BOTH row ⇒ the vid
        # appears as a directed src ⇒ is_user); url from a non-null row of
        # that minimal kind (BOTH urls are never null; a REV-only vid has
        # ≥1 non-null row — each batch ships its first occurrence's url,
        # and all of a vid's rows land in this partition).  lexsort
        # (primary kind, secondary nulls-last) + first-occurrence-per-vid.
        url_null = pc.is_null(_plain(g["url"])).to_numpy(zero_copy_only=False)
        order = np.lexsort((url_null, kind))
        _, first = np.unique(a[order], return_index=True)
        v_idx = order[first]  # output ordered by vid asc
        v = g.take(pa.array(v_idx))
        urls = v["url"].combine_chunks()
        if isinstance(urls, pa.ChunkedArray):
            urls = (
                pa.concat_arrays(urls.chunks)
                if urls.num_chunks
                else pa.array([], type=pa.string())
            )
        _atomic_write(
            f"{graph_dir}/vertices/part={p}",
            pa.table(
                {
                    "vid": v["a"],
                    "url": urls,
                    "host": hosts_of(urls),
                    "is_user": pa.array(kind[v_idx] == KIND_BOTH),
                }
            ),
        )
        counts["v"] = len(v_idx)
        return pa.table(
            {
                "part": pa.array([p], pa.int64()),
                "n_e": pa.array([counts["e"]], pa.int64()),
                "n_u": pa.array([counts["u"]], pa.int64()),
                "n_v": pa.array([counts["v"]], pa.int64()),
            }
        )

    counts = (
        raw_edges.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(write_part, batch_format="pyarrow")
        .to_pandas()
    )
    meta = {
        "P": P,
        "num_edges": int(counts["n_e"].sum()),
        "num_edges_und": int(counts["n_u"].sum()),
        "num_vertices": int(counts["n_v"].sum()),
        "lineage": lineage or {},
    }
    with open(f"{graph_dir}/meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def _atomic_write(part_dir: str, table: pa.Table) -> None:
    os.makedirs(part_dir, exist_ok=True)
    tmp = f"{part_dir}/.data.parquet.tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, f"{part_dir}/data.parquet")


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


def read_shard(
    graph_dir: str, artifact: str, shard: int, nshards: int, columns=None
) -> pa.Table:
    """Read shard ``shard`` of ``nshards`` from an artifact written with SP
    subpartitions: the union of subpartitions ``s ≡ shard (mod nshards)``.

    Because subpartitioning is ``key % SP`` and ``nshards`` divides SP,
    every key with ``key % nshards == shard`` lands in exactly those
    subpartitions — so ONE artifact layout (SP fixed at build time, sized
    for storage/reduce parallelism) serves pools of any divisor size
    (sized for the cluster)."""
    sp = read_meta(graph_dir)["P"]
    if sp % nshards != 0:
        raise ValueError(f"pool size {nshards} must divide SP={sp}")
    tables = []
    for s in range(shard, sp, nshards):
        t = read_part(graph_dir, artifact, s, columns)
        if t.num_rows:
            tables.append(t)
    if not tables:
        return pa.table({c: pa.array([], pa.int64()) for c in (columns or [])})
    return pa.concat_tables(tables)


def read_part(graph_dir: str, artifact: str, part: int, columns=None) -> pa.Table:
    """Read one hash subpartition of an artifact."""
    path = f"{graph_dir}/{artifact}/part={part}"
    if not os.path.isdir(path):
        return pa.table({c: pa.array([], pa.int64()) for c in (columns or [])})
    return pq.read_table(path, columns=columns)
