"""Actor-protocol triangle counting over the partitioned und-CSR shards.

Replaces a 6-shuffle Dataset expression (degree join ×2, wedge groupby,
closing-edge hash join, count groupby, zero-fill) with four routed message
volleys over the same shard actors the iterative kernels use — no Dataset
shuffles at all:

  1. **degree exchange** (request/reply): shard p already knows the EXACT
     degree of its local vertices (its und adjacency row lengths) and the
     destination-partition routing of its edges; it asks shard q only for
     the degrees of the vertices it actually references.
  2. **orientation**: each shard keeps the edges whose local endpoint is
     smaller in the total order (degree, vid) — the classic
     O(sqrt(m))-out-degree orientation that bounds wedge blowup at hub
     vertices (explicit skew handling).  Both copies of every undirected
     edge exist (one per endpoint shard), so orientation needs no edge
     movement.
  3. **wedge close**: oriented neighbor pairs (v, w) of each apex are
     routed to the shard owning min(v, w), which answers membership from
     its sorted adjacency (vectorized bisection per query) and immediately
     accumulates the count for its local corner.
  4. **corner routing**: counts for the two remote corners travel back as
     pre-aggregated (vid, count) arrays to their owning shards.

Wedges are generated and routed in apex blocks (``wedge_block``) so peak
message volume is bounded — the streaming knob for very dense shards.

Hosted as a kernel state inside ``state/csr.py:KernelShard`` (shared actor
pool; spawn/load paid once per graph).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..pipelines.edges import read_shard
from .csr import ShardData, _col


class TriangleState:
    def __init__(self, data: ShardData):
        self.data = data
        nparts = data.nparts
        t = read_shard(data.graph_dir, "edges_und", data.part, data.nparts, ["src", "dst"])
        src = _col(t, "src")
        dst = _col(t, "dst")
        keep = src != dst  # triangles ignore self-loops
        src, dst = src[keep], dst[keep]
        self.vids = data.vids
        self.n_local = len(self.vids)

        order = np.lexsort((dst, src))
        self.src_sorted = src[order]
        self.dst_sorted = dst[order]
        self.src_idx = np.searchsorted(self.vids, self.src_sorted)
        # CSR rows over local vids, adjacency sorted by dst within src
        self.indptr = np.searchsorted(self.src_idx, np.arange(self.n_local + 1))
        self.deg = np.diff(self.indptr)  # exact degree, no shuffle needed
        self.counts = np.zeros(self.n_local, dtype=np.int64)
        dst_part = (dst.astype(np.uint64) % np.uint64(nparts)).astype(np.int64)
        self.req: list[np.ndarray] = [
            np.unique(dst[dst_part == q]) for q in range(nparts)
        ]
        self.dst_deg = np.empty(len(dst), dtype=np.int64)
        self._dst_part_sorted = dst_part[order]

    # --- phase 1/2: degree exchange --------------------------------------
    def degree_requests(self):
        """Tuple of nparts request arrays — called with ``num_returns=nparts``
        so each slot stays an object-store ref routed shard→shard (the
        driver never pulls or re-ships the request arrays)."""
        return tuple(self.req)

    def degrees_for(self, vids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.vids, vids)
        return self.deg[idx]

    def set_degrees(self, replies) -> int:
        replies = ray.get(list(replies))
        for q in range(self.data.nparts):
            sel = self._dst_part_sorted == q
            if not sel.any():
                continue
            pos = np.searchsorted(self.req[q], self.dst_sorted[sel])
            self.dst_deg[sel] = replies[q][pos]
        sdeg = self.deg[self.src_idx]
        self.oriented = (sdeg < self.dst_deg) | (
            (sdeg == self.dst_deg) & (self.src_sorted < self.dst_sorted)
        )
        return int(self.oriented.sum())

    # --- phase 3: wedge generation (apex blocks) -------------------------
    def n_blocks(self, wedge_block: int) -> int:
        return max(1, int(np.ceil(self.n_local / max(1, wedge_block))))

    def wedges_for_block(self, block: int, wedge_block: int):
        """Returns nparts+1 slots: per-q (x, y, apex) arrays, then None.

        Wedges are enumerated directly from the (src, dst)-lexsorted edge
        array: within each apex's contiguous run the neighbors are sorted
        ascending and distinct, so every (i, j) index pair with i < j
        yields exactly the ordered combinations n_x < n_y — no join, no
        k² cartesian blowup, pure numpy repeat/cumsum arithmetic."""
        nparts = self.data.nparts
        lo = block * wedge_block
        hi = min(self.n_local, lo + wedge_block)
        sel = self.oriented & (self.src_idx >= lo) & (self.src_idx < hi)
        if not sel.any():
            return (*([None] * nparts), None)
        a = self.src_idx[sel]
        nb = self.dst_sorted[sel]
        n = len(a)
        change = np.flatnonzero(a[1:] != a[:-1]) + 1
        starts = np.concatenate((np.zeros(1, np.int64), change))
        k = np.diff(np.concatenate((starts, [n])))
        end_per_elem = np.repeat(starts + k, k)
        cnt = end_per_elem - np.arange(n) - 1  # right-partners per element
        total = int(cnt.sum())
        if total == 0:
            return (*([None] * nparts), None)
        i_abs = np.repeat(np.arange(n), cnt)
        run_start = np.concatenate((np.zeros(1, np.int64), np.cumsum(cnt)[:-1]))
        j_abs = np.arange(total, dtype=np.int64) - np.repeat(run_start, cnt) + i_abs + 1
        x = nb[i_abs]  # canonical: min vid of the closing pair
        y = nb[j_abs]
        apex = self.vids[a[i_abs]]
        xp = (x.astype(np.uint64) % np.uint64(nparts)).astype(np.int64)
        out = []
        for q in range(nparts):
            s = xp == q
            out.append((x[s], y[s], apex[s]) if s.any() else None)
        return (*out, None)

    # --- phase 4: membership check + corner accumulation -----------------
    def match_wedges(self, queries):
        nparts = self.data.nparts
        xs, ys, apexes = [], [], []
        for m in ray.get(list(queries)):
            if m is None:
                continue
            xs.append(m[0]); ys.append(m[1]); apexes.append(m[2])
        if not xs:
            return tuple([None] * nparts)
        x = np.concatenate(xs); y = np.concatenate(ys)
        apex = np.concatenate(apexes)
        xi = np.searchsorted(self.vids, x)
        lo = self.indptr[xi]
        hi = self.indptr[xi + 1]
        # vectorized lower_bound over variable CSR rows
        n_dst = len(self.dst_sorted)
        if n_dst == 0:
            return tuple([None] * nparts)
        width = hi - lo
        steps = int(np.ceil(np.log2(max(2, int(width.max()) + 1)))) + 1
        lo_b = lo.copy()
        hi_b = hi.copy()
        for _ in range(steps):
            active = lo_b < hi_b
            mid = (lo_b + hi_b) // 2
            midval = self.dst_sorted[np.minimum(mid, n_dst - 1)]
            go_right = active & (midval < y)
            lo_b = np.where(go_right, mid + 1, lo_b)
            hi_b = np.where(active & ~go_right, mid, hi_b)
        found = (lo_b < hi) & (self.dst_sorted[np.minimum(lo_b, n_dst - 1)] == y)
        if not found.any():
            return tuple([None] * nparts)
        fx, fy, fapex = xi[found], y[found], apex[found]
        np.add.at(self.counts, fx, 1)  # local corner
        out = [None] * nparts
        vcat = np.concatenate([fy, fapex])
        vp = (vcat.astype(np.uint64) % np.uint64(nparts)).astype(np.int64)
        for q in range(nparts):
            s = vp == q
            if not s.any():
                continue
            u, c = np.unique(vcat[s], return_counts=True)
            out[q] = (u, c.astype(np.int64))
        return tuple(out)

    def apply_counts(self, increments) -> int:
        n = 0
        for m in ray.get(list(increments)):
            if m is None:
                continue
            idx = np.searchsorted(self.vids, m[0])
            self.counts[idx] += m[1]
            n += int(m[1].sum())
        return n

    def get_table(self) -> pa.Table:
        return pa.table({"vid": self.vids, "triangles": self.counts})
