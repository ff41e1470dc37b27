"""Hash-partitioned CSR shard state — the engine's iterative-graph core.

This is the one place the engine drops below the Dataset API: a shared,
mutable, partition-local rank/label vector that every superstep updates in
place cannot be expressed as a stateless batch transform.  It replaces the
reference's whole-graph-in-driver-RAM networkx model
(``services/wallet_clustering.py:12``) with P actors, each owning

  - the CSR of edges whose ``src % P == p`` (its hash partition, read from
    the partitioned parquet artifact — each actor reads ONLY its files),
  - the vertex-id slice ``vid % P == p`` and its rank/label vector.

One ``KernelShard`` actor per partition hosts ALL kernels (PageRank,
min-label CC, mode-label LPA, triangles) behind a generic ``call``
dispatcher, with a per-shard artifact cache — so a multi-kernel pipeline
(the flagship: PageRank + CC + communities + triangles) pays actor-pool
spawn and parquet load ONCE (see ``state/pool.py``).

Superstep dataflow (all numpy, zero Python loops over edges):

  1. every shard computes per-destination-partition messages — values
     aggregated *locally per dst* first (``np.bincount``/``reduceat`` over a
     presorted edge order).  This local combine is the skew defense: a hub
     vertex with 10^8 in-edges receives at most P message entries per
     superstep, not 10^8.
  2. messages travel through the object store as numpy arrays via
     per-destination ``num_returns`` slots, so shard q fetches exactly the
     P slices addressed to it (never the full message matrix).
  3. every shard folds its incoming slices in fixed partition order
     (p = 0..P-1) — deterministic floating-point reduction, so a resumed
     run reproduces bit-identical vectors.

Edge/vertex partition invariants (guaranteed by ``pipelines.edges``):
``src`` of every edge in part p hashes to p; every edge endpoint appears in
the vertices artifact; vertex slices are disjoint.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..pipelines.edges import read_shard


def _col(t: pa.Table, name: str) -> np.ndarray:
    if t.num_rows == 0 or name not in t.schema.names:
        return np.empty(0, dtype=np.int64)
    return np.asarray(t[name].to_numpy(zero_copy_only=False), dtype=np.int64)


def _fetch(objs) -> list:
    """Resolve a list that may hold ObjectRefs (slot-routed protocol) or
    already-materialized values (packed protocol)."""
    objs = list(objs)
    if objs and isinstance(objs[0], ray.ObjectRef):
        return ray.get(objs)
    return objs


class _Csr:
    """Message-routing CSR over one artifact partition (edges sorted by
    (dst_partition, dst); per-q segment ids precomputed for local combine)."""

    def __init__(self, graph_dir, part, nparts, artifact, vids):
        t = read_shard(graph_dir, artifact, part, nparts, ["src", "dst"])
        src = _col(t, "src")
        dst = _col(t, "dst")
        dst_part = (dst.astype(np.uint64) % np.uint64(nparts)).astype(np.int64)
        order = np.lexsort((dst, dst_part))
        self.dst_sorted = dst[order]
        self.src_idx = np.searchsorted(vids, src[order])
        self.qb = np.searchsorted(dst_part[order], np.arange(nparts + 1))
        self.seg = np.empty(len(dst), dtype=np.int64)
        self.uniq_dst: list[np.ndarray] = []
        self.n_uniq: list[int] = []
        for q in range(nparts):
            s, e = int(self.qb[q]), int(self.qb[q + 1])
            if s == e:
                self.uniq_dst.append(np.empty(0, dtype=np.int64))
                self.n_uniq.append(0)
                continue
            u, inv = np.unique(self.dst_sorted[s:e], return_inverse=True)
            self.uniq_dst.append(u)
            self.n_uniq.append(len(u))
            self.seg[s:e] = inv
        self.outdeg = (
            np.bincount(self.src_idx, minlength=len(vids)).astype(np.int64)
            if len(src)
            else np.zeros(len(vids), dtype=np.int64)
        )


class ShardData:
    """Per-(graph_dir, part) lazily-loaded artifact cache shared by kernels."""

    def __init__(self, graph_dir: str, part: int, nparts: int):
        self.graph_dir, self.part, self.nparts = graph_dir, part, nparts
        self._vids: np.ndarray | None = None
        self._csr: dict[str, _Csr] = {}

    @property
    def vids(self) -> np.ndarray:
        if self._vids is None:
            vt = read_shard(
                self.graph_dir, "vertices", self.part, self.nparts, ["vid"]
            )
            self._vids = np.sort(_col(vt, "vid"))
        return self._vids

    def csr(self, artifact: str) -> _Csr:
        if artifact not in self._csr:
            self._csr[artifact] = _Csr(
                self.graph_dir, self.part, self.nparts, artifact, self.vids
            )
        return self._csr[artifact]

    def vertex_attrs(self):
        """(url, is_user) arrays aligned with the sorted ``vids`` slice."""
        if not hasattr(self, "_attrs"):
            vt = read_shard(
                self.graph_dir, "vertices", self.part, self.nparts,
                ["vid", "url", "is_user"],
            )
            v = _col(vt, "vid")
            order = np.argsort(v, kind="stable")
            urls = np.asarray(vt["url"].to_numpy(zero_copy_only=False))[order]
            is_user = np.asarray(
                vt["is_user"].to_numpy(zero_copy_only=False), dtype=bool
            )[order]
            self._attrs = (urls, is_user)
        return self._attrs


class _VecState:
    """Shared slice-persistence helpers (checkpoint slices)."""

    data: ShardData

    def _save_vec(self, path: str, name: str, vec: np.ndarray) -> None:
        import os

        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(pa.table({"vid": self.data.vids, name: vec}), path)

    def _load_vec(self, path: str, name: str) -> np.ndarray:
        t = pq.read_table(path)
        vids = np.asarray(t["vid"].to_numpy(), dtype=np.int64)
        # a slice from a different graph/partitioning would scatter garbage
        # silently — refuse unless the vid set is exactly this shard's
        if not np.array_equal(np.sort(vids), self.data.vids):
            raise ValueError(
                f"checkpoint slice {path} holds {len(vids)} vids that do "
                f"not match this shard's vertex set (different graph or P?)"
            )
        vec = t[name].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(self.data.vids, vids)
        out = np.empty(len(self.data.vids), dtype=vec.dtype)
        out[idx] = vec
        return out


class PageRankState(_VecState):
    """Power iteration with dangling-mass redistribution (directed edges)."""

    def __init__(self, data: ShardData):
        self.data = data
        self.csr = data.csr("edges")
        self.dangling_mask = self.csr.outdeg == 0
        self.rank = np.empty(0)
        self.n_total = 0

    def init_rank(self, n_total: int) -> None:
        self.n_total = n_total
        self.rank = np.full(len(self.data.vids), 1.0 / n_total, dtype=np.float64)

    def restore(self, path: str, n_total: int) -> None:
        self.n_total = n_total
        self.rank = self._load_vec(path, "rank")

    def compute(self):
        c = self.csr
        contrib = self.rank / np.maximum(c.outdeg, 1)
        vals = contrib[c.src_idx]
        out = []
        for q in range(self.data.nparts):
            s, e = int(c.qb[q]), int(c.qb[q + 1])
            if s == e:
                out.append(None)
                continue
            sums = np.bincount(c.seg[s:e], weights=vals[s:e], minlength=c.n_uniq[q])
            out.append((c.uniq_dst[q], sums))
        dangling = float(self.rank[self.dangling_mask].sum())
        return (*out, dangling)

    def apply(self, msg_refs, dangling_refs, alpha: float) -> float:
        """``dangling_refs`` are the P per-shard dangling scalars (refs) —
        summed HERE in fixed order, so the driver never has to synchronize
        on them and supersteps can be pipelined without round-trips."""
        dangling_total = float(sum(_fetch(dangling_refs)))
        incoming = np.zeros(len(self.data.vids), dtype=np.float64)
        for m in _fetch(msg_refs):  # fixed order p=0..P-1: deterministic
            if m is None:
                continue
            idx = np.searchsorted(self.data.vids, m[0])
            incoming[idx] += m[1]
        base = (1.0 - alpha) / self.n_total + alpha * dangling_total / self.n_total
        new = base + alpha * incoming
        delta = float(np.abs(new - self.rank).sum())
        self.rank = new
        return delta

    def save(self, path: str) -> None:
        self._save_vec(path, "rank", self.rank)

    def get_table(self) -> pa.Table:
        return pa.table({"vid": self.data.vids, "rank": self.rank})


class MinLabelState(_VecState):
    """Hash-min label propagation (connected components) over undirected
    edges, with a change-frontier so converged regions stop sending."""

    def __init__(self, data: ShardData):
        self.data = data
        self.csr = data.csr("edges_und")
        self.labels = data.vids.copy()
        self.frontier = np.ones(len(data.vids), dtype=bool)

    def restore(self, path: str) -> None:
        self.labels = self._load_vec(path, "label")
        self.frontier = np.ones(len(self.data.vids), dtype=bool)  # safe

    def compute(self):
        c = self.csr
        mask = self.frontier[c.src_idx]
        cand = self.labels[c.src_idx]
        out = []
        for q in range(self.data.nparts):
            s, e = int(c.qb[q]), int(c.qb[q + 1])
            m = mask[s:e]
            if s == e or not m.any():
                out.append(None)
                continue
            d = c.dst_sorted[s:e][m]
            v = cand[s:e][m]
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            out.append((d[starts], np.minimum.reduceat(v, starts)))
        return (*out, int(self.frontier.sum()))

    def apply(self, msg_refs) -> int:
        best = self.labels.copy()
        for m in _fetch(msg_refs):
            if m is None:
                continue
            idx = np.searchsorted(self.data.vids, m[0])
            best[idx] = np.minimum(best[idx], m[1])
        changed = best < self.labels
        self.labels = best
        self.frontier = changed
        return int(changed.sum())

    def save(self, path: str) -> None:
        self._save_vec(path, "label", self.labels)

    def get_table(self) -> pa.Table:
        return pa.table({"vid": self.data.vids, "label": self.labels})

    def get_labeled_vertices(self) -> pa.Table:
        """Labels joined with vertex attributes — partition-local, no
        Dataset join (urls/is_user live in the same hash partition)."""
        urls, is_user = self.data.vertex_attrs()
        return pa.table(
            {
                "vid": self.data.vids,
                "url": urls,
                "is_user": is_user,
                "label": self.labels,
            }
        )


class ModeLabelState(_VecState):
    """Synchronous community label propagation (mode of neighbor labels),
    delta-based with a change frontier.

    Pinned deterministic rule: new label = the smallest label among those
    with maximal neighbor count; vertices with no neighbors keep their
    label (tests pin the same rule in a pure-python oracle).

    Frontier design: mode is not monotone, so MinLabelState's
    send-only-changed trick can't work alone — a receiver can't take a
    mode over partial input.  Instead each shard keeps the full
    per-(dst, label) neighbor-count table for ITS OWN vertices (≤ its
    in-edge count rows — the same O(E/P) budget as the CSR it already
    holds), and senders ship signed COUNT DELTAS for changed sources
    only: when src moves a→b every neighbor receives (dst, a, -1) and
    (dst, b, +1), pre-aggregated per (dst, label) with zero-sum rows
    dropped.  On a web graph most labels freeze after 2-3 supersteps, so
    message bytes drop from O(E) to O(frontier out-edges); winners are
    recomputed only for delta-touched dsts.  Equivalent to the full
    recompute: an untouched dst's neighbor-label multiset is unchanged,
    hence so is its (max count, min label) argmax.  The first superstep
    (and the one after ``restore``) sends full counts to seed the table.
    """

    def __init__(self, data: ShardData):
        self.data = data
        self.csr = data.csr("edges_und")
        self.labels = data.vids.copy()
        self._reset_frontier()

    def _reset_frontier(self) -> None:
        self.frontier = np.ones(len(self.data.vids), dtype=bool)
        self.sent_labels = None  # labels as of the last compute() send
        self.t_dst = np.empty(0, dtype=np.int64)  # count table, lexsorted
        self.t_lab = np.empty(0, dtype=np.int64)  # by (dst, label)
        self.t_cnt = np.empty(0, dtype=np.int64)

    def restore(self, path: str) -> None:
        self.labels = self._load_vec(path, "label")
        self._reset_frontier()  # next compute() reseeds the count table

    @staticmethod
    def _agg(d: np.ndarray, v: np.ndarray, c: np.ndarray):
        """Sum ``c`` per (d, v) pair; returns lexsorted (d, v, sum) with
        zero-sum rows dropped, or None if nothing survives."""
        order = np.lexsort((v, d))
        d, v, c = d[order], v[order], c[order]
        new_grp = np.r_[True, (d[1:] != d[:-1]) | (v[1:] != v[:-1])]
        starts = np.flatnonzero(new_grp)
        sums = np.add.reduceat(c, starts)
        keep = sums != 0
        if not keep.any():
            return None
        return d[starts][keep], v[starts][keep], sums[keep]

    def compute(self):
        c = self.csr
        out = []
        if self.sent_labels is None:
            # seed send: full (+1) counts into empty receiver tables
            lab = self.labels[c.src_idx]
            for q in range(self.data.nparts):
                s, e = int(c.qb[q]), int(c.qb[q + 1])
                out.append(
                    None
                    if s == e
                    else self._agg(
                        c.dst_sorted[s:e],
                        lab[s:e],
                        np.ones(e - s, dtype=np.int64),
                    )
                )
        else:
            mask = self.frontier[c.src_idx]
            old = self.sent_labels[c.src_idx]
            new = self.labels[c.src_idx]
            for q in range(self.data.nparts):
                s, e = int(c.qb[q]), int(c.qb[q + 1])
                m = mask[s:e]
                if s == e or not m.any():
                    out.append(None)
                    continue
                d0 = c.dst_sorted[s:e][m]
                k = len(d0)
                sgn = np.empty(2 * k, dtype=np.int64)
                sgn[:k] = -1
                sgn[k:] = 1
                out.append(
                    self._agg(
                        np.concatenate([d0, d0]),
                        np.concatenate([old[s:e][m], new[s:e][m]]),
                        sgn,
                    )
                )
        self.sent_labels = self.labels.copy()
        return (*out, int(self.frontier.sum()))

    def apply(self, msg_refs) -> int:
        ds, vs, cs = [], [], []
        for m in _fetch(msg_refs):
            if m is None:
                continue
            ds.append(m[0]); vs.append(m[1]); cs.append(m[2])
        if not ds:
            self.frontier = np.zeros(len(self.data.vids), dtype=bool)
            return 0
        d = np.concatenate(ds); v = np.concatenate(vs); c = np.concatenate(cs)
        # fold the deltas into the count table (one lexsort-merge; rows
        # whose count returns to zero drop out)
        merged = self._agg(
            np.concatenate([self.t_dst, d]),
            np.concatenate([self.t_lab, v]),
            np.concatenate([self.t_cnt, c.astype(np.int64)]),
        )
        if merged is None:  # all counts cancelled — no neighbors anywhere
            self.t_dst = self.t_lab = self.t_cnt = np.empty(0, np.int64)
            self.frontier = np.zeros(len(self.data.vids), dtype=bool)
            return 0
        self.t_dst, self.t_lab, self.t_cnt = merged
        # recompute winners only for dsts a delta touched (sorted-vs-sorted
        # membership: t_dst is lexsort-major, touched is unique-sorted)
        touched = np.unique(d)
        pos = np.searchsorted(touched, self.t_dst)
        member = (pos < len(touched)) & (
            touched[np.minimum(pos, len(touched) - 1)] == self.t_dst
        )
        du, vu, cm = self.t_dst[member], self.t_lab[member], self.t_cnt[member]
        # per dst: max count, tie → min label
        sel = np.lexsort((vu, -cm, du))
        du, vu = du[sel], vu[sel]
        first = np.r_[True, du[1:] != du[:-1]]
        dst_win, lab_win = du[first], vu[first]
        idx = np.searchsorted(self.data.vids, dst_win)
        changed = self.labels[idx] != lab_win
        self.labels[idx] = lab_win
        self.frontier = np.zeros(len(self.data.vids), dtype=bool)
        self.frontier[idx[changed]] = True
        return int(changed.sum())

    def save(self, path: str) -> None:
        self._save_vec(path, "label", self.labels)

    def get_table(self) -> pa.Table:
        return pa.table({"vid": self.data.vids, "label": self.labels})


@ray.remote(num_cpus=0, max_restarts=8)
class KernelShard:
    """One actor per partition hosting every kernel's state.

    ``num_cpus=0``: shards are latency-bound message processors that sit
    idle between supersteps; reserving a full CPU each would starve the
    Dataset operators sharing the node (and deadlock small test clusters).

    ``max_restarts``: a crashed shard is restarted by Ray and reloads its
    partition artifacts in ``__init__``; its in-memory KERNEL state is
    gone, which ``call_live`` surfaces as an error so the superstep driver
    rewinds every shard to the latest complete checkpoint (or re-inits)
    instead of silently mixing a fresh vector into a converged run
    (reference analog: retry-everything, ``utils/retry_handler.py:12-30``).
    """

    def __init__(self, graph_dir: str, part: int, nparts: int):
        self.data = ShardData(graph_dir, part, nparts)
        self._kernels: dict[str, object] = {}

    def _kernel(self, name: str):
        k = self._kernels.get(name)
        if k is None:
            from .triangles import TriangleState

            cls = {
                "pagerank": PageRankState,
                "cc": MinLabelState,
                "lpa": ModeLabelState,
                "triangles": TriangleState,
            }[name]
            k = cls(self.data)
            self._kernels[name] = k
        return k

    def reset(self, name: str) -> None:
        """Drop a kernel's state so the next call starts fresh."""
        self._kernels.pop(name, None)

    def has_kernel(self, name: str) -> bool:
        return name in self._kernels

    def ensure(self, kernel: str) -> None:
        """Instantiate a kernel's state eagerly (after reset / restart)."""
        self._kernel(kernel)

    def call(self, kernel: str, method: str, *args):
        return getattr(self._kernel(kernel), method)(*args)

    def call_live(self, kernel: str, method: str, *args):
        """Like ``call`` but refuses to lazily (re)create state: if this
        actor restarted since the kernel was initialised, the state is a
        default-constructed imposter — raise instead of computing on it."""
        k = self._kernels.get(kernel)
        if k is None:
            raise RuntimeError(
                f"kernel {kernel!r} has no live state (shard restarted?)"
            )
        return getattr(k, method)(*args)

    def apply_then_compute(self, kernel: str, msg_refs, *apply_args):
        """Fused superstep volley: apply the incoming message slices, then
        immediately compute the NEXT superstep's outgoing messages in the
        SAME actor task — one task wave per superstep instead of two.
        At sandbox graph sizes per-shard superstep compute is single-digit
        ms, so task dispatch is the latency floor; fusing halves it.  The
        state trajectory is identical to separate apply()/compute() calls:
        the actor mailbox ran them back-to-back anyway, and compute() has
        no effect on the checkpointed vectors.  Returns
        ``(*compute_out, apply_metric)`` — callers slot-route with
        ``num_returns = P + 2``.  Live-state semantics match
        ``call_live``."""
        k = self._kernels.get(kernel)
        if k is None:
            raise RuntimeError(
                f"kernel {kernel!r} has no live state (shard restarted?)"
            )
        metric = k.apply(msg_refs, *apply_args)
        return (*k.compute(), metric)

    def fused_packed(self, kernel: str, packed_refs, q: int,
                     scalar_slot: bool, *apply_args):
        """Fused superstep volley over PACKED messages: each shard's whole
        compute() output travels as ONE object instead of P + 1/2
        ``num_returns`` slots.  Superstep latency on this pool is
        ~0.2 ms × object count (measured), so packing drops the per-wave
        object count from P·(P+2) to 2P — the single-node latency floor.
        The tradeoff vs slot routing: every shard reads every producer's
        FULL output, which on one node is a zero-copy plasma read (numpy
        arrays map shared memory) but on a multi-node cluster would ship
        P× the needed bytes — so the pipelines pick this mode only when
        the cluster has one node (``message_mode="auto"``); slot routing
        remains the multi-node / 100 TB shape.

        ``packed_refs``: P refs, each a producer's full compute() tuple
        (messages for q=0..P-1, then the scalar slot — dangling mass /
        frontier size).  ``scalar_slot``: pass the producers' scalar
        slots to ``apply`` as its second argument (PageRank's dangling
        masses).  Returns ``(packed_compute_out, apply_metric)`` —
        callers use ``num_returns=2`` and resolve only the metric.
        Live-state semantics match ``call_live``."""
        k = self._kernels.get(kernel)
        if k is None:
            raise RuntimeError(
                f"kernel {kernel!r} has no live state (shard restarted?)"
            )
        packed = ray.get(list(packed_refs))  # zero-copy on one node
        msgs = [pk[q] for pk in packed]
        if scalar_slot:
            apply_args = ([pk[-1] for pk in packed], *apply_args)
        metric = k.apply(msgs, *apply_args)
        return (k.compute(), metric)
