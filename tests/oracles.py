"""Pure-Python reference oracles, independent of the engine's code paths."""

from __future__ import annotations


def oracle_pagerank(edge_list, alpha=0.85, tol=1e-12, max_iter=1000):
    """Dict-based power iteration with uniform dangling redistribution."""
    nodes = sorted({u for e in edge_list for u in e})
    out = {v: [] for v in nodes}
    for u, v in edge_list:
        out[u].append(v)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(max_iter):
        dangling = sum(r[v] for v in nodes if not out[v])
        new = {v: (1 - alpha) / n + alpha * dangling / n for v in nodes}
        for u in nodes:
            if out[u]:
                share = alpha * r[u] / len(out[u])
                for v in out[u]:
                    new[v] += share
        err = sum(abs(new[v] - r[v]) for v in nodes)
        r = new
        if err < n * tol:
            break
    return r


def oracle_sync_lpa(edge_list, max_iter=20):
    """Synchronous LPA with the engine's pinned rule: new label = smallest
    label among those with maximal neighbor count; isolated keep theirs."""
    from collections import Counter

    nodes = sorted({u for e in edge_list for u in e})
    # undirected SIMPLE graph semantics (matches the engine's edges_und
    # artifact): neighbor multiplicity 1 even if both (u,v) and (v,u)
    # appear in the directed edge table; a self-loop counts once
    und = {(min(u, v), max(u, v)) for u, v in edge_list}
    nbrs = {v: [] for v in nodes}
    for u, v in und:
        if u != v:
            nbrs[u].append(v)
            nbrs[v].append(u)
        else:
            nbrs[u].append(u)
    labels = {v: v for v in nodes}
    for _ in range(max_iter):
        new = {}
        for v in nodes:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            counts = Counter(labels[u] for u in nbrs[v])
            best = max(counts.values())
            new[v] = min(l for l, c in counts.items() if c == best)
        if new == labels:
            break
        labels = new
    return labels
