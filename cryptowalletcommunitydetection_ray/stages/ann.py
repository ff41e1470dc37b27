"""Similarity search over an embedding column (``list<float>``).

- ``topk_cosine``: brute-force cosine top-k — the exact baseline.  The
  query matrix is broadcast ONCE via ``ray.put`` (never re-shipped per
  batch); each batch does one float64 matmul and keeps a local top-k, and a
  final tiny ``groupby(query_id)`` merges the per-batch partials — so the
  full similarity matrix never materializes.
- ``neardup_pairs_cosine``: all pairs with cosine ≥ threshold.  Exact
  variant broadcasts the (normalized) corpus matrix and scans it blockwise
  per batch (emitting only a<b pairs); the LSH variant
  (``lsh_neardup_pairs_cosine``) buckets by random-hyperplane signatures
  first — the scale path (candidates only within buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = mat.astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _emb_matrix(df: pd.DataFrame, col: str) -> np.ndarray:
    return np.stack(df[col].to_numpy())


class _TopKScorer:
    def __init__(self, queries_ref, k, id_col, emb_col):
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        self.qmat = q["mat"]  # already normalized
        self.k = k
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df[self.id_col].to_numpy()
        mat = _normalize(_emb_matrix(df, self.emb_col))
        sims = self.qmat @ mat.T  # (nq, nbatch)
        # keep k+1 per batch: the query's own row may occupy one slot and
        # is dropped in the final merge
        k = min(self.k + 1, sims.shape[1])
        # local partial top-k per query (argpartition, then exact sort later)
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        rows = np.repeat(self.qids, k)
        cols = idx.reshape(-1)
        return pd.DataFrame(
            {
                "query_id": rows,
                "neighbor_id": ids[cols],
                "sim": sims[np.repeat(np.arange(len(self.qids)), k), cols],
            }
        )


def topk_cosine(
    embeddings: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
    concurrency: int = 4,
) -> rd.Dataset:
    """(query_id, neighbor_id, sim_e6, rnk) — exact cosine top-k per query.

    Deterministic ordering: sim desc, neighbor_id asc; ``sim_e6`` is the
    similarity in 1e-6 fixed point (BIGINT — hash-exact across engines).
    Queries are rows of the corpus selected by ``query_ids``.
    """
    import pyarrow.compute as pc

    side = (
        embeddings.map_batches(
            lambda t: t.filter(pc.is_in(t[id_col], value_set=__import__("pyarrow").array(query_ids))),
            batch_format="pyarrow",
        )
        .select_columns([id_col, emb_col])
        .to_pandas()
    )
    side = side.sort_values(id_col)
    ref = ray.put(
        {"ids": side[id_col].to_numpy(), "mat": _normalize(_emb_matrix(side, emb_col))}
    )

    partials = embeddings.select_columns([id_col, emb_col]).map_batches(
        _TopKScorer,
        fn_constructor_kwargs=dict(
            queries_ref=ref, k=k, id_col=id_col, emb_col=emb_col
        ),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, concurrency),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["query_id"].iloc[0]
        if exclude_self:
            g = g[g["neighbor_id"] != qid]
        g = g.sort_values(
            ["sim", "neighbor_id"], ascending=[False, True], kind="stable"
        ).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].to_numpy(),
                "neighbor_id": g["neighbor_id"].to_numpy(),
                # scaled-int fixed point: hash-exact across engines
                "sim_e6": np.round(g["sim"].to_numpy() * 1e6).astype(np.int64),
                "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


class _PairScorer:
    def __init__(self, corpus_ref, threshold, id_col, emb_col):
        c = ray.get(corpus_ref)
        self.cids = c["ids"]
        self.cmat = c["mat"]
        self.threshold = threshold
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df[self.id_col].to_numpy()
        mat = _normalize(_emb_matrix(df, self.emb_col))
        sims = mat @ self.cmat.T  # (nbatch, ncorpus)
        bi, cj = np.nonzero(sims >= self.threshold)
        a = ids[bi]
        b = self.cids[cj]
        keep = a < b  # canonical order, also drops self-pairs
        return pd.DataFrame(
            {
                "a_id": a[keep],
                "b_id": b[keep],
                "sim_e6": np.round(sims[bi, cj][keep] * 1e6).astype(np.int64),
            }
        )


def neardup_pairs_cosine(
    embeddings: rd.Dataset,
    threshold: float = 0.4,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int = 4,
) -> rd.Dataset:
    """Exact all-pairs cosine near-dup: (a_id, b_id, sim) with a < b.

    Broadcasts the normalized corpus once; each batch scans it with one
    matmul.  O(n²) similarity work split across the pool — the exact
    baseline the LSH variant is verified against.
    """
    side = embeddings.select_columns([id_col, emb_col]).to_pandas()
    side = side.sort_values(id_col)
    ref = ray.put(
        {"ids": side[id_col].to_numpy(), "mat": _normalize(_emb_matrix(side, emb_col))}
    )
    return embeddings.select_columns([id_col, emb_col]).map_batches(
        _PairScorer,
        fn_constructor_kwargs=dict(
            corpus_ref=ref, threshold=threshold, id_col=id_col, emb_col=emb_col
        ),
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, concurrency),
    )


class _HyperplaneBucketer:
    """Random-hyperplane LSH signatures (the scale path for near-dup)."""

    def __init__(self, dim, n_bits=12, seed=42, id_col="vec_id", emb_col="embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        mat = _normalize(_emb_matrix(df, self.emb_col))
        bits = (mat @ self.planes) > 0
        bucket = bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))
        out = df[[self.id_col]].copy()
        out["bucket"] = bucket.astype(np.int64)
        out[self.emb_col] = list(mat)  # pre-normalized for the verify step
        return out


def lsh_neardup_pairs_cosine(
    embeddings: rd.Dataset,
    threshold: float = 0.4,
    *,
    dim: int,
    n_bits: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int = 4,
    max_bucket: int = 512,
) -> rd.Dataset:
    """LSH-bucketed near-dup: exact cosine only within hyperplane buckets.

    Approximate (recall < 1 across bucket boundaries — that is the
    documented tradeoff vs ``neardup_pairs_cosine``); precision is exact
    because candidates are verified with true cosine.  ``max_bucket`` caps
    degenerate buckets (same skew guard as the MinHash/SimHash stages): a
    bucket of B near-identical vectors would otherwise cost O(B²) in one
    task; capped buckets keep the smallest ids deterministically.
    """
    bucketed = embeddings.select_columns([id_col, emb_col]).map_batches(
        _HyperplaneBucketer,
        fn_constructor_kwargs=dict(
            dim=dim, n_bits=n_bits, id_col=id_col, emb_col=emb_col
        ),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, concurrency),
    )

    def within(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).head(max_bucket)  # skew guard
        if len(g) < 2:
            return pd.DataFrame(
                {
                    "a_id": np.array([], np.int64),
                    "b_id": np.array([], np.int64),
                    "sim_e6": np.array([], np.int64),
                }
            )
        ids = g[id_col].to_numpy()
        mat = np.stack(g[emb_col].to_numpy())
        sims = mat @ mat.T
        ii, jj = np.triu_indices(len(ids), k=1)
        s = sims[ii, jj]
        keep = s >= threshold
        return pd.DataFrame(
            {
                "a_id": ids[ii][keep],
                "b_id": ids[jj][keep],
                "sim_e6": np.round(s[keep] * 1e6).astype(np.int64),
            }
        )

    pairs = bucketed.groupby("bucket").map_groups(within, batch_format="pandas")
    from .dedup import exact_dedup

    return exact_dedup(pairs, ["a_id", "b_id"], num_partitions=16)
