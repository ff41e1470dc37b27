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

    return partials.groupby("query_id").map_groups(
        _merge_topk(k, exclude_self), batch_format="pandas"
    )


def _merge_topk(k: int, exclude_self: bool):
    """Final tiny merge of per-batch partial top-k rows: dedup is not
    needed (each corpus row scored once); output (query_id, neighbor_id,
    sim_e6, rnk) in the pinned deterministic order."""

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
                # half-up (not rint): pinned cross-engine rounding rule
                "sim_e6": np.floor(
                    g["sim"].to_numpy() * 1e6 + 0.5
                ).astype(np.int64),
                "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return merge


def _kmeans_lite(mat: np.ndarray, n_centroids: int, n_iter: int = 8) -> np.ndarray:
    """Deterministic spherical k-means on a (normalized) sample — the IVF
    coarse quantizer.  Driver-side by design: centroids are tiny and the
    sample is bounded; the expensive assignment runs distributed."""
    # deterministic farthest-first init: one seed lands in each
    # well-separated cluster (random init can split/merge clusters)
    n_centroids = min(n_centroids, len(mat))
    idx = [0]
    dist = 1.0 - mat @ mat[0]
    for _ in range(n_centroids - 1):
        nxt = int(dist.argmax())
        idx.append(nxt)
        dist = np.minimum(dist, 1.0 - mat @ mat[nxt])
    cent = mat[idx].copy()
    for _ in range(n_iter):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = mat[m].sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class _IVFScorer:
    """Per-batch IVF probe: assign batch rows to their centroid with one
    matmul, then score each query ONLY against rows whose centroid is in
    that query's probe list (non-candidates masked below valid cosine)."""

    def __init__(self, state_ref, k, id_col, emb_col):
        s = ray.get(state_ref)
        self.qids = s["qids"]
        self.qmat = s["qmat"]              # (nq, d) normalized
        self.cent = s["centroids"]         # (C, d) normalized
        self.probe = s["probe"]            # (nq, C) bool membership
        self.k = k
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df[self.id_col].to_numpy()
        mat = _normalize(_emb_matrix(df, self.emb_col))
        assign = (mat @ self.cent.T).argmax(axis=1)      # (nbatch,)
        sims = self.qmat @ mat.T                          # (nq, nbatch)
        cand = self.probe[:, assign]                      # (nq, nbatch)
        sims = np.where(cand, sims, -2.0)                 # below any cosine
        k = min(self.k + 1, sims.shape[1])
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        rows = np.repeat(self.qids, k)
        cols = idx.reshape(-1)
        flat = sims[np.repeat(np.arange(len(self.qids)), k), cols]
        keep = flat >= -1.0  # drop masked non-candidates
        return pd.DataFrame(
            {
                "query_id": rows[keep],
                "neighbor_id": ids[cols][keep],
                "sim": flat[keep],
            }
        )


def ivf_topk_cosine(
    embeddings: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    *,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_rows: int = 8192,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
    concurrency: int = 4,
) -> rd.Dataset:
    """IVF approximate top-k — the scale path for ANN search.

    Train a spherical-k-means coarse quantizer on a bounded sample, then
    scan the corpus ONCE: each batch is assigned to centroids with one
    matmul and each query scores only rows in its ``n_probe`` nearest
    centroid lists.  With ``n_probe == n_centroids`` this degenerates to
    the exact ``topk_cosine`` (pinned by a test); smaller ``n_probe``
    trades recall for a ~C/n_probe reduction in scored rows.  Same output
    contract as ``topk_cosine``: (query_id, neighbor_id, sim_e6, rnk).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    sample = (
        embeddings.select_columns([id_col, emb_col]).limit(sample_rows).to_pandas()
    )
    centroids = _kmeans_lite(
        _normalize(_emb_matrix(sample, emb_col)), n_centroids
    )

    qside = (
        embeddings.map_batches(
            lambda t: t.filter(
                pc.is_in(t[id_col], value_set=pa.array(query_ids))
            ),
            batch_format="pyarrow",
        )
        .select_columns([id_col, emb_col])
        .to_pandas()
        .sort_values(id_col)
    )
    qmat = _normalize(_emb_matrix(qside, emb_col))
    qc = qmat @ centroids.T                                 # (nq, C)
    n_probe = min(n_probe, len(centroids))
    probe_idx = np.argpartition(-qc, kth=n_probe - 1, axis=1)[:, :n_probe]
    probe = np.zeros((len(qmat), len(centroids)), dtype=bool)
    probe[np.repeat(np.arange(len(qmat)), n_probe), probe_idx.reshape(-1)] = True

    ref = ray.put(
        {
            "qids": qside[id_col].to_numpy(),
            "qmat": qmat,
            "centroids": centroids,
            "probe": probe,
        }
    )
    partials = embeddings.select_columns([id_col, emb_col]).map_batches(
        _IVFScorer,
        fn_constructor_kwargs=dict(
            state_ref=ref, k=k, id_col=id_col, emb_col=emb_col
        ),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, concurrency),
    )
    return partials.groupby("query_id").map_groups(
        _merge_topk(k, exclude_self), batch_format="pandas"
    )


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
                "sim_e6": np.floor(
                    sims[bi, cj][keep] * 1e6 + 0.5
                ).astype(np.int64),
            }
        )


def neardup_pairs_cosine(
    embeddings: rd.Dataset,
    threshold: float = 0.4,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int = 4,
    broadcast_max_rows: int = 200_000,
    hard_max_rows: int = 5_000_000,
) -> rd.Dataset:
    """Exact all-pairs cosine near-dup: (a_id, b_id, sim) with a < b.

    Size-dispatched like ``minhash_dedup_pairs``: a corpus under
    ``broadcast_max_rows`` is driver-collected once and broadcast whole;
    a larger corpus takes the CHUNKED route — the input is materialized
    ONCE (bounded: ``hard_max_rows`` caps it at ~n·dim·8 object-store
    bytes, and above the cap this raises), then streamed through the
    driver in ``broadcast_max_rows``-sized chunks.  Chunks run
    SEQUENTIALLY: each is ``ray.put`` → scanned → its (small,
    above-threshold) pair table materialized → the chunk ref dropped, so
    object-store residency is the materialized input + ONE normalized
    chunk + the accumulated pair tables — not every chunk at once — and
    the upstream pipeline executes twice (a streaming count for the size
    guard, then the materialize), not k+2 times (ADVICE r4).  Each unordered pair is still emitted exactly once (pair
    (x, y), x < y, appears only where the batch row is x and the chunk
    holds y).  Both paths emit identical rows (pinned by test_ann).
    Above ``hard_max_rows`` this raises — exact all-pairs is O(n²)
    compute and ``lsh_neardup_pairs_cosine`` is the scale path.
    """
    lazy = embeddings.select_columns([id_col, emb_col])
    # guard BEFORE materializing: count() streams (nothing retained), so
    # an oversized corpus is rejected without first pinning n·dim·8 bytes
    # into the object store (the exact failure the guard exists to stop)
    n = lazy.count()
    if n > hard_max_rows:
        raise ValueError(
            f"neardup_pairs_cosine: {n} rows exceeds hard_max_rows="
            f"{hard_max_rows}; exact all-pairs is O(n²) — use "
            f"lsh_neardup_pairs_cosine (bucketed, capped) at this scale "
            f"or raise hard_max_rows explicitly"
        )
    src = lazy.materialize()

    def _chunk_ref(df: pd.DataFrame):
        df = df.sort_values(id_col)
        return ray.put(
            {
                "ids": df[id_col].to_numpy(),
                "mat": _normalize(_emb_matrix(df, emb_col)),
            }
        )

    def _scan(ref) -> rd.Dataset:
        return src.map_batches(
            _PairScorer,
            fn_constructor_kwargs=dict(
                corpus_ref=ref, threshold=threshold, id_col=id_col,
                emb_col=emb_col,
            ),
            batch_format="pandas",
            batch_size=2048,
            concurrency=(1, concurrency),
        )

    if n <= broadcast_max_rows:
        return _scan(_chunk_ref(src.to_pandas()))

    results: list[rd.Dataset] = []

    def _flush(buf: list[pd.DataFrame]) -> None:
        ref = _chunk_ref(pd.concat(buf, ignore_index=True))
        results.append(_scan(ref).materialize())
        del ref  # chunk leaves the object store before the next one enters

    buf: list[pd.DataFrame] = []
    buffered = 0
    for b in src.iter_batches(batch_format="pandas", batch_size=8192):
        buf.append(b)
        buffered += len(b)
        if buffered >= broadcast_max_rows:
            _flush(buf)
            buf, buffered = [], 0
    if buffered:
        _flush(buf)
    return results[0].union(*results[1:]) if len(results) > 1 else results[0]


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
    strict_caps: bool = False,
    export_buckets: str | None = None,
) -> rd.Dataset:
    """LSH-bucketed near-dup: exact cosine only within hyperplane buckets.

    Approximate (recall < 1 across bucket boundaries — that is the
    documented tradeoff vs ``neardup_pairs_cosine``); precision is exact
    because candidates are verified with true cosine.  ``max_bucket`` caps
    degenerate buckets (same skew guard as the MinHash/SimHash stages): a
    bucket of B near-identical vectors would otherwise cost O(B²) in one
    task; capped buckets keep the smallest ids deterministically.
    ``strict_caps=True`` makes the cap LOUD: a tiny bucket-size aggregate
    counts truncations and raises instead of silently dropping pairs.
    ``export_buckets`` writes the (id, bucket) assignment table to parquet
    for external verification (the DuckDB oracle reproduces the verify
    stage as bucket-equijoin + exact cosine over the embeddings table) —
    the bucket table is one small row per vector.
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
    if strict_caps or export_buckets is not None:
        # materialize so export / cap stats / pairing don't re-run the pool
        bucketed = bucketed.materialize()
    if export_buckets is not None:
        bucketed.select_columns([id_col, "bucket"]).write_parquet(
            export_buckets
        )
    if strict_caps:
        from .dedup import capped_bucket_stats

        stats = capped_bucket_stats(
            bucketed.select_columns([id_col, "bucket"]), ["bucket"], max_bucket
        )
        if stats["n_dropped_members"]:
            raise ValueError(
                f"lsh_neardup_pairs_cosine(strict_caps=True): "
                f"{stats['n_truncated_buckets']} buckets over "
                f"max_bucket={max_bucket} would drop "
                f"{stats['n_dropped_members']} members (pairs lost); "
                f"raise max_bucket or n_bits"
            )

    # partitioned-vectorized pairing: hash-route buckets to 32 partitions
    # and build EVERY bucket's pairs in one segment-arithmetic pass — no
    # per-bucket Python (a web-scale run has millions of tiny buckets)
    from ..functions.segments import (
        segment_bounds,
        segment_pair_indices,
        segment_rank,
    )

    _empty = {
        "a_id": np.array([], np.int64),
        "b_id": np.array([], np.int64),
        "sim_e6": np.array([], np.int64),
    }

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (
            df["bucket"].to_numpy().astype(np.uint64) % np.uint64(32)
        ).astype(np.int32)
        return df

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", id_col], kind="mergesort")
        buckets = g["bucket"].to_numpy()
        # skew guard: keep each bucket's max_bucket smallest ids
        rank = segment_rank(segment_bounds(buckets))
        if (rank >= max_bucket).any():
            g = g[rank < max_bucket]
            buckets = g["bucket"].to_numpy()
        if len(g) < 2:
            return pd.DataFrame(_empty)
        ids = g[id_col].to_numpy()
        mat = np.stack(g[emb_col].to_numpy())
        ii, jj = segment_pair_indices(segment_bounds(buckets))
        if not len(ii):
            return pd.DataFrame(_empty)
        # chunked pair dots: bounds the pairs×dim temporary
        s = np.empty(len(ii), dtype=np.float64)
        step = 1 << 20
        for o in range(0, len(ii), step):
            sl = slice(o, o + step)
            s[sl] = np.einsum("ij,ij->i", mat[ii[sl]], mat[jj[sl]])
        keep = s >= threshold
        return pd.DataFrame(
            {
                "a_id": ids[ii][keep],
                "b_id": ids[jj][keep],
                "sim_e6": np.floor(s[keep] * 1e6 + 0.5).astype(np.int64),
            }
        )

    pairs = (
        bucketed.map_batches(add_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(pairs_part, batch_format="pandas")
    )
    from .dedup import exact_dedup

    return exact_dedup(pairs, ["a_id", "b_id"], num_partitions=16)
