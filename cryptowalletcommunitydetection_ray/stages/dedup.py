"""Deduplication stages: exact (hash-partitioned) and near-dup (MinHash/LSH,
SimHash, n-gram Jaccard, embedding cosine).

Exact dedup re-expresses the reference's identity-set semantics —
``set[LPTransaction]`` keyed on tx_hash (``models/lp_transaction.py:9-13``),
``_id``-keyed upserts (``databases/mongodb.py:277-288``) — as a
hash-partition + per-partition vectorized ``drop_duplicates``:

    partition p = hash(key) % P  →  groupby("__part") → per-group pandas dedup

All duplicate keys land in the same partition, each partition is deduped with
one vectorized call (NOT one Python call per key group), and P bounds the
per-task memory (choose P so a partition fits a worker heap at scale).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from ..context import hash64

_PART = "__part"


def _jaccard6(inter: np.ndarray, union: np.ndarray) -> np.ndarray:
    """inter/union quantized with the repo's pinned half-UP 6dp rule
    (floor(x·1e6 + 0.5)/1e6) — np.round is half-EVEN and flips vs SQL
    round() exactly on exact binary fractions like inter/union."""
    j = np.divide(
        inter.astype(np.float64),
        union.astype(np.float64),
        out=np.zeros(len(inter), np.float64),
        where=union > 0,
    )
    return np.floor(j * 1e6 + 0.5) / 1e6


def digest128(values) -> tuple[np.ndarray, np.ndarray]:
    """128-bit content digest of a string array as two independent 64-bit
    halves (two hash passes under different 16-byte keys — a collision
    must defeat both).  Used by the digest-keyed dedup path so wide keys
    (document text) never enter a shuffle: the digest is 16 bytes
    regardless of key width."""
    import pandas.util as pdu

    arr = np.asarray(values, dtype=object)
    d1 = pdu.hash_array(arr, hash_key="cwcd.dedup.dig.1", categorize=False)
    d2 = pdu.hash_array(arr, hash_key="cwcd.dedup.dig.2", categorize=False)
    return d1.view(np.int64), d2.view(np.int64)


def _col_str(s: pd.Series) -> np.ndarray:
    """Canonical string form of one key column, stable under pandas
    null-promotion (review r5): an int64 Arrow column whose batch holds a
    null arrives as float64 and would stringify ``5`` as ``"5.0"`` —
    a DIFFERENT composite key (hence digest / route) than the ``"5"`` of
    a null-free batch.  Delegates to ``context.canonical_key_str``
    (integral floats print as integers; everything else keeps its plain
    ``str`` form)."""
    from ..context import canonical_key_str

    if s.dtype.kind != "f":
        return s.astype(str).to_numpy()
    return canonical_key_str(s.to_numpy())


def _composite_key(df: pd.DataFrame, key_cols: Sequence[str]) -> np.ndarray:
    """\\x1f-joined string key, built with Arrow's element-wise join (one
    C kernel over the whole batch) — not pandas ``agg(join, axis=1)``,
    which invokes Python once per row.  Components come from ``_col_str``
    (promotion-canonical), matching the plain ``astype(str)`` form for
    every non-promoted dtype."""
    if len(key_cols) == 1:
        return _col_str(df[key_cols[0]])
    import pyarrow as pa
    import pyarrow.compute as pc

    parts = [
        pa.array(_col_str(df[c]), type=pa.string()) for c in key_cols
    ]
    return pc.binary_join_element_wise(*parts, "\x1f").to_numpy(
        zero_copy_only=False
    )


def _key_route_hash(df: pd.DataFrame, key_cols: Sequence[str]) -> np.ndarray:
    """uint64 partition-routing hash of the key tuple.  All-NUMERIC keys
    (the LSH/SimHash/ANN candidate-pair tables and the edge (src, dst)
    dedup — the hot paths) never touch strings: each column's canonical
    value bits (``context.numeric_route_bits`` — identical for an int64
    batch and the float64 batch pandas null-promotion makes of it) are
    splitmix64-mixed into the accumulator, so equal tuples collide and
    order matters (``(a, b) != (b, a)``).  Anything else falls back to
    hash64 of the vectorized composite string key.  Both branch tests are
    dtype-KIND-stable across batches: a numeric Arrow column is numeric
    (int or promoted-float) in every batch, a string column is object in
    every batch — so one dataset's batches always take the same route."""
    from .bloom import _splitmix64
    from ..context import numeric_route_bits

    if all(df[c].dtype.kind in "iuf" for c in key_cols):
        h = np.zeros(len(df), np.uint64)
        for c in key_cols:
            h = _splitmix64(h ^ _splitmix64(numeric_route_bits(df[c].to_numpy())))
        return h
    return hash64(_composite_key(df, key_cols)).astype(np.uint64)


def exact_dedup_digest(
    ds: rd.Dataset,
    key_cols: Sequence[str],
    id_col: str,
    num_partitions: int = 64,
    keep_order_col: str | None = None,
    digest_fn=None,
) -> rd.Dataset:
    """Digest-keyed exact dedup — the 100 TB shape of ``exact_dedup`` for
    WIDE keys (full document text): the dedup shuffle carries only
    (digest₁, digest₂, id[, order]) — 24–32 bytes/row — instead of the
    key bytes; survivors are recovered with one id-keyed hash join
    (int64 keys) against the original dataset.

    Contract: ``id_col`` must be unique per row.  Two DIFFERENT keys with
    equal 128-bit digest are (wrongly) merged — probability ≈ n²/2¹²⁹,
    negligible below ~10¹⁵ rows; callers needing certainty keep the
    byte-compare path (``exact_dedup``), which ships the key.
    ``digest_fn(df) -> (int64 array, int64 array)`` is injectable so tests
    can force collisions and pin the merge behavior.
    """
    key_cols = list(key_cols)
    order = keep_order_col or id_col

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        if digest_fn is not None:
            d1, d2 = digest_fn(df)
        else:
            d1, d2 = digest128(_composite_key(df, key_cols))
        out = pd.DataFrame(
            {"__d1": d1, "__d2": d2, id_col: df[id_col].to_numpy()}
        )
        if keep_order_col:
            out[keep_order_col] = df[keep_order_col].to_numpy()
        # local pre-winner per digest: shrinks the (already narrow) shuffle
        out = out.sort_values(order, kind="stable").drop_duplicates(
            ["__d1", "__d2"], keep="first"
        )
        out[_PART] = (
            out["__d1"].to_numpy().astype(np.uint64)
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return out

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="stable").drop_duplicates(
            ["__d1", "__d2"], keep="first"
        )
        return g[[id_col]]

    winners = (
        ds.map_batches(sig, batch_format="pandas")
        .groupby(_PART)
        .map_groups(pick, batch_format="pandas")
    )
    return ds.join(winners, "inner", num_partitions, on=(id_col,))


def exact_dedup(
    ds: rd.Dataset,
    key_cols: Sequence[str],
    num_partitions: int = 64,
    keep_order_col: str | None = None,
) -> rd.Dataset:
    """Globally drop duplicate rows on ``key_cols`` (keeps one winner per key).

    If ``keep_order_col`` is given, the kept row is the one with the minimal
    value of that column (deterministic winner, e.g. min doc_id); otherwise
    an arbitrary-but-single row survives (sufficient for set semantics).
    For WIDE keys at scale, see ``exact_dedup_digest`` (the shuffle carries
    a 16-byte digest instead of the key bytes).
    """
    key_cols = list(key_cols)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        # local pre-dedup: shrinks the shuffle; correctness unaffected
        df = df.drop_duplicates(
            subset=key_cols if keep_order_col is None else None
        )
        if keep_order_col is not None:
            df = df.sort_values(keep_order_col, kind="stable").drop_duplicates(
                subset=key_cols, keep="first"
            )
        # no per-dtype fast path: _key_route_hash's route choice is
        # kind-stable across batches, so a null-promoted float64 batch of
        # an int64 column routes each key exactly as the int64 batches do
        h = _key_route_hash(df, key_cols)
        df = df.copy()
        df[_PART] = (h % np.uint64(num_partitions)).astype(np.int32)
        return df

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        if keep_order_col is not None:
            g = g.sort_values(keep_order_col, kind="stable")
        return g.drop_duplicates(subset=key_cols, keep="first").drop(
            columns=[_PART]
        )

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby(_PART)
        .map_groups(dedup_part, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# Near-duplicate detection
# --------------------------------------------------------------------------


class MinHasher:
    """Actor-pool stage: text → MinHash signature + LSH band keys.

    Permutation parameters are built ONCE per actor in ``__init__`` (the
    stateful-stage pattern — reference analog: per-worker client state,
    ``jobs/dex_wallets/export_lp_contracts_job.py:48-56``).
    """

    def __init__(self, text_col="text", id_col="doc_id", num_perm=64, bands=16,
                 shingle_k=3):
        from ..functions.hashes import minhash_params

        self.a, self.b = minhash_params(num_perm)
        self.text_col, self.id_col = text_col, id_col
        self.bands = bands
        self.shingle_k = shingle_k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashes import (
            band_keys_matrix,
            minhash_signatures_batch,
            shingle_hashes_batch,
        )

        shingles = shingle_hashes_batch(
            df[self.text_col].tolist(), self.shingle_k
        )
        sigs = minhash_signatures_batch(shingles, self.a, self.b)
        bk = band_keys_matrix(sigs, self.bands)  # (n, bands)
        n = len(df)
        ids = np.repeat(df[self.id_col].to_numpy(), self.bands)
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(self.bands, dtype=np.int32), n),
                "bucket": bk.reshape(-1),
                self.id_col: ids,
            }
        )


def lsh_candidate_pairs(
    docs: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    concurrency: int = 4,
    max_bucket: int = 200,
) -> rd.Dataset:
    """documents → (a, b) candidate near-dup id pairs via MinHash LSH.

    shingle→minhash→band→bucket groupby: docs sharing any band bucket become
    a candidate pair.  ``max_bucket`` caps degenerate buckets (skew guard —
    a bucket of B docs would emit B² pairs); capped buckets are truncated to
    the ``max_bucket`` smallest ids (logged in the row count, not silent:
    pairs from such buckets still appear via the docs' other 15 bands).
    """
    bucketed = docs.select_columns([id_col, text_col]).map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands,
            shingle_k=shingle_k,
        ),
        batch_format="pandas",
        batch_size=1024,
        concurrency=(1, concurrency),
    )

    # hash-partition by (band, bucket) and build every bucket's pairs with
    # ONE vectorized self-merge per partition (per-bucket Python groups are
    # the classic map_groups overhead trap: bands × docs tiny groups)
    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        with np.errstate(over="ignore"):
            key = (
                df["bucket"].to_numpy().astype(np.uint64) * np.uint64(1000003)
                + df["band"].to_numpy().astype(np.uint64)
            )
        df[_PART] = (key % np.uint64(32)).astype(np.int32)
        return df

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["band", "bucket", id_col]).sort_values(
            id_col, kind="stable"
        )
        # skew guard: cap degenerate buckets at max_bucket smallest ids
        g = g.groupby(["band", "bucket"], sort=False).head(max_bucket)
        m = g.merge(g, on=["band", "bucket"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        return pd.DataFrame(
            {
                "a": m[f"{id_col}_x"].to_numpy(),
                "b": m[f"{id_col}_y"].to_numpy(),
            }
        )

    cands = (
        bucketed.map_batches(add_part, batch_format="pandas")
        .groupby(_PART)
        .map_groups(pairs_part, batch_format="pandas")
    )
    return exact_dedup(cands, ["a", "b"], num_partitions=16)


def copartitioned_jaccard(
    cands: rd.Dataset,
    docs: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Exact Jaccard for candidate (a, b) pairs WITHOUT materializing the doc
    table anywhere: two hash-routed co-partition rounds (attach text_a by
    ``hash(a) % P``, then verify in the ``hash(b) % P`` partition holding
    text_b).  This is the 100 TB path — each task only ever sees one doc
    partition plus the pairs routed to it; P bounds task memory.

    Output: (a, b, n_inter, n_union, jaccard) — inter/union as exact int64
    counts of unique word-``shingle_k``-shingles (hash-compare friendly),
    jaccard = n_inter / n_union rounded to 6 dp (0.0 when both sides empty).
    """
    P = np.uint64(num_partitions)

    def tag_docs(key_out: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            ids = df[id_col].to_numpy().astype(np.int64)
            return pd.DataFrame(
                {
                    _PART: (ids.astype(np.uint64) % P).astype(np.int32),
                    "kind": np.zeros(len(df), np.int8),
                    "a": ids if key_out == "a" else np.zeros(len(df), np.int64),
                    "b": ids if key_out == "b" else np.zeros(len(df), np.int64),
                    "text": df[text_col].fillna("").to_numpy(),
                }
            )

        return f

    def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                _PART: (a.astype(np.uint64) % P).astype(np.int32),
                "kind": np.ones(len(df), np.int8),
                "a": a,
                "b": df["b"].to_numpy().astype(np.int64),
                "text": np.full(len(df), "", dtype=object),
            }
        )

    _empty1 = pd.DataFrame(
        {
            _PART: np.array([], np.int32),
            "kind": np.array([], np.int8),
            "a": np.array([], np.int64),
            "b": np.array([], np.int64),
            "text": np.array([], object),
        }
    )

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        is_doc = g["kind"].to_numpy() == 0
        pairs = g[~is_doc]
        if not len(pairs):
            return _empty1
        lookup = dict(
            zip(g["a"].to_numpy()[is_doc], g["text"].to_numpy()[is_doc])
        )
        b = pairs["b"].to_numpy()
        return pd.DataFrame(
            {
                _PART: (b.astype(np.uint64) % P).astype(np.int32),
                "kind": np.ones(len(pairs), np.int8),
                "a": pairs["a"].to_numpy(),
                "b": b,
                # text now carries text_a, routed to b's partition
                "text": np.array(
                    [lookup[i] for i in pairs["a"]], dtype=object
                ),
            }
        )

    _empty2 = pd.DataFrame(
        {
            "a": np.array([], np.int64),
            "b": np.array([], np.int64),
            "n_inter": np.array([], np.int64),
            "n_union": np.array([], np.int64),
            "jaccard": np.array([], np.float64),
        }
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashes import shingle_hashes_batch
        from ..functions.segments import pair_intersection_counts

        is_doc = g["kind"].to_numpy() == 0
        pairs = g[~is_doc]
        if not len(pairs):
            return _empty2
        a = pairs["a"].to_numpy()
        b = pairs["b"].to_numpy()
        # shingle once per UNIQUE doc on each side (a-side text rides on the
        # pair rows; b-side text comes from this partition's doc rows), then
        # count every pair's intersection in one whole-array pass
        ua, a_first, a_codes = np.unique(
            a, return_index=True, return_inverse=True
        )
        sh_a = shingle_hashes_batch(
            pairs["text"].to_numpy()[a_first].tolist(), shingle_k
        )
        doc_ids = g["b"].to_numpy()[is_doc]
        doc_txt = g["text"].to_numpy()[is_doc]
        ub, b_codes = np.unique(b, return_inverse=True)
        o = np.argsort(doc_ids, kind="stable")
        sorted_ids = doc_ids[o]
        pos = np.searchsorted(sorted_ids, ub)
        # fail LOUDLY on a b-id with no doc row (stale pair table, pairs
        # from a superset corpus): an unguarded searchsorted insertion
        # point would silently shingle an unrelated document
        bad = (pos >= len(sorted_ids)) | (
            sorted_ids[np.minimum(pos, max(len(sorted_ids) - 1, 0))] != ub
            if len(sorted_ids)
            else np.ones(len(ub), dtype=bool)
        )
        if bad.any():
            raise KeyError(
                f"copartitioned_jaccard: {int(bad.sum())} candidate-pair "
                f"b-ids have no document row in this partition "
                f"(first missing: {ub[bad][:3].tolist()})"
            )
        sh_b = shingle_hashes_batch(doc_txt[o[pos]].tolist(), shingle_k)
        inter, union = pair_intersection_counts(
            sh_a + sh_b, a_codes, b_codes + len(sh_a)
        )
        return pd.DataFrame(
            {
                "a": pairs["a"].to_numpy(),
                "b": pairs["b"].to_numpy(),
                "n_inter": inter,
                "n_union": union,
                "jaccard": _jaccard6(inter, union),
            }
        )

    docs = docs.select_columns([id_col, text_col])
    st1 = (
        docs.map_batches(tag_docs("a"), batch_format="pandas")
        .union(cands.map_batches(tag_pairs, batch_format="pandas"))
        .groupby(_PART)
        .map_groups(attach_a, batch_format="pandas")
    )
    return (
        docs.map_batches(tag_docs("b"), batch_format="pandas")
        .union(st1)
        .groupby(_PART)
        .map_groups(verify, batch_format="pandas")
    )


class _BroadcastJaccard:
    """Small-side verify: the doc lookup is ``ray.put`` once and shared by
    every actor (J1 broadcast pattern) — chosen only when the corpus is
    below the dispatch threshold, where two extra co-partition shuffles
    would cost more than shipping the table."""

    def __init__(self, docs_ref, shingle_k=3):
        import ray

        self.lookup = ray.get(docs_ref)  # dict id -> text
        self.shingle_k = shingle_k
        self._cache: dict = {}  # doc id -> shingle array, lives per actor

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashes import shingle_hashes_batch
        from ..functions.segments import pair_intersection_counts

        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        ids = np.unique(np.concatenate([a, b])) if len(df) else a
        missing = [i for i in ids.tolist() if i not in self._cache]
        if missing:
            shs = shingle_hashes_batch(
                [self.lookup[i] for i in missing], self.shingle_k
            )
            self._cache.update(zip(missing, shs))
        inter, union = pair_intersection_counts(
            [self._cache[i] for i in ids.tolist()],
            np.searchsorted(ids, a),
            np.searchsorted(ids, b),
        )
        return pd.DataFrame(
            {
                "a": df["a"].to_numpy(),
                "b": df["b"].to_numpy(),
                "n_inter": inter,
                "n_union": union,
                "jaccard": _jaccard6(inter, union),
            }
        )


def minhash_dedup_pairs(
    docs: rd.Dataset,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
    broadcast_max_rows: int = 100_000,
    **lsh_kwargs,
) -> rd.Dataset:
    """LSH candidates → exact-Jaccard verify → pairs with sim ≥ threshold.

    Verify strategy is size-dispatched like a join planner: a corpus under
    ``broadcast_max_rows`` is broadcast once (``ray.put`` dict — the J1
    small-side pattern; two extra shuffles would dominate at this size),
    anything larger takes the CO-PARTITIONED route, which never
    materializes the corpus anywhere (pairs are hash-routed to the doc
    partitions holding their texts).  Both paths emit identical
    (a, b, n_inter, n_union, jaccard) rows (pinned by test_dedup).
    Set ``broadcast_max_rows=0`` to force the streaming path."""
    cands = lsh_candidate_pairs(
        docs, text_col=text_col, id_col=id_col, **lsh_kwargs
    )
    shingle_k = lsh_kwargs.get("shingle_k", 3)
    n_docs = docs.count()
    if n_docs <= broadcast_max_rows:
        import ray

        side = docs.select_columns([id_col, text_col]).to_pandas()
        ref = ray.put(dict(zip(side[id_col].astype(int), side[text_col])))
        verified = cands.map_batches(
            _BroadcastJaccard,
            fn_constructor_kwargs=dict(docs_ref=ref, shingle_k=shingle_k),
            batch_format="pandas",
            batch_size=4096,
            concurrency=2,
        )
    else:
        verified = copartitioned_jaccard(
            cands,
            docs,
            text_col=text_col,
            id_col=id_col,
            shingle_k=shingle_k,
            num_partitions=num_partitions,
        )
    import pyarrow.compute as pc

    # threshold on the exact integer counts: j >= t  <=>  inter >= t * union
    return verified.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater(t["n_union"], 0),
                pc.greater_equal(
                    pc.cast(t["n_inter"], "float64"),
                    pc.multiply(pc.cast(t["n_union"], "float64"), threshold),
                ),
            )
        ),
        batch_format="pyarrow",
    )


def dup_groups_from_pairs(pairs_df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, dup_group) from verified pairs — union-find on the driver.

    The verified pair set is tiny relative to the corpus (LSH precision),
    so a driver-side union-find is appropriate; at web scale the same
    edges feed ``dup_groups_distributed`` (the min-label CC kernel),
    which a test pins to identical output.
    """
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = sorted(parent)
    return pd.DataFrame(
        {"doc_id": ids, "dup_group": [find(i) for i in ids]}
    )


def dup_groups_distributed(
    pairs: rd.Dataset, graph_dir: str, *, num_partitions: int = 4
) -> rd.Dataset:
    """(doc_id, dup_group) via the DISTRIBUTED min-label CC kernel — the
    scale path the driver-side union-find documents: verified pairs are an
    edge table; group ids are component labels (min member id, identical
    to union-find's root convention).  Returns Dataset(doc_id, dup_group);
    isolated docs (no pairs) are absent, as with union-find."""
    from ..pipelines.components import connected_components
    from ..pipelines.edges import build_graph_from_edges, edges_from_vid_pairs

    build_graph_from_edges(
        edges_from_vid_pairs(pairs, "a", "b"), graph_dir, num_partitions,
        lineage={"source": "dedup pairs"},
    )
    labels, _ = connected_components(graph_dir)
    return labels.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["vid"].to_numpy(),
                "dup_group": df["label"].to_numpy(),
            }
        ),
        batch_format="pandas",
    )


class SimHasher:
    """Actor-pool stage: text → 64-bit SimHash + 4×16-bit band keys
    (guarantees hamming ≤ 3 collides in ≥ 1 band)."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashes import simhash64_batch

        sh = simhash64_batch(df[self.text_col].fillna("").tolist())
        out = pd.DataFrame(
            {self.id_col: df[self.id_col].to_numpy(), "simhash": sh.view(np.int64)}
        )
        for b in range(4):
            out[f"band{b}"] = (
                (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            ).astype(np.int32)
        return out


def capped_bucket_stats(
    bucketed: rd.Dataset, bucket_cols: Sequence[str], max_bucket: int
) -> dict:
    """Dropped-work accounting for the capped bucket stages ("no silent
    caps"): returns ``{"n_truncated_buckets", "n_dropped_members"}`` for a
    (…, bucket) table whose buckets are truncated to ``max_bucket`` rows.
    One small two-phase count aggregate; the result is a handful of rows,
    so the driver-side sum is fine at any scale."""
    from ray.data.aggregate import Count

    sizes = bucketed.groupby(list(bucket_cols)).aggregate(
        Count(alias_name="n")
    )
    big = sizes.map_batches(
        lambda df: df[df["n"] > max_bucket], batch_format="pandas"
    ).to_pandas()
    return {
        "n_truncated_buckets": int(len(big)),
        "n_dropped_members": int((big["n"] - max_bucket).sum())
        if len(big)
        else 0,
    }


def simhash_dedup_pairs(
    docs: rd.Dataset,
    *,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
    max_bucket: int = 200,
    strict_caps: bool = False,
    export_signatures: str | None = None,
) -> rd.Dataset:
    """SimHash near-dup pairs: band-bucket candidates → exact hamming verify.

    With 4 bands over a 64-bit signature, hamming ≤ 3 GUARANTEES at least
    one intact band (pigeonhole), so when no bucket is truncated the output
    is exactly the all-pairs hamming-≤3 set — the property the SQL oracle
    checks (``bit_count(xor(sig_a, sig_b)) <= 3`` over the exported
    signatures).

    ``max_bucket`` caps degenerate band buckets (same guard as the MinHash
    LSH stage): a bucket of B identical-ish docs would otherwise emit O(B²)
    pairs in every band.  Capped buckets keep the ``max_bucket`` smallest
    ids (deterministic); ``strict_caps=True`` makes truncation LOUD — it
    counts truncated buckets (one tiny extra aggregate over the signature
    table) and raises instead of silently dropping pairs (at web scale a
    degenerate bucket is an exact-dup cluster, handled by exact dedup
    first, so the strict mode is cheap insurance, not a hot path).

    ``export_signatures`` writes the (id, simhash) table to a parquet dir
    for external verification (the DuckDB oracle) — the signature table is
    one small row per doc and already materialized.

    Banding shuffles ONCE: signatures explode to (band_key, id, simhash)
    rows — band_key = band·2¹⁶ + 16-bit band value — and a single groupby
    builds every band's pairs (4 separate band groupbys would pay the
    fixed per-shuffle cost 4×)."""
    hashed = docs.select_columns([id_col, text_col]).map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, concurrency),
    ).materialize()  # tiny (one row per doc); the fan-outs below (export,
    # cap stats, banding) must not re-run the actor pool

    if export_signatures is not None:
        hashed.select_columns([id_col, "simhash"]).write_parquet(
            export_signatures
        )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        keys = [
            df[f"band{b}"].to_numpy().astype(np.int64) + (b << 16)
            for b in range(4)
        ]
        return pd.DataFrame(
            {
                "band_key": np.concatenate(keys),
                id_col: np.tile(df[id_col].to_numpy(), 4),
                "simhash": np.tile(df["simhash"].to_numpy(), 4),
            }
        )

    exploded = hashed.map_batches(explode, batch_format="pandas")

    if strict_caps:
        stats = capped_bucket_stats(exploded, ["band_key"], max_bucket)
        if stats["n_dropped_members"]:
            raise ValueError(
                f"simhash_dedup_pairs(strict_caps=True): "
                f"{stats['n_truncated_buckets']} band buckets over "
                f"max_bucket={max_bucket} would drop "
                f"{stats['n_dropped_members']} members (pairs lost); "
                f"raise max_bucket or run exact dedup first"
            )

    # partitioned-vectorized pairing: hash-route band buckets to 32
    # partitions, then ONE segment-arithmetic pass builds every bucket's
    # pairs (per-band_key Python groups are the map_groups overhead trap —
    # bands × corpus tiny buckets at web scale)
    from ..functions.segments import (
        segment_bounds,
        segment_pair_indices,
        segment_rank,
    )

    _empty = {
        "a": np.array([], np.int64),
        "b": np.array([], np.int64),
        "hamming": np.array([], np.int64),
    }

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[_PART] = (
            df["band_key"].to_numpy().astype(np.uint64) % np.uint64(32)
        ).astype(np.int32)
        return df

    def band_pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["band_key", id_col]).sort_values(
            ["band_key", id_col], kind="mergesort"
        )
        keys = g["band_key"].to_numpy()
        # skew guard: each bucket keeps its max_bucket smallest ids
        rank = segment_rank(segment_bounds(keys))
        if (rank >= max_bucket).any():
            g = g[rank < max_bucket]
            keys = g["band_key"].to_numpy()
        if len(g) < 2:
            return pd.DataFrame(_empty)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        ii, jj = segment_pair_indices(segment_bounds(keys))
        if not len(ii):
            return pd.DataFrame(_empty)
        x = hs[ii] ^ hs[jj]
        # vectorized popcount: 8 bytes per word -> unpackbits -> row sums
        ham = (
            np.unpackbits(x[:, None].view(np.uint8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"a": ids[ii][keep], "b": ids[jj][keep], "hamming": ham[keep]}
        )

    allpairs = (
        exploded.map_batches(add_part, batch_format="pandas")
        .groupby(_PART)
        .map_groups(band_pairs_part, batch_format="pandas")
    )
    return exact_dedup(allpairs, ["a", "b"], num_partitions=16)

