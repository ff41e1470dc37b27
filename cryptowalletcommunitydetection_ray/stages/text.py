"""Text-analysis stages over the ``documents`` table.

Vectorized ``map_batches`` stages wrapping the pinned functions in
``functions/textstats.py``; the language-ID stage is an actor pool (the
stopword tables are its per-actor state, compiled once in ``__init__``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

_PART = "__part"


def quality_stats(
    docs: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """(doc_id, n_chars, n_tokens, punct_ratio, digit_ratio, upper_ratio)."""
    from ..functions.textstats import quality_frame

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = quality_frame(df[text_col])
        out.insert(0, id_col, df[id_col].to_numpy())
        return out

    return docs.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas"
    )


class TokenCountStage:
    """Actor-pool token counting: whitespace tokens, GPT-2-regex pre-token
    count, and the REAL byte-pair-merge tokenizer (``BPE_MERGES`` applied
    in rank order).  The per-unique-pre-token count cache is actor state
    built up across batches — the "vocab/model loaded once per actor"
    shape of a production tokenizer stage.

    ``merges_path``: optional GPT-2-style ``merges.txt`` — loaded ONCE per
    actor here in ``__init__`` (the production-vocab hook); when absent
    the pinned ``BPE_MERGES`` table is used, which is what the SQL
    oracles reproduce."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 merges_path: str | None = None):
        from ..functions.textstats import load_merges_file

        self.text_col, self.id_col = text_col, id_col
        self._merges = (
            load_merges_file(merges_path) if merges_path else None
        )
        self._bpe_cache: dict[str, int] = {}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.textstats import (
            bpe_real_token_count,
            bpe_token_count,
        )

        s = df[self.text_col].fillna("")
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col].to_numpy(),
                "n_ws_tokens": s.str.count(r"\S+").astype(np.int64),
                "n_bpe_tokens": np.array(
                    [bpe_token_count(t) for t in s], dtype=np.int64
                ),
                "n_bpe_real": np.array(
                    [
                        bpe_real_token_count(t, self._bpe_cache, self._merges)
                        for t in s
                    ],
                    dtype=np.int64,
                ),
            }
        )


def token_counts(
    docs: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
    merges_path: str | None = None,
) -> rd.Dataset:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_bpe_real) — whitespace count,
    BPE-ish regex pre-token count, and real merge-loop BPE symbol count
    (over ``merges_path``'s vocab when given, else the pinned table)."""
    return docs.select_columns([id_col, text_col]).map_batches(
        TokenCountStage,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, merges_path=merges_path
        ),
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, concurrency),
    )


class LangIdStage:
    """Actor-pool language-ID: per-actor stopword index, vectorized scoring.

    Pinned heuristic (``functions/textstats.py:langid``): argmax of
    stopword-hit counts per language; ties/zero-hits → "und".
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        from ..functions.textstats import LANG_ORDER, STOPWORDS

        self.text_col, self.id_col = text_col, id_col
        self.langs = np.array(LANG_ORDER, dtype=object)
        # per-actor state: one sorted word array per language (LANG_ORDER)
        self.stop_arrays = [
            np.sort(np.array(sorted(STOPWORDS[lang]), dtype=object))
            for lang in LANG_ORDER
        ]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        # batch tokenization: lowercase once, whitespace-split, flatten
        ex = (
            df[self.text_col]
            .fillna("")
            .str.lower()
            .str.split()
            .reset_index(drop=True)
            .explode()
            .dropna()
        )
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        if len(ex):
            docpos = ex.index.to_numpy(dtype=np.int64)
            codes, uniques = pd.factorize(ex.to_numpy())
            # (unique-token × lang) membership, then per-doc bincount folds
            for j, sw in enumerate(self.stop_arrays):
                member = np.isin(uniques, sw)[codes]
                if member.any():
                    scores[:, j] = np.bincount(
                        docpos[member], minlength=n
                    )
        best = scores.argmax(axis=1)  # first max → LANG_ORDER tie-break
        hits = scores[np.arange(n), best]
        preds = np.where(hits > 0, self.langs[best], "und")
        return pd.DataFrame(
            {self.id_col: df[self.id_col].to_numpy(), "lang_pred": preds}
        )


def language_id(
    docs: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
) -> rd.Dataset:
    return docs.select_columns([id_col, text_col]).map_batches(
        LangIdStage,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, concurrency),
    )


def fingerprints(
    docs: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    export_token_hashes: str | None = None,
) -> rd.Dataset:
    """(doc_id, fingerprint) — rolling-hash document fingerprint.

    ``export_token_hashes`` additionally writes (doc_id, hashes
    ``list<int64>``) to parquet — the deterministic intermediate an
    external oracle folds independently (``fp ← (fp·BASE + h) mod 2^61−1``
    is exact HUGEINT arithmetic in DuckDB), the same export pattern as the
    SimHash signature table."""
    import pyarrow as pa

    from ..functions.textstats import fingerprints_batch

    def f(df: pd.DataFrame) -> pa.Table:
        fps, vecs = fingerprints_batch(df[text_col].fillna("").tolist())
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
                "fingerprint": pa.array(fps.view(np.int64)),
                "hashes": pa.array(vecs, type=pa.list_(pa.int64())),
            }
        )

    out = docs.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas"
    )
    if export_token_hashes is not None:
        out = out.materialize()
        out.select_columns([id_col, "hashes"]).write_parquet(
            export_token_hashes
        )
    return out.select_columns([id_col, "fingerprint"])


def token_topk(
    docs: rd.Dataset, *, k: int = 20, text_col: str = "text"
) -> rd.Dataset:
    """Exact corpus-wide top-k frequent tokens: (token, n), n desc, token
    asc (pinned tie-break).

    The canonical pre-aggregation pattern spelled out: each batch emits
    PARTIAL (token, n) counts (``np.unique`` over the batch's concatenated
    token stream), so the shuffle moves one row per distinct token per
    block instead of one per occurrence — at web scale the reduction is
    ~1000× (Zipf).  The groupby-Sum then merges partials, and the final
    sort+limit runs over distinct tokens only (≪ corpus)."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def partial_counts(t: pa.Table) -> pa.Table:
        # all-Arrow: split/flatten/count run C kernels over the batch's
        # string buffers — token bytes never become Python objects
        # (utf8_split_whitespace emits "" at whitespace boundaries, unlike
        # pandas str.split — filtered to keep tokenization pinned)
        import pyarrow.compute as pc

        col = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        flat = pc.list_flatten(pc.utf8_split_whitespace(col))
        flat = pc.filter(flat, pc.not_equal(flat, ""))
        if len(flat) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n_part": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(flat)
        return pa.table(
            {"token": vc.field("values"), "n_part": vc.field("counts")}
        )

    counts = (
        docs.select_columns([text_col])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n_part", alias_name="n"))
    )

    # per-block partial top-k before the final sort: each block of the
    # distinct-token table keeps its local k best, so the global sort
    # ranks <= k rows per block instead of range-partitioning the entire
    # vocabulary — the _merge_topk pattern, not a full-table ds.sort
    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n", "token"], ascending=[False, True], kind="mergesort"
        ).head(k)

    trimmed = counts.map_batches(local_topk, batch_format="pandas")
    return trimmed.sort(["n", "token"], descending=[True, False]).limit(k)


def inverted_index(
    docs: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Posting lists: (token, df, postings ``list<int64>`` sorted asc).

    ONE hash-partition shuffle keyed by token hash; each batch pre-drops
    duplicate occurrences (DISTINCT (token, doc) pairs), so within-doc
    repetition never hits the wire, and every token of a partition
    collects in one vectorized call (sort + segment offsets → one Arrow
    ListArray — no per-token Python).  Partitioning note for 100 TB:
    stopword-class tokens produce giant postings — route through
    ``min_df``/stoplists or cap postings per token before using this as a
    serving index; as a contamination/dedup auxiliary the full lists are
    the point."""
    import pyarrow as pa

    from ..context import hash64
    from .relational import _resolve_partitions

    num_partitions = _resolve_partitions(docs, num_partitions)

    def pairs(t: pa.Table) -> pa.Table:
        # all-Arrow flatten + DISTINCT: split/flatten/parent-index/group_by
        # are C kernels, so per-occurrence token bytes never become Python
        # objects; only the batch's UNIQUE tokens (dictionary_encode) are
        # materialized once for the hash64 partition routing
        import pyarrow.compute as pc

        col = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        lists = pc.utf8_split_whitespace(col)
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        mask = pc.not_equal(flat, "")
        flat = pc.filter(flat, mask)
        parent = pc.filter(parent, mask)
        ids = pc.take(pc.cast(t[id_col], pa.int64()), parent)
        distinct = (
            pa.table({"token": flat, id_col: ids})
            .group_by(["token", id_col])
            .aggregate([])
        )
        d = distinct["token"].combine_chunks().dictionary_encode()
        uniq = d.dictionary.to_numpy(zero_copy_only=False)
        hpart = (
            hash64(uniq).astype(np.uint64) % np.uint64(num_partitions)
        ).astype(np.int32)
        part = (
            hpart[d.indices.to_numpy()]
            if len(distinct)
            else np.array([], np.int32)
        )
        return distinct.append_column(_PART, pa.array(part, pa.int32()))

    def collect_part(g: pd.DataFrame) -> pa.Table:
        g = g[["token", id_col]].drop_duplicates().sort_values(
            ["token", id_col], kind="mergesort"
        )
        toks = g["token"].to_numpy()
        starts = (
            np.flatnonzero(np.r_[True, toks[1:] != toks[:-1]])
            if len(g)
            else np.empty(0, np.int64)
        )
        bounds = np.r_[starts, len(g)]
        dfreq = np.diff(bounds)
        keep = dfreq >= min_df
        ks = starts[keep]
        kept_lens = dfreq[keep]
        # rebuild offsets over only the kept segments; rows of kept
        # segments selected with one repeat+mask (no per-token loop)
        offsets = np.r_[0, np.cumsum(kept_lens)].astype(np.int32)
        row_seg = np.repeat(np.arange(len(starts)), dfreq)
        idx = np.flatnonzero(keep[row_seg]) if len(g) else np.empty(0, np.int64)
        la = pa.ListArray.from_arrays(
            pa.array(offsets),
            pa.array(
                g[id_col].to_numpy()[idx].astype(np.int64), pa.int64()
            ),
        )
        return pa.table(
            {
                "token": pa.array(toks[ks], pa.string()),
                "df": pa.array(kept_lens, pa.int64()),
                "postings": la,
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(collect_part, batch_format="pandas")
    )


def _batch_grams(texts: pd.Series, n: int):
    """Word n-grams for a whole batch in one Arrow-native pass.

    Tokens come from pandas' C-level ``str.split`` (whitespace — identical
    to ``WS_TOKEN_RE.findall``); every doc's window start positions are
    derived with segment arithmetic over the flattened token array, and
    the gram STRINGS are built by ONE ``binary_join_element_wise`` over n
    shifted takes — no per-doc or per-gram Python string work.  Returns
    ``(doc_index_per_gram: int64[], grams: pa.StringArray)``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    toks = texts.fillna("").str.split()
    lens = toks.str.len().to_numpy().astype(np.int64)
    n_grams = np.maximum(lens - n + 1, 0)
    g_total = int(n_grams.sum())
    if g_total == 0:
        return np.empty(0, np.int64), pa.array([], pa.string())
    flat = pa.array(
        [t for lst in toks for t in lst], pa.string()
    )  # pointer-level flatten; the string bytes stay in one Arrow buffer
    doc_starts = np.r_[0, np.cumsum(lens)][:-1]
    doc_of_gram = np.repeat(np.arange(len(lens), dtype=np.int64), n_grams)
    gram_starts = np.r_[0, np.cumsum(n_grams)][:-1]
    pos = (
        np.arange(g_total, dtype=np.int64)
        - gram_starts[doc_of_gram]
        + doc_starts[doc_of_gram]
    )
    parts = [pc.take(flat, pa.array(pos + k)) for k in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    return doc_of_gram, grams


def contamination_screen(
    docs: rd.Dataset,
    bench: rd.Dataset,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
) -> rd.Dataset:
    """Benchmark-contamination screen: (doc_id, n_hits) where n_hits =
    number of DISTINCT word ``n``-grams of the doc that appear anywhere in
    the benchmark set.

    The benchmark side is SMALL by construction (eval suites are MBs) —
    its distinct n-gram set is collected once on the driver and broadcast
    via ``ray.put``; every corpus task reads the same object-store copy,
    so the corpus side streams with zero shuffle.  Per batch the corpus
    side builds all grams Arrow-natively (``_batch_grams``).

    Two membership modes (identical broadcast/stream shape, identical
    results barring astronomically unlikely collisions — pinned equal on
    test corpora):

    - ``hashed=False``: grams matched as STRINGS via one C-level
      ``pc.is_in`` — exact and SQL-reproducible, broadcast carries the
      gram bytes (~n·word bytes per gram).
    - ``hashed=True``: the 100 TB shape — grams fold to int64 via
      ``hash64`` on both sides; the broadcast is a sorted int64 array
      (8 B/gram, ~10× smaller) probed with ``np.searchsorted``, and the
      per-doc DISTINCT count is a lexsort over (doc, hash) pairs.  False
      positives need a 64-bit collision between a corpus gram and a
      bench gram (~q·c/2⁶⁴): negligible, and only ever OVERcounts n_hits
      by 1."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from ..context import hash64

    bench_grams: set[str] = set()
    for b in bench.select_columns([text_col]).iter_batches(
        batch_format="pandas", batch_size=1024
    ):
        _, grams = _batch_grams(b[text_col], n)
        bench_grams.update(grams.to_pylist())
    if hashed:
        ref = ray.put(
            np.unique(hash64(np.array(sorted(bench_grams), dtype=object)))
            if bench_grams
            else np.empty(0, np.int64)
        )
    else:
        ref = ray.put(pa.array(sorted(bench_grams), pa.string()))

    class Screen:
        def __init__(self):
            self.gram_set = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            doc_of, grams = _batch_grams(df[text_col], n)
            hits = np.zeros(len(df), dtype=np.int64)
            if len(grams) and len(self.gram_set):
                if hashed:
                    h = hash64(grams.to_numpy(zero_copy_only=False))
                    s = self.gram_set  # sorted int64
                    pos = np.searchsorted(s, h)
                    m = (pos < len(s)) & (
                        s[np.minimum(pos, len(s) - 1)] == h
                    )
                    if m.any():
                        md, mh = doc_of[m], h[m]
                        order = np.lexsort((mh, md))
                        md, mh = md[order], mh[order]
                        first = np.r_[
                            True,
                            (md[1:] != md[:-1]) | (mh[1:] != mh[:-1]),
                        ]
                        np.add.at(hits, md[first], 1)
                else:
                    m = pc.is_in(
                        grams, value_set=self.gram_set
                    ).to_numpy(zero_copy_only=False)
                    if m.any():
                        matched = pd.DataFrame(
                            {
                                "d": doc_of[m],
                                "g": pc.filter(
                                    grams, pa.array(m)
                                ).to_pandas(),
                            }
                        ).drop_duplicates()
                        np.add.at(
                            hits,
                            matched["d"].to_numpy(),
                            np.ones(len(matched), dtype=np.int64),
                        )
            return pd.DataFrame(
                {id_col: df[id_col].to_numpy(), "n_hits": hits}
            )

    return docs.select_columns([id_col, text_col]).map_batches(
        Screen, batch_format="pandas", concurrency=(1, 8)
    )
