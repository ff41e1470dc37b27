"""Text-analysis stages over the ``documents`` table.

Vectorized ``map_batches`` stages wrapping the pinned functions in
``functions/textstats.py``; the language-ID stage is an actor pool (the
stopword tables are its per-actor state, compiled once in ``__init__``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd


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
    shape of a production tokenizer stage."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
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
                    [bpe_real_token_count(t, self._bpe_cache) for t in s],
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
) -> rd.Dataset:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_bpe_real) — whitespace count,
    BPE-ish regex pre-token count, and real merge-loop BPE symbol count."""
    return docs.select_columns([id_col, text_col]).map_batches(
        TokenCountStage,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
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

    from ..functions.textstats import fingerprint_with_hashes

    def f(df: pd.DataFrame) -> pa.Table:
        pairs = [fingerprint_with_hashes(t) for t in df[text_col].fillna("")]
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
                "fingerprint": pa.array(
                    np.array([p[0] for p in pairs], dtype=np.uint64).view(
                        np.int64
                    )
                ),
                "hashes": pa.array(
                    [p[1] for p in pairs], type=pa.list_(pa.int64())
                ),
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
