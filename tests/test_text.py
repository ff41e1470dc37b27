"""Text-analysis functions and stages."""

import numpy as np
import pandas as pd

from cryptowalletcommunitydetection_ray.functions.textstats import (
    bpe_token_count,
    fingerprint,
    langid,
    quality_frame,
    ws_token_count,
)


def test_token_counts():
    assert ws_token_count("a  b\tc\nd") == 4
    assert ws_token_count("") == 0
    # it | 's | 42 | red | - | ish | apples
    assert bpe_token_count("it's 42 red-ish apples") == 7
    assert bpe_token_count("   ") == 0


def test_quality_frame():
    out = quality_frame(pd.Series(["Ab1! cd", ""]))
    assert out["n_chars"].tolist() == [7, 0]
    assert out["n_tokens"].tolist() == [2, 0]
    assert out["punct_ratio"].tolist() == [round(1 / 7, 6), 0.0]
    assert out["digit_ratio"].tolist() == [round(1 / 7, 6), 0.0]
    assert out["upper_ratio"].tolist() == [round(1 / 7, 6), 0.0]
    assert out["space_ratio"].tolist() == [round(1 / 7, 6), 0.0]


def test_fingerprint_deterministic_and_order_sensitive():
    assert fingerprint("a b c") == fingerprint("a b c")
    assert fingerprint("a b c") != fingerprint("c b a")
    assert fingerprint("") == 0


def test_langid():
    assert langid("the cat and the hat is in a box") == "en"
    assert langid("der hund und die katze ist ein tier") == "de"
    assert langid("xyzzy qwerty") == "und"
    assert langid("") == "und"


def test_stages_over_dataset(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.text import (
        fingerprints,
        language_id,
        quality_stats,
        token_counts,
    )

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["the cat and the dog", "der hund und katze", "x1!"],
            }
        )
    )
    q = quality_stats(docs).to_pandas().sort_values("doc_id")
    assert q["n_tokens"].tolist() == [5, 4, 1]
    t = token_counts(docs).to_pandas().sort_values("doc_id")
    assert t["n_ws_tokens"].tolist() == [5, 4, 1]
    lang = language_id(docs).to_pandas().sort_values("doc_id")
    assert lang["lang_pred"].tolist() == ["en", "de", "und"]
    fp = fingerprints(docs).to_pandas().sort_values("doc_id")
    assert fp["fingerprint"].nunique() == 3


def test_bpe_real_token_count():
    from cryptowalletcommunitydetection_ray.functions.textstats import (
        BPE_MERGES,
        bpe_real_token_count,
    )

    # "the" fully merges (t+h, th+e); "and" likewise (a+n, an+d)
    assert bpe_real_token_count("the") == 1
    assert bpe_real_token_count("and") == 1
    # "thethe": adjacent " th e " occurrences SHARE the boundary space, so
    # the non-overlapping replace pass merges only the first → the th e
    # (this boundary behavior is part of the pin; DuckDB replace matches)
    assert bpe_real_token_count("thethe") == 3
    # "dog": no merge applies (d+o / o+g not in the table) → 3 symbols
    assert bpe_real_token_count("dog") == 3
    # pre-tokens split first: "x1!" → "x" + "1" + "!" → 3 symbols
    assert bpe_real_token_count("x1!") == 3
    assert bpe_real_token_count("") == 0
    assert bpe_real_token_count("   ") == 0
    # leading-space pre-token equals the bare word (marker is stripped)
    assert bpe_real_token_count("the the") == 2
    # cache returns identical counts and actually fills
    cache: dict = {}
    a = bpe_real_token_count("the cat and the dog", cache)
    b = bpe_real_token_count("the cat and the dog", cache)
    assert a == b and cache["the"] == 1 and len(cache) >= 4
    assert ("t", "h") == BPE_MERGES[0]  # rank order is part of the pin


def test_token_counts_real_bpe_column(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.functions.textstats import (
        bpe_real_token_count,
    )
    from cryptowalletcommunitydetection_ray.stages.text import token_counts

    texts = [
        "the cat and the dog",
        "der hund und katze",
        "x1! thethe and",
        "",
    ]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    t = token_counts(docs).to_pandas().sort_values("doc_id")
    assert t["n_bpe_real"].tolist() == [
        bpe_real_token_count(x) for x in texts
    ]


def test_fingerprint_export_and_sql_fold(ray_session, tmp_path):
    """export_token_hashes writes the ordered hash vectors; DuckDB's
    HUGEINT list_reduce fold over them reproduces the engine fingerprints
    exactly — the driver-oracle mechanism, pinned here end-to-end."""
    import duckdb
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.functions.textstats import (
        FP_BASE,
        FP_MOD,
    )
    from cryptowalletcommunitydetection_ray.stages.text import fingerprints

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["the cat sat", "the cat sat on", "", "one"],
            }
        )
    )
    exp = str(tmp_path / "hashes")
    fp = (
        fingerprints(docs, export_token_hashes=exp)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sql = f"""
        SELECT doc_id,
               CAST(list_reduce(
                   list_prepend(
                       CAST(0 AS HUGEINT),
                       list_transform(hashes,
                           x -> CAST(x AS HUGEINT)
                                + CASE WHEN x < 0
                                       THEN CAST('18446744073709551616'
                                                 AS HUGEINT)
                                       ELSE 0 END)),
                   (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}
               ) AS BIGINT) AS fingerprint
        FROM read_parquet('{exp}/*.parquet') ORDER BY doc_id
    """
    ora = duckdb.sql(sql).df()
    assert (ora["fingerprint"].to_numpy() == fp["fingerprint"].to_numpy()).all()
    assert fp["fingerprint"].iloc[2] == 0  # empty doc pins to 0
