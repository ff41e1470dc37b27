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


def test_token_topk_matches_duckdb(ray_session):
    """token_topk == DuckDB count/sort/limit with the pinned tie-break
    (n desc, token asc) over the sf0.001 documents table."""
    import duckdb
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.text import token_topk

    src = "/root/testdata/sf0.001/documents.parquet"
    got = (
        token_topk(rd.read_parquet(src, columns=["text"]), k=25)
        .to_pandas()
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH toks AS (
            SELECT unnest(regexp_extract_all(text, '\\S+')) AS token
            FROM read_parquet('{src}')
        ), c AS (SELECT token, count(*) AS n FROM toks GROUP BY token)
        SELECT token, n FROM c ORDER BY n DESC, token LIMIT 25
        """
    ).df()
    assert got["token"].tolist() == want["token"].tolist()
    assert got["n"].tolist() == want["n"].astype(int).tolist()


def test_inverted_index_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.text import inverted_index

    src = "/root/testdata/sf0.001/documents.parquet"
    got = (
        inverted_index(
            rd.read_parquet(src, columns=["doc_id", "text"]), min_df=3
        )
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH pairs AS (
            SELECT DISTINCT t.token, d.doc_id
            FROM read_parquet('{src}') d,
                 unnest(regexp_extract_all(d.text, '\\S+')) AS t(token)
        )
        SELECT token, CAST(count(*) AS BIGINT) AS df,
               list(doc_id ORDER BY doc_id) AS postings
        FROM pairs GROUP BY token HAVING count(*) >= 3
        ORDER BY token
        """
    ).df()
    assert got["token"].tolist() == want["token"].tolist()
    assert got["df"].tolist() == want["df"].tolist()
    assert [list(p) for p in got["postings"]] == [
        list(p) for p in want["postings"]
    ]


def test_contamination_screen_matches_duckdb(ray_session):
    """Handcrafted positives + the sf0.001 corpus vs an independent DuckDB
    n-gram join (list-comprehension 8-gram windows)."""
    import duckdb
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.text import (
        contamination_screen,
    )

    # handcrafted: doc 100 contains bench doc 0's exact 8-gram twice
    bench_txt = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 100, 101],
            "text": [
                bench_txt,
                f"x {bench_txt} y {bench_txt}",
                "nothing shared here at all in this one really",
            ],
        }
    )
    bench = rd.from_pandas(docs[docs.doc_id < 20])
    corpus = rd.from_pandas(docs[docs.doc_id >= 20])
    got = (
        contamination_screen(corpus, bench, n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # bench doc has 2 distinct 8-grams; doc 100 contains both (its own
    # window set is larger but intersection counts DISTINCT shared grams)
    assert got.loc[got.doc_id == 100, "n_hits"].iloc[0] == 2
    assert got.loc[got.doc_id == 101, "n_hits"].iloc[0] == 0

    src = "/root/testdata/sf0.001/documents.parquet"
    import pyarrow.compute as pc

    b = rd.read_parquet(
        src, columns=["doc_id", "text"], filter=(pc.field("doc_id") < 20)
    )
    c = rd.read_parquet(
        src, columns=["doc_id", "text"], filter=(pc.field("doc_id") >= 20)
    )
    got2 = (
        contamination_screen(c, b, n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(text, '\\S+') AS t
            FROM read_parquet('{src}')
        ), grams AS (
            SELECT doc_id,
                   unnest([array_to_string(t[i+1:i+8], ' ')
                           for i in range(greatest(len(t) - 7, 0))]) AS g
            FROM toks
        ), bench AS (
            SELECT DISTINCT g FROM grams WHERE doc_id < 20
        ), hits AS (
            SELECT dg.doc_id, CAST(count(DISTINCT dg.g) AS BIGINT) AS n_hits
            FROM (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id >= 20) dg
            JOIN bench USING (g)
            GROUP BY dg.doc_id
        )
        SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits
        FROM (SELECT doc_id FROM read_parquet('{src}') WHERE doc_id >= 20) d
        LEFT JOIN hits h USING (doc_id)
        ORDER BY d.doc_id
        """
    ).df()
    assert got2["doc_id"].tolist() == want["doc_id"].tolist()
    assert got2["n_hits"].tolist() == want["n_hits"].astype(int).tolist()


def test_fingerprints_batch_parity():
    """Batch-vectorized fold is value-identical to the per-doc path across
    empty, whitespace-only, single-token and long documents."""
    import numpy as np

    from cryptowalletcommunitydetection_ray.functions.textstats import (
        fingerprint_with_hashes,
        fingerprints_batch,
    )

    texts = [
        "",
        "   \t\n ",
        "one",
        "the quick brown fox jumps over the lazy dog",
        "a b c " * 1000,
        "Zz " * 3,
    ]
    fps, vecs = fingerprints_batch(texts)
    for i, t in enumerate(texts):
        fp, hv = fingerprint_with_hashes(t)
        assert int(fps[i]) == fp
        assert np.array_equal(vecs[i], hv)


def test_contamination_screen_hashed_equals_string(ray_session):
    """The 100 TB-shape hashed membership (int64 grams + searchsorted)
    produces byte-identical results to string is_in on real text."""
    import pyarrow.compute as pc
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.text import (
        contamination_screen,
    )

    src = "/root/testdata/sf0.001/documents.parquet"
    b = rd.read_parquet(
        src, columns=["doc_id", "text"], filter=(pc.field("doc_id") < 20)
    )
    c = rd.read_parquet(src, columns=["doc_id", "text"])
    a = (
        contamination_screen(c, b, n=8, hashed=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    h = (
        contamination_screen(c, b, n=8, hashed=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(h)
    assert (a.loc[a.doc_id < 20, "n_hits"] > 0).all()  # bench ⊂ corpus


def test_merges_file_vocab_hook(tmp_path):
    """TokenCountStage(merges_path=...) loads a GPT-2-style merges.txt once
    per actor; a file holding the pinned table reproduces the default
    counts exactly, a different vocab changes them, and the parser skips
    headers / rejects malformed lines."""
    import pandas as pd
    import pytest

    from cryptowalletcommunitydetection_ray.functions.textstats import (
        BPE_MERGES,
        load_merges_file,
    )
    from cryptowalletcommunitydetection_ray.stages.text import TokenCountStage

    same = tmp_path / "merges_same.txt"
    same.write_text(
        "#version: pinned\n"
        + "\n".join(f"{a} {b}" for a, b in BPE_MERGES)
        + "\n"
    )
    assert load_merges_file(str(same)) == BPE_MERGES

    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["the thing in there", "and another and"]}
    )
    default = TokenCountStage()(df)
    via_file = TokenCountStage(merges_path=str(same))(df)
    assert default["n_bpe_real"].tolist() == via_file["n_bpe_real"].tolist()

    other = tmp_path / "merges_other.txt"
    other.write_text("")  # empty vocab: no merges at all -> more symbols
    no_merges = TokenCountStage(merges_path=str(other))(df)
    assert (
        no_merges["n_bpe_real"].to_numpy() > default["n_bpe_real"].to_numpy()
    ).all()
    # non-BPE columns are vocab-independent
    assert default["n_ws_tokens"].tolist() == no_merges["n_ws_tokens"].tolist()

    bad = tmp_path / "merges_bad.txt"
    bad.write_text("a b c\n")
    with pytest.raises(ValueError, match="malformed"):
        load_merges_file(str(bad))

    # CRLF endings must parse identically to LF (review r5: a stray \r on
    # every right-hand symbol silently matched no merge at all)
    crlf = tmp_path / "merges_crlf.txt"
    crlf.write_bytes(
        b"#version: pinned\r\n"
        + b"\r\n".join(f"{a} {b}".encode() for a, b in BPE_MERGES)
        + b"\r\n"
    )
    assert load_merges_file(str(crlf)) == BPE_MERGES
