"""Exact and near-duplicate detection stages."""

import numpy as np
import pandas as pd
import pytest

from cryptowalletcommunitydetection_ray.functions.hashes import (
    hamming64,
    jaccard,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash64,
)


def test_shingles_and_jaccard():
    a = shingle_hashes("a b c d e", k=3)
    b = shingle_hashes("a b c d e", k=3)
    assert np.array_equal(a, b)
    assert jaccard(a, b) == 1.0
    c = shingle_hashes("x y z w v", k=3)
    assert jaccard(a, c) == 0.0
    assert len(shingle_hashes("a b", k=3)) == 1  # short text → one shingle
    assert len(shingle_hashes("", k=3)) == 0


def test_minhash_estimates_jaccard():
    a_p, b_p = minhash_params(256)
    s1 = shingle_hashes(" ".join(f"w{i}" for i in range(100)), k=3)
    s2 = shingle_hashes(" ".join(f"w{i}" for i in range(80)), k=3)
    true_j = jaccard(s1, s2)
    sig1 = minhash_signature(s1, a_p, b_p)
    sig2 = minhash_signature(s2, a_p, b_p)
    est = (sig1 == sig2).mean()
    assert abs(est - true_j) < 0.15


def test_simhash_similar_texts_close():
    base = " ".join(f"tok{i}" for i in range(60))
    h1 = simhash64(base)
    h2 = simhash64(base + " extra")
    h3 = simhash64(" ".join(f"other{i}" for i in range(60)))
    assert hamming64(h1, h2) < hamming64(h1, h3)
    assert simhash64(base) == h1  # deterministic


@pytest.fixture(scope="module")
def dup_docs(ray_session):
    import ray.data as rd

    words = [f"w{i}" for i in range(50)]
    base = " ".join(words)
    near = " ".join(words[:-2] + ["zz", "qq"])  # high jaccard vs base
    other = [" ".join(f"u{i}_{j}" for i in range(40)) for j in range(20)]
    texts = [base, near, *other]
    return rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_minhash_lsh_finds_planted_pair(dup_docs):
    from cryptowalletcommunitydetection_ray.stages.dedup import (
        dup_groups_from_pairs,
        minhash_dedup_pairs,
    )

    pairs = minhash_dedup_pairs(dup_docs, threshold=0.5).to_pandas()
    assert ((pairs["a"] == 0) & (pairs["b"] == 1)).any()
    # precision: every reported pair truly ≥ threshold
    assert (pairs["jaccard"] >= 0.5).all()
    groups = dup_groups_from_pairs(pairs)
    assert groups.set_index("doc_id")["dup_group"][1] == 0


def test_simhash_pairs_planted(dup_docs):
    from cryptowalletcommunitydetection_ray.stages.dedup import simhash_dedup_pairs

    pairs = simhash_dedup_pairs(dup_docs, max_hamming=10).to_pandas()
    assert ((pairs["a"] == 0) & (pairs["b"] == 1)).any()
    assert (pairs["hamming"] <= 10).all()


def test_copartitioned_jaccard_matches_exact(dup_docs):
    """The co-partitioned verify (no driver/broadcast materialization)
    reproduces the pure-python exact Jaccard for every candidate pair."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.dedup import (
        copartitioned_jaccard,
    )

    docs_df = dup_docs.to_pandas()
    texts = dict(zip(docs_df["doc_id"], docs_df["text"]))
    ids = sorted(texts)
    cand = pd.DataFrame(
        {"a": [0, 0, 2, ids[-2]], "b": [1, 2, 3, ids[-1]]}
    )
    out = (
        copartitioned_jaccard(
            rd.from_pandas(cand), dup_docs, num_partitions=3
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(out) == len(cand)
    for _, r in out.iterrows():
        sa = shingle_hashes(texts[r["a"]], 3)
        sb = shingle_hashes(texts[r["b"]], 3)
        ni = len(np.intersect1d(sa, sb))
        assert r["n_inter"] == ni
        assert r["n_union"] == len(sa) + len(sb) - ni
        denom = r["n_union"] or 1
        assert abs(r["jaccard"] - r["n_inter"] / denom) < 1e-9


def test_minhash_dispatch_paths_identical(dup_docs):
    """The broadcast (small-side) and co-partitioned (streaming) verify
    paths must produce identical rows."""
    from cryptowalletcommunitydetection_ray.stages.dedup import (
        minhash_dedup_pairs,
    )

    def norm(df):
        return (
            df[["a", "b", "n_inter", "n_union"]]
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )

    via_bcast = norm(
        minhash_dedup_pairs(dup_docs, threshold=0.5).to_pandas()
    )
    via_copart = norm(
        minhash_dedup_pairs(
            dup_docs, threshold=0.5, broadcast_max_rows=0
        ).to_pandas()
    )
    assert via_bcast.equals(via_copart)
    assert len(via_bcast) >= 1


def test_simhash_degenerate_bucket_bounded(ray_session):
    """1000 identical docs: without the bucket cap this is ~500k pairs per
    band x 4 bands; with max_bucket=50 the pair count is bounded by
    C(50,2) and the stage finishes quickly."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.dedup import (
        simhash_dedup_pairs,
    )

    n = 1000
    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": range(n), "text": ["same text here every time"] * n}
        )
    )
    pairs = simhash_dedup_pairs(docs, max_hamming=3, max_bucket=50).to_pandas()
    assert 0 < len(pairs) <= 50 * 49 // 2
    # deterministic winners: only the smallest 50 ids appear
    assert pairs[["a", "b"]].to_numpy().max() < 50


def test_exact_dedup_keep_min(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.dedup import exact_dedup

    df = pd.DataFrame(
        {"k": [1, 1, 2, 2, 3], "ord": [5, 2, 9, 1, 7], "v": list("abcde")}
    )
    out = (
        exact_dedup(rd.from_pandas(df), ["k"], num_partitions=4, keep_order_col="ord")
        .to_pandas()
        .sort_values("k")
    )
    assert out["v"].tolist() == ["b", "d", "e"]


def test_dup_groups_distributed_matches_union_find(ray_session, tmp_path):
    """The distributed CC path over verified pairs produces the same
    groups as the driver-side union-find (min-id group convention)."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.dedup import (
        dup_groups_distributed,
        dup_groups_from_pairs,
    )

    pairs = pd.DataFrame(
        {"a": [1, 2, 10, 11, 20], "b": [2, 3, 11, 12, 21]}
    )  # groups {1,2,3}, {10,11,12}, {20,21}
    want = dup_groups_from_pairs(pairs).sort_values("doc_id").reset_index(
        drop=True
    )
    got = (
        dup_groups_distributed(
            rd.from_pandas(pairs), str(tmp_path / "dupg"), num_partitions=2
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.astype(np.int64).equals(want.astype(np.int64))


def test_copartitioned_jaccard_hot_doc(ray_session):
    """A hub doc appearing in hundreds of pairs routes all its pairs to
    one partition - verify stays correct (shingle cache computes the hub
    text once per partition, results exact)."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.dedup import (
        copartitioned_jaccard,
    )

    n = 300
    texts = {0: "a b c d e f g h"}
    for i in range(1, n + 1):
        texts[i] = f"a b c d e x{i} y{i} z{i}"
    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[k] for k in texts]}
        )
    )
    cand = pd.DataFrame({"a": [0] * n, "b": list(range(1, n + 1))})
    out = copartitioned_jaccard(
        rd.from_pandas(cand), docs, num_partitions=8
    ).to_pandas()
    assert len(out) == n
    sa = shingle_hashes(texts[0], 3)
    for _, r in out.sample(10, random_state=0).iterrows():
        sb = shingle_hashes(texts[int(r["b"])], 3)
        ni = len(np.intersect1d(sa, sb))
        assert r["n_inter"] == ni
        assert r["n_union"] == len(sa) + len(sb) - ni


def test_capped_bucket_stats(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.dedup import (
        capped_bucket_stats,
    )

    ds = rd.from_pandas(
        pd.DataFrame({"id": range(10), "bucket": [1] * 5 + [2] * 3 + [3] * 2})
    )
    stats = capped_bucket_stats(ds, ["bucket"], max_bucket=3)
    assert stats == {"n_truncated_buckets": 1, "n_dropped_members": 2}
    assert capped_bucket_stats(ds, ["bucket"], max_bucket=5) == {
        "n_truncated_buckets": 0,
        "n_dropped_members": 0,
    }


def test_simhash_strict_caps_raises(ray_session):
    """strict_caps makes the skew guard LOUD: a degenerate bucket that
    would silently drop pairs raises instead ("no silent caps")."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.dedup import (
        simhash_dedup_pairs,
    )

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": range(80), "text": ["same text here"] * 80})
    )
    with pytest.raises(ValueError, match="strict_caps"):
        simhash_dedup_pairs(
            docs, max_hamming=3, max_bucket=50, strict_caps=True
        ).materialize()


def test_simhash_pairs_equal_allpairs_hamming(ray_session, tmp_path):
    """Pigeonhole guarantee the driver oracle relies on: with 4 bands over
    64 bits and zero truncation, the banded output EQUALS brute-force
    all-pairs hamming ≤ 3 — and the exported signature table matches the
    pure-python simhash64 per doc."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.dedup import (
        simhash_dedup_pairs,
    )

    words = [f"tok{i}" for i in range(40)]
    texts = []
    for j in range(30):
        w = list(words)
        w[j % 40] = f"alt{j}"  # near-dup cluster around the base text
        texts.append(" ".join(w))
    texts += [" ".join(f"u{i}_{j}" for i in range(30)) for j in range(20)]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )

    exp = str(tmp_path / "sigs")
    pairs = simhash_dedup_pairs(
        docs, max_hamming=3, strict_caps=True, export_signatures=exp
    ).to_pandas()

    sigs = pads.dataset(exp).to_table().to_pandas()
    assert len(sigs) == len(texts)
    mask = (1 << 64) - 1
    by_id = {
        int(i): int(s) & mask
        for i, s in zip(sigs["doc_id"], sigs["simhash"])
    }  # the column is the uint64 signature viewed as int64
    for i, t in enumerate(texts):
        assert by_id[i] == simhash64(t)

    want = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            h = hamming64(by_id[a], by_id[b])
            if h <= 3:
                want.add((a, b, h))
    got = set(zip(pairs["a"], pairs["b"], pairs["hamming"]))
    assert want, "fixture must contain true near-dup pairs"
    assert got == want


def test_simhash_batch_parity_both_paths():
    """simhash64_batch == per-doc simhash64 on BOTH the dense counts-matmul
    path and the huge-vocabulary fallback (forced by an all-distinct token
    corpus pushing n_docs x n_uniq past the dense gate)."""
    from cryptowalletcommunitydetection_ray.functions.hashes import (
        simhash64,
        simhash64_batch,
    )

    small = ["", "one two two", "the the the cat", "x " * 50]
    got = simhash64_batch(small)
    assert [int(v) for v in got] == [simhash64(t) for t in small]

    # 300 docs x ~90k distinct tokens -> n*u ~ 27M > the 8M dense gate
    big = [
        " ".join(f"tok{i}_{j}" for j in range(300)) for i in range(300)
    ] + ["", "shared shared token"]
    got = simhash64_batch(big)
    want = [simhash64(t) for t in big]
    assert [int(v) for v in got] == want


def test_exact_dedup_digest_matches_bytecompare(ray_session):
    """Digest-keyed dedup (narrow shuffle + id join) keeps exactly the same
    survivors as the byte-compare path on a corpus with real duplicates."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.dedup import (
        exact_dedup,
        exact_dedup_digest,
    )

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    # inject exact duplicates (text of doc i copied to new id 10000+i)
    dupes = docs.head(40).copy()
    dupes["doc_id"] = dupes["doc_id"] + 10_000
    docs = pd.concat([docs, dupes], ignore_index=True)
    ds = rd.from_pandas(docs, override_num_blocks=4)
    byte_path = (
        exact_dedup(ds, ["text"], num_partitions=8, keep_order_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    digest_path = (
        exact_dedup_digest(
            ds, ["text"], "doc_id", num_partitions=8,
            keep_order_col="doc_id",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "text"]]
    )
    assert len(byte_path) < len(docs)  # corpus really has duplicates
    pd.testing.assert_frame_equal(
        byte_path.reset_index(drop=True), digest_path
    )


def test_exact_dedup_digest_collision_behavior(ray_session):
    """Documented digest-collision semantics: two DIFFERENT keys whose
    injected digest collides are merged to one winner (min order) — the
    ~n²/2¹²⁹ failure mode the docstring quantifies."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.dedup import (
        exact_dedup_digest,
    )

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["alpha", "beta", "gamma", "alpha"],
        }
    )

    def colliding(frame):
        # 'alpha' and 'beta' forced onto the same 128-bit digest
        key = frame["text"].map(
            {"alpha": 7, "beta": 7, "gamma": 9}
        ).to_numpy(np.int64)
        return key, key

    out = exact_dedup_digest(
        rd.from_pandas(df, override_num_blocks=2),
        ["text"],
        "doc_id",
        num_partitions=4,
        keep_order_col="doc_id",
        digest_fn=colliding,
    ).to_pandas()
    # alpha(1) wins the collided group {alpha:1, beta:2, alpha:4}; gamma survives
    assert sorted(out["doc_id"].tolist()) == [1, 3]
