"""Bloom screen: zero false negatives, FP rate near theory, broadcast
determinism; cap_per_key: DuckDB row_number parity + hash-order
partition invariance."""

import numpy as np
import pandas as pd


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.bloom import (
        bloom_screen,
        build_bloom,
    )

    seen = pd.DataFrame({"key": [f"doc-{i}" for i in range(5000)]})
    unseen = pd.DataFrame({"key": [f"other-{i}" for i in range(20000)]})
    m_bits, k_hashes = 1 << 16, 7  # n=5000 → m/n≈13 bits/key, fp≈0.2%

    ref = build_bloom(
        rd.from_pandas(seen), "key", m_bits=m_bits, k_hashes=k_hashes
    )

    flagged_seen = bloom_screen(
        rd.from_pandas(seen).repartition(5), ref, "key"
    ).to_pandas()
    assert flagged_seen["maybe_seen"].all()  # NO false negatives, ever

    flagged_unseen = bloom_screen(
        rd.from_pandas(unseen), ref, "key"
    ).to_pandas()
    fp = flagged_unseen["maybe_seen"].mean()
    n, m, kk = len(seen), m_bits, k_hashes
    theory = (1.0 - np.exp(-kk * n / m)) ** kk
    assert fp < max(3 * theory, 0.01), (fp, theory)

    # drop_seen keeps exactly the unflagged complement, column removed
    kept = bloom_screen(
        rd.from_pandas(unseen), ref, "key", drop_seen=True
    ).to_pandas()
    assert len(kept) == int((~flagged_unseen["maybe_seen"]).sum())
    assert "maybe_seen" not in kept.columns


def test_bloom_partition_invariant(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.bloom import (
        bloom_screen,
        build_bloom,
    )

    keys = pd.DataFrame({"key": [f"k{i}" for i in range(0, 3000, 3)]})
    probe = pd.DataFrame({"key": [f"k{i}" for i in range(3000)]})
    ref = build_bloom(rd.from_pandas(keys), "key", m_bits=1 << 15)
    a = (
        bloom_screen(rd.from_pandas(probe), ref, "key")
        .to_pandas()
        .sort_values("key")["maybe_seen"]
        .to_numpy()
    )
    b = (
        bloom_screen(rd.from_pandas(probe).repartition(11), ref, "key")
        .to_pandas()
        .sort_values("key")["maybe_seen"]
        .to_numpy()
    )
    assert (a == b).all()


def _domain_docs(n=6000):
    rng = np.random.default_rng(7)
    # Zipf-ish: domain 0 is hot (half the corpus) — the skew case the
    # two-phase partial trim defends against
    dom = np.where(
        rng.random(n) < 0.5, 0, rng.integers(1, 40, size=n)
    )
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "domain": dom.astype(np.int64),
            "quality": rng.integers(0, 1000, size=n).astype(np.int64),
        }
    )


def test_cap_per_key_matches_duckdb(ray_session):
    import duckdb

    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.sampling import (
        cap_per_key,
    )

    df = _domain_docs()
    got = (
        cap_per_key(
            rd.from_pandas(df).repartition(9),
            "domain",
            5,
            ["quality", "doc_id"],
        )
        .to_pandas()
        .sort_values(["domain", "quality", "doc_id"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """
        SELECT doc_id, domain, quality FROM (
            SELECT *, row_number() OVER (
                PARTITION BY domain ORDER BY quality, doc_id) AS rn
            FROM df
        ) WHERE rn <= 5
        ORDER BY domain, quality, doc_id
        """
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].astype(int).tolist()
    assert (
        got.groupby("domain").size().max() <= 5
        and got["domain"].nunique() == df["domain"].nunique()
    )


def test_cap_per_key_hash_order_invariant(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.sampling import (
        cap_per_key,
    )

    df = _domain_docs()
    picks = []
    for parts in (3, 13):
        out = (
            cap_per_key(
                rd.from_pandas(df).repartition(parts),
                "domain",
                4,
                ["doc_id"],
                salt="cap-v1",
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert set(out.columns) == {"doc_id", "domain", "quality"}
        picks.append(out["doc_id"].tolist())
    assert picks[0] == picks[1]  # same rows whatever the partitioning
    # and the hash cap is a different (non-prefix) selection than doc_id
    # order — i.e. it actually randomizes within the domain
    by_id = cap_per_key(
        rd.from_pandas(df), "domain", 4, ["doc_id"]
    ).to_pandas()
    assert sorted(picks[0]) != sorted(by_id["doc_id"].tolist())


def test_bloom_distributed_build_bit_identical(ray_session):
    import ray
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.bloom import (
        bloom_screen,
        build_bloom,
        build_bloom_distributed,
    )

    keys = pd.DataFrame({"key": [f"page-{i}" for i in range(4000)]})
    kw = dict(m_bits=1 << 15, k_hashes=5, salt="s3")
    ref_driver = build_bloom(rd.from_pandas(keys), "key", **kw)
    ref_dist = build_bloom_distributed(
        rd.from_pandas(keys).repartition(7), "key", **kw
    )
    a, b = ray.get(ref_driver), ray.get(ref_dist)
    assert np.array_equal(a["bits"], b["bits"])  # OR fold is order-free
    assert (a["m_bits"], a["k_hashes"], a["salt"]) == (
        b["m_bits"], b["k_hashes"], b["salt"],
    )

    # and the distributed filter drives the probe stage identically
    probe = pd.DataFrame(
        {"key": [f"page-{i}" for i in range(2000, 6000)]}
    )
    fa = (
        bloom_screen(rd.from_pandas(probe), ref_driver, "key")
        .to_pandas().sort_values("key")["maybe_seen"].to_numpy()
    )
    fb = (
        bloom_screen(rd.from_pandas(probe), ref_dist, "key")
        .to_pandas().sort_values("key")["maybe_seen"].to_numpy()
    )
    assert np.array_equal(fa, fb)
    assert fa[: 2000].all()  # truly-seen suffix of the probe range
