"""Consistent sampling: determinism, nesting, stratified rates, mixing."""

import numpy as np
import pandas as pd


def _docs(n=8000):
    return pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "source": np.array(["web", "code", "wiki", "web"])[
                np.arange(n) % 4
            ],
        }
    )


def test_consistent_sample_properties(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.sampling import (
        consistent_sample,
    )

    ds = rd.from_pandas(_docs())
    s20 = set(
        consistent_sample(ds, "doc_id", 0.2).to_pandas()["doc_id"]
    )
    s20b = set(
        consistent_sample(ds.repartition(7), "doc_id", 0.2).to_pandas()["doc_id"]
    )
    assert s20 == s20b  # partition-invariant
    assert abs(len(s20) / 8000 - 0.2) < 0.03
    s50 = set(
        consistent_sample(ds, "doc_id", 0.5).to_pandas()["doc_id"]
    )
    assert s20 <= s50  # nested samples
    # different salt -> different (roughly independent) subset
    alt = set(
        consistent_sample(ds, "doc_id", 0.2, salt="x").to_pandas()["doc_id"]
    )
    assert alt != s20


def test_stratified_sample_rates(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.sampling import (
        stratified_sample,
    )

    ds = rd.from_pandas(_docs())
    out = stratified_sample(
        ds, "source", "doc_id", {"web": 0.5, "code": 0.1}
    ).to_pandas()
    frac = out.groupby("source").size() / _docs().groupby("source").size()
    assert abs(frac["web"] - 0.5) < 0.05
    assert abs(frac["code"] - 0.1) < 0.05
    assert "wiki" not in set(out["source"])  # default_rate=0 drops


def test_mix_datasets(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.sampling import (
        mix_datasets,
    )

    a = rd.from_pandas(_docs(4000))
    b = rd.from_pandas(_docs(4000))
    mixed = mix_datasets([(a, 0.75), (b, 0.25)], "doc_id").to_pandas()
    assert abs(len(mixed) - (0.75 + 0.25) * 4000) < 300
    # deterministic: same call, same rows
    mixed2 = mix_datasets([(a, 0.75), (b, 0.25)], "doc_id").to_pandas()
    assert sorted(mixed["doc_id"]) != []  # non-empty
    assert len(mixed) == len(mixed2)


def test_pack_sequences(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.sampling import (
        pack_sequences,
    )

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {"doc_id": np.arange(5000), "n_tok": rng.integers(10, 900, 5000)}
    )
    out = pack_sequences(
        rd.from_pandas(df), "doc_id", "n_tok", max_tokens=2048,
        num_partitions=8,
    ).to_pandas()
    assert len(out) == len(df)
    # every sequence respects the budget (capped doc tokens)
    sums = out.groupby("seq_id")["n_tok"].apply(
        lambda s: np.minimum(s, 2048).sum()
    )
    assert (sums <= 2048).all()
    assert (out.groupby("seq_id")["seq_tokens"].nunique() == 1).all()
    # deterministic under input repartitioning
    out2 = pack_sequences(
        rd.from_pandas(df).repartition(5), "doc_id", "n_tok",
        max_tokens=2048, num_partitions=8,
    ).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # oversized doc gets its own sequence
    big = pd.DataFrame({"doc_id": [1, 2], "n_tok": [5000, 10]})
    got = pack_sequences(
        rd.from_pandas(big), "doc_id", "n_tok", max_tokens=2048,
        num_partitions=1,
    ).to_pandas().sort_values("doc_id")
    assert got["seq_id"].nunique() == 2


def test_stratified_sample_full_rate_stratum(ray_session):
    """Regression (round-3 advice): a stratum at rate 1.0 (or >1) must keep
    EVERY row — (1.0 * 2**64) is an out-of-range float->uint64 cast that
    silently produced an all-False mask before the short-circuit guard."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.sampling import (
        stratified_sample,
    )

    df = _docs()
    ds = rd.from_pandas(df)
    out = stratified_sample(
        ds, "source", "doc_id", {"web": 1.0, "code": 2.0, "wiki": 0.5}
    ).to_pandas()
    n_by = df.groupby("source").size()
    got = out.groupby("source").size()
    assert got["web"] == n_by["web"]  # rate 1.0 keeps all
    assert got["code"] == n_by["code"]  # rate > 1 clamps to all
    assert 0 < got["wiki"] < n_by["wiki"]
