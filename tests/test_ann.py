"""Similarity search: brute-force top-k and near-dup (exact + LSH)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    base = rng.standard_normal((5, 16))
    rows = []
    vid = 0
    for c in range(5):
        for _ in range(10):
            v = base[c] + 0.05 * rng.standard_normal(16)
            rows.append({"vec_id": vid, "embedding": v.astype(np.float32)})
            vid += 1
    return rd.from_pandas(pd.DataFrame(rows)), base


def _brute_topk(df, qids, k):
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    out = {}
    for q in qids:
        qi = np.flatnonzero(ids == q)[0]
        sims = M @ M[qi]
        order = sorted(
            [(float(-sims[j]), int(ids[j])) for j in range(len(ids)) if ids[j] != q]
        )[:k]
        out[q] = [(b, round(-a, 6)) for a, b in order]
    return out


def test_topk_matches_bruteforce(emb_ds):
    from cryptowalletcommunitydetection_ray.stages.ann import topk_cosine

    ds, _ = emb_ds
    got = topk_cosine(ds, [0, 10, 20], k=5).to_pandas()
    want = _brute_topk(ds.to_pandas(), [0, 10, 20], 5)
    for q, pairs in want.items():
        sub = got[got["query_id"] == q].sort_values("rnk")
        assert [int(x) for x in sub["neighbor_id"]] == [p[0] for p in pairs]
        assert np.allclose(
            sub["sim_e6"].to_numpy() / 1e6, [p[1] for p in pairs], atol=2e-6
        )


def test_neardup_exact_pairs(emb_ds):
    from cryptowalletcommunitydetection_ray.stages.ann import neardup_pairs_cosine

    ds, _ = emb_ds
    pairs = neardup_pairs_cosine(ds, threshold=0.98).to_pandas()
    # same-cluster vectors are near-identical; cross-cluster are not
    assert len(pairs) > 0
    assert (pairs["a_id"] // 10 == pairs["b_id"] // 10).all()
    assert (pairs["a_id"] < pairs["b_id"]).all()


def test_lsh_neardup_recall(emb_ds):
    from cryptowalletcommunitydetection_ray.stages.ann import (
        lsh_neardup_pairs_cosine,
        neardup_pairs_cosine,
    )

    ds, _ = emb_ds
    exact = neardup_pairs_cosine(ds, threshold=0.98).to_pandas()
    approx = lsh_neardup_pairs_cosine(ds, threshold=0.98, dim=16, n_bits=4).to_pandas()
    # precision exact (candidates verified with true cosine)
    ex = set(zip(exact["a_id"], exact["b_id"]))
    ap = set(zip(approx["a_id"], approx["b_id"]))
    assert ap <= ex
    # near-identical vectors collide in a 4-bit hyperplane code: high recall
    assert len(ap) >= 0.5 * len(ex)


def test_ivf_full_probe_equals_exact(ray_session):
    """n_probe == n_centroids scans everything -> bit-identical to the
    exact brute-force top-k."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.ann import (
        ivf_topk_cosine,
        topk_cosine,
    )

    rng = np.random.default_rng(7)
    n, d = 400, 16
    mat = rng.standard_normal((n, d))
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": range(n), "embedding": list(mat)})
    )
    qids = [0, 5, 9]
    exact = (
        topk_cosine(ds, qids, k=8).to_pandas()
        .sort_values(["query_id", "rnk"]).reset_index(drop=True)
    )
    ivf = (
        ivf_topk_cosine(ds, qids, k=8, n_centroids=8, n_probe=8)
        .to_pandas().sort_values(["query_id", "rnk"]).reset_index(drop=True)
    )
    assert ivf.equals(exact)


def test_ivf_clustered_recall(ray_session):
    """On well-separated clusters a single probe already recovers the
    true neighbors (the centroid list contains them)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.ann import (
        ivf_topk_cosine,
        topk_cosine,
    )

    rng = np.random.default_rng(3)
    d, per = 32, 50
    centers = rng.standard_normal((4, d)) * 10
    mat = np.concatenate(
        [c + 0.05 * rng.standard_normal((per, d)) for c in centers]
    )
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": range(len(mat)), "embedding": list(mat)})
    )
    qids = [0, per, 2 * per]
    exact = topk_cosine(ds, qids, k=10).to_pandas()
    ivf = ivf_topk_cosine(
        ds, qids, k=10, n_centroids=4, n_probe=1, sample_rows=200
    ).to_pandas()
    for q in qids:
        want = set(exact[exact["query_id"] == q]["neighbor_id"])
        got = set(ivf[ivf["query_id"] == q]["neighbor_id"])
        recall = len(want & got) / len(want)
        assert recall >= 0.9, (q, recall)


def test_lsh_strict_caps_and_export(ray_session, tmp_path):
    """strict_caps raises on a degenerate bucket; export_buckets writes
    one (vec_id, bucket) row per vector for the SQL oracle."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.ann import (
        lsh_neardup_pairs_cosine,
    )

    same = np.ones(16, dtype=np.float32)
    degen = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": range(30), "embedding": [same] * 30}
        )
    )
    with pytest.raises(ValueError, match="strict_caps"):
        lsh_neardup_pairs_cosine(
            degen, threshold=0.9, dim=16, n_bits=4, max_bucket=10,
            strict_caps=True,
        ).materialize()

    rng = np.random.default_rng(3)
    ok = rd.from_pandas(
        pd.DataFrame(
            {
                "vec_id": range(40),
                "embedding": [
                    rng.standard_normal(16).astype(np.float32)
                    for _ in range(40)
                ],
            }
        )
    )
    exp = str(tmp_path / "buckets")
    pairs = lsh_neardup_pairs_cosine(
        ok, threshold=0.99, dim=16, n_bits=4, strict_caps=True,
        export_buckets=exp,
    ).to_pandas()
    b = pads.dataset(exp).to_table().to_pandas()
    assert len(b) == 40 and set(b.columns) == {"vec_id", "bucket"}
    assert sorted(b["vec_id"]) == list(range(40))
    assert (pairs["sim_e6"] >= 990000).all() if len(pairs) else True


def test_neardup_chunked_path_equality(emb_ds):
    """A corpus straddling broadcast_max_rows yields IDENTICAL pairs on the
    chunked route (3 chunks here) and the single-broadcast route, and the
    hard cap raises instead of silently materializing a huge corpus on the
    driver."""
    from cryptowalletcommunitydetection_ray.stages.ann import (
        neardup_pairs_cosine,
    )

    ds, _ = emb_ds  # 50 rows

    def norm(df):
        return (
            df.sort_values(["a_id", "b_id"]).reset_index(drop=True)
        )

    whole = norm(
        neardup_pairs_cosine(ds, threshold=0.9).to_pandas()
    )
    chunked = norm(
        neardup_pairs_cosine(
            ds, threshold=0.9, broadcast_max_rows=17
        ).to_pandas()
    )
    assert len(whole) > 0
    pd.testing.assert_frame_equal(whole, chunked)

    with pytest.raises(ValueError, match="lsh_neardup_pairs_cosine"):
        neardup_pairs_cosine(ds, threshold=0.9, hard_max_rows=10)
