"""Multimodal plumbing: binary payload schema, actor stages, stub gating."""

import numpy as np
import pandas as pd
import pytest

from cryptowalletcommunitydetection_ray.stages.multimodal import (
    FEATURE_DIM,
    RealImageDecode,
    fake_decode_features,
)


def test_fake_decode_deterministic():
    a = fake_decode_features(b"hello world payload")
    b = fake_decode_features(b"hello world payload")
    assert np.array_equal(a, b)
    assert a.shape == (FEATURE_DIM,)
    assert a.dtype == np.float32
    assert not np.array_equal(a, fake_decode_features(b"other payload"))
    assert np.array_equal(fake_decode_features(b""), np.zeros(FEATURE_DIM, np.float32))


def test_real_decode_is_gated_without_pil():
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="PIL"):
            RealImageDecode()
    else:
        pytest.skip("PIL installed; gating not applicable")


def test_real_decode_with_pil():
    """Runs only where PIL exists: decode real PNG bytes, check schema,
    dims, feature range, and the undecodable-payload sentinel."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    import pandas as pd
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), (200, 10, 10)).save(buf, format="PNG")
    df = pd.DataFrame({"id": [1, 2], "payload": [buf.getvalue(), b"junk"]})
    out = RealImageDecode()(df)
    assert list(out.columns) == ["id", "n_bytes", "width", "height",
                                 "features"]
    assert out["width"].tolist() == [32, -1]
    assert out["height"].tolist() == [16, -1]
    assert len(out["features"][0]) == 64
    assert 0.0 <= out["features"][0].min() <= out["features"][0].max() <= 1.0
    assert (out["features"][1] == 0).all()


def test_feature_pipeline(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.multimodal import (
        attach_fake_payloads,
        extract_features,
        frame_sample,
    )

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["abc def", "xyz " * 50]})
    )
    payloads = attach_fake_payloads(docs)
    rows = payloads.take_all()
    assert {r["id"] for r in rows} == {1, 2}
    assert all(isinstance(r["payload"], bytes) for r in rows)

    feats = extract_features(payloads).to_pandas().sort_values("id")
    assert len(feats) == 2
    assert all(len(f) == FEATURE_DIM for f in feats["features"])
    assert (feats["n_bytes"] > 0).all()

    frames = frame_sample(payloads, n_frames=4).to_pandas()
    assert len(frames) == 8
    assert set(frames["frame_idx"]) == {0, 1, 2, 3}


def test_resize_stub(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.multimodal import (
        attach_fake_payloads,
        resize,
    )

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["hello world " * 50, "x"]})
    )
    out = resize(
        attach_fake_payloads(docs), target_w=16, target_h=4
    ).to_pandas()
    assert len(out) == 2
    assert all(len(p) == 16 * 4 for p in out["payload"])
    assert (out["width"] == 16).all() and (out["height"] == 4).all()
    # deterministic
    out2 = resize(
        attach_fake_payloads(docs), target_w=16, target_h=4
    ).to_pandas()
    a = out.sort_values("id")["payload"].tolist()
    b = out2.sort_values("id")["payload"].tolist()
    assert a == b


def test_frame_byte_accounting_matches_octet_rule(ray_session):
    """The driver-oracle arithmetic: total sampled-frame bytes equals
    nb when nb < 4 else 4·(nb//4) — pinned across payload sizes that hit
    every branch (empty, sub-step, exact multiple, with remainder)."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.multimodal import (
        frame_sample,
    )

    sizes = [0, 1, 2, 3, 4, 5, 7, 8, 9, 100, 4096]
    payloads = rd.from_pandas(
        pd.DataFrame(
            {
                "id": list(range(len(sizes))),
                "payload": [b"x" * n for n in sizes],
            }
        )
    )
    frames = frame_sample(payloads, n_frames=4).to_pandas()
    got = (
        frames.assign(fb=[len(p or b"") for p in frames["frame"]])
        .groupby("id")["fb"]
        .sum()
    )
    for i, nb in enumerate(sizes):
        want = nb if nb < 4 else 4 * (nb // 4)
        assert got[i] == want, (nb, got[i], want)
