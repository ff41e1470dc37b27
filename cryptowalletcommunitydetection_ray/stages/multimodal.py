"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are treated as opaque Arrow ``binary`` columns
with struct metadata; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages.  The image/audio codec libraries are NOT
in this container, so the decode kernels are STUBS behind an import-try:

- ``RealImageDecode`` raises ``NotImplementedError`` unless PIL is present
  (clearly marked stub);
- ``FakeFeatureExtractor`` is a DETERMINISTIC fake decode (splitmix64 over
  the payload bytes → fixed-size float feature vector), so the Ray-side
  plumbing — schema, batch sizing for large binary rows, actor signature,
  output layout — is real and tested end-to-end.

Batch-size note: binary payloads dominate row size; callers should pass a
small ``batch_size`` (default 256 here vs 4096 for text) so
``batch_size × concurrency × payload`` fits the worker heap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

FEATURE_DIM = 16


def _splitmix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic payload → float32 feature vector (the fake decode)."""
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = int(np.ceil(len(arr) / 8)) * 8
    padded = np.zeros(n, dtype=np.uint8)
    padded[: len(arr)] = arr
    words = padded.view(np.uint64)
    with np.errstate(over="ignore"):
        seeds = _splitmix(words[:, None] + np.arange(1, dim + 1, dtype=np.uint64))
    col = seeds.sum(axis=0, dtype=np.uint64)
    return ((col >> np.uint64(11)).astype(np.float64) / 2**53).astype(np.float32)


class FakeFeatureExtractor:
    """Actor-pool stage: (id, payload) → (id, n_bytes, features list<float>).

    State (the feature "model": projection seeds) is built once per actor.
    """

    def __init__(self, id_col: str = "id", payload_col: str = "payload",
                 dim: int = FEATURE_DIM):
        self.id_col, self.payload_col, self.dim = id_col, payload_col, dim

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        feats = [fake_decode_features(p, self.dim) for p in df[self.payload_col]]
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col].to_numpy(),
                "n_bytes": np.array(
                    [len(p) if p is not None else 0 for p in df[self.payload_col]],
                    dtype=np.int64,
                ),
                "features": feats,
            }
        )


class RealImageDecode:
    """Real image decode behind a PIL import guard (PIL is not in this
    container, so construction raises a clear NotImplementedError here and
    the PIL-gated test skips; with PIL installed the stage runs for real).

    Per batch: decode each binary payload, record true (width, height),
    and emit an 8×8 grayscale thumbnail as a 64-dim float feature vector —
    the same (id, n_bytes, features) layout as ``FakeFeatureExtractor``
    plus width/height, so downstream stages are interchangeable.
    Undecodable payloads yield width = height = -1 and zero features
    (curation pipelines filter on it) instead of poisoning the batch.
    """

    def __init__(self, id_col: str = "id", payload_col: str = "payload",
                 thumb: int = 8):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires PIL; not available in this "
                "environment — use FakeFeatureExtractor for plumbing tests"
            ) from e
        self.id_col, self.payload_col, self.thumb = id_col, payload_col, thumb

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import io

        from PIL import Image, UnidentifiedImageError

        t = self.thumb
        # DecompressionBombError subclasses Exception directly (not
        # OSError), so it must be listed explicitly or one oversized
        # image poisons the whole batch instead of getting the -1 sentinel
        _bomb = getattr(Image, "DecompressionBombError", None)
        _undecodable = (UnidentifiedImageError, OSError, ValueError) + (
            (_bomb,) if _bomb is not None else ()
        )
        widths = np.empty(len(df), dtype=np.int32)
        heights = np.empty(len(df), dtype=np.int32)
        feats: list[np.ndarray] = []
        for j, p in enumerate(df[self.payload_col]):
            try:
                img = Image.open(io.BytesIO(p or b""))
                widths[j], heights[j] = img.width, img.height
                small = img.convert("L").resize((t, t))
                feats.append(
                    (np.asarray(small, dtype=np.float32) / 255.0).reshape(-1)
                )
            except _undecodable:
                widths[j] = heights[j] = -1
                feats.append(np.zeros(t * t, dtype=np.float32))
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col].to_numpy(),
                "n_bytes": np.array(
                    [len(p) if p is not None else 0
                     for p in df[self.payload_col]],
                    dtype=np.int64,
                ),
                "width": widths,
                "height": heights,
                "features": feats,
            }
        )


def attach_fake_payloads(
    docs: rd.Dataset, *, id_col: str = "doc_id", text_col: str = "text"
) -> rd.Dataset:
    """Derive a deterministic binary payload column from the documents table
    (stand-in corpus for multimodal tests: payload = utf-8 text bytes
    repeated to look image-sized, plus a meta struct)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        payloads = [(t.encode("utf-8") * 4)[:4096] for t in df[text_col]]
        return pd.DataFrame(
            {
                "id": df[id_col].to_numpy(),
                "payload": payloads,
                "width": np.full(len(df), 64, dtype=np.int32),
                "height": np.full(len(df), 16, dtype=np.int32),
                "format": ["fake/raw"] * len(df),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas", batch_size=512
    )


def extract_features(
    payloads: rd.Dataset,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    dim: int = FEATURE_DIM,
    concurrency: int = 4,
    batch_size: int = 256,
) -> rd.Dataset:
    """The multimodal feature pipeline: actor pool, small batches for large
    binary rows."""
    return payloads.select_columns([id_col, payload_col]).map_batches(
        FakeFeatureExtractor,
        fn_constructor_kwargs=dict(id_col=id_col, payload_col=payload_col, dim=dim),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def frame_sample(
    payloads: rd.Dataset,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    n_frames: int = 4,
    concurrency: int = 2,
) -> rd.Dataset:
    """"Video" frame sampling stub: split each payload into ``n_frames``
    equal chunks and emit one row per frame (id, frame_idx, frame_bytes) —
    the explode-shaped stage a real frame sampler would have."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, frames = [], [], []
        for i, p in zip(df[id_col], df[payload_col]):
            p = p or b""
            step = max(1, len(p) // n_frames)
            for k in range(n_frames):
                ids.append(i)
                idxs.append(k)
                frames.append(p[k * step : (k + 1) * step])
        return pd.DataFrame(
            {id_col: ids, "frame_idx": np.array(idxs, dtype=np.int32),
             "frame": frames}
        )

    return payloads.select_columns([id_col, payload_col]).map_batches(
        f, batch_format="pandas", batch_size=256, concurrency=concurrency
    )


def resize(
    payloads: rd.Dataset,
    *,
    target_w: int = 32,
    target_h: int = 8,
    id_col: str = "id",
    payload_col: str = "payload",
    concurrency: int = 2,
    batch_size: int = 256,
) -> rd.Dataset:
    """"Image" resize stub: deterministic byte-level downsample of the
    payload to target_w*target_h bytes (stride sampling), meta columns
    updated - the shape (actor batch stage, small batches for big binary
    rows, width/height metadata rewrite) a real PIL/opencv resize stage
    would have; the real decoder is the import-gated ``RealImageDecode``.
    """

    n_out = target_w * target_h

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for p in df[payload_col]:
            p = p or b""
            if len(p) <= n_out:
                out.append(p.ljust(n_out, b"\0"))
            else:
                arr = np.frombuffer(p, dtype=np.uint8)
                idx = (np.arange(n_out) * (len(p) / n_out)).astype(np.int64)
                out.append(arr[idx].tobytes())
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                payload_col: out,
                "width": np.full(len(df), target_w, dtype=np.int32),
                "height": np.full(len(df), target_h, dtype=np.int32),
                "format": ["fake/raw-resized"] * len(df),
            }
        )

    return payloads.select_columns([id_col, payload_col]).map_batches(
        f, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
    )
