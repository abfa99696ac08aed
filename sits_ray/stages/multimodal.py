"""Multimodal (image/audio/video) column stages.

Media payloads are opaque Arrow ``binary`` columns with typed metadata
(mime, width/height or sample-rate). Decode / feature-extract / resize /
frame-sample are actor-pool ``map_batches`` stages; the actual codec calls
are STUBBED (no image/audio libraries in this container) behind
``decode_stub`` — a clearly-marked ``NotImplementedError`` with a
deterministic fake used by tests — while the Ray-side plumbing (schema,
batch size, actor signature, output layout) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def decode_stub(payload: bytes, mime: str) -> np.ndarray:
    """Real codec entry point — intentionally not implemented here.

    Raises NotImplementedError; production deployments plug Pillow/ffmpeg
    in. Tests and the fake feature path use ``fake_decode``."""
    raise NotImplementedError(
        f"media decode for {mime!r} requires an image/audio codec library "
        "(not available in this container); use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes, mime: str, out_hw: tuple[int, int] = (8, 8)) -> np.ndarray:
    """Deterministic stand-in decode: payload bytes -> pseudo-pixel grid
    seeded by the payload digest (stable across runs/workers)."""
    h = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(h, "big"))
    return rng.integers(0, 256, size=out_hw, dtype=np.uint8).astype(np.float32)


class MediaFeatures:
    """Actor-pool stage: binary payload -> small feature vector.

    Large binary rows => SMALL batch_size (see ray_guide 'Memory-aware');
    callers pass batch_size explicitly when payloads are big.
    """

    def __init__(self, use_stub_decoder: bool = True, out_hw=(8, 8)):
        self.decode = fake_decode if use_stub_decoder else decode_stub
        self.out_hw = out_hw

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, means, stds = [], [], []
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        for p, m in zip(payloads, mimes):
            img = self.decode(p, m) if self.decode is not fake_decode else self.decode(p, m, self.out_hw)
            feats.append(img.reshape(-1).astype(np.float32))
            means.append(float(img.mean()))
            stds.append(float(img.std()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
                "mean_intensity": pa.array(means, pa.float64()),
                "std_intensity": pa.array(stds, pa.float64()),
            }
        )


def extract_features(ds, batch_size: int = 64, concurrency=(1, 4), use_stub_decoder=True):
    return ds.map_batches(
        MediaFeatures,
        fn_constructor_kwargs=dict(use_stub_decoder=use_stub_decoder),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(ln), dtype=np.uint8).tobytes()
                for ln in rng.integers(100, 4000, size=n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "mime": pa.array(["image/png" if i % 2 == 0 else "audio/wav" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n, 8, dtype=np.int32)),
            "height": pa.array(np.full(n, 8, dtype=np.int32)),
        }
    )
