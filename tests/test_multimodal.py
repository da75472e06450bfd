"""Multimodal plumbing tests: schema, batching, actor behavior,
determinism (the codec itself is stubbed — see stages/multimodal.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedup_ray.stages.multimodal import (
    IMAGE_SCHEMA,
    DecodeImage,
    decode_images,
    sample_frames,
)


def _media_ds(n=10):
    rng = np.random.Generator(np.random.PCG64(4))
    payloads = [rng.bytes(1000 + i * 37) for i in range(n)]
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([f"m{i}" for i in range(n)], pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )


def test_decode_images_schema_and_determinism():
    out1 = decode_images(_media_ds()).to_pandas().sort_values("url", ignore_index=True)
    out2 = decode_images(_media_ds()).to_pandas().sort_values("url", ignore_index=True)
    assert list(out1.columns) == [f.name for f in IMAGE_SCHEMA]
    assert (out1["width"] >= 16).all() and (out1["channels"] == 3).all()
    assert all(len(f) == 256 for f in out1["features"])
    assert all(abs(sum(f) - 1.0) < 1e-5 for f in out1["features"])
    for a, b in zip(out1["features"], out2["features"]):
        np.testing.assert_array_equal(a, b)


def test_decode_strict_raises():
    with pytest.raises(NotImplementedError):
        DecodeImage(strict=True)(
            pa.table({"url": ["x"], "payload": [b"123"]})
        )


def test_sample_frames():
    out = sample_frames(_media_ds(4), n_frames=4).to_pandas()
    assert set(out.columns) == {"url", "frame_idx", "frame_sha256"}
    assert len(out) == 16
    per = out.groupby("url")["frame_idx"].apply(list)
    assert all(sorted(v) == [0, 1, 2, 3] for v in per)
    # identical payload -> identical frame hashes
    assert out["frame_sha256"].str.len().eq(64).all()
