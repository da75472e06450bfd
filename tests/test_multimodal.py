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


def test_decode_audio_stage():
    """Real WAV decode through the Ray actor-pool stage."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dedup_ray.functions.codecs import encode_wav
    from dedup_ray.stages.multimodal import AUDIO_SCHEMA, decode_audio

    tones = []
    for i in range(6):
        t = np.arange(1600, dtype=np.float64)
        tones.append(
            (9000 * np.sin(2 * np.pi * (220 + 110 * i) * t / 16000)).astype(np.int16)
        )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([f"a{i}" for i in range(6)], pa.string()),
                "payload": pa.array(
                    [encode_wav(x, 16000) for x in tones], pa.binary()
                ),
            }
        )
    )
    out = decode_audio(ds).to_pandas().sort_values("url", ignore_index=True)
    assert list(out.columns) == [f.name for f in AUDIO_SCHEMA]
    assert (out["sample_rate"] == 16000).all()
    assert (out["n_samples"] == 1600).all()
    assert (out["channels"] == 1).all()


def test_decode_images_stage_real_png():
    """PNG payloads decode to exact dimensions through the Ray stage."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dedup_ray.functions.codecs import encode_png
    from dedup_ray.stages.multimodal import decode_images

    rng = np.random.Generator(np.random.PCG64(3))
    imgs = [rng.integers(0, 256, size=(10 + i, 20 + i, 3), dtype=np.uint8) for i in range(4)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([f"p{i}" for i in range(4)], pa.string()),
                "payload": pa.array([encode_png(x) for x in imgs], pa.binary()),
            }
        )
    )
    out = decode_images(ds, strict=True).to_pandas().sort_values("url", ignore_index=True)
    assert list(out["height"]) == [10, 11, 12, 13]
    assert list(out["width"]) == [20, 21, 22, 23]
