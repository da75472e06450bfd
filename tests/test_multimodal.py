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


def test_decode_corrupt_payloads_fall_back_not_crash():
    """Non-strict decode must degrade to the fake decoder on CORRUPT
    payloads carrying a real magic — the stdlib codecs raise
    struct.error / zlib.error / wave.Error / RuntimeError on those,
    not just ValueError, and one bad payload must never kill the whole
    map_batches task."""
    from dedup_ray.stages.multimodal import DecodeAudio

    corrupt_images = [
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 4,  # truncated IHDR -> struct.error
        b"\x89PNG\r\n\x1a\n"
        + b"\x00\x00\x00\x0dIHDR"
        + b"\x00\x00\x00\x08\x00\x00\x00\x08\x08\x02\x00\x00\x00"
        + b"\x00" * 4
        + b"\x00\x00\x00\x05IDATxxxxx"
        + b"\x00" * 4,  # garbage DEFLATE -> zlib.error
        b"\xff\xd8\xff\xe0" + b"\x00" * 6,  # torn JPEG
        b"BM" + b"\x00" * 6,  # torn BMP
    ]
    out = DecodeImage(strict=False)(
        pa.table(
            {
                "url": [f"img{i}" for i in range(len(corrupt_images))],
                "payload": corrupt_images,
            }
        )
    )
    assert len(out) == len(corrupt_images)  # every row decoded (faked)

    corrupt_audio = [
        b"RIFF\x10\x00\x00\x00WAVEgarbagegarbage",  # RuntimeError
        b"RIFF" + b"\x00" * 4,  # wave.Error
    ]
    out = DecodeAudio(strict=False)(
        pa.table({"url": ["a", "b"], "payload": corrupt_audio})
    )
    assert len(out) == 2

    # strict mode surfaces the real decode error instead of faking
    with pytest.raises(Exception):
        DecodeImage(strict=True)(
            pa.table({"url": ["x"], "payload": [corrupt_images[0]]})
        )


def test_sample_frames():
    out = sample_frames(_media_ds(4), n_frames=4).to_pandas()
    assert set(out.columns) == {
        "url", "frame_idx", "frame_sha256", "pts_sec", "is_sync"
    }
    assert len(out) == 16
    per = out.groupby("url")["frame_idx"].apply(list)
    assert all(sorted(v) == [0, 1, 2, 3] for v in per)
    # identical payload -> identical frame hashes
    assert out["frame_sha256"].str.len().eq(64).all()
    # byte-window fallback carries no timing info
    assert out["pts_sec"].isna().all() and out["is_sync"].isna().all()


def test_sample_frames_real_mp4():
    """MP4 payloads sample REAL frames: hashes match the original frame
    bytes, pts from stts, sync preference from stss — strict mode OK."""
    import hashlib

    from dedup_ray.functions.codecs import encode_mp4

    rng = np.random.Generator(np.random.PCG64(11))
    frames = [rng.bytes(80 + 13 * i) for i in range(12)]
    # sync every 3rd frame at 10 fps -> sync pts 0.0, 0.3, 0.6, 0.9
    payload = encode_mp4(frames, fps=10, sync_every=3)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["v0"], pa.string()),
                "payload": pa.array([payload], pa.binary()),
            }
        )
    )
    out = (
        sample_frames(ds, n_frames=4)
        .to_pandas()
        .sort_values("frame_idx", ignore_index=True)
    )
    assert len(out) == 4
    assert out["is_sync"].all()  # 4 sync frames exist for n_frames=4
    np.testing.assert_allclose(out["pts_sec"], [0.0, 0.3, 0.6, 0.9])
    want = [hashlib.sha256(frames[i]).hexdigest() for i in (0, 3, 6, 9)]
    assert list(out["frame_sha256"]) == want


def test_sample_frames_strict_rejects_non_mp4():
    from dedup_ray.stages.multimodal import SampleFrames

    with pytest.raises(NotImplementedError):
        SampleFrames(4, strict=True)(
            pa.table({"url": ["x"], "payload": [b"not-a-video"]})
        )


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
