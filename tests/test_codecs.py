"""Pure-stdlib codec round-trips (no Ray session needed) + the real
decode path through DecodeImage/DecodeAudio kernels called directly."""

import numpy as np
import pyarrow as pa
import pytest

from dedup_ray.functions import codecs


def _img(h=13, w=17, c=3, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def test_png_roundtrip_rgb():
    px = _img()
    out = codecs.decode_png(codecs.encode_png(px))
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize("c", [1, 2, 4])
def test_png_roundtrip_other_channels(c):
    px = _img(c=c, seed=c)
    np.testing.assert_array_equal(codecs.decode_png(codecs.encode_png(px)), px)


def test_png_all_filter_types_decode():
    """Hand-build a PNG using every scanline filter; decoded pixels
    must match the filter-0 encoding of the same image."""
    import struct
    import zlib

    px = _img(h=5, w=7, c=3, seed=9)
    h, w, ch = px.shape
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        line = np.empty(stride, np.int32)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c_ = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c_
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c_)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c_)
            line[x] = (cur[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.decode_png(data), px)


def test_bmp_roundtrip():
    px = _img(h=6, w=5)
    np.testing.assert_array_equal(codecs.decode_bmp(codecs.encode_bmp(px)), px)


def test_wav_roundtrip():
    rng = np.random.Generator(np.random.PCG64(7))
    x = rng.integers(-30000, 30000, size=(480, 2), dtype=np.int16)
    sr, out = codecs.decode_wav(codecs.encode_wav(x, 24000))
    assert sr == 24000
    np.testing.assert_array_equal(out, x)


def test_sniff():
    assert codecs.sniff(codecs.encode_png(_img())) == "png"
    assert codecs.sniff(codecs.encode_bmp(_img())) == "bmp"
    assert codecs.sniff(codecs.encode_wav(np.zeros(8, np.int16))) == "wav"
    assert codecs.sniff(b"garbage") is None


def test_decode_image_kernel_real_png():
    """The DecodeImage kernel really decodes PNG/BMP: exact dims and a
    pixel-luminance histogram (strict mode must NOT raise)."""
    from dedup_ray.stages.multimodal import DecodeImage

    px = _img(h=20, w=30)
    batch = pa.table(
        {
            "url": pa.array(["p", "b"], pa.string()),
            "payload": pa.array(
                [codecs.encode_png(px), codecs.encode_bmp(px)], pa.binary()
            ),
        }
    )
    out = DecodeImage(strict=True)(batch).to_pandas()
    assert list(out["width"]) == [30, 30]
    assert list(out["height"]) == [20, 20]
    assert list(out["channels"]) == [3, 3]
    # identical pixels -> identical luminance histograms
    np.testing.assert_allclose(out["features"][0], out["features"][1])


def test_decode_audio_kernel_real_wav():
    from dedup_ray.stages.multimodal import DecodeAudio

    t = np.arange(4800, dtype=np.float64)
    tone = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    batch = pa.table(
        {
            "url": pa.array(["w"], pa.string()),
            "payload": pa.array([codecs.encode_wav(tone, 16000)], pa.binary()),
        }
    )
    out = DecodeAudio(strict=True)(batch).to_pandas()
    assert out["sample_rate"][0] == 16000
    assert out["n_samples"][0] == 4800
    assert out["channels"][0] == 1
    f = np.asarray(out["features"][0])
    assert len(f) == 64 and abs(f.sum() - 1.0) < 1e-5
    # a pure tone concentrates energy in few bands
    assert f.max() > 0.3
