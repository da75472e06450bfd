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


def test_png_palette_decode():
    """Hand-build a palette (color type 3) PNG; decode must expand
    indices through PLTE to RGB."""
    import struct
    import zlib

    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8
    )
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 3, 0]], np.uint8)
    h, w = idx.shape
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.decode_png(data), palette[idx])


def _smooth_img(h=48, w=80):
    """Band-limited test image — JPEG loss on it is small and bounded."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.stack(
        [
            128 + 100 * np.sin(xx / 13) * np.cos(yy / 9),
            xx * 255 / w,
            yy * 255 / h,
        ],
        axis=-1,
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_444():
    img = _smooth_img()
    data = codecs.encode_jpeg(img, quality=90)
    assert codecs.sniff(data) == "jpeg"
    dec = codecs.decode_jpeg(data)
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 3 and err.max() < 16


def test_jpeg_roundtrip_420_and_restart():
    """4:2:0 subsampling (multi-block MCUs + chroma upsampling) and
    restart markers (DRI/RSTn, DC predictor resets) both decode."""
    img = _smooth_img(h=37, w=53)  # non-multiple of 16: edge padding path
    for kw in (
        dict(subsample=True),
        dict(restart_interval=3),
        dict(subsample=True, restart_interval=2),
    ):
        dec = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90, **kw))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() < 5 and err.max() < 48, kw  # chroma edges are lossy


def test_jpeg_flat_image_near_exact():
    """A flat image is DC-only; quantized DC at high quality must
    reconstruct the exact level."""
    flat = np.full((24, 40, 3), 130, np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(flat, quality=95))
    assert int(np.abs(dec.astype(int) - 130).max()) == 0


def test_jpeg_grayscale_roundtrip():
    g = _smooth_img()[:, :, 0]
    dec = codecs.decode_jpeg(codecs.encode_jpeg(g, quality=92))
    assert dec.shape == (*g.shape, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 2


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(subsample=True),
        dict(restart_interval=3),
        dict(subsample=True, restart_interval=2),
    ],
)
def test_jpeg_progressive_matches_sequential(kw):
    """Progressive mode transmits the SAME quantized coefficients as
    sequential mode (spectral selection + one successive-approximation
    level), so decoding the SOF2 stream must reproduce the sequential
    decode BIT-IDENTICALLY — across 4:2:0, restart markers, and both.
    This exercises every Annex G block path: DC first/refine, AC
    first (EOBRUN, ZRL), AC refine (correction bits)."""
    img = _smooth_img(h=37, w=53)
    base = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90, **kw))
    pb = codecs.encode_jpeg(img, quality=90, progressive=True, **kw)
    assert b"\xff\xc2" in pb and pb.count(b"\xff\xda") == 14  # real scan script
    np.testing.assert_array_equal(codecs.decode_jpeg(pb), base)


def test_jpeg_progressive_noise_and_gray():
    """Dense random coefficients (no EOB runs, long ZRL chains) and the
    grayscale single-component script both stay bit-identical."""
    noisy = _img(h=24, w=31, c=3, seed=5)
    np.testing.assert_array_equal(
        codecs.decode_jpeg(codecs.encode_jpeg(noisy, quality=90, progressive=True)),
        codecs.decode_jpeg(codecs.encode_jpeg(noisy, quality=90)),
    )
    g = _smooth_img()[:, :, 0]
    np.testing.assert_array_equal(
        codecs.decode_jpeg(codecs.encode_jpeg(g, quality=92, progressive=True)),
        codecs.decode_jpeg(codecs.encode_jpeg(g, quality=92)),
    )


def test_jpeg_progressive_restart_numbering_resets_per_scan():
    """T.81 E.1.4: restart-marker numbering starts at RST0 after every
    SOS.  The repo's decoder ignores RSTn numbers, but spec-conforming
    decoders (libjpeg family) validate the per-scan sequence — a
    counter carried across scans makes the file unreadable elsewhere."""
    pb = codecs.encode_jpeg(
        _smooth_img(h=37, w=53), quality=90, progressive=True, restart_interval=2
    )
    # In entropy-coded data every 0xFF is followed by 0x00 (stuffing)
    # or an RSTn, so raw 0xFFDA bytes always delimit real SOS headers.
    scans = pb.split(b"\xff\xda")[1:]
    assert len(scans) == 14
    saw_rst = 0
    for seg in scans:
        nums = []
        i = 0
        while i < len(seg) - 1:
            if seg[i] == 0xFF and 0xD0 <= seg[i + 1] <= 0xD7:
                nums.append(seg[i + 1] - 0xD0)
                i += 2
            else:
                i += 1
        if nums:
            saw_rst += 1
            assert nums == [k % 8 for k in range(len(nums))], nums
    assert saw_rst >= 10  # most scans of this image emit restarts


def test_jpeg_rejects_corrupt_progressive():
    """A baseline stream with its SOF marker flipped to SOF2 is NOT a
    valid progressive stream (interleaved full-band scan): the
    progressive decoder must reject it, not misdecode."""
    data = bytearray(codecs.encode_jpeg(_smooth_img(16, 16)))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError):
        codecs.decode_jpeg(bytes(data))


def test_mp4_sample_table_roundtrip():
    """ISOBMFF sample tables recover every frame's exact byte range,
    dts and sync flag — including the multi-chunk stsc/stco path."""
    frames = [bytes([i]) * (40 + 9 * i) for i in range(11)]
    for fpc in (None, 3):  # single chunk and 4 chunks (3+3+3+2)
        data = codecs.encode_mp4(
            frames, fps=25, width=160, height=90, sync_every=5,
            frames_per_chunk=fpc,
        )
        assert codecs.sniff(data) == "mp4"
        info = codecs.parse_mp4_video(data)
        assert (info["codec"], info["width"], info["height"]) == ("mp4v", 160, 90)
        assert info["n_samples"] == 11
        for i, f in enumerate(frames):
            off, sz = int(info["offsets"][i]), int(info["sizes"][i])
            assert data[off : off + sz] == f, (fpc, i)
        np.testing.assert_array_equal(
            info["dts"], np.arange(11) * (info["timescale"] // 25)
        )
        assert np.flatnonzero(info["sync"]).tolist() == [0, 5, 10]


def test_mp4_parse_rejects_non_video():
    with pytest.raises(ValueError):
        codecs.parse_mp4_video(b"\x00" * 40)
    # structurally valid but no moov
    import struct
    data = struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4
    with pytest.raises(ValueError):
        codecs.parse_mp4_video(data + struct.pack(">I", 8) + b"free")


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
            "url": pa.array(["p", "b", "j"], pa.string()),
            "payload": pa.array(
                [
                    codecs.encode_png(px),
                    codecs.encode_bmp(px),
                    codecs.encode_jpeg(px, quality=95),
                ],
                pa.binary(),
            ),
        }
    )
    out = DecodeImage(strict=True)(batch).to_pandas()
    assert list(out["width"]) == [30, 30, 30]
    assert list(out["height"]) == [20, 20, 20]
    assert list(out["channels"]) == [3, 3, 3]
    # identical pixels -> identical luminance histograms
    np.testing.assert_allclose(out["features"][0], out["features"][1])
    # JPEG is lossy but its luminance histogram stays close in L1
    l1 = np.abs(
        np.asarray(out["features"][0]) - np.asarray(out["features"][2])
    ).sum()
    assert l1 < 0.8  # random-noise image: worst case for JPEG, still same mass


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
